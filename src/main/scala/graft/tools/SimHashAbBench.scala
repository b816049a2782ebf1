package graft.tools

import org.apache.spark.sql.{Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** A/B micro-bench behind the SimHashAgg buffer-encoder scaladoc numbers
  * (graft.llmdata.Dedup): the same 64-bit vote aggregation over a
  * synthetic 5M-row token-hash frame, with the buffer encoder as the ONLY
  * variable — kryo vs structural ExpressionEncoder. Interleaved rounds in
  * one session, min-of-N reported (Bench.scala's noise rationale). Run:
  * `sbt "runMain graft.tools.SimHashAbBench"`. */
object SimHashAbBench {
  private abstract class Votes extends Aggregator[Long, Array[Int], Long] {
    override def zero: Array[Int] = new Array[Int](64)
    override def reduce(b: Array[Int], h: Long): Array[Int] = {
      var i = 0
      while (i < 64) { b(i) += (if (((h >>> i) & 1L) == 1L) 1 else -1); i += 1 }
      b
    }
    override def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
      var i = 0
      while (i < 64) { a(i) += b(i); i += 1 }
      a
    }
    override def finish(b: Array[Int]): Long = {
      var out = 0L; var i = 0
      while (i < 64) { if (b(i) > 0) out |= (1L << i); i += 1 }
      out
    }
    override def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }
  private object KryoVotes extends Votes {
    override def bufferEncoder: Encoder[Array[Int]] = Encoders.kryo[Array[Int]]
  }
  private object StructVotes extends Votes {
    override def bufferEncoder: Encoder[Array[Int]] = {
      import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
      ExpressionEncoder[Array[Int]]()
    }
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val src = spark.range(5000000L)
      .select((col("id") % 100000L).as("doc_id"), xxhash64(col("id")).as("h"))
      .persist()
    src.count()
    def run(agg: Votes): Double = {
      val f = udaf(agg, Encoders.scalaLong)
      val t0 = System.nanoTime()
      // bit_count keeps the settle aggregate inside long range (a raw sum
      // of 100k random 64-bit signatures overflows ANSI long arithmetic)
      src.groupBy("doc_id").agg(f(col("h")).as("s"))
        .agg(sum(bit_count(col("s")))).collect()
      (System.nanoTime() - t0) / 1e9
    }
    run(KryoVotes); run(StructVotes) // warmup
    val rounds = 5
    val times = (1 to rounds).map(_ => (run(KryoVotes), run(StructVotes)))
    println(f"kryo   min=${times.map(_._1).min}%.2f s  all=${times.map(t => f"${t._1}%.2f").mkString(",")}")
    println(f"struct min=${times.map(_._2).min}%.2f s  all=${times.map(t => f"${t._2}%.2f").mkString(",")}")
    spark.stop()
  }
}
