package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.matrix.CooMatrix

/** Cost probe for the unrolled-IPF certification chain (q94/q121): the
  * agg+join fit consumes its input twice, so a k-fit unroll doubles the
  * logical plan per fit and needs lineage checkpoints (~2s per truncation
  * barrier, measured below) to stay plannable; the one-pass window fit
  * ([[CooMatrix.fitRowsExactOnePass]]) consumes the matrix once and keeps
  * the whole chain a linear narrow plan. Representative warm numbers at
  * sf0.1, local[32] (round 12): steps 2/4/8 agg+join+ck2 → 2.2/6.1/10.2s;
  * one-pass → 0.99/1.13/1.06s. A persist()-based variant (truncate nothing,
  * cache every sweep) was measured to HANG beyond ~4 sweeps — persist
  * caches execution but not the analyzer's 2^k plan, the failure mode
  * CooMatrix.checkpointed's scaladoc documents.
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.tools.UnrollProbe"
  */
object UnrollProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def inputs() = {
      val li = spark.read.parquet(s"$dir/lineitem.parquet")
      val x = li.groupBy(col("l_partkey").as(CooMatrix.Idx))
        .agg(sum(col("l_quantity").cast("decimal(38,6)")).cast("double").as(CooMatrix.Value))
      val y = li.groupBy(month(col("l_shipdate")).cast("long").as(CooMatrix.Idx))
        .agg(sum(col("l_quantity").cast("decimal(38,6)")).cast("double").as(CooMatrix.Value))
      val m = CooMatrix(li.groupBy(col("l_partkey").as(CooMatrix.Row),
          month(col("l_shipdate")).cast("long").as(CooMatrix.Col))
        .agg(sum(col("l_extendedprice").cast("decimal(38,2)")).cast("double").as(CooMatrix.Value)))
      (x, y, m)
    }

    // the former q94/q121 shape: agg+join fits + every-2nd-sweep checkpoint
    def aggJoinChain(steps: Int): Long = {
      val (x, y, m0) = inputs(); var m = m0
      for (k <- 1 to steps) {
        m = m.fitRowsExact(x).mapValues(round(_, 6))
        m = m.transpose.fitRowsExact(y).mapValues(round(_, 6)).transpose
        if (k % 2 == 0 && k < steps) m = m.checkpointed()
      }
      m.df.count()
    }

    // the shipped shape: one-pass window fits, no checkpoints
    def onePassChain(steps: Int): Long = {
      val (x, y, m0) = inputs(); var m = m0
      for (_ <- 1 to steps) {
        m = m.fitRowsExactOnePass(x).mapValues(round(_, 6))
        m = m.transpose.fitRowsExactOnePass(y).mapValues(round(_, 6)).transpose
      }
      m.df.count()
    }

    aggJoinChain(2); onePassChain(2) // warmup untimed
    for (steps <- Seq(2, 4, 8)) {
      val t0 = System.nanoTime()
      val n = aggJoinChain(steps)
      println(f"UNROLL aggjoin steps=$steps rows=$n t=${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    for (steps <- Seq(2, 4, 8)) {
      val t0 = System.nanoTime()
      val n = onePassChain(steps)
      println(f"UNROLL onepass steps=$steps rows=$n t=${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
