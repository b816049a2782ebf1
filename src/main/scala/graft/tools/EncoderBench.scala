package graft.tools

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.catalyst.expressions.UnsafeRow

/** Micro-bench behind the SimHashAgg buffer-encoder scaladoc numbers
  * (graft.llmdata.Dedup): serialized size + serialize/deserialize
  * round-trip time for the 64-int vote buffer under the kryo encoder vs
  * the structural ExpressionEncoder. Run: `sbt "runMain
  * graft.tools.EncoderBench"`. No SparkSession — encoders are
  * session-free. */
object EncoderBench {
  def main(args: Array[String]): Unit = {
    val kryo = ExpressionEncoder(Encoders.kryo[Array[Int]]
      .asInstanceOf[org.apache.spark.sql.catalyst.encoders.AgnosticEncoder[Array[Int]]])
    val struct = ExpressionEncoder[Array[Int]]()
    val buf = Array.tabulate(64)(i => i * 37 - 32)
    def bench(name: String, enc0: ExpressionEncoder[Array[Int]]): Unit = {
      val enc = enc0.resolveAndBind()
      val ser = enc.createSerializer()
      val de = enc.createDeserializer()
      val size = ser(buf).asInstanceOf[UnsafeRow].getSizeInBytes
      var i = 0
      while (i < 200000) { de(ser(buf)); i += 1 } // JIT warmup
      val n = 2000000
      val t0 = System.nanoTime()
      i = 0
      while (i < n) { de(ser(buf)); i += 1 }
      val perOp = (System.nanoTime() - t0).toDouble / n
      println(f"$name: row $size bytes, $perOp%.0f ns/round-trip")
    }
    bench("kryo  ", kryo)
    bench("struct", struct)
  }
}
