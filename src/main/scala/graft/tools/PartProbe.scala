package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch: stream-stream outer interval join settle at varying
  * state-store partition counts. */
object PartProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (parts <- Seq("2", "4", "8"); rep <- 1 to 3) {
      val t0 = System.nanoTime()
      val s2 = spark.newSession()
      s2.conf.set("spark.sql.shuffle.partitions", parts)
      s2.conf.set("spark.sql.session.timeZone", "UTC")
      s2.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val staged = graft.io.TempDirs.scratch("graft-partprobe").toString
      java.nio.file.Files.createSymbolicLink(
        java.nio.file.Paths.get(staged, "events.parquet"),
        java.nio.file.Paths.get(s"$dir/events.parquet").toAbsolutePath)
      val schema = s2.read.parquet(s"$dir/events.parquet").schema
      val raw = s2.readStream.schema(schema).parquet(staged)
      val tsCol = if (raw.schema("ts").dataType.typeName == "long")
        (col("ts") / 1000000L).cast("timestamp") else col("ts").cast("timestamp")
      val stream = raw.withColumn("ts", tsCol)
      val wmMs = 3900000L
      val p = stream.filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"), col("ts").as("p_ts"), col("event_id").as("p_event"))
        .withWatermark("p_ts", s"$wmMs milliseconds")
      val v = stream.filter(col("event_type") === "view")
        .select(col("user_id").as("v_user"), col("ts").as("v_ts"), col("event_id").as("v_event"))
        .withWatermark("v_ts", s"$wmMs milliseconds")
      val j = p.join(v, col("p_user") === col("v_user") &&
          col("v_ts") >= col("p_ts") - expr("INTERVAL 3600000 MILLISECONDS") &&
          col("v_ts") <= col("p_ts"), "leftOuter")
        .select(col("p_event"), col("v_event"))
      val name = s"probe_pp_${System.nanoTime()}"
      val q = j.writeStream.outputMode("append").format("memory").queryName(name).start()
      try q.processAllAvailable() finally q.stop()
      val n = s2.table(name).count()
      s2.catalog.dropTempView(name)
      println(f"PARTPROBE parts=$parts rep=$rep rows=$n t=${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
