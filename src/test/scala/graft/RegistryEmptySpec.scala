package graft

import org.scalatest.funsuite.AnyFunSuite

/** Degenerate-input robustness: every registry query must execute (not
  * necessarily return rows) against a corpus whose every table is EMPTY —
  * the shape of a fresh pipeline, a fully-filtered partition, or a dry
  * backfill window. An operator that NPEs or throws on zero rows would
  * take down a 1000-executor job that merely read an empty partition.
  *
  * No exclusions: the ALS surfaces (the last holdouts — MLlib's fit throws
  * on zero ratings) now guard the degenerate case themselves and return
  * well-typed empty/NaN results, so EVERY registry query must execute here.
  */
class RegistryEmptySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Empty mirror of the testdata layout: each table rewritten with its
    * schema and zero rows. Built once per JVM. */
  private lazy val emptyDir: String = {
    val dir = graft.io.TempDirs.scratch("graft-empty-sf").toString
    graft.io.Tables.names.foreach { t =>
      spark.read.parquet(s"${TestSpark.sfDir}/$t.parquet")
        .limit(0).coalesce(1)
        .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    dir
  }

  Registry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name executes on an all-empty corpus") {
      val n = fn(spark, emptyDir).count()
      assert(n >= 0L)
    }
  }
}
