package graft.llmdata

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** q357 greedy sequence packing — the invariants the oracle's recursive
  * CTE certifies only in aggregate: per-bin capacity, greedy tightness,
  * oversized-document isolation, and partitioning invariance. */
class PackingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def mk(rows: Seq[(Long, String, String)]): org.apache.spark.sql.DataFrame =
    rows.map { case (id, lang, text) => (id, lang, "s", text) }
      .toDF("doc_id", "lang", "source", "text")

  test("bins respect capacity; greedy is tight; oversized docs isolate") {
    val docs = mk(Seq(
      (1L, "en", "a" * 30), (2L, "en", "b" * 40), (3L, "en", "c" * 40),
      (4L, "en", "d" * 150), // oversized: capacity 100 — its own bin
      (5L, "en", "e" * 10),
      (10L, "de", "x" * 60), (11L, "de", "y" * 60)))
    val got = Packing.packGreedy(docs, 100L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).sortBy(t => (t._1, t._2))
    // en: [1(30)+2(40)] bin0 (70; +3 would be 110>100), [3(40)] bin1
    // (+4 would be 190), [4(150)] bin2 alone, [5(10)] bin3 (greedy never
    // looks back); de: [10(60)] bin0, [11(60)] bin1
    assert(got === Array(
      ("de", 10L, 60L, 0L), ("de", 11L, 60L, 1L),
      ("en", 1L, 30L, 0L), ("en", 2L, 40L, 0L), ("en", 3L, 40L, 1L),
      ("en", 4L, 150L, 2L), ("en", 5L, 10L, 3L)))
    // capacity holds for every bin not containing an oversized doc
    val fills = got.groupBy(t => (t._1, t._4)).values
    assert(fills.forall(b => b.map(_._3).sum <= 100L || b.length == 1))
  }

  test("a NULL-key group packs from bin 0, even when its first doc is oversized") {
    // regression: a null initial sentinel conflated "no group yet" with
    // a leading NULL-lang group — its oversized first doc skipped the
    // reset and started at bin 1
    val docs = Seq(
      (1L, null.asInstanceOf[String], "s", "z" * 150),
      (2L, null.asInstanceOf[String], "s", "z" * 30),
      (3L, "en", "s", "a" * 40))
      .toDF("doc_id", "lang", "source", "text")
    val got = Packing.packGreedy(docs, 100L).collect()
      .map(r => (Option(r.getString(0)), r.getLong(1), r.getLong(3)))
      .sortBy(t => (t._1.getOrElse(""), t._2))
    assert(got === Array(
      (None, 1L, 0L), (None, 2L, 1L), (Some("en"), 3L, 0L)))
  }

  test("packing is deterministic under any input partitioning") {
    val rows = (0L until 500L).map(i =>
      (i, if (i % 3 == 0) "en" else if (i % 3 == 1) "de" else "fr",
        "t" * (1 + (i * 37 % 90)).toInt))
    val a = Packing.packingReport(mk(rows), 256L)
      .orderBy("lang", "bin").collect().toSeq
    val b = Packing.packingReport(mk(rows).repartition(17), 256L)
      .orderBy("lang", "bin").collect().toSeq
    val c = Packing.packingReport(mk(rows).coalesce(1), 256L)
      .orderBy("lang", "bin").collect().toSeq
    assert(a === b)
    assert(a === c)
    // every bin's fill is within capacity (no oversized docs here: max
    // cost 90 < 256) and no two consecutive bins could have merged
    val perDoc = Packing.packGreedy(mk(rows), 256L).collect()
      .map(r => (r.getString(0), r.getLong(3), r.getLong(2)))
    val fills = perDoc.groupBy(t => (t._1, t._2)).view
      .mapValues(_.map(_._3).sum).toMap
    assert(fills.values.forall(_ <= 256L))
    fills.keys.groupBy(_._1).foreach { case (lang, keys) =>
      val bins = keys.map(_._2).toSeq.sorted
      assert(bins === (0L until bins.length.toLong),
        s"$lang bins must be dense from 0")
    }
  }
}
