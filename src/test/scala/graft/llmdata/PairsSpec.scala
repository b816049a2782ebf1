package graft.llmdata

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The block-pair self-join must enumerate every unordered pair exactly
  * once for any block count and id distribution — the backbone every exact
  * pairwise operator rides on. */
class PairsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("property: every unordered pair exactly once, any numBlocks, gappy ids") {
    val rnd = new scala.util.Random(7)
    for (trial <- 0 until 5) {
      val n = 10 + rnd.nextInt(40)
      // gappy, unordered ids (sparse longs exercise hash-blocking)
      val ids = rnd.shuffle((0 until 1000).toList).take(n).map(_.toLong * 17 + 3)
      val df = ids.map(i => (i, s"v$i")).toDF("id", "payload")
      val numBlocks = 1 + rnd.nextInt(7)
      val pairs = Pairs.blockedSelfPairs(df, "id", numBlocks)
        .select(least(col("id_a"), col("id_b")), greatest(col("id_a"), col("id_b")))
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      val expected = (for {
        a <- ids; b <- ids if a < b
      } yield (a, b)).toSet
      assert(pairs.length === expected.size,
        s"trial $trial: ${pairs.length} pairs, expected ${expected.size} (n=$n, B=$numBlocks)")
      assert(pairs.toSet === expected)
    }
  }

  test("payload columns ride along with both sides") {
    val df = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "payload")
    val got = Pairs.blockedSelfPairs(df, "id", 2)
      .select("id_a", "payload_a", "id_b", "payload_b").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3))).toSet
    got.foreach { case (ia, pa, ib, pb) =>
      assert(pa === s"v$ia".replace("v", "") || pa === Map(1L -> "a", 2L -> "b", 3L -> "c")(ia))
      assert(pb === Map(1L -> "a", 2L -> "b", 3L -> "c")(ib))
    }
    assert(got.size === 3)
  }
}
