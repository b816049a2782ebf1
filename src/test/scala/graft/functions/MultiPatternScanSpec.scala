package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import graft.TestSpark

/** Byte-exact pins for the Aho–Corasick multi-pattern scan (q320):
  * shared-suffix outputs, greedy non-overlap, cross-pattern overlap,
  * UTF-8 multibyte safety, nulls, and codegen/interpreted parity. */
class MultiPatternScanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def direct(text: String, pats: String*): Seq[Long] =
    new AhoCorasick(pats.map(_.getBytes("UTF-8")).toArray)
      .countNonOverlapping(UTF8String.fromString(text)).toSeq

  test("classic shared-suffix set (he/she/his/hers) reports every pattern") {
    // "ushers" contains she, he, hers — and "his" not at all
    assert(direct("ushers", "he", "she", "his", "hers") === Seq(1L, 1L, 0L, 1L))
  }

  test("within-pattern counting is greedy non-overlapping (replace semantics)") {
    assert(direct("aaaa", "aa") === Seq(2L))          // not 3 (overlaps)
    assert(direct("table table table", "table table") === Seq(1L)) // not 2
    assert(direct("abababa", "aba") === Seq(2L))       // greedy left-to-right
  }

  test("different patterns may overlap each other freely") {
    assert(direct("abc", "ab", "bc") === Seq(1L, 1L))
    assert(direct("aaa", "a", "aa", "aaa") === Seq(3L, 1L, 1L))
  }

  test("matching is UTF-8 byte-exact; multibyte patterns work") {
    assert(direct("héllo hé", "hé") === Seq(2L))
    assert(direct("héllo", "é") === Seq(1L))
    // a pattern that is a byte-prefix of a multibyte char must not match
    assert(direct("é", "e") === Seq(0L))
  }

  test("expression: null in, null out; codegen and interpreted agree") {
    import spark.implicits._
    val df = Seq(Some("spark and spark"), None, Some("no hits"))
      .toDF("t")
      .select(MultiPatternCounts.counts(col("t"), Seq("spark", "no")).as("c"))
    val got = df.collect().map(r => if (r.isNullAt(0)) null else r.getSeq[Long](0))
    assert(got(0) === Seq(2L, 0L) && got(1) == null && got(2) === Seq(0L, 1L))
    // interpreted parity (no codegen): same values through direct eval
    assert(direct("spark and spark", "spark", "no") === Seq(2L, 0L))
  }

  test("empty or missing patterns are rejected at construction") {
    intercept[IllegalArgumentException] {
      MultiPatternCounts.counts(col("x"), Seq.empty)
    }
    intercept[IllegalArgumentException] {
      MultiPatternCounts.counts(col("x"), Seq("ok", ""))
    }
  }
}
