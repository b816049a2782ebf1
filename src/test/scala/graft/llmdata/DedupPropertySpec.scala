package graft.llmdata

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Scalacheck pin for the banded-SimHash pigeonhole claim: for ANY
  * (numBands, maxHamming < numBands, signature multiset), the banded
  * equi-join must return exactly the pairs with hamming ≤ maxHamming —
  * perfect recall comes from the pigeonhole argument (a pair differing in
  * ≤ maxHamming bits cannot disagree in all numBands bands), and precision
  * from the exact `bit_count(xor)` verify. Random 64-bit longs sit ~32 bits
  * apart, so the generator PLANTS near-duplicates by flipping 0..16 bits of
  * existing signatures — samples land on both sides of the threshold. */
class DedupPropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val genCase: Gen[(Int, Int, List[Long])] = for {
    numBands <- Gen.choose(2, 16)
    maxHamming <- Gen.choose(0, numBands - 1)
    n <- Gen.choose(3, 12)
    base <- Gen.listOfN(n, Gen.long)
    nDup <- Gen.choose(1, 4)
    dups <- Gen.listOfN(nDup, for {
      src <- Gen.choose(0, n - 1)
      k <- Gen.choose(0, 16)
      bits <- Gen.pick(k, 0 until 64)
    } yield base(src) ^ bits.foldLeft(0L)((acc, b) => acc | (1L << b)))
  } yield (numBands, maxHamming, base ++ dups)

  test("scalacheck: banded pairs == exact hamming-threshold pairs for any bands/threshold/signatures") {
    val s = spark
    import s.implicits._
    val prop = Prop.forAllNoShrink(genCase) { case (numBands, maxHamming, sigs) =>
      val df = sigs.zipWithIndex.map { case (sig, i) => (i.toLong, sig) }
        .toDF("doc_id", "simhash")
      val got = Dedup.simhashBandedPairsOf(df, maxHamming, numBands).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val exp = (for {
        i <- sigs.indices; j <- sigs.indices if i < j
        h = java.lang.Long.bitCount(sigs(i) ^ sigs(j)) if h <= maxHamming
      } yield (i.toLong, j.toLong, h.toLong)).toSet
      Prop(got == exp) :| s"bands=$numBands maxHam=$maxHamming got=$got exp=$exp"
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, s"scalacheck failed: ${res.status}")
  }
}
