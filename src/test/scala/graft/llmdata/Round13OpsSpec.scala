package graft.llmdata

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Unit pins for the round-13 operator work: the quality-stack capstone
  * (q192) and the certified label/split frame (q193). */
class Round13OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def dir = TestSpark.sfDir
  private lazy val docs = spark.read.parquet(s"$dir/documents.parquet")

  test("q192 capstone equals the stepwise composition of its public stages") {
    // Stage the pipeline by hand from the same public pieces the capstone
    // composes — score gate, kept-min-per-component near-dup, pack — and
    // require exact frame equality. A capstone that silently reorders or
    // drops a stage (gate after dedup, corpus-min representative) diverges.
    val keepIds = graft.ml.QualityClassifier.scoreDocs(spark, dir)
      .filter(col("keep")).select("doc_id")
    val kept = docs.join(keepIds, Seq("doc_id"), "left_semi")
    val reps = kept.select("doc_id")
      .join(Dedup.componentLabelsOn(spark, dir), "doc_id")
      .groupBy("component").agg(min(col("doc_id")).as("doc_id"))
      .select("doc_id")
    val expected = Curation.packSequences(
      kept.join(reps, Seq("doc_id"), "left_semi"))
    val got = Curation.qualityCurationPipeline(spark, dir)
    assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty,
      "capstone diverged from the stepwise stage composition")
    assert(got.count() > 0L)
  }

  test("q192 filtering before dedup never resurrects a dropped representative's dups") {
    // Every surviving doc must be the MINIMUM kept doc_id of its near-dup
    // component: if the corpus-wide representative was quality-dropped,
    // exactly one (the smallest) kept member stands in — never two.
    val out = Curation.qualityCurationPipeline(spark, dir).select("doc_id")
    val labels = Dedup.componentLabelsOn(spark, dir)
    val perComp = out.join(labels, "doc_id")
      .groupBy("component").agg(count(lit(1)).as("n"))
    assert(perComp.filter(col("n") > 1L).count() === 0L,
      "two survivors share a near-dup component")
  }

  test("q194 JL projection: norm-preserving in expectation, deterministic") {
    import spark.implicits._
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val proj = Similarity.jlProject(emb, k = 16)
    // k components per vector, every vector present
    assert(proj.count() === emb.count() * 16)
    // E||Rx/√k||² = ||x||² for ±1 JL signs; with d=64, k=16 the per-vector
    // ratio is noisy but the corpus mean concentrates near 1.
    val pn = proj.groupBy("vec_id")
      .agg(sum(col("value") * col("value")).as("pn2"))
    val on = emb.select(col("vec_id"),
      aggregate(graft.functions.VectorOps.asDouble(col("embedding")),
        lit(0.0), (a, x) => a + x * x).as("on2"))
    val meanRatio = pn.join(on, "vec_id")
      .agg(avg(col("pn2") / col("on2"))).head().getDouble(0)
    assert(meanRatio > 0.5 && meanRatio < 1.5,
      s"mean norm ratio $meanRatio — projection not unbiased")
    val again = Similarity.jlProject(emb, k = 16)
    assert(proj.exceptAll(again).isEmpty && again.exceptAll(proj).isEmpty)
  }

  test("q194 narrow SignedProjection expression equals the relational twin bit-for-bit") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val narrow = Similarity.jlProject(emb, k = 16)
    val relational = Similarity.jlProjectRelational(emb, k = 16)
    assert(narrow.exceptAll(relational).isEmpty && relational.exceptAll(narrow).isEmpty,
      "narrow expression diverged from the relational formulation")
    // and the narrow plan is exchange-free (pure projection + generate)
    val plan = narrow.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"narrow JL plan has a shuffle:\n$plan")
  }

  test("q197 trusted dedup keeps the highest-trust source's copy, not the first") {
    import spark.implicits._
    val planted = Seq(
      (0L, "same text here", "src2", "en", 14L),   // first-arrived, low trust
      (1L, "same text here", "src10", "en", 14L),  // higher trust wins
      (2L, "same text here", "src10", "en", 14L),  // same trust: doc_id tiebreak
      (3L, "unique text", "src0", "en", 11L)
    ).toDF("doc_id", "text", "source", "lang", "n_chars")
    val got = Dedup.dedupKeepTrusted(planted).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(got === Set(1L, 3L), s"keepers were $got")
  }

  test("q200 dup-centrality: a boilerplate hub out-ranks its spokes; isolated docs settle at 0.15") {
    import spark.implicits._
    // star graph: doc 0 near-dups docs 1..4; doc 9 is isolated
    val pairs = Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L)).toDF("doc_a", "doc_b")
    val ids = (0L to 9L).map(i => (i, s"t$i", "s", "en", 2L))
      .toDF("doc_id", "text", "source", "lang", "n_chars")
    val pr = Dedup.dupCentralityFrom(pairs, ids)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(pr(0L) > pr(1L), s"hub ${pr(0L)} not above spoke ${pr(1L)}")
    assert(math.abs(pr(9L) - 0.15) < 1e-12, s"isolated doc pr ${pr(9L)} != 0.15")
    // hand-computed star: spokes send 1/1 each -> hub pr1 = 0.15+0.85*4;
    // hub sends 1/4 each -> spoke pr1 = 0.15+0.85*0.25
    // iter2: hub = 0.15+0.85*sum(spoke_pr1/1); spoke = 0.15+0.85*(hub_pr1/4)
    val spoke1 = 0.15 + 0.85 * 0.25
    val hub2 = 0.15 + 0.85 * (4 * spoke1)
    val spoke2 = 0.15 + 0.85 * ((0.15 + 0.85 * 4.0) / 4.0)
    assert(math.abs(pr(0L) - hub2) < 1e-9, s"hub ${pr(0L)} != $hub2")
    assert(math.abs(pr(1L) - spoke2) < 1e-9, s"spoke ${pr(1L)} != $spoke2")
  }

  test("q201 negative sampling: degenerate draws are flagged, never silently kept") {
    import spark.implicits._
    // two-doc corpus: every mod-2 draw lands on the pair itself
    val pairs = Seq((0L, 1L)).toDF("doc_a", "doc_b")
    val tiny = Seq((0L, "a", "s", "en", 1L), (1L, "b", "s", "en", 1L))
      .toDF("doc_id", "text", "source", "lang", "n_chars")
    val got = Dedup.contrastiveNegativesFrom(pairs, tiny, negsPerPair = 3).collect()
    assert(got.length === 3)
    assert(got.forall(_.getAs[Boolean]("is_degenerate")),
      "a draw onto the pair itself was not flagged")
    // larger corpus: a draw landing on a verified-dup neighbor is flagged too
    val ids = (0L to 99L).map(i => (i, s"t$i", "s", "en", 2L))
      .toDF("doc_id", "text", "source", "lang", "n_chars")
    val multi = Dedup.contrastiveNegativesFrom(
      Seq((0L, 1L), (0L, 2L)).toDF("doc_a", "doc_b"), ids, negsPerPair = 50)
    val flagged = multi.filter(col("is_degenerate")).select("neg_id")
      .collect().map(_.getLong(0)).toSet
    // every flagged id must be 0, 1, or 2 (pair member or dup neighbor)
    assert(flagged.subsetOf(Set(0L, 1L, 2L)), s"unexpected flags: $flagged")
  }

  test("q203 quarantine: rule priority — a short dup is exact_dup, not too_short") {
    import spark.implicits._
    val planted = Seq(
      (0L, "tiny text", "s", "en", 9L),          // keeper of the dup group; too short
      (1L, "tiny text", "s", "en", 9L),          // dup loser AND too short -> exact_dup wins
      (2L, "x y z", "s", "xx", 5L),              // blocked lang AND too short -> lang wins
      (3L, (1 to 50).map(i => s"w$i").mkString(" "), "s", "en", 99L) // ok
    ).toDF("doc_id", "text", "source", "lang", "n_chars")
    val got = Curation.quarantineRouter(planted)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    assert(got(0L) === (("drop", "too_short")))
    assert(got(1L) === (("drop", "exact_dup")), s"priority broken: ${got(1L)}")
    assert(got(2L) === (("drop", "lang_blocked")))
    assert(got(3L) === (("keep", "ok")))
  }

  test("q202 profile: null/distinct/min-max semantics on a planted frame") {
    import spark.implicits._
    val f = Seq((1L, Some("b")), (2L, None), (3L, Some("a")), (4L, Some("a")))
      .toDF("id", "s")
    val p = graft.relational.Profile.tableProfile(f, Seq("id", "s"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5))).toMap
    assert(p("id") === ((4L, 0L, 4L, "1", "4")))
    assert(p("s") === ((4L, 1L, 2L, "a", "b")), s"got ${p("s")}")
  }

  test("q199 streaming file sink: batch-equal output and an exactly-once commit log") {
    import graft.streaming.Events
    val got = Events.streamingFileSink(spark, dir)
    val batch = spark.read.parquet(s"$dir/events.parquet")
      .groupBy("user_id", "event_type")
      .agg(count(lit(1)).as("n_events"),
        min(col("value")).as("min_value"), max(col("value")).as("max_value"))
    assert(got.exceptAll(batch).isEmpty && batch.exceptAll(got).isEmpty,
      "file-sink round-trip diverged from the batch aggregation")
    // the exactly-once guarantee lives in the sink's commit log
    val sinkDir = new java.io.File(
      got.inputFiles.head.stripPrefix("file:")).getParentFile
    assert(new java.io.File(sinkDir, "_spark_metadata").exists(),
      s"no _spark_metadata commit log under $sinkDir")
  }

  test("q193 label/split frame: tercile balance, split rate, and determinism") {
    val f = graft.ml.QualityClassifier.labeledSplits(docs)
    val n = f.count()
    // middle tercile dropped -> roughly 2/3 of the corpus is labeled
    val total = docs.count()
    assert(n >= total * 55 / 100 && n <= total * 75 / 100,
      s"labeled $n of $total — tercile drop looks wrong")
    // both classes present per language
    val perLang = f.groupBy("lang").agg(countDistinct("label").as("k")).collect()
    assert(perLang.forall(_.getLong(1) === 2L), "a language lost a label class")
    // the md5 1-in-5 gate lands near 20%
    val held = f.filter(col("split") === "heldout").count().toDouble / n
    assert(held > 0.1 && held < 0.3, s"held-out rate $held far from 0.2")
    val again = graft.ml.QualityClassifier.labeledSplits(docs)
    assert(f.exceptAll(again).isEmpty && again.exceptAll(f).isEmpty)
  }

  test("q206 bloom prune is lossless: pruned join equals the plain join") {
    import graft.relational.BloomPrune
    val cust = spark.read.parquet(s"$dir/customer.parquet")
      .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
    val orders = spark.read.parquet(s"$dir/orders.parquet")
    val plain = orders.join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy("c_custkey")
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
          .as("total_spend"))
    val got = BloomPrune.segmentOrderStats(spark, dir)
    assert(got.exceptAll(plain).isEmpty && plain.exceptAll(got).isEmpty,
      "bloom-pruned join diverged from the plain join")
    assert(got.count() > 0L)
  }

  test("q206 bloom has no false negatives and prunes effectively") {
    import graft.relational.BloomPrune
    val cust = spark.read.parquet(s"$dir/customer.parquet")
      .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
    val orders = spark.read.parquet(s"$dir/orders.parquet")
    // no false negatives: every dim key passes its own filter
    val selfPruned = BloomPrune.prune(
      cust.select(col("c_custkey").as("k")), col("k"), cust, col("c_custkey"))
    assert(selfPruned.count() === cust.count(),
      "a dim key failed its own bloom — false negative")
    // effective pruning: survivors ≈ true matches (fp rate small)
    val matching = orders.join(cust, col("o_custkey") === col("c_custkey"))
      .count()
    val survivors = BloomPrune.prune(
      orders, col("o_custkey"), cust, col("c_custkey")).count()
    val total = orders.count()
    assert(survivors >= matching, "pruned below the true match count")
    assert(survivors <= matching + (total - matching) / 20 + 1,
      s"fp rate too high: $survivors survivors vs $matching matches of $total")
  }

  test("q213 FK audit: planted orphans are counted exactly; fixture graph is clean") {
    import graft.relational.FkAudit
    import spark.implicits._
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val child = Seq(1L, 1L, 2L, 99L, 98L, 98L).toDF("ck")
    val r = FkAudit.edge("t", child, "ck", parent, "pk").head
    assert(r.getLong(1) === 6L && r.getLong(2) === 3L,
      s"planted-orphan audit wrong: $r")
    // the fixture warehouse must be referentially clean
    val audit = FkAudit.audit(spark, dir).collect()
    assert(audit.length === 7)
    audit.foreach { row =>
      assert(row.getLong(1) > 0L, s"empty child side: $row")
      assert(row.getLong(2) === 0L, s"fixture orphans found: $row")
    }
  }

  test("q214 cascade-delete impact: modulus=1 deletes everything, fixture cascade is consistent") {
    import graft.relational.FkAudit
    val all = FkAudit.cascadeDeleteImpact(spark, dir, modulus = 1L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(all("customer") === spark.read.parquet(s"$dir/customer.parquet").count())
    assert(all("orders") === spark.read.parquet(s"$dir/orders.parquet").count())
    assert(all("lineitem") === spark.read.parquet(s"$dir/lineitem.parquet").count())
    val some = FkAudit.cascadeDeleteImpact(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(some("customer") > 0L && some("customer") < all("customer"))
    // cascade monotonicity: an order has >= 1 lineitem in this fixture
    // family is not guaranteed, but deleted lineitems can never exceed the
    // full table while orders are a strict subset
    assert(some("orders") < all("orders") && some("lineitem") <= all("lineitem"))
  }

  test("q207/q211 CDC: streaming materialized view settles to the batch compaction") {
    import graft.streaming.Events
    val batch = Events.cdcCompact(spark, dir)
    val stream = Events.streamingCdcCompact(spark, dir)
    assert(batch.exceptAll(stream).isEmpty && stream.exceptAll(batch).isEmpty,
      "streaming CDC view diverged from the batch compaction")
    assert(batch.count() > 0L)
  }

  test("q207 CDC tombstones: a key whose latest change is a delete is absent") {
    import graft.streaming.Events
    val ev = spark.read.parquet(s"$dir/events.parquet")
      .select(col("user_id"), col("event_id"), col("event_type"))
    // users whose max-(event order) change is an 'error' (ts ties broken by
    // event_id — recompute the winner independently of the operator)
    val raw = spark.read.parquet(s"$dir/events.parquet")
    val tsMs = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => expr("ts div 1000000")
      case _ => unix_millis(col("ts").cast("timestamp"))
    }
    val last = raw.select(col("user_id"), tsMs.as("ts_ms"), col("event_id"), col("event_type"))
      .groupBy("user_id")
      .agg(max(struct(col("ts_ms"), col("event_id"), col("event_type"))).as("l"))
    val tombstoned = last.filter(col("l.event_type") === "error").select("user_id")
    val nTomb = tombstoned.count()
    assert(nTomb > 0L, "fixture has no tombstoned user — test vacuous")
    val out = Events.cdcCompact(spark, dir)
    assert(out.join(tombstoned, "user_id").count() === 0L,
      "a tombstoned key survived compaction")
    assert(out.count() === last.count() - nTomb)
  }

  test("q215 edit distance separates reordered-token twins that Jaccard cannot") {
    import spark.implicits._
    // doc 1 = doc 0's tokens reversed: identical 1-gram bag, near-identical
    // 3-gram overlap is NOT guaranteed — so feed the pair frame directly.
    val a = "alpha beta gamma delta epsilon zeta eta theta"
    val b = a.split(' ').reverse.mkString(" ")       // same chars, reordered
    val docs = Seq((0L, a, "src0", "en", a.length.toLong),
      (1L, b, "src0", "en", b.length.toLong),
      (2L, a, "src0", "en", a.length.toLong))        // verbatim copy of 0
    .toDF("doc_id", "text", "source", "lang", "n_chars")
    val pairs = Seq((0L, 1L, 1.0), (0L, 2L, 1.0)).toDF("doc_a", "doc_b", "jaccard")
    val out = Dedup.editDistanceAuditFrom(pairs, docs)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(4)).toMap
    assert(out((0L, 2L)) === 1.0, "verbatim copy must score edit_sim 1.0")
    assert(out((0L, 1L)) < 0.6,
      s"reordered twin scored ${out((0L, 1L))} — edit tier failed to separate")
  }

  test("q215 prefix truncation bounds the DP: long tails beyond prefixLen are invisible") {
    import spark.implicits._
    val common = ("x " * 100).trim
    val docs = Seq((0L, common + " unique tail one", "src0", "en", 0L),
      (1L, common + " utterly different ending", "src0", "en", 0L))
      .toDF("doc_id", "text", "source", "lang", "n_chars")
    val pairs = Seq((0L, 1L, 0.9)).toDF("doc_a", "doc_b", "jaccard")
    val short = Dedup.editDistanceAuditFrom(pairs, docs, prefixLen = 64)
      .select("edit_sim").as[Double].head()
    assert(short === 1.0, "identical 64-char prefixes must be edit-identical")
  }

  test("q216 constraint gate counts each planted violation under its own rule") {
    import spark.implicits._
    val docs = Seq(
      (Option(1L), "good text", "src0", "en"),        // clean
      (Option(1L), "dup id", "src1", "de"),           // duplicate doc_id
      (Option.empty[Long], "no id", "src2", "fr"),    // null doc_id
      (Option(3L), "", "src3", "es"),                 // empty text
      (Option(4L), "bad lang", "src4", "xx"),         // unaccepted lang
      (Option(5L), "bad source", "weird", "zh"))      // bad source namespace
      .toDF("doc_id", "text", "source", "lang")
      .withColumn("n_chars", length(col("text")))
      // plant one n_chars mismatch on the clean row's twin
      .union(Seq((Option(6L), "len lies", "src5", "en"))
        .toDF("doc_id", "text", "source", "lang").withColumn("n_chars", lit(999L)))
    val out = graft.relational.Validate.documentConstraints(docs)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(out("doc_id_not_null") === 1L)
    assert(out("doc_id_unique") === 1L)   // one surplus row for doc_id=1
    assert(out("text_not_empty") === 1L)
    assert(out("n_chars_matches_text") === 1L)
    assert(out("lang_accepted") === 1L)
    assert(out("source_accepted") === 1L)
  }

  test("q219 PSI: identical cohorts score exactly zero, a planted shift scores large") {
    import spark.implicits._
    // even/odd cohorts with IDENTICAL per-bin length histograms → every
    // per-bin contribution is (p−p)·ln(1) = 0 exactly
    val same = (0L until 200L).map(i => (i, "t", "src0", "en", 50L + (i / 2) % 3 * 100L))
      .toDF("doc_id", "text", "source", "lang", "n_chars")
    val psiSame = TextAnalysis.psiBySource(same)
      .select("psi").as[Double].head()
    assert(psiSame === 0.0, s"identical cohorts scored $psiSame")
    // odd cohort shifted +500 chars → disjoint bins → large PSI (>0.5 is
    // the standard "significant drift" rule of thumb; disjoint is ≫ that)
    val shifted = (0L until 200L).map(i =>
        (i, "t", "src0", "en", if (i % 2 == 0) 50L else 550L))
      .toDF("doc_id", "text", "source", "lang", "n_chars")
    val psiShift = TextAnalysis.psiBySource(shifted)
      .select("psi").as[Double].head()
    assert(psiShift > 0.5, s"disjoint cohorts scored only $psiShift")
  }

  test("q220 CMS one-sided error: estimates never undercount; width collisions overcount") {
    import spark.implicits._
    val tiny = Seq((0L, "aa bb cc aa bb cc", "src0", "en", 17L))
      .toDF("doc_id", "text", "source", "lang", "n_chars")
    // width=2, depth=1, all 3 terms heavy (k=100): pigeonhole forces >=2
    // terms into one bucket → at least one strictly positive overcount
    val out = TextAnalysis.countMinEstimates(tiny, depth = 1, width = 2, k = 100)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.length === 3)
    out.foreach { case (t, exact, est, over) =>
      assert(est >= exact, s"$t undercounted: est $est < exact $exact")
      assert(over === est - exact)
    }
    assert(out.exists(_._4 > 0L), "no collision overcount at width=2 with 3 terms")
    // fixture corpus at the shipped parameters: still one-sided
    val fix = TextAnalysis.countMinEstimates(docs)
    assert(fix.filter(col("overcount") < 0L).count() === 0L)
    assert(fix.count() > 0L)
  }

  test("q229 pruning estimate is sound (no matching row skipped) and actually prunes") {
    val r = graft.io.ZOrder.pruningStats(spark, dir).head()
    val (nb, nbs, rt, rs, rm, skip) = (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4), r.getDouble(5))
    assert(nbs <= nb && rs <= rt)
    // soundness: every matching row lives in a scanned bucket (extent
    // intersection can over-approximate but never under-approximate)
    assert(rs >= rm, "a matching row was skipped — pruning is UNSOUND")
    assert(rm > 0L, "predicate matches nothing — test vacuous")
    // the z-layout must actually skip something on a box predicate
    assert(skip > 0.0, "layout pruned nothing")
    assert(nbs < nb)
  }

  test("q230 incremental maintenance equals the direct recompute, per source") {
    import org.apache.spark.sql.functions._
    val maintained = Curation.incrementalAggMaintenance(docs)
    val direct = docs.filter(col("doc_id") % 3 =!= 0)
      .groupBy("source")
      .agg(count(lit(1)).cast("long").as("n_docs"),
        sum("n_chars").cast("long").as("sum_chars"))
    assert(maintained.exceptAll(direct).isEmpty && direct.exceptAll(maintained).isEmpty,
      "delta-maintained aggregate diverged from the direct recompute")
    // the change set the deltas touched is a strict subset of the table
    val nChanges = Curation.corpusSnapshotDiff(docs)
      .filter(col("status") =!= "unchanged").count()
    assert(nChanges > 0L && nChanges < docs.count())
  }

  test("q231 matryoshka: error shrinks monotonically with prefix length; exact at full dim") {
    import spark.implicits._
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val out = Similarity.matryoshkaFidelity(emb)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getLong(3))).toMap
    val nCand = emb.count() - 1
    out.values.foreach { case (n, _, agree) =>
      assert(n === 10L * nCand); assert(agree >= 0L && agree <= 10L)
    }
    assert(out(8L)._2 > out(16L)._2 && out(16L)._2 > out(32L)._2,
      "longer prefixes must approximate full cosine better")
    // a prefix equal to the full dimension is error-free and agrees on
    // every top-1 — the identity sanity bound
    val full = Similarity.matryoshkaFidelity(emb, prefixes = Seq(64))
      .head()
    assert(full.getDouble(2) === 0.0 && full.getLong(3) === 10L)
    // structured embeddings where all mass sits in the first 4 dims:
    // every prefix >= 4 is already perfect
    val structured = (0L until 40L).map { i =>
      (i, Array.tabulate(64)(j => if (j < 4) (i % 7 + j + 1).toFloat else 0.0f))
    }.toDF("vec_id", "embedding")
    val s8 = Similarity.matryoshkaFidelity(structured, prefixes = Seq(8), nQueries = 5)
      .head()
    assert(s8.getDouble(2) === 0.0 && s8.getLong(3) === 5L,
      "front-loaded embeddings must truncate losslessly")
  }

  test("q235 borderline queue IS the k closest-to-threshold pairs of the wider set") {
    val queue = Dedup.borderlinePairs(spark, dir).collect()
    assert(queue.nonEmpty && queue.length <= 20)
    val dists = queue.map(_.getDouble(3))
    assert(dists.sameElements(dists.sorted), "queue not sorted by uncertainty")
    // top-k correctness: no excluded pair sits closer to the threshold
    val all = Dedup.minhashMd5PairsOn(spark, dir, simThreshold = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        math.abs(r.getDouble(3) - 0.5)))
    val inQueue = queue.map(r => (r.getLong(0), r.getLong(1))).toSet
    val worstIn = dists.max
    all.filterNot(p => inQueue.contains((p._1, p._2))).foreach { p =>
      assert(p._3 >= worstIn - 1e-9,
        s"excluded pair ${(p._1, p._2)} dist ${p._3} beats queue worst $worstIn")
    }
    // the lower floor actually surfaces sub-threshold pairs to review
    assert(all.exists(_._3 > 0.0), "no uncertainty spread — vacuous")
  }

  test("q237 FD audit: key FDs hold, planted violation counted per group") {
    import spark.implicits._
    val df = Seq((1L, "x"), (1L, "y"), (2L, "z"), (3L, "z"), (3L, "z"))
      .toDF("a", "b")
    val out = graft.relational.Profile.fdAudit(Seq(("t", df, "a", "b"))).head()
    // groups: 1 -> {x,y} violating; 2 -> {z}; 3 -> {z}
    assert(out.getLong(2) === 3L && out.getLong(3) === 1L && !out.getBoolean(4))
    val rev = graft.relational.Profile.fdAudit(Seq(("t", df, "b", "a"))).head()
    // b=z maps to {2,3} — violating; x,y map uniquely
    assert(rev.getLong(2) === 3L && rev.getLong(3) === 1L && !rev.getBoolean(4))
    // fixture: the declared key FDs hold exactly
    val fix = graft.relational.Profile.fdAudit(Seq(
      ("documents", docs, "doc_id", "lang"))).head()
    assert(fix.getBoolean(4), "doc_id->lang must hold on the fixture")
  }

  test("q241 span removal: overlapping islands never double-count; planted overlap case") {
    import spark.implicits._
    // Two docs share two 52-token runs separated by a 3-token unique gap
    // (< windowTokens), so the two maximal islands' TOKEN ranges overlap
    // on the shoulder — the union must count the overlap once.
    val shared1 = (1 to 52).map(i => s"s$i").mkString(" ")
    val shared2 = (1 to 52).map(i => s"t$i").mkString(" ")
    def doc(id: Long, gap: String) =
      (id, s"$shared1 $gap $shared2", "src0", "en", 0L)
    val planted = Seq(doc(0L, "u1 u2 u3"), doc(1L, "v1 v2 v3"))
      .toDF("doc_id", "text", "source", "lang", "n_chars")
    val out = Dedup.spanRemovalReport(planted)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out.size === 2)
    out.foreach { case (_, (n, dup, kept)) =>
      assert(n === 107L)
      assert(dup <= n, "coverage exceeded the document — double-counted overlap")
      assert(kept === n - dup)
      // both shared runs are covered; only (part of) the 3-token gap survives
      assert(dup >= 104L && kept <= 3L, s"dup=$dup kept=$kept")
    }
    // fixture: every affected doc keeps a sane ratio
    val fix = Dedup.spanRemovalReport(docs)
    assert(fix.filter(col("dup_tokens") > col("n_tokens")).count() === 0L)
  }

  test("q243 triage: priority routes exact pairs past the containment rule") {
    val out = Dedup.dupTriage(spark, dir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (j, cont, cls) = (r.getDouble(2), r.getDouble(3), r.getString(4))
      cls match {
        case "exact" => () // byte-identity checked engine-side
        case "containment" => assert(cont >= 0.9 - 1e-9)
        case "near" => assert(j >= 0.7 && cont < 0.9)
        case "weak" => assert(j < 0.7 && cont < 0.9)
        case other => fail(s"unknown class $other")
      }
    }
  }

  test("q243 triage routing on a planted multi-class corpus") {
    import spark.implicits._
    val base = (1 to 20).map(i => s"w$i").mkString(" ")
    val truncated = (1 to 8).map(i => s"w$i").mkString(" ")
    val midSwap = (1 to 20).map(i => if (i == 10) "XX" else s"w$i").mkString(" ")
    val planted = Seq((0L, base), (1L, base), (2L, truncated), (3L, midSwap))
      .toDF("doc_id", "text").withColumn("source", lit("src0"))
      .withColumn("lang", lit("en")).withColumn("n_chars", length(col("text")))
    // hand-specified candidate pairs (LSH recall at low jaccard is a
    // separate concern — q155 covers containment retrieval); shingle
    // arithmetic: base/midSwap have 18 3-shingles, truncated has 6
    val pairs = Seq((0L, 1L, 18L, 1.0), (0L, 2L, 6L, 0.333333),
      (0L, 3L, 15L, 0.714286)).toDF("doc_a", "doc_b", "n_common", "jaccard")
    val out = Dedup.dupTriageFrom(pairs, planted)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getString(4)).toMap
    assert(out((0L, 1L)) === "exact",
      "byte-identical pair must route exact, not containment")
    assert(out((0L, 2L)) === "containment", "truncation routes containment")
    // mid-swap: 15 shared of 18 shingles each -> jaccard .714, cont .833
    assert(out((0L, 3L)) === "near", s"mid-swap routed ${out((0L, 3L))}")
  }

  test("q244 dataset card: internal consistency of the published metrics") {
    val card = TextAnalysis.datasetCard(docs)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(card("n_docs") === docs.count().toDouble)
    assert(card("exact_dup_docs") >= 0.0 && card("exact_dup_docs") < card("n_docs"))
    assert(math.abs(card("mean_doc_tokens") - card("n_tokens") / card("n_docs")) < 1e-5)
    assert(card("type_token_ratio") > 0.0 && card("type_token_ratio") <= 1.0)
    assert(card("hapax_ratio") >= 0.0 && card("hapax_ratio") <= 1.0)
    // language shares cover the corpus exactly
    val shares = card.filter(_._1.startsWith("lang_share_")).values.sum
    assert(math.abs(shares - 1.0) < 1e-4, s"lang shares sum to $shares")
    assert(card.keys.count(_.startsWith("lang_share_")) ===
      docs.select("lang").distinct().count())
  }

  test("q246 l-diversity: a large homogeneous class fails where k-anonymity passes") {
    import spark.implicits._
    // 10 docs, one quasi-class, all from ONE source: k-anonymous at k=5
    // yet zero diversity — the homogeneity attack k-anonymity misses
    val homog = (1L to 10L).map(i => (i, "en", 50L, "src0"))
      .toDF("doc_id", "lang", "n_chars", "source")
    val k = graft.relational.Validate.kAnonymityAudit(homog)
    assert(k.count() === 0L, "class is k-anonymous")
    val ld = graft.relational.Validate.lDiversityAudit(homog).head()
    assert(ld.getLong(2) === 10L && ld.getLong(3) === 1L && !ld.getBoolean(4),
      "homogeneous class must fail l-diversity")
  }

  test("q247 threshold sweep: cumulative curve is monotone and anchored at the pair total") {
    val sweep = Dedup.thresholdSweep(spark, dir).orderBy("band").collect()
    assert(sweep.nonEmpty)
    val total = Dedup.minhashMd5PairsOn(spark, dir, simThreshold = 0.3).count()
    assert(sweep.head.getLong(2) === total,
      "lowest band's cumulative must equal the full pair count")
    // cumulative decreases as the band floor rises
    val cums = sweep.map(_.getLong(2))
    assert(cums.zip(cums.tail).forall { case (a, b) => a >= b })
    assert(sweep.map(_.getLong(1)).sum === total)
    sweep.foreach(r => assert(r.getLong(0) >= 3L && r.getLong(0) <= 10L))
  }

  test("q250 waterfall: monotone survivors, drops sum to the total loss, final equals chain") {
    import org.apache.spark.sql.functions._
    val wf = Curation.curationWaterfall(spark, dir).orderBy("stage_idx").collect()
    assert(wf.length === 5)
    val ns = wf.map(_.getLong(2))
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b }, "survivors not monotone")
    assert(wf.head.getLong(3) === 0L)
    assert(wf.map(_.getLong(3)).sum === ns.head - ns.last,
      "drop attribution does not sum to the total loss")
    // the final count equals independently re-running the gate chain
    val keep1 = docs.select(col("doc_id"), md5(col("text")).as("m"))
      .groupBy("m").agg(min(col("doc_id")).as("doc_id")).select("doc_id")
    val d1 = docs.join(keep1, Seq("doc_id"), "left_semi")
    val reps = d1.select("doc_id").join(Dedup.componentLabelsOn(spark, dir), "doc_id")
      .groupBy("component").agg(min(col("doc_id")).as("doc_id")).select("doc_id")
    val expectedFinal = d1.join(reps, Seq("doc_id"), "left_semi")
      .filter(col("n_chars").between(100, 2000))
      .filter(size(split(col("text"), " ")) >= 20).count()
    assert(ns.last === expectedFinal)
  }

  test("q251 content-defined chunks RE-SYNC after a prefix insertion") {
    import spark.implicits._
    // the CDC property fixed-size blocks lack: shifting all offsets by one
    // token still shares every chunk after the first content boundary
    val body = (1 to 400).map(i => s"tok${i * 7 % 401}").mkString(" ")
    val planted = Seq((0L, body), (1L, "INSERTED " + body))
      .toDF("doc_id", "text").withColumn("source", lit("src0"))
      .withColumn("lang", lit("en")).withColumn("n_chars", length(col("text")))
    val out = Dedup.contentChunkReport(planted)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val (nA, sharedA, sharedTokA) = out(0L)
    assert(nA >= 3L, s"planted doc produced only $nA chunks — boundary rate off")
    assert(sharedA >= 1L, "no chunk resynchronized after the prefix insertion")
    assert(sharedTokA >= 100L,
      s"only $sharedTokA tokens shared — resync failed (fixed-size behavior)")
    // both docs share the SAME resynced chunks
    assert(out(1L)._3 === sharedTokA)
  }

  test("q252 layout bake-off: z-order strictly out-prunes the single-dimension sort") {
    val rows = graft.io.ZOrder.layoutComparison(spark, dir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    val z = rows("zorder"); val x = rows("x_sorted")
    assert(z._1 === x._1, "layouts must cover the same corpus")
    assert(z._2 < x._2,
      s"z-order scanned ${z._2} rows vs x-sorted ${x._2} — no 2-D win")
    assert(z._3 > x._3 && z._3 > 0.0 && x._3 >= 0.0)
  }

  test("q216 constraint gate: fixture corpus passes every rule") {
    val out = graft.relational.Validate.documentConstraints(docs)
    assert(out.filter(!col("passed")).count() === 0L,
      "fixture documents violated a constraint")
    assert(out.count() === 6L)
  }

  test("blockedCrossPairs yields every bipartite pair exactly once") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val a = emb.filter(col("label") === 0).select(col("vec_id").as("aid"))
    val b = emb.filter(col("label") === 1).select(col("vec_id").as("bid"))
    val (na, nb) = (a.count(), b.count())
    val pairs = Pairs.blockedCrossPairs(a, b, "aid", "bid", numBlocks = 4)
      .select("aid_a", "bid_b")
    assert(pairs.count() === na * nb, "pair count must be |A|x|B|")
    assert(pairs.distinct().count() === na * nb, "no pair may repeat")
  }

  test("q254 bitext margin equals a brute-force recomputation per source") {
    import spark.implicits._
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val got = Similarity.bitextMarginMining(emb, k = 4, marginThreshold = 1.0)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(3))).toMap
    // Brute force in plain Scala: full score grid, bilateral top-4 means.
    def vecs(label: Int) = emb.filter(col("label") === label)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) ->
        r.getAs[scala.collection.Seq[Float]](1).map(_.toDouble).toArray)
      .sortBy(_._1)
    val src = vecs(0); val tgt = vecs(1)
    def cos(x: Array[Double], y: Array[Double]) = {
      val dp = x.zip(y).map { case (u, v) => u * v }.sum
      BigDecimal(dp / (math.sqrt(x.map(v => v * v).sum) * math.sqrt(y.map(v => v * v).sum)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val grid = (for { (si, sv) <- src; (ti, tv) <- tgt } yield ((si, ti), cos(sv, tv))).toMap
    def topMean(scores: Seq[Double]) = scores.sorted.reverse.take(4).sum / math.min(4, scores.size)
    val fwd = src.map { case (si, _) => si -> topMean(tgt.map(t => grid((si, t._1))).toSeq) }.toMap
    val bwd = tgt.map { case (ti, _) => ti -> topMean(src.map(s => grid((s._1, ti))).toSeq) }.toMap
    for ((si, _) <- src) {
      val best = tgt.map { case (ti, _) =>
        (ti, grid((si, ti)) / ((fwd(si) + bwd(ti)) / 2.0))
      }.minBy { case (ti, m) => (-m, ti) }
      val bm = BigDecimal(best._2).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      if (bm > 1.0) {
        assert(got.contains(si), s"source $si missing from mining output")
        assert(got(si)._1 === best._1, s"source $si picked a different target")
        assert(math.abs(got(si)._2 - bm) < 2e-6, s"source $si margin drifted")
      } else assert(!got.contains(si), s"source $si should fall below the margin gate")
    }
  }

  test("q255 triangles: planted clique scores 1.0, planted chain scores 0.0") {
    import spark.implicits._
    // triangle {1,2,3} + chain 4-5-6 (open wedge at 5) + isolated edge 7-8
    val pairs = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L), (5L, 6L), (7L, 8L))
      .toDF("doc_a", "doc_b")
    val got = Dedup.dupTrianglesFrom(pairs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got(1L) === ((2L, 1L, 1.0)) && got(2L) === ((2L, 1L, 1.0)) &&
      got(3L) === ((2L, 1L, 1.0)), "clique members: 1 triangle, clustering 1")
    assert(got(5L) === ((2L, 0L, 0.0)), "chain center: open wedge, clustering 0")
    assert(got(4L)._1 === 1L && got(4L)._3 === 0.0)
    assert(got(7L) === ((1L, 0L, 0.0)) && got(8L) === ((1L, 0L, 0.0)))
  }

  test("q255 triangles on the corpus: counts bounded by wedge capacity") {
    val out = Dedup.dupTrianglesOn(spark, dir).collect()
    assert(out.nonEmpty, "near-dup graph should not be empty at sf0.001")
    out.foreach { r =>
      val (deg, t, c) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(t <= deg * (deg - 1) / 2, s"${r.getLong(0)}: triangles exceed C(deg,2)")
      assert(c >= 0.0 && c <= 1.0)
    }
  }

  test("q258 t-closeness: matching class scores 0, one-sided classes score 0.5") {
    import spark.implicits._
    // Three quasi-classes over a 50/50 two-source global: A all src0,
    // B mirroring the global mix exactly, C all src1. TVD must be
    // 0.5 / 0.0 / 0.5 — the skewness attack l-diversity can't see
    // (B and the global are both "diverse"; A leaks by skew alone).
    val rows =
      (1L to 10L).map(i => (i, "en", 50L, "src0")) ++
      (11L to 15L).map(i => (i, "de", 50L, "src0")) ++
      (16L to 20L).map(i => (i, "de", 50L, "src1")) ++
      (21L to 30L).map(i => (i, "fr", 50L, "src1"))
    val df = rows.toDF("doc_id", "lang", "n_chars", "source")
    val got = graft.relational.Validate.tClosenessAudit(df).collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getDouble(3), r.getBoolean(4))).toMap
    assert(got("en") === ((10L, 0.5, false)), "all-src0 class must sit at TVD 0.5")
    assert(got("de") === ((10L, 0.0, true)), "global-mix class must sit at TVD 0")
    assert(got("fr") === ((10L, 0.5, false)))
  }

  test("q258 t-closeness on the corpus: TVD bounded and absent-mass algebra sane") {
    val out = graft.relational.Validate.tClosenessAudit(docs).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val tvd = r.getDouble(3)
      assert(tvd >= 0.0 && tvd <= 1.0, s"TVD out of range: $tvd")
      assert(r.getBoolean(4) === (tvd <= 0.35))
    }
    // class sizes conserve the corpus
    assert(out.map(_.getLong(2)).sum === docs.count())
  }

  test("q259 unimax: planted waterfill — small source saturates, rest split the freed budget") {
    import spark.implicits._
    // 10/100/100/100 tokens, maxEpochs=2, budget=1.5x corpus: fair1=116
    // caps the 20-token source at its 2-epoch ceiling; the freed 97
    // tokens waterfill as floor(97/3)=32 extra to each open source.
    def text(n: Int) = Seq.fill(n)("w").mkString(" ")
    val df = Seq((1L, text(10), "s0"), (2L, text(100), "s1"),
      (3L, text(100), "s2"), (4L, text(100), "s3"))
      .toDF("doc_id", "text", "source")
    val got = Curation.unimaxAllocation(df).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5), r.getBoolean(6)))
      .toMap
    assert(got("s0") === ((10L, 20L, 20L, 20L, 2.0, true)),
      "tiny source must saturate at maxEpochs")
    for (s <- Seq("s1", "s2", "s3"))
      assert(got(s) === ((100L, 200L, 116L, 148L, 1.48, false)),
        s"$s: open sources must each get fair1 116 + extra 32")
  }

  test("q259 unimax invariants on the corpus: caps respected, monotone rounds, within budget") {
    val out = Curation.unimaxAllocation(docs).collect()
    val n = out.map(_.getLong(1)).sum
    val budget = (n * 3) / 2
    out.foreach { r =>
      val (nTok, cap, g1, g2, epochs, sat) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5), r.getBoolean(6))
      assert(cap === nTok * 2)
      assert(g1 <= g2 && g2 <= cap, s"${r.getString(0)}: rounds not monotone or cap broken")
      assert(epochs <= 2.0 + 1e-9)
      assert(sat === (g2 === cap))
    }
    assert(out.map(_.getLong(4)).sum <= budget, "waterfill overshot the budget")
    // every non-saturated source lands on the SAME grant (the uniformity
    // objective): fair1 + extra is source-independent
    val openGrants = out.filter(!_.getBoolean(6)).map(_.getLong(4)).distinct
    assert(openGrants.length <= 1, s"open sources diverged: ${openGrants.mkString(",")}")
  }

  test("q260 gopher rules: planted docs attribute to exactly the rules they break") {
    import spark.implicits._
    val pass = ((1 to 50).map(i => f"w$i%03d") ++ Seq("the", "a")).mkString(" ")
    val short = ((1 to 8).map(i => f"s$i%03d") ++ Seq("the", "a")).mkString(" ")
    val runt = Seq.fill(45)("zz").mkString(" ")   // mean-len + repetition + TTR + stops
    val loop = (Seq("the", "a") ++ Seq.fill(38)("word")).mkString(" ")
    val df = Seq((1L, pass), (2L, short), (3L, runt), (4L, loop)).toDF("doc_id", "text")
    val got = TextAnalysis.gopherRuleReport(df).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(got("word_count") === 1L, "only the 10-word doc breaks the count range")
    assert(got("mean_word_len") === 1L, "only the zz-run breaks mean word length")
    assert(got("top_token_share") === 2L, "zz-run and word-loop break repetition")
    assert(got("type_token_ratio") === 2L)
    assert(got("stopword_types") === 1L, "only the zz-run lacks two stop types")
    assert(got("any_rule") === 3L, "doc 1 must pass every rule")
  }

  test("q260 gopher rules on the corpus: any-rule bounded by union algebra") {
    val rows = TextAnalysis.gopherRuleReport(docs).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    val singles = rows.view.filterKeys(_ != "any_rule").values.map(_._2).toSeq
    val (nDocs, any, _) = rows("any_rule")
    assert(any >= singles.max && any <= math.min(singles.sum, nDocs),
      "any_rule must sit between the max single rule and the sum/corpus cap")
    rows.values.foreach { case (n, f, share) =>
      assert(n === docs.count() && f >= 0L && f <= n)
      assert(math.abs(share - f.toDouble / n) < 1e-6)
    }
  }

  test("q261 FS linkage: every dirty record recovers its source; no false pair reaches match") {
    val customer = spark.read.parquet(s"$dir/customer.parquet")
    val out = graft.relational.RecordLinkage.fsLinkage(customer).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2), r.getBoolean(4),
        r.getDouble(5), r.getString(6)))
    val nDirty = customer.filter(
      substring(md5(concat(col("c_custkey").cast("string"), lit(":dirty"))), 1, 2) < "40")
      .count()
    val truePairs = out.filter { case (d, c, _, _, _, _) => d - 10000000L === c }
    assert(truePairs.length.toLong === nDirty,
      "every dirty re-registration must surface its true source at score >= 0")
    truePairs.foreach { case (_, _, aName, aBal, score, verdict) =>
      assert(aName, "true pair must agree on name at edit distance 1")
      if (aBal) assert(verdict === "match" && math.abs(score - 18.769069) < 1e-9)
      else assert(verdict === "possible" && math.abs(score - 5.510355) < 1e-9,
        "balance-perturbed true pair must land in the clerical-review band")
    }
    // the match band is PURE: only true pairs score past the upper cutoff
    out.filter(_._6 == "match").foreach { case (d, c, _, _, _, _) =>
      assert(d - 10000000L === c, s"false pair ($d,$c) crossed the match threshold")
    }
  }

  test("q262 fertility: a corpus whose merges fully fuse its words scores exactly 1.0") {
    import spark.implicits._
    // Two word types 'ab'/'cd', two merges: (a,b) then (c,d) — every word
    // becomes ONE symbol, so fertility = 1.0 and chars/token = 2.0 exactly.
    val df = Seq((1L, "ab cd ab cd", "xx"), (2L, "cd ab", "xx"))
      .toDF("doc_id", "text", "lang")
    val got = TextAnalysis.bpeFertility(df, steps = 2).head()
    assert(got.getString(0) === "xx" && got.getLong(1) === 2L)
    assert(got.getLong(2) === 6L && got.getLong(3) === 6L, "6 words, 6 fused tokens")
    assert(got.getDouble(4) === 1.0 && got.getDouble(5) === 2.0)
  }

  test("q262 fertility on the corpus: bounds hold per language") {
    val rows = TextAnalysis.bpeFertility(docs).collect()
    assert(rows.length === docs.select("lang").distinct().count().toInt)
    rows.foreach { r =>
      val (words, toks, fert, cpt) =
        (r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5))
      assert(toks >= words, "every word encodes to at least one token")
      assert(fert >= 1.0, s"${r.getString(0)}: fertility below 1")
      assert(cpt >= 1.0, s"${r.getString(0)}: a token must cover at least one char")
    }
  }

  test("q253 file sizing: ceil split per month, no file over budget") {
    val audit = graft.relational.Queries.fileSizingAudit(spark, dir, rowsPerFile = 500)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val monthCounts = spark.read.parquet(s"$dir/lineitem.parquet")
      .groupBy(month(col("l_shipdate")).cast("long").as("m")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(audit.forall(_._3 <= 500L), "a file exceeded the row budget")
    val byMonth = audit.groupBy(_._1)
    assert(byMonth.keySet === monthCounts.keySet)
    for ((m, files) <- byMonth) {
      assert(files.length === ((monthCounts(m) + 499) / 500).toInt,
        s"month $m: wrong file count for ceil split")
      assert(files.map(_._3).sum === monthCounts(m), s"month $m: rows lost")
    }
  }
}
