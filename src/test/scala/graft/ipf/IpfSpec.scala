package graft.ipf

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.matrix.{CooMatrix, Dense}

class IpfSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  val x = Vector(30.0, 70.0)          // row marginal
  val y = Vector(40.0, 35.0, 25.0)    // col marginal (same total mass: 100)
  val seed = Vector(Vector(1.0, 2.0, 1.0), Vector(3.0, 1.0, 2.0))

  test("ipfUnrolled: bit-exact vs a local BigDecimal replay of 2 chained sweeps") {
    import graft.relational.Queries
    val dir = TestSpark.sfDir
    // Inputs, collected once from the (independently oracle-proven) COO and
    // marginal builders; the replay below shares no Spark execution with the
    // query under test.
    val cells = Queries.cooExact(spark, dir, "l_extendedprice").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    import org.apache.spark.sql.functions._
    val xm = li.groupBy(col("l_partkey")).agg(Queries.dsum(col("l_quantity")).as("v"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val ym = li.groupBy(month(col("l_shipdate")).cast("long").as("m"))
      .agg(Queries.dsum(col("l_quantity")).as("v"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    def round6(v: Double): Double =
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // fitRowsExact replay: DECIMAL(38,6)-exact denominator per key, double
    // factor, double multiply, HALF_UP 6dp round — the contract both engines
    // implement.
    def fit(m: Map[(Long, Long), Double], keyOf: ((Long, Long)) => Long,
        marg: Map[Long, Double]): Map[(Long, Long), Double] = {
      val sums = m.toSeq.groupBy { case (k, _) => keyOf(k) }
        .map { case (g, kvs) =>
          g -> kvs.map { case (_, v) => BigDecimal(v).setScale(6) }.sum.toDouble }
      m.map { case (k, v) => k -> round6(v * (marg(keyOf(k)) / sums(keyOf(k)))) }
    }
    var local = cells
    for (_ <- 1 to 2) {
      local = fit(local, _._1, xm)   // row fit to x
      local = fit(local, _._2, ym)   // column fit to y
    }
    val got = Queries.ipfUnrolled(spark, dir, steps = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got.keySet === local.keySet)
    val diverged = got.filter { case (k, v) => v != local(k) }
    assert(diverged.isEmpty,
      s"${diverged.size} cells diverged from the local replay, e.g. ${diverged.take(3)}")
  }

  test("dense converge reproduces both marginals") {
    val r = Dense.converge(x, y, seed, threshold = 1e-12, maxIter = 1000)
    Dense.sumRows(r.matrix).zip(x).foreach { case (got, want) => assert(math.abs(got - want) < 1e-6) }
    Dense.sumCols(r.matrix).zip(y).foreach { case (got, want) => assert(math.abs(got - want) < 1e-6) }
    assert(r.iterations > 0)
  }

  test("uniform seed converges to outer product of marginals / total") {
    val uniform = Vector.fill(2)(Vector.fill(3)(1.0))
    val r = Dense.converge(x, y, uniform, threshold = 1e-12, maxIter = 500)
    val expected = Dense.seedMatrix(x, y).map(_.map(_ / 100.0))
    r.matrix.zip(expected).foreach { case (gr, er) =>
      gr.zip(er).foreach { case (g, e) => assert(math.abs(g - e) < 1e-6) }
    }
  }

  test("distributed converge matches dense result") {
    val dense = Dense.converge(x, y, seed, threshold = 1e-10, maxIter = 50)
    val dist = Ipf.converge(
      CooMatrix.marginal(spark, x), CooMatrix.marginal(spark, y),
      CooMatrix.fromDense(spark, seed), threshold = 1e-10, maxIter = 50)
    assert(dist.iterations === dense.iterations)
    assert(math.abs(dist.loss - dense.loss) < 1e-8)
    val got = dist.matrix.toLocalMap
    for { i <- 0 until 2; j <- 0 until 3 }
      assert(math.abs(got((i.toLong, j.toLong)) - dense.matrix(i)(j)) < 1e-8)
  }

  test("batched loss checks: identical final matrix on an iteration-capped run") {
    val perIter = Ipf.converge(
      CooMatrix.marginal(spark, x), CooMatrix.marginal(spark, y),
      CooMatrix.fromDense(spark, seed), threshold = 1e-15, maxIter = 6)
    val batched = Ipf.converge(
      CooMatrix.marginal(spark, x), CooMatrix.marginal(spark, y),
      CooMatrix.fromDense(spark, seed), threshold = 1e-15, maxIter = 6,
      checkpointEvery = 2, lossEvery = 3)
    assert(batched.iterations === perIter.iterations)
    // Steps run at k = 0..5; the last boundary check is k=3, so the exit is
    // mid-batch and Result.loss comes from the post-loop recompute — this
    // asserts that branch returns the per-iteration (final-step) loss.
    assert(math.abs(batched.loss - perIter.loss) < 1e-12,
      s"batched loss ${batched.loss} != per-iteration loss ${perIter.loss}")
    val a = perIter.matrix.toLocalMap
    val b = batched.matrix.toLocalMap
    assert(a.keySet === b.keySet)
    a.foreach { case (k, v) => assert(math.abs(v - b(k)) < 1e-12) }
  }

  test("batched loss: cap landing ON a boundary also reports the final step's loss") {
    // maxIter=7, lossEvery=3: the last step (k=6) IS a boundary check, so
    // lossIsFinal holds at exit and Result.loss must come straight from
    // that check — the complementary path to the 6/3 recompute test above.
    val perIter = Ipf.converge(
      CooMatrix.marginal(spark, x), CooMatrix.marginal(spark, y),
      CooMatrix.fromDense(spark, seed), threshold = 1e-15, maxIter = 7)
    val batched = Ipf.converge(
      CooMatrix.marginal(spark, x), CooMatrix.marginal(spark, y),
      CooMatrix.fromDense(spark, seed), threshold = 1e-15, maxIter = 7,
      checkpointEvery = 2, lossEvery = 3)
    assert(batched.iterations === perIter.iterations)
    assert(math.abs(batched.loss - perIter.loss) < 1e-12,
      s"batched loss ${batched.loss} != per-iteration loss ${perIter.loss}")
    val a = perIter.matrix.toLocalMap
    val b = batched.matrix.toLocalMap
    a.foreach { case (k, v) => assert(math.abs(v - b(k)) < 1e-12) }
  }

  test("reference stopping semantics: loss lags the returned matrix (core.clj:115-117)") {
    // With maxIter=1 the loop runs exactly one step but reports the seed's loss.
    val r = Dense.converge(x, y, seed, threshold = 1e-15, maxIter = 1)
    val seedLoss = Dense.rmse(x, Dense.sumRows(seed))
    assert(r.iterations === 1)
    assert(math.abs(r.loss - seedLoss) < 1e-12)
    // maxIter=0 returns the seed untouched with sentinel loss.
    val r0 = Dense.converge(x, y, seed, maxIter = 0)
    assert(r0.matrix === seed && r0.iterations === 0 && r0.loss === Int.MaxValue.toDouble)
  }

  test("property: one fitRows makes row sums equal the marginal; mass conserved") {
    val rnd = new scala.util.Random(42)
    (0 until 50).foreach { _ =>
      val rows = 1 + rnd.nextInt(5); val cols = 1 + rnd.nextInt(5)
      val mtx = Vector.fill(rows, cols)(0.1 + 10.0 * rnd.nextDouble())
      val marg = Vector.fill(rows)(0.5 + 20.0 * rnd.nextDouble())
      val fitted = Dense.fitRows(marg, mtx)
      Dense.sumRows(fitted).zip(marg).foreach { case (g, w) => assert(math.abs(g - w) < 1e-9) }
      assert(math.abs(fitted.flatten.sum - marg.sum) < 1e-9)
    }
  }

  test("property: IPF loss settles and never ends above the seed loss") {
    val rnd = new scala.util.Random(7)
    (0 until 30).foreach { _ =>
      val rows = 2 + rnd.nextInt(3); val cols = 2 + rnd.nextInt(3)
      val mtx = Vector.fill(rows, cols)(0.1 + 5.0 * rnd.nextDouble())
      val xm = Vector.fill(rows)(1.0 + 10.0 * rnd.nextDouble())
      val ym0 = Vector.fill(cols)(1.0 + 10.0 * rnd.nextDouble())
      val ym = ym0.map(_ * xm.sum / ym0.sum) // equal-mass precondition (README.md:7)
      var losses = Vector.empty[Double]
      var cur = mtx
      (0 until 30).foreach { _ =>
        losses :+= Dense.rmse(xm, Dense.sumRows(cur))
        cur = Dense.step(xm, ym, cur)
      }
      // IPF under the reference's L2 loss is not strictly monotone per
      // sweep, but it must settle: the final loss is no worse than the
      // seed's, and the tail flattens out.
      assert(losses.last <= losses.head + 1e-9)
      assert(math.abs(losses(29) - losses(28)) <= 1e-4 * (1.0 + losses.head))
    }
  }

  test("transpose twice is identity (property, dense)") {
    val rnd = new scala.util.Random(3)
    (0 until 20).foreach { _ =>
      val m = Vector.fill(1 + rnd.nextInt(6), 1 + rnd.nextInt(6))(rnd.nextDouble())
      assert(Dense.transpose(Dense.transpose(m)) === m)
    }
  }

  test("mmult associativity against itself (property, dense)") {
    val rnd = new scala.util.Random(11)
    (0 until 10).foreach { _ =>
      val (a, b, c) = (2 + rnd.nextInt(3), 2 + rnd.nextInt(3), 2 + rnd.nextInt(3))
      val m1 = Vector.fill(a, b)(rnd.nextDouble())
      val m2 = Vector.fill(b, c)(rnd.nextDouble())
      val m3 = Vector.fill(c, 2)(rnd.nextDouble())
      val l = Dense.mmult(Dense.mmult(m1, m2), m3)
      val r = Dense.mmult(m1, Dense.mmult(m2, m3))
      l.zip(r).foreach { case (lr, rr) =>
        lr.zip(rr).foreach { case (lv, rv) => assert(math.abs(lv - rv) < 1e-9) }
      }
    }
  }

  test("q286 3-way raking: the LAST-fit marginal is met exactly, totals conserve") {
    import org.apache.spark.sql.functions._
    val spark = graft.TestSpark.spark
    val dir = graft.TestSpark.sfDir
    val out = graft.relational.Queries.rake3Sweep(spark, dir)
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    // after fitting layers LAST, each layer's mass equals its target
    // marginal up to the per-cell 6dp rounding
    val gotLay = out.groupBy("mlay").agg(sum("mval").as("got")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val target = li.groupBy(col("l_returnflag").as("mlay"))
      .agg(graft.relational.Queries.dsum(col("l_quantity")).as("t")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(gotLay.keySet === target.keySet)
    gotLay.foreach { case (lay, got) =>
      val cells = out.filter(col("mlay") === lay).count()
      assert(math.abs(got - target(lay)) <= cells * 5e-7,
        s"layer $lay mass $got misses target ${target(lay)}")
    }
    // earlier-fit marginals are only approximate after later fits (the
    // raking property) but every cell stays positive
    assert(out.filter(col("mval") <= 0.0).count() === 0L)
  }
}
