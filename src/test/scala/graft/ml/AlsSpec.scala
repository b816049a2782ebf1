package graft.ml

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Quality gate for the MLlib ALS recommender: a silently broken model
  * (all-zero factors, degenerate split, wrong column wiring) must fail
  * loudly, not just produce rows. */
class AlsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("ALS optimizes: train reconstruction crushes the mean baseline; held-out RMSE pinned") {
    // The synthetic ratings (qty sums over a TPC-H-ish star schema) carry
    // no collaborative structure, so held-out predictions CANNOT beat the
    // global-mean baseline — asserting that would test the data, not the
    // model. What a working ALS must do is optimize its objective: fit the
    // observed (train) cells far better than a constant predictor. A
    // silently broken model (zero factors, miswired columns) fails this.
    val ratings = AlsRecommender.ratingsFromLineitem(spark, TestSpark.sfDir)
    val Array(train, _) = ratings.randomSplit(Array(0.8, 0.2), 42L)
    val model = AlsRecommender.train(train)
    val mean = train.agg(avg("rating")).head.getDouble(0)
    val trainBaseline = math.sqrt(
      train.select(pow(col("rating") - mean, 2).as("e")).agg(avg("e")).head.getDouble(0))
    val trainRmse = math.sqrt(model.transform(train)
      .select(pow(col("rating") - col("prediction"), 2).as("e"))
      .agg(avg("e")).head.getDouble(0))
    assert(trainRmse < 0.5 * trainBaseline,
      s"ALS train rmse $trainRmse does not crush the constant baseline $trainBaseline — " +
        "the optimizer is not optimizing")
    // Held-out regression pin: observed 29.464 at sf0.001 under seed 42.
    val heldOut = AlsRecommender.evalRmse(spark, TestSpark.sfDir)
    assert(heldOut > 0.0)
    assert(math.abs(heldOut - 29.464) < 3.0, s"held-out rmse $heldOut drifted from pinned 29.464")
  }

  test("q60 contract: the 0.8 train split covers every rated user") {
    // q60's recommendations come from the model fit on the train split; a
    // user whose ratings all landed in the 0.2 test split would silently
    // vanish from the output. Every user has many ratings here, so full
    // coverage is expected — this pins it, failing loudly if the ratings
    // shape or split seed ever changes.
    val ratings = AlsRecommender.ratingsFromLineitem(spark, TestSpark.sfDir)
    val (model, _) = AlsRecommender.trainedOn(spark, TestSpark.sfDir)
    val missing = ratings.select("user").distinct()
      .join(model.userFactors.select(col("id").as("user")), Seq("user"), "left_anti")
      .count()
    assert(missing === 0,
      s"$missing rated users absent from the train-split model — q60 would drop them")
  }

  test("recommendations are well-formed: k rows per user, ranks 1..k") {
    val model = AlsRecommender.train(
      AlsRecommender.ratingsFromLineitem(spark, TestSpark.sfDir))
    val recs = AlsRecommender.recommendTopK(model, k = 3)
    val byUser = recs.groupBy("user").agg(count(lit(1)).as("n"),
      min("rank").as("lo"), max("rank").as("hi"))
    assert(byUser.filter(col("n") =!= 3 || col("lo") =!= 1 || col("hi") =!= 3).count() === 0)
  }
}
