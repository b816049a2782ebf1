package graft.ipf

import org.apache.spark.sql.DataFrame
import graft.matrix.{CooMatrix, Marginals}

/** Distributed Iterative Proportional Fitting (IPF / RAS / biproportional
  * fitting) over COO matrices — the reference engine's core algorithm
  * (`/root/reference/src/cost_allocation/core.clj:82-119`): alternately
  * rescale rows to the x-marginal and columns to the y-marginal until the
  * imputed marginals converge to the known ones.
  *
  * Spark shape of one iteration: two fused fit passes, each = one hash
  * aggregation (map-side partial) + one equi-join (AQE broadcasts the
  * factor side — it has one row per matrix row-key, tiny next to the
  * matrix). Transposes are free projections in COO. Per-iteration
  * `localCheckpoint` truncates lineage so the plan does not grow
  * O(iterations) — the classic Spark iterative-algorithm pattern.
  */
object Ipf {

  final case class Result(matrix: CooMatrix, loss: Double, iterations: Int)

  /** Inferred `optimize-marginal` (`core.clj:82-87`; see SURVEY.md §0). */
  def fitRows(marginal: DataFrame, m: CooMatrix): CooMatrix = m.fitRows(marginal)

  /** One IPF sweep. Reference `step` (`core.clj:89-97`). Uses the one-pass
    * window fit ([[CooMatrix.fitRowsOnePass]]): each fit consumes the
    * matrix once, so a sweep is one narrow chain (two keyed window sums +
    * two broadcast joins) instead of the agg+join shape whose double
    * consumption doubles the plan per fit; within the loop's checkpoint
    * segments that halves both planning and recompute. Last-ulp sum-order
    * differences vs the hash agg are inside the loop's loss tolerances
    * (IpfSpec pins dense-mirror parity at 1e-8). */
  def step(x: DataFrame, y: DataFrame, m: CooMatrix): CooMatrix =
    m.fitRowsOnePass(x).transpose.fitRowsOnePass(y).transpose

  /** Reference `converge` (`core.clj:99-119`) with its exact stopping
    * semantics: stop when loss < threshold (fit good enough), |Δloss| <
    * threshold (local minimum), or iterations exhausted. The loss is the
    * reference's `rmse` (L2 of residual, no mean, `core.clj:28-30`) of the
    * x-marginal vs the row sums of the matrix *before* the step — so the
    * reported loss lags the returned matrix by one step (`core.clj:115-117`).
    * Initial loss sentinels are Integer/MAX_VALUE (`core.clj:108-109`).
    *
    * `checkpointEvery` controls how often lineage is truncated; 1 is the
    * safe default, higher values trade driver round-trips for plan size.
    *
    * `lossEvery` batches the convergence check (SURVEY.md §7.4 item 1):
    * the loss is a driver-side scalar collect — a full job plus a barrier
    * per iteration — so when far from convergence it is computed only at
    * every `lossEvery`-th iteration, and the stopping rule is evaluated
    * against those boundary losses (`lossDiff` then spans a batch rather
    * than one step). With the default 1 the reference's per-iteration
    * semantics (`core.clj:111-117`) hold exactly; with k > 1 a
    * threshold-stop can overshoot by up to k−1 steps, while an
    * iteration-capped run returns the identical matrix. Whatever the
    * batching, the returned `Result.loss` is always the reference-lag loss
    * of the *final* step (recomputed after the loop when the last boundary
    * check predates it), never a stale boundary value.
    */
  def converge(
      x: DataFrame, y: DataFrame, seed: CooMatrix,
      threshold: Double = 1e-15, maxIter: Int = 1000,
      verbose: Boolean = false, checkpointEvery: Int = 1,
      lossEvery: Int = 1): Result = {
    require(maxIter >= 0 && checkpointEvery >= 1 && lossEvery >= 1)
    // The marginals are loop constants but each sweep's TWO broadcast
    // builds (and every loss check's join) re-executed their whole
    // source subtree — for the q26 inputs that is a lineitem scan+agg
    // per consumption, ~2 extra stages x 16 broadcasts per run
    // (measured r21: the per-sweep stage trace showed the 20 MB
    // lineitem input re-read 8+ times inside one converge). Marginals
    // are one row per fitted index — tiny by the fitRowsOnePass
    // broadcast contract — so materialize each ONCE and let every
    // sweep broadcast from the cached blocks. Values are identical;
    // only the number of times the source is computed changes.
    val xc = x.localCheckpoint()
    val yc = y.localCheckpoint()
    var matrix = seed.checkpointed()
    var prev = matrix          // matrix before the most recent step
    var lastLoss = Int.MaxValue.toDouble
    var lossDiff = Int.MaxValue.toDouble
    var lossIsFinal = false    // lastLoss was computed for the last executed step
    var iteration = maxIter
    while (!(lastLoss < threshold || lossDiff < threshold || iteration == 0)) {
      var next = step(xc, yc, matrix)
      val k = maxIter - iteration
      if (k % checkpointEvery == 0) next = next.checkpointed()
      if (k % lossEvery == 0) {
        val loss = Marginals.rmse(xc, matrix.sumRows)
        lossDiff = math.abs(lastLoss - loss)
        lastLoss = loss
        lossIsFinal = true
        if (verbose) println(s"loss=$lastLoss diff=$lossDiff iter=$iteration")
      } else {
        lossIsFinal = false
        if (verbose) println(s"loss=<batched, next check in ${lossEvery - k % lossEvery}> iter=$iteration")
      }
      prev = matrix
      matrix = next; iteration -= 1
    }
    // With lossEvery > 1 the loop can exit on the iteration cap between
    // boundary checks; recompute so Result.loss is the final step's
    // reference-lag loss (rmse of x vs the pre-step row sums), not a value
    // up to lossEvery-1 steps stale.
    val finalLoss =
      if (iteration == maxIter || lossIsFinal) lastLoss
      else Marginals.rmse(xc, prev.sumRows)
    Result(matrix, finalLoss, maxIter - iteration)
  }
}
