package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Property tests for the event operators against straightforward
  * driver-side reference implementations on random corpora — the
  * distributed window/join plans must agree with the obvious sequential
  * semantics for any input shape. */
class EventOpsPropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val rnd = new scala.util.Random(1234)

  /** Random (user, ts_ms, event_id, type) corpus; distinct (user, ts). */
  private def randomEvents(n: Int, nUsers: Int, types: Seq[String]): Seq[(Long, Long, Long, String)] = {
    val seen = scala.collection.mutable.Set[(Long, Long)]()
    (0 until n).flatMap { i =>
      val u = rnd.nextInt(nUsers).toLong
      val t = rnd.nextInt(100000).toLong * 7
      if (seen.add((u, t))) Some((u, t, i.toLong, types(rnd.nextInt(types.length))))
      else None
    }
  }

  test("property: as-of join equals the sequential scan-back reference") {
    for (_ <- 0 until 3) {
      val ev = randomEvents(300, 5, Seq("purchase", "view", "other"))
      val df = ev.toDF("user_id", "ts_ms", "event_id", "event_type")
      val got = Events.asofJoinOn(df, "purchase", "view").collect()
        .map(r => r.getLong(0) -> (r.getLong(3), r.getLong(4))).toMap
      // reference: for each purchase, max view ts <= purchase ts per user
      val views = ev.filter(_._4 == "view").groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
      val purchases = ev.filter(_._4 == "purchase")
      assert(got.size === purchases.size)
      purchases.foreach { case (u, t, id, _) =>
        val expected = views.getOrElse(u, Nil).filter(_ <= t) match {
          case Nil => (-1L, -1L)
          case vs  => (vs.max, t - vs.max)
        }
        assert(got(id) === expected, s"purchase $id user $u ts $t")
      }
    }
  }

  test("property: sessionize partitions each user's events; gap rule exact") {
    for (_ <- 0 until 3) {
      val gap = 1000L
      val ev = randomEvents(400, 4, Seq("x")).map { case (u, t, id, _) => (u, t % 20000, id) }
        .groupBy(e => (e._1, e._2)).map(_._2.head).toSeq  // unique (user, ts)
      // build reference sessions: sort per user, split where diff > gap
      val ref = ev.groupBy(_._1).flatMap { case (u, rows) =>
        val ts = rows.map(_._2).distinct.sorted
        val sessions = ts.foldLeft(List.empty[List[Long]]) {
          case (Nil, t) => List(List(t))
          case (cur :: done, t) if t - cur.head <= gap => (t :: cur) :: done
          case (acc, t) => List(t) :: acc
        }.map(_.reverse).reverse
        sessions.zipWithIndex.map { case (s, i) =>
          (u, i.toLong + 1, s.head, s.last - s.head, s.length.toLong)
        }
      }.toSet
      // drive the same data through the distributed plan via a temp view of
      // synthetic rows shaped like the events table (ns timestamps)
      val df = ev.toDF("user_id", "ts_ms", "event_id")
        .select(col("user_id"), (col("ts_ms") * 1000000L).as("ts"), col("event_id"))
      val got = sessionizeOn(df, gap).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
      assert(got === ref)
    }
  }

  test("property: MG fold — bounded size, undercount bound, no true heavy ever lost") {
    for (trial <- 0 until 20) {
      val k = 2 + rnd.nextInt(10)
      val n = 50 + rnd.nextInt(500)
      // zipf-ish stream: a few hot ids + uniform noise
      val stream = (0 until n).map { _ =>
        if (rnd.nextBoolean()) rnd.nextInt(3).toLong else rnd.nextInt(100).toLong
      }
      val m = stream.foldLeft(Map.empty[Long, Long])((acc, u) => Events.mgFold(acc, u, k))
      val freq = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
      assert(m.size <= k - 1, s"trial $trial: ${m.size} counters exceed k-1=${k - 1}")
      m.foreach { case (u, c) =>
        assert(c <= freq(u), s"trial $trial: counter over-counts $u")
        assert(c >= freq(u) - n.toLong / k,
          s"trial $trial: counter for $u below the n/k undercount bound")
      }
      // the MG theorem: every id with freq > n/k is present
      freq.filter(_._2 * k > n).keys.foreach { u =>
        assert(m.contains(u), s"trial $trial: true heavy $u dropped (k=$k, n=$n)")
      }
    }
  }

  /** Batch sessionize logic applied to a raw (user_id, ts:ns-long, event_id)
    * frame — mirrors Events.sessionize's plan on synthetic input. */
  private def sessionizeOn(df: org.apache.spark.sql.DataFrame, gapMs: Long) = {
    import org.apache.spark.sql.expressions.Window
    val e = df.select(col("user_id"), (col("ts") / 1000000L).cast("long").as("ts_ms"), col("event_id"))
    val byUser = Window.partitionBy("user_id").orderBy(col("ts_ms"), col("event_id"))
    e.withColumn("prev_ms", lag(col("ts_ms"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ms").isNull || col("ts_ms") - col("prev_ms") > gapMs, 1L).otherwise(0L))
      .withColumn("session_seq", sum(col("new_session")).over(
        byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(min(col("ts_ms")).as("session_start_ms"),
        (max(col("ts_ms")) - min(col("ts_ms"))).as("duration_ms"),
        count(lit(1)).as("n_events"))
  }
}
