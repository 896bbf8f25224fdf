package graft

import graft.operators.Behavior

/** Behavioral-mining pack (q212–q214): each declared query against a
  * driver-side brute-force replay in plain Scala (a third implementation
  * beside the Spark plan and the DuckDB oracle), plus the invariants the
  * measures must satisfy.
  */
class BehaviorSpec extends SparkTestBase {

  private lazy val events: Array[(Long, Long, Long, String)] =
    Tables.events(spark, sfDir)
      .selectExpr("event_id", "unix_micros(ts)", "user_id", "event_type")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))

  test("q212 assoc rules: matches a set-algebra replay; lift symmetric") {
    val got = Behavior.queries("q212_assoc_rules")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
                 r.getLong(4), r.getDouble(5), r.getDouble(6), r.getDouble(7)))
    val byType = events.groupBy(_._4).view.mapValues(_.map(_._3).toSet).toMap
    val users = events.map(_._3).toSet
    val nu = users.size.toLong
    val want = byType.keys.toSeq.sorted.combinations(2).toSeq.collect {
      case Seq(a, b) if (byType(a) & byType(b)).size >= 3 =>
        val nab = (byType(a) & byType(b)).size.toLong
        val na = byType(a).size.toLong; val nb = byType(b).size.toLong
        (a, b, nab, na, nb,
         math.floor(nab.toDouble / nu * 1000000) / 1000000,
         math.floor(nab.toDouble / na * 1000000) / 1000000,
         math.floor(nab.toDouble * nu / (na.toDouble * nb) * 1000) / 1000)
    }.sortBy(t => (t._1, t._2))
    assert(got.toSeq == want)
    // lift is direction-free: swapping a/b changes confidence, never lift
    got.foreach { case (_, _, nab, na, nb, _, _, lift) =>
      assert(lift ==
        math.floor(nab.toDouble * nu / (nb.toDouble * na) * 1000) / 1000)
    }
  }

  test("q213 event paths: matches a sorted-timeline trigram replay") {
    val got = Behavior.queries("q213_event_paths")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3)))
    val counts = events.groupBy(_._3).values.flatMap { tl =>
      tl.sortBy(e => (e._2, e._1)).map(_._4).sliding(3).filter(_.size == 3)
        .map(s => (s(0), s(1), s(2)))
    }.groupBy(identity).view.mapValues(_.size.toLong).toSeq
    val want = counts.map { case ((a, b, c), n) => (a, b, c, n) }
      .sortBy(t => (-t._4, t._1, t._2, t._3)).take(20)
    assert(got.toSeq == want)
  }

  test("q214 decayed counts: matches an exact shift-weight replay") {
    val got = Behavior.queries("q214_decayed_counts")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3),
                 r.getDouble(4)))
    val day = 86400000000L
    val days = events.map(e => (e._4, e._2 / day))
    val maxd = days.map(_._2).max
    def w(d: Long): Long =
      { val age = maxd - d; if (age <= 20) 1L << (20 - age).toInt else 0L }
    val tot = days.map(e => w(e._2)).sum
    val want = days.groupBy(_._1).toSeq.map { case (t, es) =>
      val ds = es.map(e => w(e._2)).sum
      (t, es.length.toLong, ds,
       math.floor(ds.toDouble / (1L << 20) * 1000000) / 1000000,
       math.floor(ds.toDouble / tot.toDouble * 1000000) / 1000000)
    }.sortBy(_._1)
    assert(got.toSeq == want)
    // shares of an exhaustive partition sum to ≤ 1 and > 0.99 (floor loss)
    val s = got.map(_._5).sum
    assert(s <= 1.0 + 1e-9 && s > 0.99, s"share sum $s")
  }

  test("q226 user growth: matches a per-day replay; cumulative closes at |users|") {
    val got = Behavior.queries("q226_user_growth")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val day = 86400000000L
    val dayUser = events.map(e => (e._2 / day, e._3))
    def fmt(d: Long): String =
      java.time.LocalDate.ofEpochDay(d).toString
    val active = dayUser.distinct.groupBy(_._1).view
      .mapValues(_.size.toLong).toMap
    val firstDay = dayUser.groupBy(_._2).view.mapValues(_.map(_._1).min).toMap
    val newByDay = firstDay.values.groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    var cum = 0L
    val want = active.keys.toSeq.sorted.map { d =>
      cum += newByDay.getOrElse(d, 0L)
      (fmt(d), active(d), newByDay.getOrElse(d, 0L), cum)
    }
    assert(got.toSeq == want)
    assert(got.last._4 == firstDay.size.toLong)
    // actives always at least the day's new arrivals
    assert(got.forall(t => t._2 >= t._3))
  }

  test("q230 rolling actives: WAU replay; window dominates the day") {
    val got = Behavior.queries("q230_rolling_active")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val day = 86400000000L
    val dayUser = events.map(e => (e._2 / day, e._3)).distinct
    def fmt(d: Long): String = java.time.LocalDate.ofEpochDay(d).toString
    val days = dayUser.map(_._1).distinct.sorted
    val want = days.map { d =>
      val dau = dayUser.count(_._1 == d).toLong
      val wau = dayUser.collect {
        case (dd, u) if dd >= d - 6 && dd <= d => u }.distinct.length.toLong
      (fmt(d), dau, wau)
    }
    assert(got.toSeq == want.toSeq)
    // a trailing-7 distinct count dominates its own day and is capped by
    // the 7-day sum of daily actives
    assert(got.forall(t => t._3 >= t._2))
  }
}
