package graft

import graft.operators.EventOps
import org.apache.spark.sql.functions._

/** q176 event conversion funnel: the declared query against a driver-side
  * brute-force recompute of the strict-ordering min-semantics, plus the
  * monotonicity invariants any funnel must satisfy. */
class FunnelSpec extends SparkTestBase {

  test("q176 funnel: matches a brute-force strict-order recompute") {
    val got = EventOps.queries("q176_funnel")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    val ev = Tables.events(spark, sfDir)
      .selectExpr("user_id", "unix_micros(ts) AS us", "event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val byUser = ev.groupBy(_._1)
    val n0 = byUser.size.toLong
    def minAfter(es: Array[(Long, Long, String)], t: String,
                 after: Option[Long]): Option[Long] = {
      val c = es.collect { case (_, us, et)
        if et == t && after.forall(us > _) => us }
      if (c.isEmpty) None else Some(c.min)
    }
    var n1 = 0L; var n2 = 0L; var n3 = 0L
    byUser.values.foreach { es0 =>
      val es = es0.toArray
      val t1 = minAfter(es, "view", None)
      val t2 = if (t1.isEmpty) None else minAfter(es, "signup", t1)
      val t3 = if (t2.isEmpty) None else minAfter(es, "purchase", t2)
      if (t1.nonEmpty) n1 += 1
      if (t2.nonEmpty) n2 += 1
      if (t3.nonEmpty) n3 += 1
    }
    def conv(a: Long, b: Long): Double =
      if (b == 0) 0.0 else math.floor(a * 1000.0 / b) / 1000
    val want = Seq(
      (1L, "view", n1, conv(n1, n0)),
      (2L, "signup", n2, conv(n2, n1)),
      (3L, "purchase", n3, conv(n3, n2)))
    assert(got.toSeq == want, s"funnel mismatch: got ${got.toSeq}, want $want")
    // funnel invariants: counts only shrink down the stages, ratios in [0,1]
    assert(n1 >= n2 && n2 >= n3)
    assert(got.forall(r => r._4 >= 0.0 && r._4 <= 1.0))
    assert(n3 > 0, "testdata should contain full-journey users")
  }

  test("q190 transitions: mass accounting and per-state probability sums") {
    val rows = EventOps.queries("q190_transitions")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    // every user contributes exactly (events − 1) transitions
    val ev = Tables.events(spark, sfDir)
    val nEvents = ev.count()
    val nUsers = ev.select("user_id").distinct().count()
    assert(rows.map(_._3).sum == nEvents - nUsers,
      "transition mass must equal total events minus one per user")
    // probabilities per source state sum to 1 up to the 1e-3 flooring
    rows.groupBy(_._1).foreach { case (cur, rs) =>
      val p = rs.map(_._4).sum
      assert(p <= 1.0 + 1e-9 && p > 1.0 - 0.001 * rs.length,
        s"state $cur: probability mass $p out of the flooring envelope")
    }
  }

  test("q191 rate anomaly: flags exactly the brute-force 2-sigma set") {
    val got = EventOps.queries("q191_rate_anomaly")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val hourly = Tables.events(spark, sfDir)
      .selectExpr("event_type", "unix_micros(ts) div 3600000000 AS hr")
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(identity).map { case ((t, h), v) => (t, h, v.size.toLong) }.toSeq
    val want = hourly.groupBy(_._1).toSeq.flatMap { case (t, hs) =>
      val k = hs.length
      val sc = hs.map(_._3).sum
      val sq = hs.map(x => x._3 * x._3).sum
      val mu = sc.toDouble / k
      val sd = math.sqrt(math.max(0.0, sq.toDouble / k - mu * mu))
      hs.collect { case (_, h, c) if sd > 0 && math.abs(c - mu) > 2 * sd =>
        (t, h, c, math.floor(math.abs(c - mu) / sd * 1e4).toLong)
      }
    }.sortBy(x => (x._1, x._2))
    assert(want.nonEmpty && got.toSeq == want,
      "operator != brute-force 2-sigma recompute")
  }

  test("q193 retention: day-0 is always 1.0, cells bounded by cohort, " +
       "cohorts partition the users") {
    val rows = EventOps.queries("q193_retention")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
                 r.getDouble(4)))
    assert(rows.nonEmpty)
    val cohorts = rows.groupBy(_._1)
    cohorts.foreach { case (cd, cells) =>
      val day0 = cells.find(_._2 == 0L)
      // every cohort member is active on their own first day
      assert(day0.exists(c => c._3 == c._4 && c._5 == 1.0),
        s"cohort $cd: day-0 cell must be full retention, got $day0")
      cells.foreach { c =>
        assert(c._2 >= 0 && c._3 >= 1 && c._3 <= c._4,
          s"cohort $cd offset ${c._2}: active outside [1, cohort]")
      }
    }
    // cohort sizes partition the user base exactly once each
    val totalUsers = Tables.events(spark, sfDir)
      .select("user_id").distinct().count()
    assert(cohorts.values.map(_.head._4).sum == totalUsers,
      "cohort sizes must sum to the distinct user count")
  }

  test("q197 value trend matches a brute-force OLS recompute") {
    val got = EventOps.queries("q197_value_trend")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1),
                 if (r.isNullAt(2)) None else Some(r.getLong(2))))
    val ev = Tables.events(spark, sfDir)
      .selectExpr("event_type", "unix_micros(ts) div 1000000 AS sec", "value")
      .collect().map(r => (r.getString(0), r.getLong(1),
        math.floor(r.getDouble(2) * 100 + 0.5).toLong))
    val t0 = ev.map(_._2).min
    val want = ev.groupBy(_._1).toSeq.sortBy(_._1).map { case (ty, rows) =>
      val n = rows.length.toLong
      val t = rows.map(_._2 - t0)
      val v = rows.map(_._3)
      val (st, sv) = (t.sum, v.sum)
      val stv = t.zip(v).map { case (a, b) => a * b }.sum
      val stt = t.map(x => x * x).sum
      val den = n.toDouble * stt - st.toDouble * st
      val slope = if (den == 0) None
        else Some(math.floor((n.toDouble * stv - st.toDouble * sv) / den * 1e9)
          .toLong)
      (ty, n, slope)
    }
    assert(got.toSeq == want, "operator != brute-force OLS")
    assert(got.forall(_._3.isDefined), "every type spans multiple timestamps")
  }

  test("q198 histogram: bin envelopes hold and counts partition each type") {
    val rows = EventOps.queries("q198_value_histogram")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
                 r.getDouble(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (ty, bin, n, total, share) =>
      val lo = 1L << (bin - 1).toInt
      val hi = (1L << bin.toInt) - 1
      assert(total >= n * lo && total <= n * hi,
        s"$ty bin $bin: mass $total outside [$lo,$hi]×$n")
      assert(share >= 0 && share <= 1)
    }
    val perType = rows.groupBy(_._1)
    val expected = Tables.events(spark, sfDir)
      .selectExpr("event_type", "cast(floor(value * 100 + 0.5) as bigint) c")
      .collect().filter(_.getLong(1) >= 1)
      .groupBy(_.getString(0)).map { case (k, v) => k -> v.size.toLong }
    perType.foreach { case (ty, bins) =>
      assert(bins.map(_._3).sum == expected(ty),
        s"$ty: histogram mass != positive-cents event count")
    }
  }

  test("q199 RFM: valid segment codes, users partitioned, terciles balanced") {
    val rows = EventOps.queries("q199_rfm_segments")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (seg, n, total) =>
      val (r, f, m) = (seg / 100, seg / 10 % 10, seg % 10)
      assert(Seq(r, f, m).forall(d => d >= 1 && d <= 3), s"bad code $seg")
      assert(n >= 1 && total >= 0)
    }
    val totalUsers = Tables.events(spark, sfDir)
      .select("user_id").distinct().count()
    assert(rows.map(_._2).sum == totalUsers, "segments must partition users")
    // tercile cuts are real: each recency band holds roughly a third
    val byR = rows.groupBy(_._1 / 100).map { case (k, v) => k -> v.map(_._2).sum }
    (1L to 3L).foreach { r =>
      val share = byR.getOrElse(r, 0L).toDouble / totalUsers
      assert(share > 0.2 && share < 0.47, s"recency band $r share $share")
    }
  }

  test("q200 enrichment coverage: partial dim yields partial coverage, " +
       "counts reconcile") {
    val rows = EventOps.queries("q200_enrich_coverage")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
                 r.getDouble(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (ty, n, m, mc, cov) =>
      assert(m <= n && mc >= 0)
      // the planted partial snapshot makes coverage REAL: neither full
      // nor empty for any type
      assert(cov > 0.0 && cov < 1.0, s"$ty: degenerate coverage $cov")
    }
    assert(rows.map(_._2).sum == Tables.events(spark, sfDir).count())
  }

  test("q192 conversion time: anchored to the funnel's converted count, " +
       "ordered percentiles") {
    val r = EventOps.queries("q192_conversion_time")(spark, sfDir).collect()
    assert(r.length == 1)
    val (n, p25, p50, p90) = (r(0).getLong(0), r(0).getDouble(1),
                              r(0).getDouble(2), r(0).getDouble(3))
    val n3 = EventOps.queries("q176_funnel")(spark, sfDir).collect()
      .find(_.getString(1) == "purchase").get.getLong(2)
    assert(n == n3, s"converted count $n != funnel stage-3 $n3")
    assert(n > 0 && p25 > 0 && p25 <= p50 && p50 <= p90)
  }

  test("q247 quantile registers: certificate holds, merge equals rebuild") {
    val rows = EventOps.queries("q247_quantile_sketch")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // every declared row carries a green certificate: the exact k-th
    // value sits inside the register envelope, and the envelope is sane
    rows.foreach { r =>
      val (lo, hi, exact, inB) =
        (r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8))
      assert(inB == 1L && lo <= exact && exact <= hi, r.toString)
    }
    // the registers themselves are MERGEABLE: building (cnt, vmin, vmax)
    // per bin over two disjoint halves and combining by (sum, min, max)
    // must reproduce the one-shot registers bit-for-bit
    val v = Tables.events(spark, sfDir)
      .select(col("event_type"),
              expr("cast(floor(value * 100 + 0.5) as bigint)").as("cents"))
      .filter(col("cents") >= 1)
      .withColumn("half", expr("cast(xxhash64(cents) % 2 = 0 as int)"))
    def regs(df: org.apache.spark.sql.DataFrame) =
      df.groupBy(col("event_type"),
                 expr("length(bin(cents))").cast("long").as("bin"))
        .agg(count(lit(1)).as("cnt"), min("cents").as("vmin"),
             max("cents").as("vmax"))
    val oneShot = regs(v).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val merged = regs(v.filter(col("half") === 1))
      .unionByName(regs(v.filter(col("half") === 0)))
      .groupBy("event_type", "bin")
      .agg(sum("cnt").as("cnt"), min("vmin").as("vmin"),
           max("vmax").as("vmax"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(merged == oneShot, "register merge must equal the one-shot build")
  }

  test("q253 sweep core: planted overlaps, midnight span, endpoint ties") {
    import spark.implicits._
    val D = 86400000000L
    // day 0: three sessions — [10,100], [50,200], [150,300]: peak 2
    // (1&2 overlap, 2&3 overlap, never all three); plus [100,120]
    // starting exactly at session 1's end: inclusive ends mean 3 open
    // at t=100 with (t, delta) ordering releasing at end+1
    val d0 = Seq((10L, 100L), (50L, 200L), (150L, 300L), (100L, 120L))
    // a session spanning midnight into day 1, plus a disjoint day-1 pair
    val d1 = Seq((D - 50L, D + 50L), (D + 100L, D + 200L),
                 (D + 300L, D + 400L))
    val out = graft.operators.EventOps
      .peakConcurrencyFromSessions((d0 ++ d1).toDF("st", "en"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // day 0: 5 segments touch it (4 native + the midnight-spanner's
    // head); peak 3 at t=100 (sessions 1, 2 and the [100,120] claim)
    assert(out(0L) == ((5L, 3L)), s"day0 ${out(0L)}")
    // day 1: the spanner's tail + two disjoint sessions — peak 1
    assert(out(1L) == ((3L, 1L)), s"day1 ${out(1L)}")
  }

  test("q264 lateness core: planted out-of-order arrivals measure exactly") {
    import spark.implicits._
    val M = 60000000L // one minute in us
    // stream a: in-order, then one row 2 min late, then one 11 min late
    val a = Seq((1L, 0L), (2L, 10L * M), (3L, 8L * M), (4L, 20L * M),
                (5L, 9L * M))
      .map { case (id, us) => ("a", id, us) }
    // stream b: strictly in order — no late rows
    val b = Seq(("b", 1L, 0L), ("b", 2L, M), ("b", 3L, 2L * M))
    val out = graft.operators.EventOps
      .latenessFromArrivals((a ++ b).toDF("event_type", "event_id", "us"))
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // a: id 3 is 2 min behind the hwm (late_1m), id 5 is 11 min behind
    // (late_1m AND late_10m); max lateness 11 min
    assert(out("a") == ((5L, 11L * M, 2L, 1L)), s"a ${out("a")}")
    assert(out("b") == ((3L, 0L, 0L, 0L)), s"b ${out("b")}")
  }

  test("q296 queue depth: the window closed form equals the sequential " +
       "Lindley recursion, and admissions conserve") {
    // the plan computes q_t = cum_t − min(0, min_{g≤t} cum_g); the
    // ground truth is the definitional q_t = max(0, q_{t−1} + a_t − S)
    // folded sequentially over the SAME dense hour grid
    val rows = SparkEntry.queries("q296_queue_depth")(spark, sfDir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
                 r.getLong(4)))
    assert(rows.nonEmpty)
    assert(rows.map(_._1).sorted.sameElements(rows.map(_._1)), "tick-ordered")
    val n = rows.map(_._2).sum
    val slots = (n + rows.length - 1) / rows.length
    var q = 0L
    rows.foreach { case (tick, a, depth, admitted, util) =>
      val expect = math.max(0L, q + a - slots)
      assert(depth == expect, s"$tick: depth $depth != Lindley $expect")
      assert(admitted == q + a - expect, s"$tick: admissions must conserve")
      assert(admitted <= slots && util == admitted * 1000000L / slots)
      q = expect
    }
    assert(rows.exists(_._3 > 0), "critical load must actually queue")
    assert(rows.exists(_._3 == 0), "the queue must also fully drain")
  }
}
