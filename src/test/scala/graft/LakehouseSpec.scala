package graft

import graft.operators.{Lakehouse, Relational2}

/** Lakehouse-maintenance pack (q271–q274) and the q275 skyline: each
  * declared query against a driver-side brute-force replay, plus the
  * structural invariants (noise-table partition of the hash domain,
  * delete-vector conservation, dominance-freeness of the skyline).
  */
class LakehouseSpec extends SparkTestBase {

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("q271 compaction plan: matches a shelf-packing replay") {
    val got = Lakehouse.queries("q271_compaction_plan")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
                 r.getLong(4), r.getLong(5), r.getDouble(6)))
    val rows = Tables.lineitem(spark, sfDir)
      .selectExpr("year(l_shipdate) * 100 + month(l_shipdate)",
                  "l_orderkey % 40", "96 + l_partkey % 64")
      .collect().map(r => (r.getInt(0).toLong, r.getLong(1), r.getLong(2)))
    val t = Lakehouse.compactTarget
    val want = rows.groupBy(_._1).toSeq.map { case (p, rs) =>
      val files = rs.groupBy(_._2).view.mapValues(_.map(_._3).sum).toSeq
        .sortBy { case (fid, b) => (-b, fid) }
      val csb = files.map(_._2).scanLeft(0L)(_ + _).init
      val bins = files.zip(csb).map { case ((_, b), c) => (c / t, b) }
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq
      val tot = files.map(_._2).sum
      (p, files.length.toLong, files.count(_._2 < t / 2).toLong, tot,
       bins.length.toLong, bins.map(_._2).max,
       math.floor(tot.toDouble * 1000 / (bins.length * t)) / 1000)
    }.sortBy(_._1)
    assert(got.toSeq == want)
  }

  test("q272 delete vectors: matches a position-delete replay; counts conserve") {
    val got = Lakehouse.queries("q272_delete_vectors")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
                 r.getLong(4)))
    val docs = Tables.documents(spark, sfDir).selectExpr("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val want = docs.groupBy(_._1 / 50).toSeq.map { case (fid, rs) =>
      val del = rs.filter(r => "01".contains(md5hex(r._2).head))
      val live = rs.filterNot(r => "01".contains(md5hex(r._2).head))
      (fid, rs.length.toLong, del.length.toLong, live.length.toLong,
       live.map(_._1).sum)
    }.sortBy(_._1)
    assert(got.toSeq == want)
    got.foreach { case (_, n, d, l, _) => assert(n == d + l) }
  }

  test("q273 dp release: noise table partitions the hash domain; replay matches") {
    // the literal inverse-CDF table tiles [0, 2^20) with no gap/overlap,
    // k strictly increasing
    val tbl = Lakehouse.dpNoiseTable
    assert(tbl.head._2 == 0L && tbl.last._3 == (1L << 20))
    tbl.sliding(2).foreach { case Seq((k1, _, h1), (k2, l2, _)) =>
      assert(h1 == l2 && k1 < k2)
    }
    val got = Lakehouse.queries("q273_dp_release")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val bySrc = Tables.documents(spark, sfDir).selectExpr("source").collect()
      .map(_.getString(0)).groupBy(identity).view.mapValues(_.length.toLong)
    val want = bySrc.toSeq.map { case (src, n) =>
      val u = java.lang.Long.parseLong(md5hex("dp-" + src).take(5), 16)
      val k = tbl.find(t => u >= t._2 && u < t._3).get._1
      (src, n, k, math.max(0L, n + k))
    }.sortBy(_._1)
    assert(got.toSeq == want)
  }

  test("q274 l-diversity: matches a distinct-sensitive replay") {
    val got = Lakehouse.queries("q274_l_diversity")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
                 r.getLong(4), r.getLong(5), r.getDouble(6)))
    val ev = Tables.events(spark, sfDir)
      .selectExpr("event_type", "unix_micros(ts) div 3600000000 % 24",
                  "length(bin(greatest(cast(floor(value * 100 + 0.5) as bigint), 1)))",
                  "user_id % 10")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2).toLong,
                           r.getLong(3)))
    val want = ev.groupBy(e => (e._1, e._2, e._3)).toSeq
      .map { case ((et, _, _), rs) =>
        (et, rs.length.toLong, rs.map(_._4).distinct.length.toLong) }
      .groupBy(_._1).toSeq.map { case (et, gs) =>
        val nRows = gs.map(_._2).sum
        val exposed = gs.filter(_._3 < 3).map(_._2).sum
        (et, gs.length.toLong, nRows, gs.map(_._3).min,
         gs.count(_._3 < 3).toLong, exposed,
         math.floor(exposed.toDouble * 1000 / nRows) / 1000)
      }.sortBy(_._1)
    assert(got.toSeq == want)
  }

  test("q276 t-closeness: matches a total-variation replay; t-test " +
       "agrees with the double form") {
    val got = Lakehouse.queries("q276_t_closeness")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3),
                 r.getLong(4), r.getLong(5), r.getDouble(6)))
    val ev = Tables.events(spark, sfDir)
      .selectExpr("event_type", "unix_micros(ts) div 3600000000 % 24",
                  "length(bin(greatest(cast(floor(value * 100 + 0.5) as bigint), 1)))",
                  "user_id % 10")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2).toLong,
                           r.getLong(3)))
    val nn = ev.length.toLong
    val glob = ev.groupBy(_._4).view.mapValues(_.length.toLong).toMap
    val groups = ev.groupBy(e => (e._1, e._2, e._3)).toSeq.map { case ((et, _, _), rs) =>
      val n = rs.length.toLong
      val cnt = rs.groupBy(_._4).view.mapValues(_.length.toLong).toMap
      val tvnum = glob.map { case (sv, g) =>
        math.abs(cnt.getOrElse(sv, 0L) * nn - g * n) }.sum
      // the integer t-test is EXACTLY the double TV > 1/4 test
      assert((2 * tvnum > n * nn) ==
        (tvnum.toDouble / (2.0 * n * nn) > 0.25))
      (et, n, tvnum)
    }
    val want = groups.groupBy(_._1).toSeq.map { case (et, gs) =>
      val nRows = gs.map(_._2).sum
      val exposed = gs.filter(g => 2 * g._3 > g._2 * nn).map(_._2).sum
      (et, gs.length.toLong, nRows,
       gs.map(g => math.floor(g._3.toDouble * 1000 / (2 * g._2 * nn)) / 1000).max,
       gs.count(g => 2 * g._3 > g._2 * nn).toLong, exposed,
       math.floor(exposed.toDouble * 1000 / nRows) / 1000)
    }.sortBy(_._1)
    assert(got.toSeq == want)
  }

  test("q275 skyline: survivors undominated, non-survivors dominated") {
    val got = Relational2.queries("q275_skyline")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val grain = Tables.part(spark, sfDir)
      .selectExpr("cast(p_size as bigint)", "cast(round(p_retailprice * 100) as bigint)")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def dominated(p: (Long, Long)): Boolean = grain.exists(q =>
      q._1 >= p._1 && q._2 >= p._2 && (q._1 > p._1 || q._2 > p._2))
    val want = grain.filterNot(dominated)
    assert(got == want)
  }
}
