package graft

import graft.operators.Evaluation

/** Evaluation-metric pack (q267–q270): each declared query against a
  * driver-side brute-force replay (the third implementation beside the
  * Spark plan and the DuckDB oracle), plus metric-range invariants.
  */
class EvaluationSpec extends SparkTestBase {

  private lazy val docs: Array[(Long, String)] =
    Tables.documents(spark, sfDir).selectExpr("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))

  private def toks(text: String): Array[String] =
    text.trim.split("\\s+").filter(_.nonEmpty)

  test("q267 ndcg: matches a ranked-replay; metrics in [0,1]") {
    val got = Evaluation.queries("q267_ndcg")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    val qs = Seq(
      1L -> Seq("join", "hash", "scan"),
      2L -> Seq("customer", "order", "line"),
      3L -> Seq("stream", "window", "batch"),
      4L -> Seq("vector", "merge", "sort"),
      5L -> Seq("filter", "group", "agg"))
    val want = qs.map { case (qid, terms) =>
      val cand = docs.flatMap { case (id, text) =>
        val tf = toks(text).filter(terms.contains).groupBy(identity)
          .view.mapValues(_.length.toLong).toMap
        if (tf.isEmpty) None
        else Some((id, tf.values.sum, tf.values.count(_ >= 2).toLong))
      }
      val byScore = cand.sortBy { case (id, sc, _) => (-sc, id) }
      val byRel = cand.sortBy { case (id, _, rel) => (-rel, id) }
      def dcg(ordered: Array[(Long, Long, Long)]): Long =
        ordered.take(10).zipWithIndex.map { case ((_, _, rel), i) =>
          ((1L << rel) - 1) * Evaluation.dcgW(i)
        }.sum
      val (d, ideal) = (dcg(byScore), dcg(byRel))
      val frel = byScore.zipWithIndex.collectFirst {
        case ((_, _, rel), i) if rel >= 2 => i + 1L }
      (qid, cand.length.toLong,
       if (ideal == 0) 0.0 else math.floor(d.toDouble * 1e6 / ideal) / 1e6,
       frel.map(r => (1000000L / r) / 1e6).getOrElse(0.0))
    }
    assert(got.toSeq == want)
    got.foreach { case (_, _, ndcg, mrr) =>
      assert(ndcg >= 0 && ndcg <= 1 && mrr >= 0 && mrr <= 1)
    }
  }

  test("q268 calibration: bins partition the corpus; ece consistent with bins") {
    val got = Evaluation.queries("q268_calibration")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
                 r.getDouble(4), r.getDouble(5)))
    assert(got.map(_._2).sum == docs.length)
    // conf sits inside its bin's confidence interval (bin 9 holds the clamp)
    got.foreach { case (bin, _, nPos, acc, conf, _) =>
      assert(acc >= 0 && acc <= 1)
      assert(conf >= bin / 10.0 - 1e-6)
      assert(bin == 9 || conf <= (bin + 1) / 10.0 + 1e-6)
      assert(nPos >= 0)
    }
    // every row carries the same ece, and it is bounded by max per-bin gap
    val eces = got.map(_._6).distinct
    assert(eces.length == 1 && eces.head >= 0 && eces.head <= 1)
    val maxGap = got.map { case (_, _, _, acc, conf, _) =>
      math.abs(acc - conf) }.max
    assert(eces.head <= maxGap + 1e-3)
  }

  test("q269 kappa: matches a contingency replay") {
    val got = Evaluation.queries("q269_kappa")(spark, sfDir).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
       r.getDouble(5), r.getDouble(6), r.getDouble(7))).toSeq
    val cells = docs.map { case (_, text) =>
      val w = toks(text)
      val n = w.length; val ns = w.count(x => x == "a" || x == "the")
      val sl = w.map(_.length).sum
      val ka = 0.1 + 0.015 * n + 3.0 * (ns.toDouble / n) -
        0.25 * (sl.toDouble / n) > 0
      val kb = n >= 30 && ns * 20 >= n && sl * 10 <= n * 45
      (ka, kb)
    }
    val nd = cells.length.toLong
    val n00 = cells.count(c => !c._1 && !c._2).toLong
    val n01 = cells.count(c => !c._1 && c._2).toLong
    val n10 = cells.count(c => c._1 && !c._2).toLong
    val n11 = cells.count(c => c._1 && c._2).toLong
    val pe = (n00 + n01) * (n00 + n10) + (n10 + n11) * (n01 + n11)
    val want = Seq((nd, n00, n01, n10, n11,
      math.floor((n00 + n11).toDouble * 1e6 / nd) / 1e6,
      math.floor(pe.toDouble * 1e6 / (nd * nd)) / 1e6,
      math.floor((nd * (n00 + n11) - pe).toDouble * 1e6 / (nd * nd - pe)) / 1e6))
    assert(got == want)
  }

  test("q277 auc: rank-sum equals the pairwise Mann-Whitney definition") {
    val got = Evaluation.queries("q277_auc")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.length == 1)
    val (nd, np, nn, auc) = got.head
    assert(nd == np + nn && auc >= 0 && auc <= 1)
    // third implementation: the O(n_pos·n_neg) DEFINITION of AUC —
    // wins + half-ties over all (positive, negative) pairs — against
    // the query's tie-aware rank-sum form; scores replayed from text
    // (the q269 formula), labels from the shared pipeline verdict
    val scores = docs.map { case (id, text) =>
      val w = toks(text)
      val n = w.length
      val ns = w.count(x => x == "a" || x == "the")
      val sl = w.map(_.length).sum
      val raw = 0.1 + 0.015 * n + 3.0 * (ns.toDouble / n) -
        0.25 * (sl.toDouble / n)
      (id, math.round(math.floor(raw * 1e6) / 1e6 * 1e6))
    }.toMap
    val y = graft.operators.Curation.pipelineFlags(spark, sfDir)
      .selectExpr("doc_id", "CASE WHEN s3 THEN 1L ELSE 0L END")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val pos = scores.collect { case (id, v) if y(id) == 1L => v }.toSeq
    val neg = scores.collect { case (id, v) if y(id) == 0L => v }.toSeq
    assert(pos.length.toLong == np && neg.length.toLong == nn)
    val wins2 = (for (p <- pos; q <- neg)
      yield if (p > q) 2L else if (p == q) 1L else 0L).sum
    val want = math.floor(wins2.toDouble * 1e6 /
      (2.0 * pos.length * neg.length)) / 1e6
    assert(auc == want)
  }

  test("q278 benford: digits partition the rows; expected masses sum to " +
       "~1e6; replay matches") {
    val got = Evaluation.queries("q278_benford")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
                 r.getLong(4)))
    val prices = Tables.lineitem(spark, sfDir).selectExpr("l_extendedprice")
      .collect().map(_.getDouble(0))
    assert(got.map(_._2).sum == prices.length)
    // generated literals: Σ round(log10(1+1/d)·1e6) ≈ 1e6 (rounding only)
    assert(math.abs(Evaluation.benfordPpm.map(_._2).sum - 1000000L) <= 5)
    val want = prices
      .map(p => math.round(p * 100).toString.head.asDigit.toLong)
      .groupBy(identity).view.mapValues(_.length.toLong).toSeq.sortBy(_._1)
      .map { case (dig, n) =>
        val exp = Evaluation.benfordPpm.toMap.apply(dig)
        val share = n * 1000000L / prices.length
        (dig, n, share, exp, share - exp)
      }
    assert(got.toSeq == want)
    got.foreach { case (_, _, share, _, delta) =>
      assert(share >= 0 && share <= 1000000 && math.abs(delta) <= 1000000)
    }
  }

  test("q279 gini: matches a sorted-rank replay; bounds and degenerate " +
       "cases hold") {
    val got = Evaluation.queries("q279_gini")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.length == 1)
    val (n, tot, gini) = got.head
    assert(gini >= 0 && gini < 1)
    val freq = docs.flatMap(d => toks(d._2)).groupBy(identity)
      .view.mapValues(_.length.toLong).toSeq
    val ranked = freq.sortBy { case (t, f) => (f, t) }.zipWithIndex
    val nn = ranked.length.toLong
    val tt = ranked.map(_._1._2).sum
    val swr = ranked.map { case ((_, f), i) => (i + 1L) * f }.sum
    assert(n == nn && tot == tt)
    val want = math.floor((2 * swr - (nn + 1) * tt).toDouble * 1e6
      / (nn * tt)) / 1e6
    assert(gini == want)
    // definition sanity: a perfectly uniform distribution has G → 0
    val uswr = (1L to nn).map(_ * 7L).sum
    assert(math.abs((2 * uswr - (nn + 1) * nn * 7).toDouble) < 1e-9)
  }

  test("q270 zipf fit: matches an OLS replay over integerized logs") {
    val got = Evaluation.queries("q270_zipf_fit")(spark, sfDir).collect().map(
      r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))).toSeq
    val freq = docs.flatMap(d => toks(d._2)).groupBy(identity)
      .view.mapValues(_.length.toLong).toSeq
    val ranked = freq.sortBy { case (t, f) => (-f, t) }.take(1000).zipWithIndex
    val lg = ranked.map { case ((_, f), i) =>
      (math.round(math.log(i + 1.0) * 1000), math.round(math.log(f.toDouble) * 1000))
    }
    val n = lg.length.toLong
    val sx = lg.map(_._1).sum; val sy = lg.map(_._2).sum
    val sxx = lg.map(p => p._1 * p._1).sum
    val sxy = lg.map(p => p._1 * p._2).sum
    val syy = lg.map(p => p._2 * p._2).sum
    val num = n * sxy - sx * sy
    val denx = n * sxx - sx * sx
    val deny = n * syy - sy * sy
    val want = Seq((n,
      math.floor(num.toDouble * 1000 / denx) / 1000,
      math.floor((sy.toDouble / 1000 - num.toDouble / denx * (sx.toDouble / 1000))
                 * 1000 / n) / 1000,
      math.floor(num.toDouble * num.toDouble * 1e6 /
                 (denx.toDouble * deny.toDouble)) / 1e6))
    assert(got == want)
  }
}
