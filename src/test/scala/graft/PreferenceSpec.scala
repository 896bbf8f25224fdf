package graft

/** Behavioral pins for the preference-data prep pack (q280–q282) beyond
  * the DuckDB hash gate: internal consistency of the record model and
  * the structural guarantees the gates exist to demonstrate.
  */
class PreferenceSpec extends SparkTestBase {

  private def row1(q: String) =
    SparkEntry.queries(q)(spark, sfDir).collect().head

  test("q280: confusion cells partition the records; kappa/po/pe in range") {
    val r = row1("q280_preference_kappa")
    val n = r.getAs[Long]("n_records")
    val cells = Seq("c_aa", "c_ab", "c_at", "c_ba", "c_bb", "c_bt",
                    "c_ta", "c_tb", "c_tt").map(r.getAs[Long](_))
    assert(n > 0, "the sf0.001 corpus must yield complete records")
    assert(cells.sum == n, "the 3x3 cells must partition the records")
    val po = r.getAs[Double]("po"); val pe = r.getAs[Double]("pe")
    val k = r.getAs[Double]("kappa")
    assert(po >= 0.0 && po <= 1.0 && pe >= 0.0 && pe <= 1.0)
    assert(k >= -1.0 && k <= 1.0 && !k.isNaN, s"kappa out of range: $k")
  }

  test("q281: per-rater counts partition the records; ppm fields bounded") {
    val rows = SparkEntry.queries("q281_position_bias")(spark, sfDir).collect()
    assert(rows.map(_.getAs[String]("rater")).toSeq == Seq("model", "structural"))
    for (r <- rows) {
      val n = r.getAs[Long]("n_records")
      assert(r.getAs[Long]("n_pref_first") + r.getAs[Long]("n_pref_second") +
        r.getAs[Long]("n_tie") == n)
      val share = r.getAs[Long]("first_share_ppm")
      assert(share >= 0L && share <= 1000000L)
      assert(r.getAs[Long]("tie_ppm") >= 0L && r.getAs[Long]("tie_ppm") <= 1000000L)
    }
  }

  test("q282: cluster-grain assignment leaks zero near-dup prompt pairs") {
    val r = row1("q282_preference_leakage")
    assert(r.getAs[Long]("leak_cluster") == 0L,
      "near-dup prompts share a CC cluster by construction - a nonzero " +
        "cluster leak means the assignment or the split hash broke")
    assert(r.getAs[Long]("leak_naive") <= r.getAs[Long]("n_neardup_prompt_pairs"))
    assert(r.getAs[Long]("n_records") > 0)
  }

  test("q283: buckets bounded, counts positive, shares sum to ~1e6") {
    val rows = SparkEntry.queries("q283_preference_margin")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val b = r.getAs[Long]("bucket")
      assert(b >= -5L && b <= 4L)
      assert(r.getAs[Long]("n") > 0L)
    }
    val shareSum = rows.map(_.getAs[Long]("share_ppm")).sum
    // floored ppm shares: sum in (1e6 - nBuckets, 1e6]
    assert(shareSum <= 1000000L && shareSum > 1000000L - rows.length)
  }

  test("q284: strengths positive over core sources; mean near 1") {
    val rows = SparkEntry.queries("q284_preference_btl")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val strengths = rows.map(_.getAs[Double]("strength"))
    assert(strengths.forall(s => s > 0.0 && !s.isNaN && !s.isInfinite))
    // MM preserves total wins; strengths are scale-normalized near 1
    val mean = strengths.sum / strengths.length
    assert(mean > 0.1 && mean < 10.0, s"degenerate fit: mean strength $mean")
    val sources = rows.map(_.getAs[String]("source")).toSet
    assert(sources.forall(_.startsWith("src")))
  }

  test("q287: wins partition complete groups; per-position stats match a " +
       "brute argmax replay") {
    import org.apache.spark.sql.functions.{col, expr}
    val rows = SparkEntry.queries("q287_bestofn_audit")(spark, sfDir).collect()
      .map(r => r.getAs[Long]("pos") ->
        ((r.getAs[Long]("n_wins"), r.getAs[Long]("win_share_ppm"),
          r.getAs[Long]("mean_margin_micro"), r.getAs[Long]("max_margin_micro"))))
      .toMap
    assert(rows.nonEmpty)
    // brute replay: score every doc through the same certified scorer
    // expression, then do the argmax/margin bookkeeping in plain Scala
    val ip = Tables.documents(spark, sfDir).select(col("doc_id"),
        expr(graft.functions.TextExprs.let1(graft.functions.TextExprs.toks, "w",
          """named_struct(
               'n', size(w),
               'ns', size(filter(w, x -> x IN ('a', 'the'))),
               'sl', aggregate(w, 0, (acc, x) -> acc + length(x)))""")).as("f"))
      .selectExpr("doc_id",
        """cast(round((0.015 * f.n + 3.0 * (f.ns / cast(f.n as double))
                       - 0.25 * (f.sl / cast(f.n as double))) * 1000000)
           as bigint) as ip""")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val wins = ip.groupBy(_._1 / 4).filter(_._2.length == 4).values.map { g =>
      val ranked = g.map { case (id, s) => (id % 4, s) }
        .sortBy { case (pos, s) => (-s, pos) }
      (ranked(0)._1, ranked(0)._2 - ranked(1)._2)
    }.toSeq
    val total = wins.size.toLong
    val byPos = wins.groupBy(_._1).map { case (pos, ms) =>
      val m = ms.map(_._2)
      pos -> ((m.size.toLong, m.size * 1000000L / total,
               m.sum / m.size, m.max))
    }
    assert(rows == byPos, s"gate $rows != replay $byPos")
    assert(rows.values.map(_._1).sum == total)
  }

  test("q288: bins bounded and consistent; pair population ties out " +
       "against q281's structural non-ties") {
    val rows = SparkEntry.queries("q288_reward_calibration")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val bin = r.getAs[Long]("bin")
      assert(bin >= 0L && bin <= 9L)
      val acc = r.getAs[Double]("acc"); val conf = r.getAs[Double]("conf")
      assert(acc >= 0.0 && acc <= 1.0 && conf >= 0.0 && conf <= 1.0)
      // mean confidence must sit inside its own bin's bounds
      assert(conf >= bin * 0.1 - 1e-9 && conf <= (bin + 1) * 0.1 + 1e-9,
        s"bin $bin holds conf $conf")
      assert(r.getAs[Double]("ece") >= 0.0 && r.getAs[Double]("ece") <= 1.0)
      assert(r.getAs[Long]("n_pos") <= r.getAs[Long]("n_pairs"))
    }
    // every source reports ONE ece (constant across its bins)
    rows.groupBy(_.getAs[String]("source")).foreach { case (src, rs) =>
      assert(rs.map(_.getAs[Double]("ece")).distinct.length == 1,
        s"source $src reports differing ece values")
    }
    // population: q288 audits exactly the structurally-decided pairs
    val structural = SparkEntry.queries("q281_position_bias")(spark, sfDir)
      .collect().find(_.getAs[String]("rater") == "structural").get
    val nonTies = structural.getAs[Long]("n_records") -
      structural.getAs[Long]("n_tie")
    assert(rows.map(_.getAs[Long]("n_pairs")).sum == nonTies,
      "q288's pair population must equal q281's structural non-ties")
  }

  test("q290 yield curve: monotone, bounded, ties out against q287's " +
       "prompt population") {
    val rows = SparkEntry.queries("q290_rejection_yield")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val thr = r.getAs[Long]("thr")
      assert(thr >= 0L && thr <= 9L)
      val ppm = r.getAs[Long]("keep_ppm")
      assert(ppm >= 0L && ppm <= 1000000L)
      // kept winners all sit in bins >= thr, so their mean confidence
      // clears the threshold's lower edge
      assert(r.getAs[Long]("mean_kept_conf_ppm") >= thr * 100000L,
        s"mean kept confidence below its own threshold at thr=$thr")
    }
    rows.groupBy(_.getAs[String]("source")).foreach { case (src, rs) =>
      val byThr = rs.sortBy(_.getAs[Long]("thr"))
      // the curve is a descending cumulative: raising tau only drops rows
      for (Array(lo, hi) <- byThr.sliding(2) if byThr.length >= 2) {
        assert(lo.getAs[Long]("n_kept") > hi.getAs[Long]("n_kept"),
          s"$src: occupied-bin cumulative must strictly decrease")
        assert(lo.getAs[Long]("mean_kept_conf_ppm") <=
               hi.getAs[Long]("mean_kept_conf_ppm"),
          s"$src: truncating low bins cannot lower the kept mean")
      }
      // the lowest occupied threshold keeps everything
      assert(byThr.head.getAs[Long]("keep_ppm") == 1000000L,
        s"$src: lowest occupied bin must report full yield")
    }
    // population: one winner per complete prompt group — exactly q287's
    val q287Total = SparkEntry.queries("q287_bestofn_audit")(spark, sfDir)
      .collect().map(_.getAs[Long]("n_wins")).sum
    val q290Total = rows.groupBy(_.getAs[String]("source"))
      .map(_._2.map(_.getAs[Long]("n_kept")).max).sum
    assert(q290Total == q287Total,
      "q290's per-source totals must sum to q287's prompt-group count")
  }

  test("q280/q281 read the same record population") {
    val n280 = row1("q280_preference_kappa").getAs[Long]("n_records")
    val n281 = SparkEntry.queries("q281_position_bias")(spark, sfDir)
      .collect().head.getAs[Long]("n_records")
    val n282 = row1("q282_preference_leakage").getAs[Long]("n_records")
    assert(n280 == n281 && n281 == n282,
      "the three gates must agree on the complete-record count")
  }
}
