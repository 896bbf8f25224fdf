package graft

import graft.operators.Projection
import org.apache.spark.sql.functions._

/** Contracts of the trained PCA projection behind q125. */
class ProjectionSpec extends SparkTestBase {

  private lazy val e =
    Tables.embeddings(spark, sfDir).select(col("vec_id"), col("embedding"))

  test("training is deterministic: two runs produce bit-identical literals") {
    val a = Projection.trainPca(e, 32)
    val b = Projection.trainPca(e, 32)
    assert(a.mu.sameElements(b.mu))
    assert(a.eigvals.sameElements(b.eigvals))
    assert(a.comps.length == b.comps.length &&
      a.comps.zip(b.comps).forall { case (x, y) => x.sameElements(y) })
  }

  test("components are orthonormal rows with descending positive spectrum") {
    val p = Projection.trainPca(e, 32)
    def dot(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => x * y }.sum
    for (i <- p.comps.indices) {
      assert(math.abs(dot(p.comps(i), p.comps(i)) - 1.0) < 1e-9,
        s"component $i is not unit-norm")
      for (j <- (i + 1) until p.comps.length)
        assert(math.abs(dot(p.comps(i), p.comps(j))) < 1e-9,
          s"components $i and $j are not orthogonal")
    }
    p.eigvals.sliding(2).foreach { w =>
      if (w.length == 2) assert(w(0) >= w(1), "spectrum not descending")
    }
    assert(p.eigvals.forall(_ > 0), "covariance spectrum not positive")
  }

  test("whitened projection has unit variance along every kept component") {
    val p = Projection.trainPca(e, 8)
    val rows = e.filter(col("vec_id") < 256)
      .select(col("vec_id"),
              Projection.whitenExpr(p, Projection.projectExpr(p, col("embedding")))
                .as("w"))
      .orderBy("vec_id").collect()
      .map(_.getSeq[Double](1).toArray)
    val n = rows.length
    for (j <- 0 until 8) {
      val xs = rows.map(_(j))
      val mean = xs.sum / n
      val v = xs.map(x => (x - mean) * (x - mean)).sum / (n - 1)
      assert(math.abs(v - 1.0) < 1e-6,
        s"whitened component $j has variance $v, expected 1")
    }
  }

  test("projection onto all d components preserves centered geometry") {
    // a full-rank rotation is an isometry: pairwise L2 distances between
    // projected vectors equal the distances between centered originals
    val p = Projection.trainPca(e, 64)
    val rows = e.filter(col("vec_id") < 8)
      .select(col("vec_id"),
              graft.functions.VectorExprs.asDouble("embedding").as("v"),
              Projection.projectExpr(p, col("embedding")).as("y"))
      .orderBy("vec_id").collect()
    def l2(a: Array[Double], b: Array[Double]): Double =
      math.sqrt(a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum)
    for (i <- rows.indices; j <- (i + 1) until rows.length) {
      val vi = rows(i).getSeq[Double](1).toArray
      val vj = rows(j).getSeq[Double](1).toArray
      val yi = rows(i).getSeq[Double](2).toArray
      val yj = rows(j).getSeq[Double](2).toArray
      // centering cancels in differences, so d(v_i, v_j) = d(y_i, y_j)
      assert(math.abs(l2(vi, vj) - l2(yi, yj)) < 1e-8,
        s"rotation distorted the distance between rows $i and $j")
    }
  }

  test("q153: RBO in [0,1], top-weighted, and overlap agrees with q135's hits") {
    val rbo = Projection.queries("q153_rbo_eval")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(rbo.nonEmpty)
    rbo.values.foreach { case (ov, v) =>
      assert(v >= 0.0 && v <= 1.0, s"RBO $v outside [0,1]")
      assert(ov >= 0 && ov <= 5)
      // zero overlap forces zero RBO and vice versa
      assert((ov == 0) == (v == 0.0), "overlap/RBO zero-consistency broken")
    }
    // the intersected id set is the same one q135's recall counts
    val hits = Projection.queries("q135_binary_ann")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    rbo.foreach { case (q, (ov, _)) =>
      assert(ov == hits(q), s"query $q: RBO overlap $ov != q135 hits ${hits(q)}")
    }
  }

  test("q163 embedding audit: one row per dim, n = corpus, bounds hold") {
    val rows = Projection.queries("q163_embedding_audit")(spark, sfDir).collect()
    val n = Tables.embeddings(spark, sfDir).count()
    assert(rows.nonEmpty && rows.forall(_.getLong(1) == n))
    assert(rows.map(_.getLong(0)).toSeq == (1L to rows.length).toSeq)
    rows.foreach { r =>
      val (mn, mx, mean, std) =
        (r.getLong(4), r.getLong(5), r.getDouble(6), r.getDouble(7))
      assert(mn <= mx)
      assert(mean * 1e6 >= mn - 1 && mean * 1e6 <= mx + 1,
        "mean outside the [min, max] envelope")
      assert(std >= 0)
    }
  }

  test("q166 standardization: per-dim z mean ~ 0, std ~ 1") {
    val rows = Projection.queries("q166_standardize")(spark, sfDir).collect()
    assert(rows.length == Tables.embeddings(spark, sfDir).count())
    val mat = rows.map(_.getString(1).split(',').map(_.toLong / 1e4))
    assert(mat.map(_.length).distinct.length == 1, "ragged z vectors")
    for (j <- mat.head.indices) {
      val colv = mat.map(_(j))
      val m = colv.sum / colv.length
      val sd = math.sqrt(colv.map(x => (x - m) * (x - m)).sum / colv.length)
      // 1e-4 output quantization + 1e-6 input quantization head-room
      assert(math.abs(m) < 2e-3, s"dim ${j + 1}: z mean $m")
      assert(math.abs(sd - 1) < 2e-3, s"dim ${j + 1}: z std $sd")
    }
  }

  test("q175 outlier audit: matches a brute-force z-score recompute") {
    val got = Projection.queries("q175_outlier_audit")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // brute-force mirror: the same 1e-6 integer quantization for the
    // stats, double z per element, flag on strictly > 3
    val vecs = Tables.embeddings(spark, sfDir)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    val d = vecs.head._2.length
    val n = vecs.length
    val q = vecs.map { case (_, v) =>
      v.map(x => math.floor(x.toDouble * 1e6).toLong) }
    val mu = Array.tabulate(d)(j => q.map(_(j)).sum.toDouble / n / 1e6)
    val sd = Array.tabulate(d) { j =>
      val s = q.map(_(j)).sum.toDouble / n
      val sq = q.map(r => r(j) * r(j)).sum.toDouble / n
      math.sqrt(math.max(0.0, sq - s * s)) / 1e6
    }
    val want = vecs.flatMap { case (id, v) =>
      val z = Array.tabulate(d)(j =>
        if (sd(j) == 0) 0.0 else math.abs((v(j).toDouble - mu(j)) / sd(j)))
      val ne = z.count(_ > 3.0)
      if (ne >= 1) Some((id, ne.toLong, math.floor(z.max * 1e4).toLong))
      else None
    }.sortBy(_._1)
    assert(want.nonEmpty, "testdata should contain z > 3 outlier vectors")
    assert(got.toSeq == want.toSeq, "operator != brute-force recompute")
    // and the flagged set is a strict subset — the audit returns a tail,
    // not the corpus
    assert(got.length < n)
  }

  test("q178 per-label audit sums exactly to the global q163 audit") {
    val per = Projection.queries("q178_label_audit")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
                 r.getLong(4)))
    assert(per.map(_._1).distinct.length > 1, "needs multiple labels")
    val glob = Projection.queries("q163_embedding_audit")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
                                           r.getLong(3))).toMap
    // integer sums are exact, so per-label partitions must reassemble
    // the global pass bit-for-bit
    per.groupBy(_._2).foreach { case (dim, rows) =>
      val (n, s, sq) = (rows.map(_._3).sum, rows.map(_._4).sum,
                        rows.map(_._5).sum)
      assert((n, s, sq) == glob(dim),
        s"dim $dim: label partition sums != global audit")
    }
  }

  test("q179 separability matches a brute-force Fisher recompute") {
    val got = Projection.queries("q179_separability")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val vecs = Tables.embeddings(spark, sfDir)
      .select("label", "embedding").collect()
      .map(r => r.getInt(0).toLong -> r.getSeq[Float](1).toArray
        .map(x => math.floor(x.toDouble * 1e6).toLong))
    val d = vecs.head._2.length
    val want = (1 to d).map { dim =>
      val j = dim - 1
      val byLabel = vecs.groupBy(_._1).toSeq.sortBy(_._1)
      val nn = vecs.length.toLong
      val ss = vecs.map(_._2(j)).sum
      val qq = vecs.map(v => v._2(j) * v._2(j)).sum
      // the label-ordered left fold, exactly as both engines run it
      val t = byLabel.foldLeft(0.0) { case (acc, (_, vs)) =>
        val s = vs.map(_._2(j)).sum
        acc + (s.toDouble * s.toDouble) / vs.length
      }
      val within = qq.toDouble - t
      val f6 =
        if (within <= 0) -1L
        else math.floor(math.max(0.0, t - (ss.toDouble * ss.toDouble) / nn)
                        / within * 1e6).toLong
      (dim.toLong, nn, f6)
    }
    assert(got.toSeq == want, "operator != brute-force Fisher recompute")
    // the ratio is a real number on this corpus, not all sentinels
    assert(got.forall(_._3 >= -1L) && got.exists(_._3 >= 0L))
  }

  test("q184 snapshot drift matches a brute-force recompute") {
    val got = Projection.queries("q184_embedding_drift")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val vecs = Tables.embeddings(spark, sfDir)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray
        .map(x => math.floor(x.toDouble * 1e6).toLong))
    val half = vecs.length / 2
    val d = vecs.head._2.length
    def stats(vs: Array[Array[Long]], j: Int): (Long, Double, Double) = {
      val n = vs.length.toLong
      val s = vs.map(_(j)).sum
      val sq = vs.map(v => v(j) * v(j)).sum
      val mu = s.toDouble / n / 1e6
      val va = math.max(0.0,
        sq.toDouble / n - (s.toDouble / n) * (s.toDouble / n)) / 1e12
      (n, mu, va)
    }
    val a = vecs.filter(_._1 < half).map(_._2)
    val b = vecs.filter(_._1 >= half).map(_._2)
    val want = (1 to d).map { dim =>
      val j = dim - 1
      val (na, ma, va) = stats(a, j)
      val (nb, mb, vb) = stats(b, j)
      val pooled = math.sqrt((va + vb) / 2)
      val s4 = if (pooled == 0) -1L
               else math.floor(math.abs(ma - mb) / pooled * 1e4).toLong
      (dim.toLong, na, nb, s4)
    }
    assert(got.toSeq == want, "operator != brute-force drift recompute")
  }

  test("q185 label-noise suspects match a brute-force nearest-centroid pass") {
    val got = Projection.queries("q185_label_noise")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val rows = Tables.embeddings(spark, sfDir)
      .select("vec_id", "label", "embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1).toLong,
                 r.getSeq[Float](2).toArray.map(_.toDouble)))
    val d = rows.head._3.length
    val cents = rows.groupBy(_._2).toSeq.sortBy(_._1).map { case (l, vs) =>
      val q = vs.map(_._3.map(x => math.floor(x * 1e6).toLong))
      l -> Array.tabulate(d)(j => q.map(_(j)).sum.toDouble / q.length / 1e6)
    }
    val want = rows.sortBy(_._1).flatMap { case (id, lbl, v) =>
      val dists = cents.map { case (l, mu) =>
        l -> (0 until d).foldLeft(0.0)((acc, j) =>
          acc + (v(j) - mu(j)) * (v(j) - mu(j)))
      }
      val (nl, nd) = dists.minBy { case (l, dd) => (dd, l) }
      val dOwn = dists.find(_._1 == lbl).get._2
      if (nl != lbl) Some((id, lbl, nl, math.floor((dOwn - nd) * 1e4).toLong))
      else None
    }
    assert(want.nonEmpty && got.length < rows.length)
    assert(got.toSeq == want.toSeq, "operator != brute-force nearest centroid")
  }

  test("planted vec_int_stats: exact sums/minmax; partial buffers merge") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, expr}
    // 2 partitions force a real partial-agg merge of two buffers
    val df = Seq(Seq(1L, -2L, 3L), Seq(5L, 0L, -1L), Seq(-3L, 4L, 2L))
      .toDF("q").repartition(2)
    val st = df.agg(graft.functions.VecStatsAgg.vec_int_stats(col("q")).as("st"))
      .select(col("st.n"), expr("st.sums"), expr("st.sumsqs"),
              expr("st.mins"), expr("st.maxs"))
      .collect().head
    assert(st.getLong(0) == 3L)
    assert(st.getSeq[Long](1) == Seq(3L, 2L, 4L), "sums")
    assert(st.getSeq[Long](2) == Seq(35L, 20L, 14L), "sum of squares")
    assert(st.getSeq[Long](3) == Seq(-3L, -2L, -1L), "mins")
    assert(st.getSeq[Long](4) == Seq(5L, 4L, 3L), "maxs")
  }

  test("vec_int_stats overflow FAILS LOUDLY instead of wrapping") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // x ≈ sqrt(Long.MaxValue): one x² fits, two overflow the sumsq
    // accumulator — the guard must throw, not silently wrap into wrong
    // means/stds (the 100 TB failure mode the exact-guard exists for)
    val big = 3037000499L
    val ex = intercept[Exception] {
      Seq(Seq(big), Seq(big)).toDF("q").coalesce(1)
        .agg(graft.functions.VecStatsAgg.vec_int_stats(col("q")))
        .collect()
    }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(ex).exists(_.isInstanceOf[ArithmeticException]),
      s"expected ArithmeticException in the cause chain, got $ex")
  }
}
