package graft

import org.apache.spark.sql.functions._

/** q119 bigram-LM scoring + q120 deterministic split assignment. */
class Curation3Spec extends SparkTestBase {

  private def q(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("q119: positive NLL, bigram counts match doc length, partitioning-independent") {
    val rows = q("q119_lm_score").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (id, nb, nll) =>
      assert(nb >= 1, s"doc $id")
      // every smoothed bigram probability is < 1, so mean -ln is positive
      assert(nll > 0, s"doc $id nll $nll")
    }
    val lens = Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        expr(s"size(${graft.functions.TextExprs.toks})").as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    rows.foreach { case (id, nb, _) =>
      assert(nb == lens(id) - 1, s"doc $id: $nb bigrams for ${lens(id)} tokens")
    }
    // the per-doc mean is a pos-sorted fold: the score must not depend on
    // how the aggregation happened to partition (the unordered-float-sum
    // landmine this query is designed around)
    val pKey = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(pKey)
    spark.conf.set(pKey, "7")
    try assert(q("q119_lm_score").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq == rows.toSeq)
    finally spark.conf.set(pKey, prev)
  }

  test("q122: pair set is q42's; split columns agree with q120's assignment") {
    val leak = q("q122_split_leakage").collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
                 (r.getString(2), r.getString(3), r.getLong(4))))
    val pairs = q("q42_minhash_lsh").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(leak.map(_._1).toSet == pairs)
    val split = q("q120_split_assign").collect()
      .map(r => r.getLong(0) -> r.getString(3)).toMap
    leak.foreach { case ((a, b), (sa, sb, lk)) =>
      assert(sa == split(a) && sb == split(b), s"($a,$b) split mismatch")
      assert(lk == (if (sa != sb) 1L else 0L))
    }
  }

  test("q124: cluster-aware split has ZERO leaky near-dup pairs") {
    val split = q("q124_split_by_cluster").collect()
      .map(r => r.getLong(0) -> r.getString(3)).toMap
    val pairs = q("q42_minhash_lsh").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b) =>
      assert(split(a) == split(b),
        s"pair ($a,$b) split across ${split(a)}/${split(b)} — the fix failed")
    }
    // and it is a real fix, not a degenerate one: all three splits occur
    assert(split.values.toSet == Set("train", "val", "test"))
  }

  test("q120: buckets in [0,100), split consistent with bucket, rerun-stable") {
    val rows = q("q120_split_assign").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (id, _, b, sp) =>
      assert(b >= 0 && b < 100, s"doc $id bucket $b")
      val expected = if (b < 80) "train" else if (b < 90) "val" else "test"
      assert(sp == expected, s"doc $id bucket $b split $sp")
    }
    assert(rows.map(_._4).distinct.toSet == Set("train", "val", "test"))
    assert(q("q120_split_assign").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3)))
      .toSeq == rows.toSeq)
  }

  test("q236 held-out LM: matches a train-split JVM replay with OOV smoothing") {
    val got = SparkEntry.queries("q236_lm_heldout")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    def bucket(id: Long): Long =
      java.lang.Long.parseLong(java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8")).take(8).map("%02x".format(_))
        .mkString.take(15), 16) % 100
    val docs = Tables.documents(spark, sfDir)
      .selectExpr("doc_id", graft.functions.TextExprs.toks).collect()
      .map(r => (r.getLong(0), r.getSeq[String](1)))
    val train = docs.filter(d => bucket(d._1) < 80)
    val test = docs.filter(d => bucket(d._1) >= 90)
    val c2 = train.flatMap(_._2.sliding(2).filter(_.size == 2)
        .map(p => (p(0), p(1))))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val c1 = train.flatMap(_._2).groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    val v = c1.size.toDouble
    val want = test.filter(_._2.size >= 2).map { case (id, w) =>
      val terms = w.sliding(2).filter(_.size == 2).map { p =>
        val bc = c2.getOrElse((p(0), p(1)), 0L)
        val uc = c1.getOrElse(p(0), 0L)
        (math.log((bc + 1.0) / (uc + v)), bc == 0L)
      }.toSeq
      var acc = 0.0
      terms.foreach(t => acc += t._1)
      (id, terms.size.toLong, terms.count(_._2).toLong,
       math.floor(-acc / terms.size * 1e6) / 1e6)
    }.sortBy(_._1)
    assert(got.toSeq == want.toSeq)
    // OOV accounting is live on a real split, and never exceeds the total
    assert(got.exists(_._3 > 0))
    assert(got.forall(t => t._3 <= t._2))
  }
}
