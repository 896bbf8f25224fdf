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
}
