package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, BroadcastNestedLoopJoinExec}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Semantics + plan-shape checks for the round-2 packs (Curation,
  * Relational2). Oracle parity is covered by the Verify gate; these
  * assert the properties the oracle can't see — physical plan shapes and
  * partitioning-independence.
  */
class CurationSpec extends SparkTestBase {

  private def executed(name: String): SparkPlan = {
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.collect()
    df.queryExecution.executedPlan
  }

  private def collectAll(p: SparkPlan): Seq[SparkPlan] = {
    val nested = p match {
      case a: AdaptiveSparkPlanExec => collectAll(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => collectAll(q.plan)
      case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => collectAll(r.child)
      case _ => Nil
    }
    (p +: p.children.flatMap(collectAll)) ++ nested
  }

  test("q46 pack: bins are contiguous per lang and token-bounded") {
    val rows = SparkEntry.queries("q46_pack_sequences")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).foreach { case (lang, bins) =>
      val ids = bins.map(_.getLong(1)).sorted
      assert(ids.head == 0, "first bin starts at 0")
      assert(ids.distinct.length == ids.length, "bin ids unique per lang")
      assert(bins.forall(_.getLong(2) > 0), "every bin holds at least one doc")
      // token conservation: bins partition the corpus exactly
      val packed = bins.map(_.getLong(3)).sum
      val total = Tables.documents(spark, sfDir)
        .filter(org.apache.spark.sql.functions.col("lang") === lang)
        .selectExpr(s"sum(size(${graft.functions.TextExprs.toks}))")
        .collect().head.getLong(0)
      assert(packed == total, s"$lang: packed $packed != corpus $total")
    }
  }

  test("q48 contamination: benchmark shingle set is broadcast") {
    val joins = collectAll(executed("q48_contamination"))
    assert(joins.exists(p => p.isInstanceOf[BroadcastHashJoinExec]),
           "benchmark side must broadcast — the corpus is never shuffled for the probe")
  }

  test("q63 range join: inequality-only join broadcasts the band relation") {
    val joins = collectAll(executed("q63_range_join"))
    assert(joins.exists(_.isInstanceOf[BroadcastNestedLoopJoinExec]),
           "band join should plan as broadcast nested loop (10-row build side)")
  }

  test("q67 sampling is reproducible and stratified") {
    val a = SparkEntry.queries("q67_hash_sample")(spark, sfDir).collect()
    val b = SparkEntry.queries("q67_hash_sample")(spark, sfDir).collect()
    assert(a.toSeq == b.toSeq, "hash sampling must be deterministic across runs")
    // en stratum samples at ~50%, others ~20% — at 500 docs the counts
    // must at least rank that way per doc share
    val docs = Tables.documents(spark, sfDir)
    val totals = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    a.foreach { r =>
      val lang = r.getString(0); val n = r.getLong(1)
      val rate = n.toDouble / totals(lang)
      if (lang == "en") assert(rate > 0.3 && rate < 0.7, s"en rate $rate")
      else assert(rate < 0.45, s"$lang rate $rate")
    }
  }

  test("q69 exact correlation is partitioning-independent") {
    def run(): Seq[(String, Double)] =
      SparkEntry.queries("q69_corr_exact")(spark, sfDir)
        .collect().map(r => (r.getString(0), r.getDouble(2))).toSeq
    val r1 = run()
    // shrink input splits so the scan (and thus partial aggregation) runs
    // over a different partitioning — exact integer sums must not care
    val key = "spark.sql.files.maxPartitionBytes"
    val prev = spark.conf.get(key)
    try {
      spark.conf.set(key, "65536")
      val r2 = run()
      assert(r1 == r2, "power-sum correlation must be bit-identical under any partitioning")
    } finally spark.conf.set(key, prev)
    r1.foreach { case (_, c) => assert(c >= -1.0 && c <= 1.0) }
  }

  test("q77 top-k aggregate: two-phase object-hash agg, no window sort") {
    val nodes = collectAll(executed("q77_topk_agg"))
    // the heap aggregate plans as ObjectHashAggregate with a partial
    // phase (map-side k-row bound) ...
    val aggs = nodes.collect {
      case a: org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec => a
    }
    assert(aggs.size >= 2, s"expected partial+final object-hash agg, got ${aggs.size}")
    // ... and no WindowExec materializing/sorting whole groups
    assert(!nodes.exists(_.isInstanceOf[org.apache.spark.sql.execution.window.WindowExec]),
      "top-k must not fall back to a window")
  }

  test("q74 quality gate keeps the upper quantile and broadcasts the threshold") {
    import org.apache.spark.sql.functions._
    val total = Tables.documents(spark, sfDir).count()
    val df = SparkEntry.queries("q74_quality_gate")(spark, sfDir)
    val kept = df.agg(sum("n_kept")).collect()(0).getLong(0)
    // p25 gate keeps ~75% (ties can only add)
    assert(kept >= (total * 0.74).toLong && kept <= total, s"kept $kept of $total")
    // the threshold side is a broadcast, not a shuffle join
    df.collect()
    val bcasts = collectAll(df.queryExecution.executedPlan).collect {
      case b: BroadcastNestedLoopJoinExec => b
    }
    assert(bcasts.nonEmpty, "threshold must arrive via broadcast")
  }

  test("q75 global pack: distributed prefix sum is nParts-independent and exact") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    import graft.operators.Curation
    val docs = Tables.documents(spark, sfDir)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val wide = rows(Curation.globalPack(docs, 2048L, 32))
    val narrow = rows(Curation.globalPack(docs, 2048L, 5))
    assert(wide == narrow, "bin assignment must not depend on partition count")
    // and both equal the naive single-task global window
    val w = Window.orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val naive = docs
      .select(col("doc_id"),
              expr(s"size(${graft.functions.TextExprs.toks})").as("n_tokens"))
      .withColumn("cum", sum("n_tokens").over(w))
      .withColumn("bin", floor((col("cum") - col("n_tokens")) / 2048).cast("long"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").cast("long").as("bin_tokens"))
      .orderBy("bin")
    assert(wide == rows(naive))
  }

  test("q129 sweep at n = 3 reproduces q48 exactly; smaller n flags more") {
    val sweep = SparkEntry.queries("q129_contamination_sweep")(spark, sfDir)
      .collect()
    val byN = sweep.groupBy(_.getLong(0))
    val at3 = byN(3L).map(r => (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(_._1)
    val q48 = SparkEntry.queries("q48_contamination")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    assert(at3.toSeq == q48.toSeq,
      "the n = 3 sweep rows must equal q48's output row-for-row")
    // the knob is monotone in flag volume: bigrams over-flag vs trigrams,
    // trigrams vs 4-grams (strictly more hits at every smaller n on this
    // corpus; >= guards the general contract)
    assert(byN(2L).length >= byN(3L).length && byN(3L).length >= byN(4L).length,
      s"flag counts not monotone: ${byN.view.mapValues(_.length).toMap}")
  }

  test("q130 funnel: stage survival is monotone and anchored at raw = 1") {
    val rows = SparkEntry.queries("q130_pipeline_funnel")(spark, sfDir)
      .collect()
    assert(rows.length == 4)
    assert(rows.head.getString(1) == "raw" && rows.head.getDouble(4) == 1.0)
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b.getLong(2) <= a.getLong(2),
        s"docs grew from ${a.getString(1)} to ${b.getString(1)}")
      assert(b.getLong(3) <= a.getLong(3),
        s"tokens grew from ${a.getString(1)} to ${b.getString(1)}")
    }
    // the last stage must actually remove something on this corpus (the
    // benchmark docs leave the pool at decontam if nothing else)
    assert(rows.last.getLong(2) < rows.head.getLong(2))
  }

  test("q49 repetition: ratios are consistent and bounded") {
    SparkEntry.queries("q49_repetition")(spark, sfDir).collect().foreach { r =>
      val nTokens = r.getLong(1); val nDistinct = r.getLong(2)
      val topShare = r.getDouble(4); val distinctRatio = r.getDouble(5)
      assert(nDistinct <= nTokens)
      assert(topShare > 0 && topShare <= 1.0)
      assert(distinctRatio > 0 && distinctRatio <= 1.0)
    }
  }

  test("q188 release export: split-partitioned layout, funnel-consistent, " +
       "memo-stable") {
    val rows = SparkEntry.queries("q188_release_export")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3),
                 r.getString(4)))
    assert(rows.nonEmpty)
    // every row carries a valid split read from a directory name
    assert(rows.map(_._2).toSet.subsetOf(Set("train", "val", "test")))
    assert(rows.map(_._2).toSet.contains("train"))
    // the export IS the funnel's final stage: row count = s3 survivors
    val s3 = graft.operators.Curation.pipelineFlags(spark, sfDir)
      .filter(org.apache.spark.sql.functions.col("s3")).count()
    assert(rows.length.toLong == s3, s"export ${rows.length} != s3 $s3")
    // memoized artifact: a second invocation serves the same rows
    val again = SparkEntry.queries("q188_release_export")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
                           r.getLong(3), r.getString(4)))
    assert(rows.toSeq == again.toSeq)
  }

  test("q204 opt-out: removal is by CONTENT digest and the per-source " +
       "counts reconcile against an independent replay") {
    import org.apache.spark.sql.functions._
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // independent registry + survivor replay (pipelineFlags is the
    // operator's own input relation; the digest matching is re-derived
    // here through java.security.MessageDigest, not Spark's md5)
    val reg = Tables.documents(spark, sfDir)
      .filter(col("doc_id") % 37 === 3).select("text").collect()
      .map(r => md5hex(r.getString(0))).toSet
    val surv = graft.operators.Curation.pipelineFlags(spark, sfDir)
      .filter(col("s3")).select("source", "dig", "ntok").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val want = surv.groupBy(_._1).map { case (src, rows) =>
      val (rem, rel) = rows.partition(r => reg(r._2))
      (src, rows.length.toLong, rem.length.toLong, rem.map(_._3).sum,
       rel.length.toLong, rel.map(_._3).sum)
    }.toSeq.sortBy(_._1)
    val got = SparkEntry.queries("q204_optout_filter")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
                 r.getLong(4), r.getLong(5)))
    assert(got.toSeq == want, s"got ${got.toSeq}\nwant $want")
    // the stage does real work and accounting closes
    assert(got.map(_._3).sum > 0, "no opt-out ever fired — dead registry")
    got.foreach { case (src, sv, rd, _, ld, _) =>
      assert(sv == rd + ld, s"$src: $sv != $rd + $ld") }
  }

  test("q237/q239: normalization is a within-source permutation; bias audit bounded") {
    val norm = SparkEntry.queries("q237_score_normalize")(spark, sfDir)
      .collect().map(r => (r.getString(1), r.getLong(3), r.getDouble(4)))
    // ranks are a 1..n permutation per source and pct spans [0, 1]
    norm.groupBy(_._1).foreach { case (_, rows) =>
      val rks = rows.map(_._2).sorted
      assert(rks.toSeq == (1L to rks.length).toSeq)
      assert(rows.map(_._3).min == 0.0)
      assert(rows.forall(t => t._3 >= 0.0 && t._3 <= 1.0))
    }
    val bias = SparkEntry.queries("q239_length_bias")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(bias.exists(_._1 == "__ALL"))
    assert(bias.forall(t => t._3 >= -1.0 && t._3 <= 1.0))
    // the pooled row aggregates every per-source population
    assert(bias.filter(_._1 != "__ALL").map(_._2).sum ==
           bias.find(_._1 == "__ALL").get._2)
  }

  test("q238 planted: a clean near-dup inside a contaminated family is flagged") {
    import spark.implicits._
    val assign = Seq((10L, 10L), (11L, 10L), (12L, 12L), (13L, 13L))
      .toDF("doc_id", "cluster_id")
    val direct = Seq((10L, 1L), (13L, 1L)).toDF("doc_id", "direct")
    val got = graft.operators.Curation
      .familyContaminationCore(assign, direct).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // doc 11 carries no direct flag but shares family 10 → transitively
    // flagged; the clean singleton 12 stays out; 13 flags itself
    assert(got.toSeq == Seq((10L, 10L, 1L, 1L), (11L, 10L, 0L, 1L),
                            (13L, 13L, 1L, 1L)))
  }

  test("q238 declared: superset of q48 directs; counts consistent") {
    val got = SparkEntry.queries("q238_family_contamination")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    val direct = SparkEntry.queries("q48_contamination")(spark, sfDir)
      .collect().map(_.getLong(0)).toSet
    assert(got.collect { case (id, 1L) => id }.toSet == direct)
    assert(got.map(_._1).toSet.size == got.length)
  }

  test("q243 takedown closure: replays from gated q73 + the digest registry") {
    val got = SparkEntry.queries("q243_takedown_closure")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
                           r.getLong(3), r.getLong(4), r.getLong(5)))
    val assign = SparkEntry.queries("q73_dedup_clusters")(spark, sfDir)
      .select("doc_id", "cluster_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val docs = Tables.documents(spark, sfDir)
      .selectExpr("doc_id", "source",
        s"cast(size(${graft.functions.TextExprs.toks}) as long)",
        "md5(text)").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3)))
    val reg = docs.collect { case (id, _, _, dig) if id % 37 == 3 => dig }
      .toSet
    val direct = docs.map(d => d._1 -> (if (reg(d._4)) 1L else 0L)).toMap
    val famHit = docs.groupBy(d => assign(d._1)).view
      .mapValues(_.map(d => direct(d._1)).max).toMap
    val want = docs.groupBy(_._2).toSeq.map { case (src, ds) =>
      val hits = ds.map(d => famHit(assign(d._1)))
      (src, ds.length.toLong, ds.map(d => direct(d._1)).sum, hits.sum,
       ds.count(d => famHit(assign(d._1)) == 1L && direct(d._1) == 0L).toLong,
       ds.collect { case d if famHit(assign(d._1)) == 1L => d._3 }.sum)
    }.sortBy(_._1)
    assert(got.toSeq == want)
    // the closure can only grow the direct set, and it does somewhere
    assert(got.forall(t => t._4 >= t._3))
    assert(got.map(_._5).sum > 0,
      "corpus should exercise the transitive path")
  }

  test("q251 release-diff core: planted added/removed/changed classify exactly") {
    import spark.implicits._
    // v1: docs 1,2,3; v2: 2 (unchanged), 3 (rewritten), 4 (new)
    val v1 = Seq((1L, "a", 10L, "h1"), (2L, "a", 20L, "h2"),
                 (3L, "b", 30L, "h3"))
      .toDF("doc_id", "source", "ntok", "text_md5")
    val v2 = Seq((2L, "a", 20L, "h2"), (3L, "b", 31L, "h3x"),
                 (4L, "b", 40L, "h4"))
      .toDF("doc_id", "source", "ntok", "text_md5")
    val out = graft.operators.Curation.releaseDiff(v1, v2).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))).toMap
    // source a: doc 1 removed (10 tokens), doc 2 carried unchanged
    assert(out("a") == ((2L, 1L, 0L, 0L, 1L, 10L, 0L)))
    // source b: doc 4 added (40 tokens), doc 3 changed, nothing removed
    assert(out("b") == ((1L, 2L, 1L, 40L, 0L, 0L, 1L)))
  }
}
