package graft

import graft.operators.Relational
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.BroadcastExchangeExec
import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec

/** Plan-shape regression tests: the physical properties the queries are
  * designed around (scan pushdown/pruning, broadcast dims) must survive
  * refactors — a correct-but-full-scan plan is a perf bug at 100 TB.
  */
class PlanSpec extends SparkTestBase {

  /** All physical nodes, descending through AQE wrappers and query
    * stages (QueryStageExec has children = Nil; its plan is a field). */
  private def allNodes(p: org.apache.spark.sql.execution.SparkPlan):
      Seq[org.apache.spark.sql.execution.SparkPlan] = {
    val nested = p match {
      case a: AdaptiveSparkPlanExec => allNodes(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => allNodes(q.plan)
      case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => allNodes(r.child)
      case _ => Nil
    }
    p +: (p.children.flatMap(allNodes) ++ nested)
  }

  private def executed(df: DataFrame) = {
    df.collect() // materialize so AQE finalizes
    allNodes(df.queryExecution.executedPlan)
  }

  test("driver smoke contract: entry returns rows at sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("query construction schedules no driver job (documented builders excepted)") {
    // Queries whose CONSTRUCTION legitimately runs driver-coordinated
    // work, each documented at its site: the verifyJoin adaptive size
    // guard (LSH/near-dup family), the iterative CC loop (cluster
    // family), driver-trained constant-size codebooks (IVF/PQ family —
    // the standard FAISS training step), and the sharded bloom build.
    // Everything else must compose lazily: an eager count()/collect()
    // in a plain query serializes an extra job per plan build.
    val allow = Set(
      "q41_ann_lsh", "q42_minhash_lsh", "q100_incremental_neardup",
      "q73_dedup_clusters", "q80_embedding_clusters",
      "q261_incremental_clusters",
      // q88 composes the memoized fuzzy-pair core (lazy localCheckpoint —
      // whichever of q88/q89 builds first pays the one-off)
      "q88_fuzzy_join",
      // q35/q244 share the memoized τ = 0.8 prefix pair core — same
      // lazy-checkpoint one-off on first build
      "q35_ngram_jaccard", "q244_prefix_join",
      "q89_entity_resolution", "q101_cluster_sizes", "q124_split_by_cluster",
      "q164_priority_survivor", "q181_effective_tokens",
      // q78 materializes its exploded tf index once per invocation
      // (lazy localCheckpoint — the r16 fix for the 4× tf-chain
      // recompute); toRdd physical planning under AQE runs the leading
      // tf stages at build
      "q78_doc_cosine",
      // q205 composes the memoized cluster assignment (the CC loop);
      // q207/q216/q246 compose the q42 pair pipeline (verifyJoin size
      // guard + the memoized pair-core localCheckpoint)
      "q205_mixture_plan", "q207_quality_disagree", "q216_pagerank",
      "q246_triangles",
      // q292 rides q205's shared effective-tokens core — same memoized
      // cluster-chain one-off when it is the first consumer built
      // (latent since r13; exposed when a registry edit reshuffled the
      // map's iteration order)
      "q220_mixture_sample", "q292_mixture_sweep",
      "q221_negative_sample", "q235_triplets",
      // q297 composes the memoized cluster assignment (the CC loop)
      "q297_epoch_order",
      "q238_family_contamination", "q243_takedown_closure",
      "q259_dataset_card",
      // the pipelineFlags memo lazily checkpoints on first touch, and
      // toRdd physical planning under AQE runs leading query stages —
      // whichever flags consumer builds first pays the one-off
      "q130_pipeline_funnel", "q132_source_scorecard", "q204_optout_filter",
      "q268_calibration", "q277_auc",
      // the BPE merge-chain memo lazily checkpoints each round's one-row
      // election; toRdd physical planning under AQE runs the leading
      // election stages — whichever of q186/q202 builds first pays it
      "q186_bpe_merges", "q202_bpe_apply",
      // the LM score memo lazily checkpoints the bigram count/join chain;
      // same AQE leading-stage one-off — whichever of q119/q241 builds
      // first pays it
      "q119_lm_score", "q241_quality_ensemble",
      // the prefVerdicts / prefMargins memos lazily checkpoint an A/B
      // record join; toRdd physical planning fires the join's broadcast
      // future async — whichever consumer builds first pays the one-off
      // (the flags-memo exemption pattern: list every consumer).
      // Verified r13: removing these four makes this test FAIL on the
      // first consumer built ("q280_preference_kappa scheduled 1 driver
      // job(s): [withThreadLocalCaptured at CompletableFuture.java]" —
      // the async broadcast-exchange future of the memo's record join)
      "q280_preference_kappa", "q281_position_bias",
      "q282_preference_leakage", "q283_preference_margin",
      // q288 joins BOTH record memos (prefMargins ⋈ prefVerdicts) —
      // same one-off when it is the first consumer built
      "q288_reward_calibration",
      // r15: q102/q110 compose the rankedHalves memo (lazy checkpoint
      // of the BM25/cosine top-k lists; toRdd physical planning fires
      // the halves' broadcast-exchange futures async), and q242
      // composes the flagged-relation memo (same lazy-checkpoint
      // one-off on its prefix-verify + banding join) — whichever
      // consumer builds first pays it
      "q102_hybrid_search", "q110_hybrid_weighted", "q242_lsh_recall",
      // q224 trains the constant-size coarse codebook at build (the
      // q45/q86 FAISS training step) for its probed-candidate kNN graph;
      // q286 trains one per side for its two probed mining directions;
      // q289 additionally persists both side indexes (write-once per
      // session+dataset) and loads their resident handles
      "q224_hub_audit", "q286_margin_mine_probed",
      "q289_mining_index_lifecycle",
      // q284 collects the players^2 win matrix at build and fits the
      // Bradley-Terry strengths driver-side (same constant-size
      // training pattern; the win matrix is source-grain bounded)
      "q284_preference_btl",
      // q285 trains the coarse codebook at build (the q103/q224
      // constant-size training pattern) for its contamination cells
      "q285_semantic_contamination",
      "q45_ann_ivf", "q82_ann_pq", "q86_ann_ivfpq", "q103_semantic_dedup",
      "q109_ann_recall", "q115_recall_sweep", "q125_pca_sweep",
      "q128_cluster_balanced", "q136_pca_binary", "q138_cluster_purity",
      "q95_dedup_bloom_sharded",
      // q114/q122/q131 compose the q42 (+ q81) pair pipelines, so they
      // inherit q42's verifyJoin adaptive size guard
      "q114_neardup_consensus", "q122_split_leakage", "q131_crosslang_audit",
      "q143_neardup_degree", "q154_simhash_sweep",
      // the streaming-gate queries RUN a bounded streaming query inside
      // the declared function by design (the batch-equivalence harness)
      "q104_incdedup_stream", "q105_contamination_stream",
      "q106_simhash_stream", "q107_minhash_stream", "q112_quality_stream",
      "q118_window_stream", "q150_entropy_stream", "q162_repetition_stream",
      "q167_sessionize_stream", "q168_window_topk_stream",
      "q169_quota_stream", "q170_dedup_stream", "q177_funnel_stream",
      "q182_outlier_stream", "q194_anomaly_stream", "q211_hll_stream",
      "q218_decay_stream", "q219_attribution_stream", "q223_paths_stream",
      "q227_attribution_outer", "q229_growth_stream", "q240_ks_stream",
      "q248_quantile_stream", "q263_bloom_stream", "q293_minhash_evict",
      // index build (write-once per session+dataset) + verifyJoin probe
      "q108_neardup_indexed",
      // per-topic partitioned write + read-back (write-once per
      // session+dataset) — the multi-topic ingest parity gate
      "q173_multi_topic",
      // release-artifact write + read-back (write-once per
      // session+dataset) — q173's pattern on the curated corpus;
      // q251 diffs against that same artifact, so it shares the
      // first-build write when it runs before q188 in a fresh session
      "q188_release_export", "q251_release_diff",
      // persisted BM25 index build+append (write-once per
      // session+dataset) — the lexical index lifecycle artifact
      "q260_bm25_index_append",
      // IVF-PQ persisted-index family: index build/append (write-once per
      // session+dataset), codebook training, and the probe-cell collect
      // (|Q|·nprobe ids) documented at ivfPqSearch
      "q156_ann_rerank", "q157_index_append", "q158_index_tombstone",
      "q159_index_stats", "q160_index_compact", "q172_index_retrain")
    // warm the memoized ANALYZE-style stats (documented one-off per
    // session+dataset) so they don't attribute to whichever query builds
    // first
    Tables.rowCount(spark, sfDir, "embeddings")
    // warm per-table schema resolution: Spark 4 reads parquet footers via
    // a small job on FIRST touch of each path and caches the result for
    // the session — session init, not a per-build cost; warming keeps the
    // assertion strict for genuinely per-build jobs
    Seq("region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings")
      .foreach(t => if (t == "events") Tables.events(spark, sfDir).schema
                    else Tables.load(spark, sfDir, t).schema)
    val jobs = new java.util.concurrent.atomic.AtomicInteger()
    val descs = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        descs.add(js.stageInfos.map(_.name).mkString("[", " | ", "]"))
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)
           if !allow(name)) {
        org.apache.spark.GraftTestBridge.waitListenerBusEmpty(spark.sparkContext)
        jobs.set(0); descs.clear()
        fn(spark, sfDir) // build the plan only — never execute it
        org.apache.spark.GraftTestBridge.waitListenerBusEmpty(spark.sparkContext)
        assert(jobs.get() == 0,
          s"$name scheduled ${jobs.get()} driver job(s) during plan " +
            s"construction: ${descs.toArray.mkString("; ")}")
      }
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("q2: filters and projection are pushed into the parquet scan") {
    val plan = executed(Relational.queries("q2_filter")(spark, sfDir))
    val scans = plan.collect { case s: FileSourceScanExec => s }.toSeq
    assert(scans.nonEmpty)
    val scan = scans.head
    assert(scan.dataFilters.nonEmpty, "filters must reach the scan")
    // projection pruning: far fewer columns than lineitem's 11
    assert(scan.requiredSchema.fields.length <= 5,
      s"expected pruned ReadSchema, got ${scan.requiredSchema.fieldNames.mkString(",")}")
  }

  test("q4: dimension joins execute as broadcast hash joins") {
    val plan = executed(Relational.queries("q4_star_join")(spark, sfDir))
    val bhj = plan.collect { case j: BroadcastHashJoinExec => j }.toSeq
    assert(bhj.size >= 2, s"expected 2 broadcast joins, got ${bhj.size}")
    val bex = plan.collect { case b: BroadcastExchangeExec => b }.toSeq
    assert(bex.nonEmpty)
  }

  test("bucket-capped posting self-join reuses a single posting exchange") {
    import org.apache.spark.sql.functions._
    import graft.operators.Dedup
    // the q41/q42 candidate-generation shape: window-capped postings
    // self-joined on the bucket keys — the window's hash exchange must be
    // REUSED by both join branches (the cap costs no second full shuffle
    // of the postings)
    val sh = Tables.documents(spark, sfDir)
      .select(col("doc_id"),
              graft.functions.NativeExprs.word_shingles(col("text")).as("sh"))
      .filter(size(col("sh")) > 0)
    val banded = Dedup.capBuckets(
      sh.select(col("doc_id"),
                posexplode(graft.functions.NativeExprs.minhash_band_keys(col("sh")))
                  .as(Seq("band", "bkey"))),
      Seq("band", "bkey"), maxBucket = 1000000L)
    val cand = banded.select(col("band"), col("bkey"), col("doc_id").as("a_id"))
      .join(banded.select(col("band"), col("bkey"), col("doc_id").as("b_id")),
            Seq("band", "bkey"))
      .filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id").distinct()
    val plan = executed(cand)
    val reused = plan.collect {
      case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => r
    }.toSeq
    assert(reused.nonEmpty,
      "the capped-posting exchange must be shared by both self-join branches")
  }

  test("q81: the simhash posting exchange is reused by both self-join branches") {
    // same contract as the q41/q42 shape above, for the banded-Hamming
    // retrieval: the signature computation + window cap must run ONCE,
    // with the second join branch reading the reused exchange
    val plan = executed(
      graft.operators.Dedup.queries("q81_simhash_neardup")(spark, sfDir))
    val reused = plan.collect {
      case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => r
    }.toSeq
    assert(reused.nonEmpty,
      "the capped simhash posting exchange must be shared by both join branches")
  }

  test("q242: the banded-signature exchange is reused by both self-join branches") {
    // the 64-hash md5 signature relation must compute ONCE: the explicit
    // repartition on (band, k) puts an identical shuffle under both
    // self-join branches, and the second branch must read the reused
    // exchange (without it the signature pass runs twice — measured as
    // q242's dominant cost in round 10). Pinned on the COMPUTE form —
    // the declared gate memoizes the flagged relation (r15), so its
    // executed plan is the sweep over checkpointed blocks and the
    // exchange contract lives in the build that runs once per session.
    val plan = executed(
      graft.operators.Dedup.lshRecallCore(
        graft.operators.Dedup.shingledCore(spark, sfDir)))
    val reused = plan.collect {
      case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => r
    }.toSeq
    assert(reused.nonEmpty,
      "the banded md5-signature exchange must be shared by both join branches")
  }

  test("q102/q110/q242 declared gates: steady state reads the memoized blocks, never a corpus scan") {
    // ADVICE r15: the compute-form pins above leave the DECLARED
    // (memoized) read path's executed plan unpinned. The declared
    // gates' contract is that steady state is the fusion/sweep over
    // checkpointed blocks — a regression that re-derives a half (a
    // dropped localCheckpoint, a memo key miss) would re-scan the
    // corpus parquet every rep. Pin: the executed plan contains ZERO
    // FileSourceScanExec — every leaf is the memoized RDD (plus
    // driver-literal relations), so no corpus-side shuffle or
    // corpus-wide window can exist below the fusion stage either.
    for (q <- Seq("q102_hybrid_search", "q110_hybrid_weighted",
                  "q242_lsh_recall")) {
      val plan = executed(SparkEntry.queries(q)(spark, sfDir))
      val scans = plan.collect { case f: FileSourceScanExec => f }
      assert(scans.isEmpty,
        s"$q declared gate re-scans the corpus: " +
          scans.map(_.tableIdentifier.toString).mkString(", "))
    }
  }

  test("q286: forced broadcasts are driver-literal codebooks only — density joins are AQE's call") {
    // the production mining path must never FORCE a corpus-derived
    // relation (the side-sized density aggregates) onto the driver: a
    // broadcast() hint is unretractable at 100 TB, while AQE broadcasts
    // from the observed runtime size only while it genuinely fits. The
    // only legitimate hints in this plan are the k-row trained-codebook
    // LocalRelations (constant-size by construction).
    val df = SparkEntry.queries("q286_margin_mine_probed")(spark, sfDir)
    val hints = df.queryExecution.analyzed.collect {
      case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint => h
    }
    assert(hints.nonEmpty, "expected the codebook broadcast hints")
    hints.foreach { h =>
      val leaves = h.child.collectLeaves()
      assert(leaves.nonEmpty && leaves.forall(
        _.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.LocalRelation]),
        s"forced broadcast over a non-literal relation: " +
          s"${leaves.map(_.nodeName).mkString(", ")} — corpus-derived " +
          "sides must be left to AQE (VERDICT r12)")
    }
  }

  test("hot-path queries execute inside WholeStageCodegen spans") {
    // the per-row kernels of the scan-heavy queries must sit inside
    // codegen stages (no interpreted Project/Filter on the hot path);
    // native expressions (CosineSim, WordShingles, ...) implement
    // doGenCode, so their pipelines fuse
    Seq("q2_filter", "q30_tokens", "q40_cosine_topk", "q93_quality_model")
      .foreach { name =>
        val df = SparkEntry.queries(name)(spark, sfDir)
        df.collect()
        // descend through AQE wrappers — the final plan hides behind
        // AdaptiveSparkPlanExec/QueryStageExec, which are not `children`
        def all(p: org.apache.spark.sql.execution.SparkPlan):
            Seq[org.apache.spark.sql.execution.SparkPlan] = {
          val nested = p match {
            case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
              all(a.executedPlan)
            case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
              all(q.plan)
            case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
              all(r.child)
            case _ => Nil
          }
          (p +: p.children.flatMap(all)) ++ nested
        }
        val codegenStages = all(df.queryExecution.executedPlan).collect {
          case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
        }
        assert(codegenStages.nonEmpty,
               s"$name: expected at least one WholeStageCodegen span")
      }
  }

  test("q102: both retrieval halves broadcast their small side; no corpus-wide window") {
    // pinned on the COMPUTE form: the declared gate reads the memoized
    // rankedHalves (r15) whose executed plan is the fusion over
    // checkpointed blocks — the broadcast/window contracts live in the
    // halves build that runs once per session
    val plan = executed(graft.operators.Retrieval.rrfFuse(
      graft.operators.Retrieval.lexicalRanks(spark, sfDir)
        .select("q_id", "doc_id", "rnk"),
      graft.operators.Retrieval.vectorRanks(spark, sfDir)
        .select("q_id", "doc_id", "rnk")))
    // lexical qterms + corpus stats and the vector query set all ride
    // broadcasts — the corpus scans are never shuffled for scoring
    assert(plan.exists(_.isInstanceOf[BroadcastHashJoinExec]),
      "expected broadcast joins for the query-side small tables")
    // the only WindowExec allowed is the fusion re-rank over the fused
    // top-k lists (≤ 2k rows per query, bounded by construction): its
    // input must come from the rank join, never a corpus-sized scan
    val windows = plan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w }
    assert(windows.nonEmpty, "fusion re-rank window expected")
    windows.foreach { w =>
      // allNodes descends through AQE query stages, unlike SparkPlan.collect
      val belowWindow = w.children.flatMap(allNodes)
      val scansBelow = belowWindow.collect { case f: FileSourceScanExec => f }
      val aggsBelow = belowWindow.collect {
        case a: org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec => a }
      assert(scansBelow.isEmpty || aggsBelow.nonEmpty,
        "the fusion window must rank the fused top-k aggregate outputs, " +
          "not sort a raw corpus scan")
    }
  }

  test("q116: join-free — one aggregation pipeline, no join operator at all") {
    val plan = executed(SparkEntry.queries("q116_source_overlap")(spark, sfDir))
    // source rides the explode and the per-hash source set is collected
    // by aggregation, so the whole matrix is shuffles + map work: any
    // join node means the doc-keyed or vocab self-join shape crept back
    val joins = plan.filter(n =>
      n.isInstanceOf[org.apache.spark.sql.execution.joins.BaseJoinExec])
    assert(joins.isEmpty,
      s"q116 must not join; found ${joins.map(_.nodeName).mkString(", ")}")
  }

  test("q113: joins are doc-keyed only — the window vocabulary never joins itself") {
    val plan = executed(SparkEntry.queries("q113_window_novelty")(spark, sfDir))
    val joins = plan.collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j }
    assert(joins.nonEmpty, "expected the doc-sized novelty join")
    joins.foreach { j =>
      val keys = (j.leftKeys ++ j.rightKeys).map(_.sql.toLowerCase)
      assert(keys.forall(k => k.contains("doc_id") && !k.contains("wh")),
        s"q113 join must be keyed by doc_id, got: ${keys.mkString(", ")}")
    }
  }

  test("q1: aggregation is two-phase (partial before the exchange)") {
    val plan = executed(Relational.queries("q1_agg")(spark, sfDir))
    val aggModes = plan.collect {
      case a: org.apache.spark.sql.execution.aggregate.HashAggregateExec =>
        a.aggregateExpressions.map(_.mode)
    }.toSeq.flatten
    import org.apache.spark.sql.catalyst.expressions.aggregate.{Final, Partial}
    assert(aggModes.contains(Partial), "map-side partial aggregation missing")
    assert(aggModes.contains(Final))
  }

  test("q140/q141/q145/q147: global top-k plans as TakeOrderedAndProject") {
    // bounded per-partition heaps + a driver merge — never a full sort of
    // the vocabulary/key space
    for (q <- Seq("q140_heavy_hitters", "q141_corpus_drift",
                  "q145_skew_report", "q147_bpe_pairs")) {
      val nodes = executed(SparkEntry.queries(q)(spark, sfDir))
      assert(nodes.exists(
          _.isInstanceOf[org.apache.spark.sql.execution.TakeOrderedAndProjectExec]),
        s"$q: top-k did not plan as TakeOrderedAndProject")
    }
  }

  test("q139: greedy rerank plans without windows or cartesian products") {
    val nodes = executed(SparkEntry.queries("q139_mmr_rerank")(spark, sfDir))
    assert(!nodes.exists(
        _.isInstanceOf[org.apache.spark.sql.execution.window.WindowExec]),
      "a window sort leaked into the MMR plan")
    assert(!nodes.exists(
        _.isInstanceOf[org.apache.spark.sql.execution.joins.CartesianProductExec]),
      "a non-broadcast cartesian product leaked into the MMR plan")
  }

  test("q156/q157/q158: rerank joins broadcast-only, no windows, no shuffle joins") {
    import graft.operators.Similarity
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    import org.apache.spark.sql.execution.window.WindowExec
    // (the pruned index scan itself is pinned in SimilaritySpec — it runs
    // inside the localCheckpoint; this pins the post-retrieve plan)
    for (name <- Seq("q156_ann_rerank", "q157_index_append",
                     "q158_index_tombstone")) {
      val plan = executed(Similarity.queries(name)(spark, sfDir))
      assert(plan.exists(_.isInstanceOf[BroadcastHashJoinExec]),
        s"$name: the candidate/query joins must broadcast")
      assert(!plan.exists(_.isInstanceOf[SortMergeJoinExec]),
        s"$name: a shuffle join has no place in the rerank plan")
      assert(!plan.exists(_.isInstanceOf[WindowExec]),
        s"$name: ranking must stay in the bounded heap, not a window sort")
    }
  }

  test("q159: the stats read prunes to the id/cell columns") {
    import graft.operators.Similarity
    val plan = executed(Similarity.queries("q159_index_stats")(spark, sfDir))
    val scans = plan.collect { case f: FileSourceScanExec => f }
    assert(scans.nonEmpty)
    // the occupancy count collapses to the partition column alone — no
    // scan in the plan may read the code bytes (or any data column: the
    // index scan's requiredSchema prunes to empty, counting rows per
    // centroid from footers + partition values)
    assert(scans.forall(!_.requiredSchema.fieldNames.contains("codes")),
      "stats scan must prune the codes column")
  }

  test("q137: the sampling heap aggregates partially before the shuffle") {
    val nodes = executed(SparkEntry.queries("q137_weighted_sample")(spark, sfDir))
    val modes = nodes.collect {
      case a: org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec =>
        a.aggregateExpressions.map(_.mode)
    }.flatten
    import org.apache.spark.sql.catalyst.expressions.aggregate.{Final, Partial}
    assert(modes.contains(Partial),
      "TopKAgg partial phase missing — each map partition must send <= k rows")
    assert(modes.contains(Final))
  }

  test("q163: the audit aggregate folds partially — one buffer per map task") {
    val nodes = executed(SparkEntry.queries("q163_embedding_audit")(spark, sfDir))
    val modes = nodes.collect {
      case a: org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec =>
        a.aggregateExpressions.map(_.mode)
    }.flatten
    import org.apache.spark.sql.catalyst.expressions.aggregate.{Final, Partial}
    assert(modes.contains(Partial),
      "VecStatsAgg partial phase missing — the shuffle must carry buffers, not rows")
    assert(modes.contains(Final))
    // and no explode feeds the aggregate: the d-fanout happens AFTER it
    val gens = nodes.collect {
      case g: org.apache.spark.sql.execution.GenerateExec => g }
    assert(gens.size <= 1, "only the post-agg posexplode may generate rows")
  }

  test("q35/q244: the prefix posting exchange is shared by both " +
       "self-join branches (prefix plan, no full posting self-join)") {
    // both declared queries are the memoized τ = 0.8 pair core + sort
    // (checkpoint truncates the lineage out of their executed plans), so
    // the algorithm's plan shape is pinned on the compute form they share
    val plan = executed(
      graft.operators.TextAnalysis.prefixJaccardPairsCompute(spark, sfDir))
    // the prefix rank is present (a doc-grain window, never global)...
    assert(plan.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.window.WindowExec]),
      "prefixJaccardPairsCompute: the rarest-first prefix rank window is missing")
    // ...and the candidate self-join reads ONE ranked-prefix exchange
    // from both branches — a full inverted-index self-join would have
    // no window above its (identical, also reused) posting branches,
    // so the window+reuse pair pins the prefix shape specifically
    assert(plan.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.exchange.ReusedExchangeExec]),
      "prefixJaccardPairsCompute: the prefix posting exchange must be " +
        "shared, not rebuilt per branch")
  }

  test("q174: both candidate-join branches read ONE ranked posting " +
       "subtree (reused rank-window exchange), prefix filter on the " +
       "contained side only") {
    // r15: the full side is ranked TOO (the containment positional
    // bound needs brn), but through the SAME doc-grain rank window —
    // the join must reuse that exchange, never compute the rank twice
    // (the prefixVerifiedPairs discipline). The prefix FILTER stays
    // asymmetric: containment's overlap ceiling uses only the
    // contained doc's size.
    val plan = executed(SparkEntry.queries("q174_containment")(spark, sfDir))
    val sJoins = plan.collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec
        if (j.leftKeys ++ j.rightKeys)
          .forall(_.references.exists(_.name == "s")) => j
    }
    assert(sJoins.nonEmpty, "the shingle-keyed candidate join is missing")
    val windowSides = sJoins.map { j =>
      Seq(j.children.head, j.children(1)).count(side => allNodes(side).exists(
        _.isInstanceOf[org.apache.spark.sql.execution.window.WindowExec]))
    }
    assert(windowSides.exists(_ == 2),
      s"both candidate sides must be rank-window-fed, got $windowSides")
    assert(plan.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.exchange.ReusedExchangeExec]),
      "the shared rank-window exchange must be REUSED by the second " +
        "branch, not rebuilt")
  }

  test("q175: stats come back as ONE broadcast row — the corpus side " +
       "never sort-merge joins or shuffles for the flagging pass") {
    val nodes = executed(SparkEntry.queries("q175_outlier_audit")(spark, sfDir))
    assert(nodes.exists(_.isInstanceOf[BroadcastExchangeExec]),
      "per-dim stats must broadcast back, not join by shuffle")
    assert(!nodes.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.joins.SortMergeJoinExec]),
      "no sort-merge join: the one-row stats side must broadcast")
    // the stats pass itself still folds partially (the q163 contract)
    val modes = nodes.collect {
      case a: org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec =>
        a.aggregateExpressions.map(_.mode)
    }.flatten
    import org.apache.spark.sql.catalyst.expressions.aggregate.Partial
    assert(modes.contains(Partial),
      "VecStatsAgg partial phase missing in the stats subplan")
  }

  test("q176: funnel is one grouped pass — no window sort, no self-join") {
    val nodes = executed(SparkEntry.queries("q176_funnel")(spark, sfDir))
    assert(!nodes.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.window.WindowExec]),
      "funnel must not rank via window functions")
    assert(!nodes.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.joins.SortMergeJoinExec]),
      "funnel must not self-join events per stage")
    // the per-user collect folds partially before the user_id shuffle
    val modes = nodes.collect {
      case a: org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec =>
        a.aggregateExpressions.map(_.mode)
    }.flatten
    import org.apache.spark.sql.catalyst.expressions.aggregate.Partial
    assert(modes.contains(Partial), "collect_list partial phase missing")
  }

  test("q186: the vocabulary exchange is reused across BPE rounds " +
       "(un-memoized training form)") {
    // the declared q186/q202 read the memoized per-round-checkpointed
    // merge artifact (lineage truncated), so the one-lazy-plan training
    // shape is pinned on the compute form (the q35/q244 precedent)
    val (t1, t2, t3) = graft.operators.Stats.bpeMergeChainCompute(spark, sfDir)
    val merged = t1.withColumn("step", org.apache.spark.sql.functions.lit(1L))
      .unionByName(t2.withColumn("step", org.apache.spark.sql.functions.lit(2L)))
      .unionByName(t3.withColumn("step", org.apache.spark.sql.functions.lit(3L)))
    val nodes = executed(merged)
    val reused = nodes.collect {
      case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => r
    }
    assert(reused.nonEmpty,
      "each round re-reads the prior vocabulary — the exchange must be " +
        "shared, not recomputed per consumer")
  }

  test("q190: transitions build from per-user arrays — no corpus-wide " +
       "window sort") {
    val nodes = executed(SparkEntry.queries("q190_transitions")(spark, sfDir))
    assert(!nodes.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.window.WindowExec]),
      "the transition matrix must not rank via window functions")
  }

  test("q171: the salted join fans the dim side out by the salt factor " +
       "and joins on __salt") {
    import graft.operators.Skew
    val nodes = executed(Skew.queries("q171_salted_join")(spark, sfDir))
    // the dim side replicates via explode(sequence(0, salts-1)) —
    // constant-folded by Catalyst into explode(<literal array>) whose
    // length IS the replication factor; assert it produces __salt
    val gens = nodes.collect {
      case g: org.apache.spark.sql.execution.GenerateExec => g }
    val saltGens = gens.filter(_.generatorOutput.exists(_.name == "__salt"))
    assert(saltGens.nonEmpty, "expected an explode producing __salt on the dim side")
    val fanouts = saltGens.flatMap(_.generator.children.collect {
      case org.apache.spark.sql.catalyst.expressions.Literal(a:
          org.apache.spark.sql.catalyst.util.ArrayData, _) => a.numElements()
    })
    assert(fanouts.contains(Skew.q171Salts),
      s"expected the ${Skew.q171Salts}-way dim fan-out, got $fanouts")
    // and the salt is a JOIN KEY (the hot key becomes salts sub-keys)
    val joins = nodes.collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j }
    assert(joins.exists(j =>
        j.leftKeys.exists(_.toString.contains("__salt")) &&
        j.rightKeys.exists(_.toString.contains("__salt"))),
      s"expected __salt among the equi-join keys; joins: " +
        s"${joins.map(j => j.leftKeys.mkString(","))}")
  }

  test("round-9b plan shapes: map-side fan-outs and windowless day grains") {
    // q233: the skip-gram pair fan-out must be the nested map-side
    // transform — a positional self-join would put a join in the plan
    val sg = executed(SparkEntry.queries("q233_skipgram_counts")(spark, sfDir))
    assert(!sg.exists(_.isInstanceOf[
      org.apache.spark.sql.execution.joins.BaseJoinExec]),
      "q233 must not join; the pair fan-out is map-side")
    // q213: trigrams come from lead(), never from a collected timeline
    val paths = SparkEntry.queries("q213_event_paths")(spark, sfDir)
    assert(!paths.queryExecution.executedPlan.toString.contains("collect_list"),
      "q213 must not buffer timelines via collect_list")
    // q230: the rolling distinct is join+aggregate only — no window op
    val roll = executed(SparkEntry.queries("q230_rolling_active")(spark, sfDir))
    assert(!roll.exists(_.isInstanceOf[
      org.apache.spark.sql.execution.window.WindowExec]),
      "q230 must not window; the cover-day explode replaces it")
    // q214: decay weights are shifts, not pow()
    assert(!SparkEntry.queries("q214_decayed_counts")(spark, sfDir)
      .queryExecution.executedPlan.toString.toLowerCase.contains("pow"),
      "q214 weights must be shiftleft, not POW")
  }
}
