package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
import org.apache.spark.sql.functions._

/** Semantics + plan-shape checks for the round-5 pack (Curation2).
  * Oracle parity is covered by the Verify gate; these assert what the
  * oracle can't see — plan shapes, equivalence of the heap-aggregate
  * sampler with its window formulation, and the sharded dedup's output
  * equality with the plain anti-join.
  */
class Curation2Spec extends SparkTestBase {

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

  test("q91 boilerplate: hot-set is broadcast; text rebuild is map-side") {
    val plan = collectAll(executed("q91_boilerplate"))
    // the one-row hot aggregate joins in as a broadcast nested loop
    // (cross join of a singleton) — the corpus side must NOT shuffle for
    // the rebuild; the only exchanges belong to the df-count aggregate
    // and the final orderBy's range partitioning
    assert(plan.exists(_.isInstanceOf[BroadcastNestedLoopJoinExec]),
           "hot-chunk set must broadcast")
    val shuffles = plan.collect { case s: ShuffleExchangeExec => s }
    assert(shuffles.size <= 3,
           s"expected <=3 exchanges (df agg pair + sort), got ${shuffles.size}")
  }

  test("q91 boilerplate: dropped spans are exactly the df>=2 chunks") {
    val out = SparkEntry.queries("q91_boilerplate")(spark, sfDir)
      .select("doc_id", "n_chunks", "n_dropped", "clean_text").collect()
    assert(out.nonEmpty)
    // token conservation per doc: clean_text holds exactly the kept chunks
    out.foreach { r =>
      val kept = r.getLong(1) - r.getLong(2)
      val words = r.getString(3)
      if (kept == 0) assert(words.isEmpty)
      else assert(words.nonEmpty)
    }
    // cross-doc consistency: a chunk dropped anywhere is dropped everywhere
    // (df is a corpus-level property) — spot-check via recomputation
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), expr(graft.functions.TextExprs.let1(
        graft.functions.TextExprs.toks, "w",
        """transform(sequence(0, cast(ceil(size(w) / 8.0) as int) - 1),
                     i -> array_join(slice(w, i * 8 + 1, 8), ' '))""")).as("chunks"))
      .select(col("doc_id"), explode(col("chunks")).as("chunk"))
    val dfCounts = docs.groupBy("chunk")
      .agg(count_distinct(col("doc_id")).as("df"))
    val expectDropped = docs.join(dfCounts, "chunk").filter(col("df") >= 2)
      .groupBy("doc_id").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.foreach { r =>
      assert(r.getLong(2) == expectDropped.getOrElse(r.getLong(0), 0L),
             s"doc ${r.getLong(0)}: n_dropped mismatch")
    }
  }

  test("q91 hashed scale variant equals the declared string form") {
    val declared = SparkEntry.queries("q91_boilerplate")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val hashed = graft.operators.Curation2.boilerplateHashed(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(declared.sameElements(hashed))
  }

  test("q92 stratified sample: heap aggregate == window formulation") {
    val viaAgg = SparkEntry.queries("q92_stratified_sample")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy(col("score").desc, col("doc_id"))
    val viaWindow = Tables.documents(spark, sfDir)
      .select(col("source"), col("doc_id"),
              expr("cast((doc_id * 2654435761) % 1048576 as double)").as("score"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select(col("source"), col("rnk").cast("long"), col("doc_id"))
      .orderBy("source", "rnk")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(viaAgg.sameElements(viaWindow))
  }

  test("q92 plan: no Window operator — sampling is a partial aggregate") {
    val plan = collectAll(executed("q92_stratified_sample"))
    assert(!plan.exists(_.isInstanceOf[org.apache.spark.sql.execution.window.WindowExec]),
           "sampler must run as an aggregate, not a window sort")
  }

  test("q93 quality model: keep flag is consistent with the score sign") {
    val rows = SparkEntry.queries("q93_quality_model")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val score = r.getDouble(2); val keep = r.getLong(3)
      // score column is floor-truncated; the keep flag uses the raw score.
      // Truncation only moves scores DOWN, so keep==1 implies truncated
      // score > -1e-6 and keep==0 implies truncated score <= 0.
      if (keep == 1) assert(score > -1e-6) else assert(score <= 0)
    }
    val kept = rows.count(_.getLong(3) == 1)
    assert(kept > 0 && kept < rows.length, "model must split the corpus")
  }

  test("q94 domain mix: rates honor weights and kept counts match rates") {
    val rows = SparkEntry.queries("q94_domain_mix")(spark, sfDir).collect()
    val bySource = rows.map(r => r.getString(0) ->
      (r.getLong(1), r.getDouble(2), r.getLong(3))).toMap
    val weighted = Set("src0", "src1", "src2", "src3", "src4")
    bySource.foreach { case (src, (n, rate, kept)) =>
      assert(rate > 0 && rate <= 1.0)
      assert(kept <= n)
      // weighted sources get 2x the rate of unweighted (both uncapped here)
      if (weighted(src)) bySource.filterNot(kv => weighted(kv._1)).foreach {
        case (_, (_, r2, _)) =>
          if (rate < 1.0 && r2 < 1.0)
            assert(math.abs(rate - 2 * r2) < 1e-3, s"$src rate $rate vs $r2")
      }
    }
  }

  test("q96 knn classify: vote structure and window-formulation parity") {
    val out = SparkEntry.queries("q96_knn_classify")(spark, sfDir).collect()
    assert(out.nonEmpty)
    val labelDomain = Tables.embeddings(spark, sfDir)
      .filter(col("vec_id") % 10 =!= 0)
      .select("label").distinct().collect().map(_.getInt(0).toLong).toSet
    out.foreach { r =>
      assert(r.getLong(2) >= 1 && r.getLong(2) <= 5, "votes in [1,5]")
      assert(labelDomain(r.getLong(1)), "pred label from labeled domain")
    }
    // parity with the window formulation (the oracle's shape)
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"), col("label"))
    val q = e.filter(col("vec_id") % 10 === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
    val labeled = e.filter(col("vec_id") % 10 =!= 0)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(col("cos").desc, col("vec_id"))
    val w2 = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(col("votes").desc, col("label"))
    val expect = labeled.crossJoin(broadcast(q))
      .withColumn("cos",
        graft.functions.NativeExprs.cosine_sim(col("embedding"), col("qv")))
      .withColumn("rnk", row_number().over(w)).filter(col("rnk") <= 5)
      .groupBy("q_id", "label").agg(count(lit(1)).as("votes"))
      .withColumn("pr", row_number().over(w2)).filter(col("pr") === 1)
      .select(col("q_id"), col("label").cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.foreach { r =>
      assert(expect(r.getLong(0)) == r.getLong(1),
             s"query ${r.getLong(0)}: pred mismatch vs window formulation")
    }
  }

  test("q97 bm25: heap-ranked, no window; ranks contiguous") {
    val plan = collectAll(executed("q97_bm25"))
    assert(!plan.exists(_.isInstanceOf[org.apache.spark.sql.execution.window.WindowExec]),
           "global top-10 must run as the heap aggregate, not a window sort")
    val rows = SparkEntry.queries("q97_bm25")(spark, sfDir).collect()
    assert(rows.map(_.getLong(0)).toSeq == (1L to rows.length).toSeq)
    assert(rows.forall(_.getDouble(2) > 0))
  }

  test("q98 filtered ann: every neighbor passes the metadata predicate") {
    val enDocs = Tables.documents(spark, sfDir)
      .filter(col("lang") === "en").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val rows = SparkEntry.queries("q98_filtered_ann")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(enDocs(r.getLong(2)),
      s"neighbor ${r.getLong(2)} is not an en doc — pre-filter violated"))
  }

  test("q100 incremental near-dup == q42's cross-side pairs") {
    val inc = SparkEntry.queries("q100_incremental_neardup")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val full = SparkEntry.queries("q42_minhash_lsh")(spark, sfDir)
      .filter(col("a_id") < 250 && col("b_id") >= 250)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(inc == full,
      "batch-vs-corpus join must produce exactly the cross-side subset of the self-join")
    inc.foreach { case (a, b, _) => assert(a < 250 && b >= 250) }
  }

  test("q95 sharded bloom dedup == plain anti-join (and q76 contract)") {
    val sharded = SparkEntry.queries("q95_dedup_bloom_sharded")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val docs = Tables.documents(spark, sfDir)
    val existing = docs.filter(col("doc_id") < 250).select(md5(col("text")).as("sig"))
    val plain = docs.filter(col("doc_id") >= 250)
      .select(col("doc_id"), md5(col("text")).as("sig"))
      .join(existing, Seq("sig"), "left_anti")
      .select("doc_id", "sig").orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(sharded.sameElements(plain))
  }

  test("q210: curriculum bins replay from the q93 scores and cover the " +
       "corpus exactly once") {
    val sc = SparkEntry.queries("q93_quality_model")(spark, sfDir).collect()
      .map(r => (r.getLong(1), r.getDouble(2),
                 math.round(r.getDouble(2) * 1000000)))
    val sorted = sc.map(_._2).sorted
    def q(p: Double): Double = {
      val rank = (sorted.length - 1) * p
      val lo = sorted(rank.toInt)
      lo + (sorted(math.ceil(rank).toInt) - lo) * (rank - rank.toInt)
    }
    val ts = Seq(q(0.25), q(0.5), q(0.75))
    val want = sc.groupBy { case (_, s, _) => 1L + ts.count(s > _) }
      .map { case (bin, rows) =>
        (bin, rows.length.toLong, rows.map(_._1).sum,
         math.floor(rows.map(_._3).sum.toDouble / rows.length) / 1000000)
      }.toSeq.sortBy(_._1)
    val got = SparkEntry.queries("q210_curriculum_bins")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
                           r.getDouble(3)))
    assert(got.toSeq == want, s"got ${got.toSeq}\nwant $want")
    assert(got.map(_._2).sum == sc.length.toLong, "bins must partition")
    assert(got.map(_._1).toSeq == (1L to 4L), "all four quartile bins")
    // the curriculum signal: mean score strictly increases with bin
    assert(got.map(_._4).sliding(2).forall(p => p(0) < p(1)))
  }

  test("q207: disagreement gaps replay from the q42 pair set + q93 scores") {
    val pairs = SparkEntry.queries("q42_minhash_lsh")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val isc = SparkEntry.queries("q93_quality_model")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> math.round(r.getDouble(2) * 1000000)).toMap
    val edges = pairs.flatMap { case (a, b) => Seq(a -> b, b -> a) }
    val want = edges.groupBy(_._1).map { case (id, es) =>
      val nsum = es.map(e => isc(e._2)).sum
      val nbrAvg = math.floor(nsum.toDouble / es.length) / 1000000
      val score = isc(id).toDouble / 1000000
      (id, es.length.toLong, score, nbrAvg,
       math.floor(math.abs(score - nbrAvg) * 1000) / 1000)
    }.toSeq.sortBy(_._1)
    val got = SparkEntry.queries("q207_quality_disagree")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
                           r.getDouble(3), r.getDouble(4)))
    assert(got.toSeq == want, s"got ${got.take(3).toSeq}… want ${want.take(3)}…")
    // near-dups mostly agree: the typical gap is small, and the audit
    // covers exactly the docs that have at least one neighbor
    assert(got.nonEmpty && got.map(_._1).toSet == edges.map(_._1).toSet)
  }

  test("q241 ensemble: percentile fusion replays from the three gated signals") {
    val got = SparkEntry.queries("q241_quality_ensemble")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
                           r.getLong(3), r.getLong(4), r.getLong(5)))
    val src = Tables.documents(spark, sfDir).select("doc_id", "source")
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    val v93 = SparkEntry.queries("q93_quality_model")(spark, sfDir)
      .collect().map(r => (r.getLong(0),
        math.round(r.getDouble(2) * 1000000))).toMap
    val v119 = SparkEntry.queries("q119_lm_score")(spark, sfDir)
      .collect().map(r => (r.getLong(0),
        math.round(r.getDouble(2) * 1000000))).toMap
    val v142 = SparkEntry.queries("q142_token_entropy")(spark, sfDir)
      .collect().map(r => (r.getLong(0),
        math.round(r.getDouble(3) * 1000000))).toMap
    val ids = v93.keySet & v119.keySet & v142.keySet
    def pcts(v: Map[Long, Long], desc: Boolean): Map[Long, Long] =
      ids.groupBy(src).values.flatMap { grp =>
        val sorted = grp.toSeq.sortBy(id =>
          (if (desc) -v(id) else v(id), id))
        val n = sorted.length
        sorted.zipWithIndex.map { case (id, i) =>
          id -> (if (n > 1)
            math.floor(i.toDouble / (n - 1) * 1000000).toLong else 0L) }
      }.toMap
    val (p93, p119, p142) =
      (pcts(v93, desc = false), pcts(v119, desc = true),
       pcts(v142, desc = false))
    val want = ids.toSeq.sorted.map(id => (id, src(id), p93(id), p119(id),
      p142(id), p93(id) + p119(id) + p142(id)))
    assert(got.toSeq == want)
    // fusion disagrees with any single signal somewhere (ensembling is
    // not a rename of one input)
    assert(got.exists(t => t._6 != 3 * t._3))
  }
}
