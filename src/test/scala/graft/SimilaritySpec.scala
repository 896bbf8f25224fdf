package graft

import graft.operators.{Dedup, Similarity, TextAnalysis}
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkTestBase {

  test("q40 brute-force top-k: neighbors sorted by cosine, no self-matches") {
    val rows = Similarity.queries("q40_cosine_topk")(spark, sfDir).collect()
    assert(rows.length == 50) // 10 queries × top-5
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.keySet == (0L until 10L).toSet)
    byQ.values.foreach { g =>
      val cs = g.sortBy(_.getLong(1)).map(_.getDouble(3))
      assert(cs.sameElements(cs.sortBy(-_)), "cosines must descend with rank")
      assert(g.forall(r => r.getLong(2) != r.getLong(0)), "self-match leaked")
    }
  }

  test("LSH signatures: recall 1.0 on constructed clustered vectors") {
    import spark.implicits._
    // 20 clusters × 5 members; members = center + tiny noise → intra-cluster
    // cosine ≈ 1, inter ≈ random. All intra-cluster pairs must be found.
    val rnd = new scala.util.Random(7)
    val centers = Seq.fill(20)(Array.fill(64)(rnd.nextGaussian()))
    val vecs = for {
      (c, ci) <- centers.zipWithIndex
      m <- 0 until 5
    } yield (ci.toLong * 5 + m, c.map(x => (x + rnd.nextGaussian() * 0.01).toFloat))
    val df = vecs.toDF("vec_id", "embedding")
      .select(col("vec_id"), graft.functions.VectorExprs.asDouble("embedding").as("v"))
      .withColumn("nrm", graft.functions.VectorExprs.norm("v"))
    val sig = Similarity.withSignatures(df, nBands = 2, bitsPerBand = 8)
      .select("vec_id", "sig_0", "sig_1").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // every intra-cluster pair must share at least one band bucket
    val missed = for {
      ci <- 0 until 20; i <- 0 until 5; j <- (i + 1) until 5
      a = ci.toLong * 5 + i; b = ci.toLong * 5 + j
      if sig(a)._1 != sig(b)._1 && sig(a)._2 != sig(b)._2
    } yield (a, b)
    assert(missed.isEmpty, s"LSH missed ${missed.size} near-identical pairs")
  }

  test("q45 IVF: same-cell search finds cluster neighbors (testdata)") {
    val ivf = Similarity.queries("q45_ann_ivf")(spark, sfDir).collect()
    assert(ivf.nonEmpty)
    // every query returns <=5 ranked, cosine-descending neighbors from its cell
    ivf.groupBy(_.getLong(0)).foreach { case (_, g) =>
      val cs = g.sortBy(_.getLong(1)).map(_.getDouble(3))
      assert(cs.sameElements(cs.sortBy(-_)))
    }
  }

  test("IVF trained codebook: recall@5 beats first-k on clustered data, parity on random") {
    import spark.implicits._
    import org.apache.spark.sql.DataFrame

    def firstK(e: DataFrame, k: Int): Array[Array[Double]] =
      e.filter(col("vec_id") < k).orderBy("vec_id")
        .select(graft.functions.VectorExprs.asDouble("embedding")).collect()
        .map(_.getSeq[Double](0).toArray)

    def top5(df: DataFrame): Set[(Long, Long)] = df
      .groupBy("q_id")
      .agg(graft.functions.TopKAgg.top_k_by_score(col("cos"), col("vec_id"), 5).as("top"))
      .select(col("q_id"), explode(expr("transform(top, x -> x.id)")).as("n_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    // recall@5 of nprobe=1 cell search vs exact brute force, nQ queries
    def recall(e: DataFrame, cents: Array[Array[Double]], nQ: Int): Double = {
      val assigned = Similarity.ivfAssignCodebook(spark, e, cents)
      val qs = assigned.filter(col("vec_id") < nQ)
        .select(col("vec_id").as("q_id"), col("centroid").as("q_centroid"),
                col("embedding").as("qv"))
      val got = top5(
        assigned.join(broadcast(qs), col("centroid") === col("q_centroid"))
          .filter(col("vec_id") =!= col("q_id"))
          .withColumn("cos",
            graft.functions.NativeExprs.cosine_sim(col("embedding"), col("qv"))))
      val brute = top5(
        e.crossJoin(broadcast(e.filter(col("vec_id") < nQ)
            .select(col("vec_id").as("q_id"), col("embedding").as("qv"))))
          .filter(col("vec_id") =!= col("q_id"))
          .withColumn("cos",
            graft.functions.NativeExprs.cosine_sim(col("embedding"), col("qv"))))
      got.intersect(brute).size.toDouble / brute.size
    }

    // Clustered corpus — the case IVF exists for: k-means discovers the
    // cluster structure, first-k centroids are arbitrary members.
    // (Measured: trained ~0.94 vs first-k ~0.58.)
    val rnd = new scala.util.Random(13)
    val centers = Seq.fill(25)(Array.fill(64)(rnd.nextGaussian()))
    val vecs = for { (c, ci) <- centers.zipWithIndex; m <- 0 until 20 }
      yield (ci.toLong * 20 + m, c.map(x => (x + rnd.nextGaussian() * 0.15).toFloat).toSeq)
    val ce = vecs.toDF("vec_id", "embedding")
    val trainedC = recall(ce, Similarity.trainCentroids(ce, Similarity.ivfK), nQ = 50)
    val firstkC = recall(ce, firstK(ce, Similarity.ivfK), nQ = 50)
    assert(trainedC > firstkC,
      s"k-means codebook must beat first-k on clustered data ($trainedC vs $firstkC)")

    // Testdata embeddings are near-random (no planted neighbor structure):
    // both codebooks yield balanced cells with the same expected scanned
    // fraction, so recall parity IS the correct outcome — a quantizer
    // cannot recover structure that isn't there. Assert parity within a
    // small deterministic margin (everything here is seeded/exact).
    val e = Tables.embeddings(spark, sfDir).select(col("vec_id"), col("embedding"))
    val trainedR = recall(e, Similarity.trainCentroids(e, Similarity.ivfK), nQ = 100)
    val firstkR = recall(e, firstK(e, Similarity.ivfK), nQ = 100)
    assert(trainedR >= firstkR - 0.05,
      s"trained codebook must not lose recall on structureless data ($trainedR vs $firstkR)")
  }

  test("q81 banded SimHash pairs = brute-force Hamming pairs (recall exactly 1)") {
    // brute force over all collected signatures — 500 docs, driver-side
    val sigs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), graft.functions.NativeExprs.simhash_sig(col("text")).as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val brute = (for {
      (a, as) <- sigs; (b, bs) <- sigs if a < b
      h = java.lang.Long.bitCount(as ^ bs) if h <= 3
    } yield (a, b, h.toLong)).toSet
    val banded = Dedup.queries("q81_simhash_neardup")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(banded == brute,
      s"banded retrieval must find EXACTLY the Hamming<=3 pairs (pigeonhole over 4 bands); " +
        s"got ${banded.size} vs ${brute.size}")
    assert(brute.nonEmpty, "testdata must contain planted near-dups")
  }

  test("q88 fuzzy join = brute-force Levenshtein<=1 pairs (recall exactly 1)") {
    def lev(a: String, b: String): Int = {
      val dp = Array.tabulate(b.length + 1)(identity)
      for (i <- 1 to a.length) {
        var prev = dp(0); dp(0) = i
        for (j <- 1 to b.length) {
          val t = dp(j)
          dp(j) = math.min(math.min(dp(j) + 1, dp(j - 1) + 1),
                           prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
          prev = t
        }
      }
      dp(b.length)
    }
    val names = Tables.customer(spark, sfDir)
      .select(col("c_custkey"), col("c_name")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val brute = (for {
      (a, an) <- names; (b, bn) <- names if a < b
      dd = lev(an, bn) if dd <= 1
    } yield (a, b, dd.toLong)).toSet
    val got = Dedup.queries("q88_fuzzy_join")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == brute,
      s"deletion-neighborhood retrieval must find exactly the distance<=1 pairs " +
        s"(${got.size} vs ${brute.size})")
    assert(brute.nonEmpty)
  }

  test("q82 PQ/ADC: shape, ascending distance, and cluster recall") {
    val rows = Similarity.queries("q82_ann_pq")(spark, sfDir).collect()
    assert(rows.length == 50) // 10 queries × top-5
    rows.groupBy(_.getLong(0)).foreach { case (q, g) =>
      val ds = g.sortBy(_.getLong(1)).map(_.getDouble(3))
      assert(ds.sameElements(ds.sorted), "ADC distance must ascend with rank")
      assert(g.forall(_.getLong(2) != q), "self-match leaked")
    }

    // clustered corpus: ADC over 8-byte codes must still put same-cluster
    // members first — the compression must not destroy neighbor structure
    import spark.implicits._
    val rnd = new scala.util.Random(29)
    val centers = Seq.fill(20)(Array.fill(64)(rnd.nextGaussian()))
    val vecs = for { (c, ci) <- centers.zipWithIndex; m <- 0 until 10 }
      yield (ci.toLong * 10 + m, c.map(x => (x + rnd.nextGaussian() * 0.05).toFloat).toSeq)
    val ce = vecs.toDF("vec_id", "embedding")
    val cb = Similarity.trainPq(ce)
    val codes = ce.select(col("vec_id"),
      graft.functions.NativeExprs.pq_encode(col("embedding"), cb).as("codes"))
    val qs = ce.filter(col("vec_id") % 10 === 0)
      .select(col("vec_id").as("q_id"),
              graft.functions.VectorExprs.asDouble("embedding").as("qv"))
    val top1 = codes.crossJoin(broadcast(qs))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("score", -graft.functions.NativeExprs.pq_adc(col("qv"), col("codes"), cb))
      .groupBy("q_id")
      .agg(graft.functions.TopKAgg.top_k_by_score(col("score"), col("vec_id"), 1).as("top"))
      .select(col("q_id"), expr("top[0].id").as("n_id"))
      .collect()
    val wrong = top1.filter(r => r.getLong(1) / 10 != r.getLong(0) / 10)
    assert(wrong.length <= 2,
      s"PQ top-1 should land in the query's cluster for nearly all queries; " +
        s"misses: ${wrong.map(_.getLong(0)).mkString(",")}")
  }

  test("IVF-PQ index: all-cells probe reproduces full-scan PQ ranking; pruned probe reads fewer partitions") {
    val dir = java.nio.file.Files.createTempDirectory("ivfpq").toString
    val e = Tables.embeddings(spark, sfDir).select(col("vec_id"), col("embedding"))
    // residual = false here so nprobe=k is comparable to a flat full-scan
    // PQ (a residual index re-expresses the query per cell; its quality
    // contract is the dedicated reconstruction test below)
    Similarity.ivfPqIndex(e, Similarity.ivfK, dir, residual = false)
    val qs = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"),
              graft.functions.VectorExprs.asDouble("embedding").as("qv"))

    // nprobe = k scans every cell → must equal the full-scan ADC ranking
    val all = Similarity.ivfPqSearch(spark, dir, qs, topK = 5, nprobe = Similarity.ivfK)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val cb = Similarity.trainPq(e)
    val full = e.select(col("vec_id"),
        graft.functions.NativeExprs.pq_encode(col("embedding"), cb).as("codes"))
      .crossJoin(broadcast(qs))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("score", -graft.functions.NativeExprs.pq_adc(col("qv"), col("codes"), cb))
      .groupBy("q_id")
      .agg(graft.functions.TopKAgg.top_k_by_score(col("score"), col("vec_id"), 5).as("top"))
      .select(col("q_id"), posexplode(col("top")).as(Seq("rnk0", "t")))
      .select(col("q_id"), (col("rnk0") + 1).cast("long").as("rnk"), col("t.id").as("n_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(all.toSet == full.toSet, "nprobe=k IVF-PQ must equal full-scan PQ ADC")

    // nprobe=1 scans a strict subset of the index partitions
    def collectAll(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.SparkPlan] = {
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      val nested = p match {
        case a: AdaptiveSparkPlanExec => collectAll(a.executedPlan)
        case q: QueryStageExec => collectAll(q.plan)
        case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => collectAll(r.child)
        case _ => Nil
      }
      (p +: p.children.flatMap(collectAll)) ++ nested
    }
    val one = Similarity.ivfPqSearch(spark, dir, qs, topK = 5, nprobe = 1)
    assert(one.collect().nonEmpty)
    // the CODES scan (the big side; the tiny _codebook sidecar scan is
    // unpartitioned by design) must be partition-pruned to the probed cells
    val scans = collectAll(one.queryExecution.executedPlan).collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec
          if f.schema.fieldNames.contains("codes") => f
    }
    assert(scans.nonEmpty && scans.forall(_.partitionFilters.nonEmpty),
      "probed IVF-PQ codes scan must carry partition filters")
  }

  test("IVF-PQ residual encoding reconstructs tighter than raw PQ; residual search stays pruned") {
    val e = Tables.embeddings(spark, sfDir).select(col("vec_id"), col("embedding"))
    val coarse = Similarity.trainCentroids(e, Similarity.ivfK)

    // raw PQ reconstruction error: || v − recon(codes(v)) ||²
    val pqRaw = Similarity.trainPq(e)
    val rawErr = e.select(graft.functions.NativeExprs.pq_adc(
        graft.functions.VectorExprs.asDouble("embedding"),
        graft.functions.NativeExprs.pq_encode(col("embedding"), pqRaw), pqRaw).as("err"))
      .agg(avg("err")).head.getDouble(0)

    // residual PQ: same code budget over v − centroid
    import spark.implicits._
    val cbDf = coarse.zipWithIndex.map { case (v, i) => (i.toLong, v.toSeq) }
      .toSeq.toDF("c_id", "cv")
    val enc = Similarity.ivfAssignCodebook(spark, e, coarse)
      .join(broadcast(cbDf), col("centroid") === col("c_id"))
      .withColumn("enc",
        expr("zip_with(transform(embedding, x -> cast(x as double)), cv, (a, b) -> a - b)"))
    val pqRes = Similarity.trainPqResidual(e, coarse)
    val resErr = enc.select(graft.functions.NativeExprs.pq_adc(col("enc"),
        graft.functions.NativeExprs.pq_encode(col("enc"), pqRes), pqRes).as("err"))
      .agg(avg("err")).head.getDouble(0)
    assert(resErr < rawErr,
      s"residual coding must reconstruct tighter: residual MSE $resErr vs raw $rawErr")

    // a residual index end-to-end: search returns ranked rows and the
    // codes scan is still statically pruned to the probed cells
    val dir = java.nio.file.Files.createTempDirectory("ivfpqres").toString
    Similarity.ivfPqIndex(e, Similarity.ivfK, dir) // residual default
    val qs = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"),
              graft.functions.VectorExprs.asDouble("embedding").as("qv"))
    val res = Similarity.ivfPqSearch(spark, dir, qs, topK = 5, nprobe = 2)
    val rows = res.collect()
    assert(rows.length == 25)
    rows.groupBy(_.getLong(0)).foreach { case (_, g) =>
      val ds = g.sortBy(_.getLong(1)).map(_.getDouble(3))
      assert(ds.sameElements(ds.sorted), "ADC distance must ascend with rank")
    }
  }

  test("IVF-PQ rerank: output is exactly the cosine top-k of the ADC candidate pool") {
    val dir = java.nio.file.Files.createTempDirectory("ivfpqrr").toString
    val e = Tables.embeddings(spark, sfDir).select(col("vec_id"), col("embedding"))
    Similarity.ivfPqIndex(e, Similarity.ivfK, dir)
    val qs = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"),
              graft.functions.VectorExprs.asDouble("embedding").as("qv"))
    val rerankK = 25
    val pool = Similarity.ivfPqSearch(spark, dir, qs, rerankK, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val got = Similarity.ivfPqSearchRerank(spark, dir, qs, e, topK = 5, nprobe = 2, rerankK = rerankK)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // expected: exact cosine over the pool, top-5, ties by n_id asc
    val emb = e.collect().map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val expected = pool.flatMap { case (q, ids) =>
      ids.toSeq.map(n => (q, n, cos(emb(q), emb(n))))
        .sortBy { case (_, n, c) => (-c, n) }.take(5).zipWithIndex
        .map { case ((_, n, _), i) => (q, i + 1L, n) }
    }.toSet
    assert(got.toSet == expected,
      "rerank must return the exact-cosine top-5 of the ADC candidate pool")
  }

  test("q86 residual IVF-PQ query: shape and ascending ADC per query") {
    val rows = Similarity.queries("q86_ann_ivfpq")(spark, sfDir).collect()
    assert(rows.length == 50)
    rows.groupBy(_.getLong(0)).foreach { case (q, g) =>
      val ds = g.sortBy(_.getLong(1)).map(_.getDouble(3))
      assert(ds.sameElements(ds.sorted), "ADC distance must ascend with rank")
      assert(g.forall(_.getLong(2) != q), "self-match leaked")
    }
  }

  test("q156 persisted-index rerank: shape, descending cosine, no self-match") {
    val rows = Similarity.queries("q156_ann_rerank")(spark, sfDir).collect()
    assert(rows.length == 50)
    rows.groupBy(_.getLong(0)).foreach { case (q, g) =>
      assert(g.map(_.getLong(1)).sorted.sameElements(1L to 5L), "rnk not 1..5")
      val cs = g.sortBy(_.getLong(1)).map(_.getDouble(3))
      assert(cs.zip(cs.tail).forall { case (a, b) => a >= b },
        "cosine must descend with rank")
      assert(g.forall(_.getLong(2) != q), "self-match leaked")
    }
  }

  test("q157 index append: appended-index search equals full-rebuild search") {
    val rebuilt = Similarity.queries("q156_ann_rerank")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val appended = Similarity.queries("q157_index_append")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(appended == rebuilt,
      "append with frozen codebooks must reproduce the full rebuild exactly")
  }

  test("q158 tombstones: deleted ids never surface; survivors keep q156 order") {
    val rows = Similarity.queries("q158_index_tombstone")(spark, sfDir).collect()
    assert(rows.length == 50)
    assert(rows.forall(_.getLong(2) % 7 != 3), "tombstoned id surfaced")
    // masking pre-pool can only remove candidates: every returned pair
    // that q156 also returns must keep its relative cosine order
    rows.groupBy(_.getLong(0)).foreach { case (_, g) =>
      val cs = g.sortBy(_.getLong(1)).map(_.getDouble(3))
      assert(cs.zip(cs.tail).forall { case (a, b) => a >= b })
    }
  }

  test("q160 compaction: one file per cell after, search equals rebuild") {
    import org.apache.spark.sql.functions.col
    val compacted = Similarity.queries("q160_index_compact")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val rebuilt = Similarity.queries("q156_ann_rerank")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(compacted == rebuilt, "compaction must not change search results")
    // the physical effect: the appended (v0) files are fragmented (>1
    // file in at least one cell); the compacted version is exactly 1
    // file per cell, lives in a _v<N> dir UNDER the index path (a valid
    // shared-filesystem location — not a driver-local temp dir), and the
    // manifest points at it
    val e = Tables.embeddings(spark, sfDir).select(col("vec_id"), col("embedding"))
    val appended = Similarity.appendIndexFor(spark, e, sfDir)
    assert(Similarity.ivfPqCompact(spark, appended) == appended,
      "compact must return the root: readers follow the manifest")
    val serving1 = Similarity.resolveIndex(spark, appended)
    assert(serving1 != appended && serving1.startsWith(s"$appended/_v"),
      s"serving dir must be a _v<N> under the index path, got $serving1")
    // WorkDirs returns Hadoop-qualified paths (file:/… locally; hdfs://
    // on a cluster) — strip the local scheme for java.io inspection
    def filesPerCell(dir: String): Seq[Int] =
      new java.io.File(dir.stripPrefix("file:")).listFiles()
        .filter(_.getName.startsWith("centroid="))
        .map(_.listFiles().count(_.getName.endsWith(".parquet"))).toSeq
    assert(filesPerCell(appended).exists(_ > 1), "append should fragment")
    assert(filesPerCell(serving1).forall(_ == 1), "compaction must coalesce")
    // a second compact bumps the version and swaps the manifest forward
    Similarity.ivfPqCompact(spark, appended)
    val serving2 = Similarity.resolveIndex(spark, appended)
    def vnum(p: String) = p.split("_v").last.toInt
    assert(vnum(serving2) > vnum(serving1), "second compact must bump _v<N>")
    assert(filesPerCell(serving2).forall(_ == 1))
  }

  test("q172 retrain: planted drift trips the skew trigger; search equals " +
       "a fresh rebuild over the drifted corpus; a balanced index does not fire") {
    import org.apache.spark.sql.functions.col
    // the gated query: stale build → frozen backfill → drifted append →
    // max/median occupancy trigger → retrain; its search must equal a
    // FRESH index built directly on the same original ∪ drifted corpus
    // (retrain ≡ rebuild, at the search grain)
    val retrained = Similarity.queries("q172_index_retrain")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val e = Tables.embeddings(spark, sfDir).select(col("vec_id"), col("embedding"))
    val corpus = e
      .select(col("vec_id"),
              graft.functions.VectorExprs.asDouble("embedding").as("embedding"))
      .unionByName(Similarity.driftedBatch(e))
    val freshDir = java.nio.file.Files.createTempDirectory("graft_rt_fresh").toString
    Similarity.ivfPqIndex(corpus, Similarity.ivfK, freshDir)
    val queries = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"),
              graft.functions.VectorExprs.asDouble("embedding").as("qv"))
    val rebuilt = Similarity.ivfPqSearchRerank(spark, freshDir, queries, corpus,
        topK = 5, nprobe = 2, rerankK = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(retrained == rebuilt, "retrain-then-search must equal fresh rebuild")
    // the drifted ids actually surface: the whole point of the fixture
    // is that the new mode is real data the retrained index must serve
    assert(retrained.exists(_._3 >= Similarity.driftIdOffset),
      "expected drifted vectors among the search results")
    // corpus-relative no-fire: a BALANCED index at the same production
    // threshold — max/median skew is sampling noise (~1.2–1.5 here),
    // under retrainSkew, so the health check must be a no-op (the r12
    // share-vs-constant trigger fired on exactly this case)
    val dir = java.nio.file.Files.createTempDirectory("graft_rt_noop").toString
    Similarity.ivfPqIndex(e, Similarity.ivfK, dir)
    val before = Similarity.resolveIndex(spark, dir)
    assert(!Similarity.ivfPqRetrain(spark, dir, e, Similarity.ivfK,
                                    skewRatio = Similarity.retrainSkew),
      "a balanced index must not trip the corpus-relative skew trigger")
    assert(Similarity.resolveIndex(spark, dir) == before,
      "a no-op check must not move the serving pointer")
  }

  test("q159 index stats: cell masses cover the corpus; shares bounded") {
    val rows = Similarity.queries("q159_index_stats")(spark, sfDir).collect()
    val n = Tables.embeddings(spark, sfDir).count()
    assert(rows.map(_.getLong(1)).sum == n, "cell masses != corpus size")
    assert(rows.forall(r => r.getDouble(2) >= 0 && r.getDouble(2) <= 1))
    assert(rows.map(_.getLong(0)).distinct.length == rows.length)
  }

  test("q84 int8 quantization: code range and reconstruction-error bound") {
    val rows = Similarity.queries("q84_int8_quant")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val scale = r.getDouble(1)
      val codes = r.getString(2).split(',').map(_.toLong)
      val maxErr = r.getDouble(3)
      assert(codes.forall(c => c >= -128 && c <= 127), "int8 range")
      // floor quantization: error strictly under one step (scale/127)
      assert(maxErr < scale / 127 + 1e-12,
        s"reconstruction error $maxErr exceeds one quantization step ${scale / 127}")
    }
  }

  test("q42 MinHash+LSH equals the exact ngram-jaccard pair set") {
    val lsh = Dedup.queries("q42_minhash_lsh")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = TextAnalysis.queries("q35_ngram_jaccard")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh == exact)
  }

  test("q79 minhash estimate tracks exact jaccard; q78 tf-cosine covers the near-dups") {
    val rows = Dedup.queries("q79_minhash_est")(spark, sfDir).collect()
    val dups = rows.filter(_.getDouble(3) >= 0.9)
    assert(dups.nonEmpty, "candidate set must include the planted near-dups")
    // 32-component minhash concentration: |est - jaccard| small on dups
    dups.foreach { r =>
      assert(math.abs(r.getDouble(2) - r.getDouble(3)) <= 0.2,
        s"estimate ${r.getDouble(2)} too far from jaccard ${r.getDouble(3)}")
    }
    val negs = rows.filter(_.getDouble(3) <= 0.1)
    assert(negs.nonEmpty)
    assert(negs.map(_.getDouble(2)).sum / negs.size <= 0.15,
      "weak-overlap pairs must estimate low on average")

    // the tf-cosine pair set must cover every exact jaccard near-dup pair
    // (near-identical token multisets have cosine ~1 on any df-pruned index)
    val jac = TextAnalysis.queries("q35_ngram_jaccard")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val cos = TextAnalysis.queries("q78_doc_cosine")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(jac.nonEmpty && jac.subsetOf(cos),
      s"tf-cosine misses near-dup pairs: ${jac.diff(cos)}")
  }

  test("q73 clusters: pairs co-clustered, cluster id = min member, one keeper each") {
    val labels = Dedup.queries("q73_dedup_clusters")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val pairs = TextAnalysis.queries("q35_ngram_jaccard")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    // connected docs share a cluster
    pairs.foreach { case (a, b) =>
      assert(labels(a)._1 == labels(b)._1, s"pair ($a,$b) split across clusters")
    }
    // cluster id is the smallest member; exactly that member is kept
    labels.groupBy(_._2._1).foreach { case (cid, members) =>
      assert(members.keys.min == cid)
      assert(members.count(_._2._2 == 1L) == 1)
      assert(members(cid)._2 == 1L)
    }
    // every document is labeled
    assert(labels.size == Tables.documents(spark, sfDir).count())
  }

  test("q164 priority survivorship: survivor is a member with the family-min tier") {
    import org.apache.spark.sql.functions.{col, expr}
    val labels = Dedup.queries("q73_dedup_clusters")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val tiers = Tables.documents(spark, sfDir)
      .select(col("doc_id"), expr("cast(substring(source, 4) as int) div 7").as("t"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val families = labels.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    val rows = Dedup.queries("q164_priority_survivor")(spark, sfDir).collect()
    assert(rows.length == families.size, "one survivor row per family")
    assert(rows.exists(_.getLong(1) > 1), "multi-member families must exist")
    rows.foreach { r =>
      val (cid, n, sid, stier) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      val fam = families(cid)
      assert(fam.contains(sid), s"survivor $sid not in family $cid")
      assert(n == fam.size)
      assert(stier == fam.map(tiers).min,
        s"family $cid: survivor tier $stier above the family minimum")
      // within the winning tier, the survivor is the smallest id
      assert(sid == fam.filter(tiers(_) == stier).min)
    }
    // the policy BITES somewhere: some survivor differs from min-id election
    assert(rows.exists(r => r.getLong(2) != families(r.getLong(0)).min),
      "expected at least one family where priority overrides min-id")
  }

  test("q43 SimHash: identical texts collide, near-dups are Hamming-close") {
    import spark.implicits._
    val sim = Dedup.queries("q43_simhash")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // near-dup doc pairs (exact jaccard >= 0.8) → small Hamming distance
    val pairs = TextAnalysis.queries("q35_ngram_jaccard")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b) =>
      val ham = java.lang.Long.bitCount(sim(a) ^ sim(b))
      assert(ham <= 16, s"near-dup pair ($a,$b) has hamming $ham")
    }
    // determinism: recompute matches
    val sim2 = Dedup.queries("q43_simhash")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sim == sim2)
  }

  test("q242 recall sweep: bimodal corpus saturates; planted mid-similarity pairs decay") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("q242_lsh_recall")(spark, sfDir).collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2), r.getDouble(3),
                 r.getDouble(4)))
    assert(rows.length == 5)
    rows.foreach { case (_, ne, nd, rec, th) =>
      assert(nd <= ne)
      assert(rec >= 0.0 && rec <= 1.0 && th >= 0.0 && th <= 1.0)
    }
    // exact-count monotone in threshold; theory strictly rises with t
    assert(rows.map(_._2).zip(rows.map(_._2).tail).forall { case (a, b) => a >= b })
    assert(rows.map(_._5).zip(rows.map(_._5).tail).forall { case (a, b) => a < b })
    // planted decay region: 40 doc pairs sharing ~half their shingles
    // (j = 9/19 ≈ 0.47… build 10/30: j = 10/30 no — construct j ≈ 0.52:
    // 21 shared of 40 distinct → 21/(31+30-21)); md5 banding must miss
    // SOME and catch some — theory says ~64% detected at j ≈ 0.5
    import spark.implicits._
    val planted = (0 until 40).flatMap { p =>
      val shared = (0 until 21).map(i => s"s${p}_$i")
      val aOnly = (0 until 10).map(i => s"a${p}_$i")
      val bOnly = (0 until 9).map(i => s"b${p}_$i")
      Seq((p * 2L, shared ++ aOnly), (p * 2L + 1L, shared ++ bOnly))
    }.toDF("doc_id", "sh")
    val sw = graft.operators.Dedup.lshRecallCore(planted).collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2)))
    val at05 = sw.find(_._1 == 0.5).get
    assert(at05._2 == 40L, s"expected 40 exact pairs, got ${at05._2}")
    assert(at05._3 < 40L, "banding should miss some j~0.5 pairs")
    assert(at05._3 > 0L, "banding should catch some j~0.5 pairs")
  }

  test("IVF-PQ resident handle: cached per version; append keeps it; manifest swap and in-place rebuild reload it") {
    val dir = java.nio.file.Files.createTempDirectory("ivfpqhandle").toString
    val e = Tables.embeddings(spark, sfDir).select(col("vec_id"), col("embedding"))
    Similarity.ivfPqIndex(e.filter(col("vec_id") < 150), Similarity.ivfK, dir)
    val h1 = Similarity.ivfPqHandle(spark, dir)
    assert(Similarity.ivfPqHandle(spark, dir) eq h1,
      "handle must be session-resident (same object) while the version serves")
    // append encodes under FROZEN codebooks — the resident handle stays valid
    Similarity.ivfPqAppend(spark, dir,
      e.filter(col("vec_id") >= 150 && col("vec_id") < 200))
    assert(Similarity.ivfPqHandle(spark, dir) eq h1,
      "append must not invalidate the resident handle (frozen codebooks)")
    // compact swaps the manifest — the new version must reload
    Similarity.ivfPqCompact(spark, dir)
    val h2 = Similarity.ivfPqHandle(spark, dir)
    assert((h2 ne h1) && h2.cur != h1.cur,
      "a manifest swap must resolve to the new version and reload the handle")
    // compaction carries codebooks over unchanged — same values, new residency
    assert(h2.coarse.map(_.toSeq).toSeq == h1.coarse.map(_.toSeq).toSeq,
      "compaction must carry the coarse codebook over unchanged")

    // in-place rebuild (violating the versioned-artifact contract) still
    // invalidates: the _codebook mtime is part of the memo token
    val dir2 = java.nio.file.Files.createTempDirectory("ivfpqinplace").toString
    Similarity.ivfPqIndex(e.filter(col("vec_id") < 150), Similarity.ivfK, dir2)
    val g1 = Similarity.ivfPqHandle(spark, dir2)
    Similarity.ivfPqIndex(e.filter(col("vec_id") >= 100), Similarity.ivfK, dir2)
    val g2 = Similarity.ivfPqHandle(spark, dir2)
    assert(g2 ne g1, "an in-place codebook rewrite must reload the handle")
  }

  test("IVF-PQ probe plan: keyed searches memoize the plan and match the unkeyed results exactly") {
    val dir = java.nio.file.Files.createTempDirectory("ivfpqplan").toString
    val e = Tables.embeddings(spark, sfDir).select(col("vec_id"), col("embedding"))
    Similarity.ivfPqIndex(e, Similarity.ivfK, dir)
    val qs = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"),
              graft.functions.VectorExprs.asDouble("embedding").as("qv"))
    def rows(pk: Option[String]) =
      Similarity.ivfPqSearch(spark, dir, qs, topK = 5, nprobe = 2, probeKey = pk)
        .collect().toSeq
    val unkeyed = rows(None)
    val keyed1 = rows(Some("spec"))
    assert(keyed1 == unkeyed, "a keyed probe plan must not change results")
    // the memoized plan object is reused verbatim on the second keyed call
    val h = Similarity.ivfPqHandle(spark, dir)
    val plan1 = SessionMemo.get[Similarity.IvfProbePlan](
      spark, "ann.ivfProbePlan", s"${h.token}|2|spec")
    assert(plan1.isDefined, "keyed search must install the probe plan memo")
    val keyed2 = rows(Some("spec"))
    val plan2 = SessionMemo.get[Similarity.IvfProbePlan](
      spark, "ann.ivfProbePlan", s"${h.token}|2|spec")
    assert(plan2.get.asInstanceOf[AnyRef] eq plan1.get.asInstanceOf[AnyRef],
      "the resident probe plan must be reused, not recomputed")
    assert(keyed2 == unkeyed)
    // the rerank path rides the same plan + resident query rows
    val rr1 = Similarity.ivfPqSearchRerank(spark, dir, qs, e, topK = 5,
      nprobe = 2, rerankK = 10, probeKey = Some("spec")).collect().toSeq
    val rr0 = Similarity.ivfPqSearchRerank(spark, dir, qs, e, topK = 5,
      nprobe = 2, rerankK = 10).collect().toSeq
    assert(rr1 == rr0, "keyed rerank must match the unkeyed rerank exactly")
  }
}
