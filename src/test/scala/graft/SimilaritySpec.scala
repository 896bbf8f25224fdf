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

  test("q42 MinHash+LSH equals the exact ngram-jaccard pair set") {
    val lsh = Dedup.queries("q42_minhash_lsh")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = TextAnalysis.queries("q35_ngram_jaccard")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh == exact)
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
}
