package graft

import graft.operators.WindowDedup
import org.apache.spark.sql.functions._

/** Round-6b operators: q111/q113 token-window dedup + novelty, q114
  * near-dup consensus, q115 recall sweep, q112 streaming quality gate. */
class WindowSpec extends SparkTestBase {

  private def q(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("q111: dup mass bounded by window count; hashed scale variant count-identical") {
    val declared = q("q111_window_dedup")
      .select("doc_id", "n_windows", "dup_windows").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(declared.nonEmpty)
    declared.foreach { case (id, nw, dup) =>
      assert(dup >= 0 && dup <= nw, s"doc $id: dup $dup outside [0, $nw]")
    }
    val hashed = WindowDedup.windowProfileHashed(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(hashed.toSeq == declared.toSeq,
      "xxhash64 scale variant must reproduce the md5 profile exactly")
  }

  test("q113: every window hash is novel exactly once; no-dup docs are fully novel") {
    val nov = q("q113_window_novelty")
    // doc 0 is the first arrival: all its windows are first occurrences
    val first = nov.filter(col("doc_id") === 0).select("novelty").collect()
    assert(first.length == 1 && first(0).getDouble(0) == 1.0)
    // a doc with zero cross-doc duplicated windows shares no hash with
    // any other doc, so every one of its windows is first-seen by it
    val joined = q("q111_window_dedup").filter(col("dup_windows") === 0)
      .join(nov, "doc_id").select("doc_id", "novelty").collect()
    assert(joined.nonEmpty)
    joined.foreach(r =>
      assert(r.getDouble(1) == 1.0,
        s"doc ${r.getLong(0)} has no duplicated windows but novelty ${r.getDouble(1)}"))
  }

  test("q114: consensus flags reproduce the q42 and q81 pair sets") {
    val cons = q("q114_neardup_consensus").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    val mh = q("q42_minhash_lsh").select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val sh = q("q81_simhash_neardup").select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cons.keySet == (mh ++ sh), "consensus rows must be the union")
    cons.foreach { case (pair, (bm, bs, m)) =>
      assert(bm == (if (mh(pair)) 1L else 0L), s"$pair minhash flag")
      assert(bs == (if (sh(pair)) 1L else 0L), s"$pair simhash flag")
      assert(m == bm + bs, s"$pair methods sum")
    }
  }

  test("q115: one row per (nprobe, query); hits within [0, 5] and recall consistent") {
    val rows = q("q115_recall_sweep").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.map(t => (t._1, t._2)).distinct.length == rows.length)
    assert(rows.map(_._1).distinct.sorted.toSeq == Seq(1L, 2L, 4L))
    rows.foreach { case (np, qid, hits, recall) =>
      assert(hits >= 0 && hits <= 5, s"($np,$qid) hits $hits")
      assert(recall == math.floor(hits / 5.0 * 1000) / 1000,
        s"($np,$qid) recall $recall vs hits $hits")
    }
  }

  test("q117: pair docs must carry duplicated-window mass in q111") {
    val pairs = q("q117_window_pairs").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    pairs.foreach { case (a, b, sh) =>
      assert(a < b && sh >= 3, s"($a,$b) shared $sh")
    }
    val inPairs = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    val dupByDoc = q("q111_window_dedup").collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    // sharing a window with another doc means that window is cross-doc
    // duplicated, so every paired doc must show dup mass in the profile
    inPairs.foreach(id =>
      assert(dupByDoc(id) > 0, s"doc $id paired but dup_windows = 0"))
  }

  test("q116: off-diagonal overlap never exceeds either diagonal") {
    val m = q("q116_source_overlap").collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    val diag = m.collect { case ((a, b), n) if a == b => a -> n }
    assert(diag.nonEmpty)
    m.foreach { case ((a, b), n) =>
      if (a != b) {
        assert(n <= diag(a) && n <= diag(b),
          s"($a,$b) shared $n exceeds a diagonal")
      }
    }
  }

  test("q123: full-dimension row is a perfect self-baseline; hits bounded") {
    val rows = q("q123_dim_sweep").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.length == 3 * 10)
    rows.foreach { case (dim, qid, hits, recall) =>
      assert(hits >= 0 && hits <= 5, s"($dim,$qid)")
      if (dim == 64)
        assert(hits == 5 && recall == 1.0,
          s"query $qid: full-dim sweep row must equal the baseline")
    }
  }

  test("q112: streaming quality gate equals batch q93 (shared scoring core)") {
    val stream = q("q112_quality_stream").collect().toSeq
    val batch = q("q93_quality_model").collect().toSeq
    assert(stream == batch)
  }

  test("q121: removal mass consistent with the q111 dup profile") {
    val removed = q("q121_span_removal").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val dup = q("q111_window_dedup").collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(removed.nonEmpty && removed.keySet == dup.keySet)
    removed.foreach { case (id, (n, rm)) =>
      assert(rm >= 0 && rm <= n, s"doc $id")
      if (dup(id) == 0) assert(rm == 0, s"doc $id: no dup windows but removed $rm")
      // one duplicated window covers all W of its token positions
      else assert(rm >= 8, s"doc $id: dup windows but only $rm tokens removed")
    }
    assert(removed.values.exists(_._2 > 0), "planted near-dups must remove spans")
  }

  test("posting store: the memoized session relation equals the " +
       "positionalWindows definition row-for-row (plus source)") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sfDir)
    val fromStore = WindowDedup.windowPostingsCore(spark, sfDir)
      .select("doc_id", "pos", "wh")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val fromDef = WindowDedup.positionalWindows(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(fromStore == fromDef,
      "the six store consumers and the q118 stream must share ONE " +
        "window/hash definition — the store drifted from positionalWindows")
    // the store's source column matches the document row's
    val srcOk = WindowDedup.windowPostingsCore(spark, sfDir)
      .select("doc_id", "source").distinct()
      .join(docs.select(col("doc_id"), col("source").as("want")), "doc_id")
      .filter(col("source") =!= col("want")).count()
    assert(srcOk == 0, "posting-store source column drifted")
  }

  test("q118: streamed span containment equals the batch formulation") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sfDir)
    val corpus = WindowDedup.positionalWindows(docs.filter(col("doc_id") < 250))
      .select("wh").distinct().withColumn("hit", lit(1L))
    val batch = WindowDedup.positionalWindows(docs.filter(col("doc_id") >= 250))
      .join(corpus, Seq("wh"), "left")
      .select(col("doc_id"), col("pos"),
              coalesce(col("hit"), lit(0L)).as("in_corpus"))
      .orderBy("doc_id", "pos").collect().toSeq
    val streamed = q("q118_window_stream").collect().toSeq
    assert(streamed == batch)
    assert(batch.nonEmpty)
  }
}
