package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev utility: generate a SCALED copy of the synthetic corpus for the
  * scale study (PERF.md) — same statistical shape as the driver's
  * tables, N× the rows, fully deterministic (every random draw is an
  * xxhash64 of the row id, so the output is independent of partitioning
  * and re-runs bit-identically).
  *
  * Self-calibrating: vocabulary, language mix, twin density and
  * embedding cluster centroids/spreads are measured FROM the base
  * dataset rather than hardcoded, so the generated corpus tracks the
  * driver generator's observable statistics:
  *  - documents: uniform token draws from the base's 30-word core
  *    vocabulary, uniform 10–100 token lengths, source = src{id%20}
  *    (the base's exact layout), languages at the base's measured mix;
  *    ~1/19 of docs are near-identical TWINS of their predecessor (one
  *    interior token replaced by the rare `dup` marker — J ≳ 0.85 on
  *    3-gram shingles for docs ≥ 30 tokens, the base's planted-pair
  *    density), which also reproduces the base's directed-containment
  *    pair density (a twin contains ~94% of its base both ways).
  *  - embeddings: 10 clusters; per-(label, dim) mean/std measured from
  *    the base, points = centroid + Box–Muller Gaussian noise.
  *  - all other tables are copied from the base unchanged (the study
  *    families read documents/embeddings only).
  *
  * Usage: ScaleGen <baseDir> <outDir> <factor>
  */
object ScaleGen {

  /** Write `df` as ONE parquet FILE at `$out/$name.parquet` — the
    * driver's physical layout. The layout is load-bearing, not
    * cosmetic: StreamGate's staging symlinks `<table>.parquet` into a
    * file-stream source dir, and a symlinked DIRECTORY yields zero
    * input files there — the doc-stream gates then measure an empty
    * stream's floor while looking green (caught in the round-11
    * streaming study: rows=0 at every factor). */
  private def writeSingleFile(df: DataFrame, out: String, name: String): Unit = {
    val tmp = s"$out/_tmp_$name"
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    val tmpDir = java.nio.file.Paths.get(tmp)
    // list once into a collection and close the stream (Files.list holds
    // a directory handle until closed)
    val entries = {
      val st = java.nio.file.Files.list(tmpDir)
      try {
        val b = Seq.newBuilder[java.nio.file.Path]
        st.forEach(p => b += p)
        b.result()
      } finally st.close()
    }
    val part = entries.find(_.getFileName.toString.endsWith(".parquet"))
    require(part.isDefined, s"no part file produced for $name")
    java.nio.file.Files.move(part.get,
      java.nio.file.Paths.get(s"$out/$name.parquet"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    entries.filterNot(_ == part.get).foreach(java.nio.file.Files.delete(_))
    java.nio.file.Files.delete(tmpDir)
  }

  def main(args: Array[String]): Unit = {
    val base = args(0); val out = args(1); val factor = args(2).toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    generate(spark, base, out, factor,
             zipf = args.length > 3 && args(3) == "zipf")
    spark.stop()
  }

  /** The generation body, callable from a host session (ScaleGenSpec
    * pins the output contract on this). */
  /** `zipf = true` swaps the base-calibrated constant vocabulary for a
    * REALISTIC one: tokens drawn Zipf(s = 1) over a vocabulary that
    * grows with the corpus by Heaps' law (V ∝ √totalTokens), via the
    * classic inverse-CDF draw rank = ⌊V^u⌋. The constant-vocab mode is
    * the adversarial hot-shingle regime (df ∝ corpus size — posting-
    * join exponents are upper bounds); the zipf mode measures the
    * long-tail regime a real crawl corpus exhibits, where rare
    * shingles keep their df as the corpus grows. Twins, lengths,
    * languages and sources are generated identically in both modes. */
  def generate(spark: SparkSession, base: String, out: String,
               factor: Int, zipf: Boolean = false): Unit = {
    // ---- calibrate from the base corpus ----------------------------
    val baseDocs = spark.read.parquet(s"$base/documents.parquet")
    val nDocs = baseDocs.count() * factor
    // core vocabulary: every token within 2× of the modal count (the
    // base is a uniform 30-word draw + the rare `dup` marker)
    val tokCounts = baseDocs
      .select(explode(split(trim(col("text")), "\\s+")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("tok"))
      .collect()
    val modal = tokCounts.head.getLong(1)
    val vocab = tokCounts.filter(_.getLong(1) * 2 > modal).map(_.getString(0))
    require(vocab.length >= 10, s"degenerate base vocabulary: ${vocab.length}")
    // language mix in per-mille, deterministic order
    val langRows = baseDocs.groupBy("lang").agg(count(lit(1)).as("n"))
      .orderBy("lang").collect()
    val nBase = langRows.map(_.getLong(1)).sum.toDouble
    val langCut = langRows.scanLeft(("", 0L)) { case ((_, acc), r) =>
      (r.getString(0), acc + math.round(r.getLong(1) / nBase * 1000)) }.tail
    val nSources = baseDocs.select(countDistinct("source")).head().getLong(0)

    // ---- documents --------------------------------------------------
    val v = vocab.length
    val vocabSql = vocab.map(w => s"'$w'").mkString("array(", ", ", ")")
    def lenOf(idCol: String) = s"(10 + pmod(xxhash64($idCol, 0L), 91))"
    val langSql = langCut.init.foldRight(s"'${langCut.last._1}'") {
      case ((l, cut), tail) => s"IF(pmod(xxhash64(id, 999L), 1000) < $cut, '$l', $tail)"
    }
    val docs = spark.range(nDocs)
      .withColumn("is_twin", expr(
        s"id % 19 = 1 AND id >= 1 AND ${lenOf("id - 1")} >= 30"))
      .withColumn("sid", expr("IF(is_twin, id - 1, id)"))
      .withColumn("L", expr(lenOf("sid")))
      .withColumn("toks0", expr(
        if (!zipf)
          s"transform(sequence(1L, L), i -> element_at($vocabSql, " +
            s"cast(1 + pmod(xxhash64(sid, i), $v) as int)))"
        else {
          // Heaps vocabulary for THIS corpus size; Zipf(1) inverse CDF
          val bigV = math.max(100L,
            math.ceil(3 * math.sqrt(nDocs * 55.0)).toLong)
          s"transform(sequence(1L, L), i -> concat('w', cast(floor(" +
            s"power($bigV, (pmod(xxhash64(sid, i), 1000000) + 0.5) " +
            s"/ 1000000.0)) as bigint)))"
        }))
      // twin: ONE interior token -> the rare `dup` marker (kills 3
      // shingles of ~L-2: J = (S-3)/(S+3) >= 0.8 for S >= 27)
      .withColumn("p", expr("cast(3 + pmod(xxhash64(id, 12345L), L - 4) as bigint)"))
      .withColumn("toks", expr(
        "IF(is_twin, transform(toks0, (t, i) -> IF(i + 1 = p, 'dup', t)), toks0)"))
      .select(
        col("id").as("doc_id"),
        array_join(col("toks"), " ").as("text"),
        expr(langSql).as("lang"),
        expr(s"concat('src', pmod(id, $nSources))").as("source"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    writeSingleFile(docs, out, "documents")

    // ---- embeddings --------------------------------------------------
    val baseEmb = spark.read.parquet(s"$base/embeddings.parquet")
    val nEmb = baseEmb.count() * factor
    val dim = baseEmb.select(size(col("embedding"))).head().getInt(0)
    val stats = baseEmb
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "x")))
      .groupBy("label", "pos")
      .agg(avg("x").as("mu"), stddev_pop("x").as("sd"))
      .groupBy("label")
      .agg(
        expr("transform(array_sort(collect_list(struct(pos, mu))), s -> s.mu)").as("mu"),
        expr("transform(array_sort(collect_list(struct(pos, sd))), s -> s.sd)").as("sd"))
    // draw labels from the base's ACTUAL label domain (not an assumed
    // 0..9): an inner join on a label outside the domain would silently
    // drop generated rows while the summary still claimed nEmb
    val labels = stats.select("label").orderBy("label")
      .collect().map(_.getInt(0))
    require(labels.nonEmpty, "base embeddings have no labels")
    val labelSql = labels.mkString("array(", ", ", ")")
    val emb = spark.range(nEmb)
      .select(col("id").as("vec_id"),
              expr(s"element_at($labelSql, cast(1 + pmod(xxhash64(id, 7L), " +
                s"${labels.length}) as int))").as("label"))
      .join(broadcast(stats), "label")
      .withColumn("embedding", expr(
        s"""transform(sequence(0, ${dim - 1}), j -> cast(
              element_at(mu, j + 1) + element_at(sd, j + 1) *
              sqrt(-2.0 * ln((pmod(xxhash64(vec_id, cast(j * 2 + 101 as long)), 1000000) + 0.5) / 1000000.0)) *
              cos(2.0 * pi() * (pmod(xxhash64(vec_id, cast(j * 2 + 102 as long)), 1000000) + 0.5) / 1000000.0)
            as float))"""))
      .select("vec_id", "embedding", "label")
    writeSingleFile(emb, out, "embeddings")

    // ---- events ------------------------------------------------------
    // calibrated: event-type domain + weights, user count (scaled ×N so
    // events-per-user stays constant — the sessionize/funnel grain), the
    // base's time window (same window, ×N the rate — how scale-up
    // actually arrives), exponential values at the base's measured mean
    val baseEv = spark.read.parquet(s"$base/events.parquet")
    val nEv = baseEv.count() * factor
    val types = baseEv.groupBy("event_type").agg(count(lit(1)).as("n"))
      .orderBy("event_type").collect().map(_.getString(0))
    val nUsers = baseEv.select(countDistinct("user_id")).head().getLong(0) * factor
    val (tsMin, tsMax) = {
      val r = baseEv.agg(expr("min(unix_millis(cast(ts as timestamp)))"),
                         expr("max(unix_millis(cast(ts as timestamp)))")).head()
      (r.getLong(0), r.getLong(1))
    }
    // pmod(x, tsMax - tsMin) with a zero modulus returns NULL — a base
    // table with one distinct timestamp would silently write NULL ts for
    // every generated event (the vocabulary/labels degenerate-base guard,
    // applied to the time window)
    require(tsMax > tsMin,
      s"degenerate base events window: min ts == max ts ($tsMin)")
    val meanValue = baseEv.agg(avg("value")).head().getDouble(0)
    val typesSql = types.map(t => s"'$t'").mkString("array(", ", ", ")")
    val ev = spark.range(nEv).select(
      col("id").as("event_id"),
      // NTZ to match the base table's physical type (UTC session: equal)
      expr(s"cast(timestamp_millis(${tsMin}L + pmod(xxhash64(id, 1L), " +
        s"${tsMax - tsMin}L)) as timestamp_ntz)").as("ts"),
      expr(s"pmod(xxhash64(id, 2L), ${nUsers}L)").as("user_id"),
      expr(s"element_at($typesSql, cast(1 + pmod(xxhash64(id, 3L), " +
        s"${types.length}) as int))").as("event_type"),
      // exponential at the base's mean: value = −mean·ln(u), u ∈ (0, 1]
      expr(s"round(-$meanValue * ln((pmod(xxhash64(id, 4L), 1000000) + 0.5) " +
        s"/ 1000000.0), 2)").as("value"),
      expr("concat('{\"k\": ', pmod(xxhash64(id, 5L), 100), '}')").as("props"))
    writeSingleFile(ev, out, "events")

    // ---- remaining tables: copied from the base ---------------------
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
                  "orders", "lineitem")) {
      val src = java.nio.file.Paths.get(s"$base/$t.parquet")
      if (java.nio.file.Files.exists(src))
        java.nio.file.Files.copy(src, java.nio.file.Paths.get(s"$out/$t.parquet"),
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    println(s"""{"out":"$out","factor":$factor,"docs":$nDocs,"embeddings":$nEmb,"vocab":$v}""")
  }
}
