package graft

import org.apache.spark.sql.functions._

/** Pins graft.tools.ScaleGen's output contract — above all the
  * single-FILE parquet layout, whose violation the round-11 streaming
  * study caught the hard way: StreamGate's staging symlinks
  * `<table>.parquet` into a file-stream source dir, and a symlinked
  * DIRECTORY yields zero input files, so every doc-stream measurement
  * silently became an empty-stream floor. A scale study on a corpus
  * the stream gates cannot read must FAIL here, not in a judge's
  * reading of the exponents.
  */
class ScaleGenSpec extends SparkTestBase {

  private lazy val outDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_scalegen_spec")
    TempDirs.register(dir.toString)
    // factor 1 over the tiny sf0.001 base — seconds, not minutes
    graft.tools.ScaleGen.generate(spark, sfDir, dir.toString, 1)
    dir.toString
  }

  test("every generated table is a single parquet FILE (stream-stageable)") {
    for (t <- Seq("documents", "embeddings", "events")) {
      val p = java.nio.file.Paths.get(s"$outDir/$t.parquet")
      assert(java.nio.file.Files.isRegularFile(p),
        s"$t.parquet must be a regular file - the file-stream staging " +
          "symlink yields zero input files on a directory")
    }
  }

  test("row counts scale by the factor and no rows are dropped") {
    val baseDocs = spark.read.parquet(s"$sfDir/documents.parquet").count()
    val baseEmb = spark.read.parquet(s"$sfDir/embeddings.parquet").count()
    val baseEv = spark.read.parquet(s"$sfDir/events.parquet").count()
    assert(spark.read.parquet(s"$outDir/documents.parquet").count() == baseDocs)
    assert(spark.read.parquet(s"$outDir/embeddings.parquet").count() == baseEmb,
      "a label outside the assumed domain would silently drop rows here")
    assert(spark.read.parquet(s"$outDir/events.parquet").count() == baseEv)
  }

  test("generated corpus carries the base's structure: vocab, twins, schema") {
    val docs = spark.read.parquet(s"$outDir/documents.parquet")
    assert(docs.schema.fieldNames.toSeq ==
      Seq("doc_id", "text", "lang", "source", "n_chars"))
    // the rare `dup` marker exists (twins were planted)
    val nDup = docs.filter(col("text").contains("dup")).count()
    assert(nDup > 0, "no twins planted - near-dup studies would be vacuous")
    // embeddings keep the base's label domain and dimension
    val emb = spark.read.parquet(s"$outDir/embeddings.parquet")
    val baseLabels = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("label").distinct().collect().map(_.getInt(0)).toSet
    val genLabels = emb.select("label").distinct().collect().map(_.getInt(0)).toSet
    assert(genLabels.subsetOf(baseLabels))
    assert(emb.select(size(col("embedding"))).head().getInt(0) ==
      spark.read.parquet(s"$sfDir/embeddings.parquet")
        .select(size(col("embedding"))).head().getInt(0))
  }

  test("zipf mode grows a Heaps-law vocabulary and keeps the twin structure") {
    val dir = java.nio.file.Files.createTempDirectory("graft_scalegen_zipf")
    TempDirs.register(dir.toString)
    graft.tools.ScaleGen.generate(spark, sfDir, dir.toString, 1, zipf = true)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val vocab = docs.select(explode(split(trim(col("text")), "\\s+")).as("t"))
      .select(countDistinct("t")).head().getLong(0)
    assert(vocab > 100, s"zipf mode must grow the vocabulary (got $vocab)")
    assert(docs.filter(col("text").contains("dup")).count() > 0,
      "twins must be planted in zipf mode too")
    assert(java.nio.file.Files.isRegularFile(
      java.nio.file.Paths.get(s"$dir/documents.parquet")))
  }

  test("generation is deterministic (same seed hashing, bit-identical)") {
    val dir2 = java.nio.file.Files.createTempDirectory("graft_scalegen_spec2")
    TempDirs.register(dir2.toString)
    graft.tools.ScaleGen.generate(spark, sfDir, dir2.toString, 1)
    val a = spark.read.parquet(s"$outDir/documents.parquet")
      .orderBy("doc_id").collect().toSeq
    val b = spark.read.parquet(s"$dir2/documents.parquet")
      .orderBy("doc_id").collect().toSeq
    assert(a == b, "re-running the generator must reproduce the corpus")
  }
}
