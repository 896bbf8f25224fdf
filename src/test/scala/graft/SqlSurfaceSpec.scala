package graft

class SqlSurfaceSpec extends SparkTestBase {

  test("native functions usable from SQL after registration") {
    GraftExtensions.ensureRegistered(spark)
    val r = spark.sql(
      """SELECT cosine_sim(array(1.0D, 0.0D, 1.0D), array(1.0D, 0.0D, 1.0D)) AS c,
                size(word_shingles('a b c d')) AS ns,
                size(minhash_band_keys(word_shingles('a b c d e'))) AS nb""").collect()(0)
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(r.getInt(1) == 2)   // 'a b c', 'b c d'
    assert(r.getInt(2) == 16)  // 16 band keys
  }

  test("top_k_by_score usable as a SQL aggregate") {
    GraftExtensions.ensureRegistered(spark)
    Tables.part(spark, sfDir).createOrReplaceTempView("part_sql")
    val viaAgg = spark.sql(
      """SELECT p_brand, t.id AS p_partkey
         FROM (SELECT p_brand, top_k_by_score(p_retailprice, p_partkey, 2) AS top
               FROM part_sql GROUP BY p_brand)
         LATERAL VIEW explode(top) AS t
         ORDER BY p_brand, t.score DESC, t.id""").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val viaWindow = spark.sql(
      """SELECT p_brand, p_partkey FROM (
           SELECT p_brand, p_partkey, row_number() OVER (PARTITION BY p_brand
             ORDER BY p_retailprice DESC, p_partkey) AS rn FROM part_sql)
         WHERE rn <= 2 ORDER BY p_brand, rn""").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(viaAgg.sameElements(viaWindow))
  }

  test("cosine_sim from SQL over the embeddings table matches the operator path") {
    GraftExtensions.ensureRegistered(spark)
    Tables.embeddings(spark, sfDir).createOrReplaceTempView("emb")
    val viaSql = spark.sql(
      """SELECT a.vec_id, cosine_sim(a.embedding, b.embedding) AS c
         FROM emb a JOIN emb b ON b.vec_id = 0 AND a.vec_id < 5
         ORDER BY a.vec_id""").collect().map(_.getDouble(1))
    assert(viaSql.length == 5)
    assert(math.abs(viaSql(0) - 1.0) < 1e-12) // self-similarity
  }
}
