package graft

import graft.operators.Relational

class RelationalSpec extends SparkTestBase {

  test("every relational query returns rows at sf0.001") {
    Relational.queries.foreach { case (name, fn) =>
      val n = fn(spark, sfDir).count()
      assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("every relational query has an oracle") {
    assert(Relational.oracles.keySet == Relational.queries.keySet)
  }

  test("q1_agg groups to the six flag/status combinations") {
    val rows = Relational.queries("q1_agg")(spark, sfDir).collect()
    assert(rows.length == 6)
    val flags = rows.map(_.getString(0)).toSet
    assert(flags == Set("A", "N", "R"))
  }

  test("q3_join_topk is sorted by revenue descending") {
    val rev = Relational.queries("q3_join_topk")(spark, sfDir)
      .collect().map(_.getDouble(1))
    assert(rev.length == 10)
    assert(rev.sameElements(rev.sortBy(-_)))
  }

  test("q12_anti_join excludes all customers having an URGENT order") {
    val anti = Relational.queries("q12_anti_join")(spark, sfDir)
      .select("c_custkey").collect().map(_.getLong(0)).toSet
    val urgent = Tables.orders(spark, sfDir)
      .filter(org.apache.spark.sql.functions.col("o_orderpriority") === "1-URGENT")
      .select("o_custkey").collect().map(_.getLong(0)).toSet
    assert(anti.intersect(urgent).isEmpty)
  }

  test("q83 gap fill: dense contiguous daily spine, counts preserved, gaps flagged") {
    val rows = graft.operators.Relational2.queries("q83_gap_fill")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val days = rows.map(r => java.time.LocalDate.parse(r.getString(0)))
    // contiguous: row count equals the full calendar span, no holes
    val span = java.time.temporal.ChronoUnit.DAYS.between(days.head, days.last) + 1
    assert(days.length.toLong == span, s"spine has holes: ${days.length} rows over $span days")
    // counts preserved: zero-filling must not invent or lose orders
    assert(rows.map(_.getLong(1)).sum == Tables.orders(spark, sfDir).count())
    // flag consistency
    assert(rows.forall(r => (r.getLong(2) == 1L) == (r.getLong(1) == 0L)))
  }

  test("q189 data-quality suite: all declared checks pass on clean data, " +
       "and a planted violation is caught") {
    val rows = SparkEntry.queries("q189_data_quality")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3),
                 r.getBoolean(4)))
    assert(rows.map(_._1).toSeq == (1L to 7L))
    // the synthetic warehouse is referentially clean: every check passes
    rows.foreach { case (id, tbl, check, metric, pass) =>
      assert(pass, s"check $id $tbl.$check failed with metric $metric")
      if (check != "non_empty") assert(metric == 0L)
    }
    // the checks have teeth: an orphaned order key flips fk_customer —
    // recompute check 5's metric against a corrupted orders relation
    import org.apache.spark.sql.functions._
    val orders = Tables.orders(spark, sfDir)
      .withColumn("o_custkey",
        when(col("o_orderkey") % 100 === 0, lit(-1L)).otherwise(col("o_custkey")))
    val orphans = orders.join(Tables.customer(spark, sfDir),
        orders("o_custkey") === col("c_custkey"), "left_anti").count()
    assert(orphans > 0, "the planted corruption must register as orphans")
  }
}
