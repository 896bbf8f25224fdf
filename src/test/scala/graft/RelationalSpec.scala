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
}
