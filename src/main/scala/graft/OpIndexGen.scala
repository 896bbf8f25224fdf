package graft

/** README operator-index generator: dumps one TSV line per declared
  * query — key, owning pack object, oracle kind — straight from
  * [[SparkEntry.packs]], so the generated README table can never drift
  * from the actual registry (tools/gen_opindex.py resolves each key's
  * registration site by grep and splices the table into README.md).
  *
  * Oracle kinds:
  *  - `sql`        — static DuckDB SQL in the pack's `oracles` map
  *  - `generated`  — literals captured at query build (trained
  *                   codebooks / planes), dumped via `oraclesFor(dir)`
  * Every declared query has one of the two (the repo carries no
  * rows-only checks).
  */
object OpIndexGen {
  def main(args: Array[String]): Unit = {
    for (pack <- SparkEntry.packs) {
      val packName = pack.getClass.getSimpleName.stripSuffix("$")
      val oracles = pack.oracles
      for (key <- pack.queries.keys.toSeq.sorted) {
        val kind = oracles.get(key) match {
          case Some(sql) if sql.contains("_not_built") => "generated"
          case Some(_)                                 => "sql"
          // absent from the static map → produced only by oraclesFor
          case None                                    => "generated"
        }
        println(s"$key\t$packName\t$kind")
      }
    }
  }
}
