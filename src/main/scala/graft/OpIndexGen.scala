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

  /** (key, owning pack, oracle kind) for every declared query — the
    * stable registry content of the README table (the `registered at`
    * file:line column is resolved by grep in tools/gen_opindex.py and
    * shifts with unrelated edits, so it is display-only, not contract).
    * OpIndexSpec string-compares THIS against the committed README
    * section, which is what makes the registry ↔ README index match a
    * failing test instead of a convention. */
  def rows: Seq[(String, String, String)] =
    for {
      pack <- SparkEntry.packs
      packName = pack.getClass.getSimpleName.stripSuffix("$")
      // Probe oraclesFor with a dir no query ever built for: every
      // generated-oracle entry is keyed by a per-dir codebook cache, so
      // the probe returns its `_not_built` placeholder REGARDLESS of
      // what this process has trained. (Classifying off the static
      // `oracles` map was state-dependent: a pack whose fallback embeds
      // the one trained codebook flips kind once another query trains
      // it — OpIndexSpec flaked in the full suite exactly that way.)
      oracles = pack.oraclesFor("__opindex_probe__")
      key <- pack.queries.keys.toSeq.sorted
    } yield {
      val kind = oracles.get(key) match {
        case Some(sql) if sql.contains("_not_built") => "generated"
        case Some(_)                                 => "sql"
        // absent even from oraclesFor → produced only at query build
        case None                                    => "generated"
      }
      (key, packName, kind)
    }

  def main(args: Array[String]): Unit =
    rows.foreach { case (k, p, o) => println(s"$k\t$p\t$o") }
}
