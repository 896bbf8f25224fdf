package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Dev utility (VERDICT r15 task 4): attribute q289's steady-state
  * wall-clock across its three nested legs — the persisted index-slice
  * read (assignment columns ⋈ corpus vectors), the probed core search
  * (codebook crossJoin + probe TopK + candidate-scoring TopK), and the
  * margin tail (pair union/dedup + two density joins + per-anchor
  * argmax). Legs nest, so leg deltas are the attribution:
  *
  *   slice read = t(read)        probe = t(cores) − t(read)
  *   margin tail = t(full) − t(cores)
  *
  * The first full run builds the memoized side indexes + codebooks (the
  * write-once lifecycle cost, attributed separately); every timing below
  * is steady state (min over reps AFTER the warm build). q286 (in-plan
  * assignment) and q126 (brute exact) run beside it for the family
  * comparison the adjudication cites.
  *
  * Usage: MineProbe [sfDir] [reps]
  */
object MineProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(5)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // toRdd.count materializes the plan EXACTLY as built (a Dataset
    // .count would let Catalyst prune the aggregate payloads away)
    def time(mk: () => DataFrame): Double = {
      var best = Double.MaxValue
      for (_ <- 1 to reps) {
        val t0 = System.nanoTime()
        mk().queryExecution.toRdd.count()
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      best
    }

    // warm build: side indexes + codebooks + handles (the write-once
    // lifecycle artifacts), timed once for the ledger
    val t0 = System.nanoTime()
    graft.SparkEntry.queries("q289_mining_index_lifecycle")(spark, sfDir)
      .collect()
    val tBuild = (System.nanoTime() - t0) / 1e9

    val tRead = time { () =>
      val ((asgB, asgA), _) = graft.operators.Mining.q289Legs(spark, sfDir)
      asgB.unionByName(asgA)
    }
    val tCores = time { () =>
      // positional union: the per-side id columns are named a_id / b_id
      val (_, (fwd, bwd)) = graft.operators.Mining.q289Legs(spark, sfDir)
      fwd.union(bwd)
    }
    val tFull = time { () =>
      graft.SparkEntry.queries("q289_mining_index_lifecycle")(spark, sfDir) }
    val t286 = time { () =>
      graft.SparkEntry.queries("q286_margin_mine_probed")(spark, sfDir) }
    val t126 = time { () =>
      graft.SparkEntry.queries("q126_margin_mine")(spark, sfDir) }

    println(f"[mine] first_full_incl_index_build=$tBuild%.2fs (write-once)")
    println(f"[mine] slice_read=$tRead%.2fs")
    println(f"[mine] cores=$tCores%.2fs -> probe_search=${tCores - tRead}%.2fs")
    println(f"[mine] full=$tFull%.2fs -> margin_tail=${tFull - tCores}%.2fs")
    println(f"[mine] q286_inplan=$t286%.2fs q126_brute=$t126%.2fs reps=$reps")
    spark.stop()
  }
}
