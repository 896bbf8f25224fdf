package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}

/** Standard extension entry point: enables the engine's native functions
  * on any session via
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or the
  * `spark.sql.extensions=graft.GraftExtensions` config (cluster-wide,
  * no code changes for SQL users).
  *
  * Function registration happens lazily on first session use via an
  * injected check rule (the extensions API has no direct "on session
  * ready" hook for temp functions; a resolution-rule closure sees the
  * session once analysis first runs).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectCheckRule { session =>
      GraftExtensions.ensureRegistered(session)
      _ => ()
    }
  }
}

object GraftExtensions {
  /** Idempotent function registration (also usable directly on a session). */
  def ensureRegistered(spark: SparkSession): Unit = synchronized {
    functions.NativeExprs.register(spark)
    functions.AvroFunctions.register(spark)
  }
}
