package graft

import org.apache.spark.sql.SparkSession

/** The single "open the engine" entry point: every main (Bench,
  * BenchOne, Verify) and any embedding application builds its session
  * here, so the confs the engine needs before its FIRST table read are
  * set in one place instead of as side effects of whichever loader
  * happens to run first.
  *
  * Why this exists: `events.parquet` has shipped carrying
  * TIMESTAMP(NANOS), which Spark 4 rejects at scan time unless the
  * legacy nanos-as-long conf is on. A query that counted `events`
  * without reading `ts` used to depend on ANOTHER query having run
  * first in the same session — an order dependence a fresh-session
  * user hits on their very first query. Bootstrapping the conf at
  * session build makes every registry entry self-contained
  * ([[Tables.events]] keeps only a fail-then-set fallback for
  * caller-built sessions, engaged when the nanos scan actually
  * rejects); IsolationSpec runs each entry against
  * deliberately-reset conf state to keep it that way.
  */
object GraftSession {

  /** Confs that must hold before any graft table is scanned. */
  val requiredConfs: Map[String, String] = Map(
    // TIMESTAMP(NANOS) parquet columns read as epoch-nanos long;
    // Tables.events truncates to micros (same truncation DuckDB applies)
    "spark.sql.legacy.parquet.nanosAsLong" -> "true",
    // the engine's declared determinism contract (SURVEY §5) is
    // session TZ = UTC everywhere; before this lived here, only
    // Verify and the specs pinned it — a Bench or embedding session
    // on a non-UTC JVM would shift every NTZ→timestamp cast and
    // date_trunc by the host offset
    "spark.sql.session.timeZone" -> "UTC")

  /** Apply [[requiredConfs]] to an existing session (all are
    * runtime-settable SQL confs). Idempotent. */
  def configure(s: SparkSession): SparkSession = {
    requiredConfs.foreach { case (k, v) => s.conf.set(k, v) }
    s
  }

  /** Build the standard local engine session: `local[cpus]` with
    * shuffle parallelism matched to the core count (not the 200
    * default — at local scale 200 tiny shuffle partitions are pure
    * scheduling overhead; on a real cluster this knob is sized to
    * executors × cores). Extra confs layer on top. */
  def build(cpus: String, extraConfs: Map[String, String] = Map.empty): SparkSession = {
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    val all = requiredConfs ++ extraConfs
    all.foreach { case (k, v) => b.config(k, v) }
    val s = b.getOrCreate()
    // getOrCreate can return a pre-existing session whose builder
    // confs were ignored — re-apply EVERYTHING requested, required
    // and caller extras alike, so an embedding JVM's stale session
    // can't silently drop them
    all.foreach { case (k, v) => s.conf.set(k, v) }
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
