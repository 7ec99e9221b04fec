package graft

/** Every registry entry must be self-contained in a FRESH session: no
  * entry may depend on a session-global side effect (a legacy-parquet
  * conf, a cached frame, a temp view) left behind by a different entry
  * that happened to run earlier. Round 5's q_union_counts crashed on
  * its own because Verify/Bench run entries in sorted order and an
  * earlier query's `Tables.events` call had already set the
  * nanos-timestamp conf — the green oracle row masked an operator a
  * first-query user couldn't run.
  *
  * Spinning up 75 actual SparkSessions would take minutes, so instead
  * each entry runs against deliberately-RESET session state: every
  * [[GraftSession.requiredConfs]] key is unset back to its Spark
  * default, the cache is cleared, and temp views are dropped. Any
  * entry that leans on another entry's leftovers fails here exactly
  * the way it would fail alone in a fresh session.
  */
class IsolationSpec extends SparkSpec {

  private def resetSessionState(): Unit = {
    GraftSession.requiredConfs.keys.foreach(spark.conf.unset)
    spark.catalog.clearCache()
    spark.catalog.listTables().collect()
      .filter(_.isTemporary).foreach(t => spark.catalog.dropTempView(t.name))
  }

  // q_union_counts first — the round-5 repro ordering — then the rest
  // alphabetically, each against reset state.
  private val names =
    "q_union_counts" +: SparkEntry.queries.keys.toSeq.filterNot(_ == "q_union_counts").sorted

  names.foreach { name =>
    test(s"$name runs against fresh session state") {
      resetSessionState()
      // noop write materializes the FULL plan (count() would let
      // Catalyst prune sorts/projects that might hide the hazard)
      SparkEntry.queries(name)(spark, sf)
        .write.mode("overwrite").format("noop").save()
    }
  }
}
