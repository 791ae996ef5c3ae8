package graft.catalog

import org.apache.spark.sql.SparkSession

/** Session plumbing for the SQL row-level-mutation surface.
  *
  * [[GraftExtensions]] binds at SESSION BUILD time (`spark.sql.extensions`
  * is read once by the builder), so a host-owned session created without it
  * cannot gain `UPDATE`/`MERGE INTO` later. [[withExtensions]] derives a
  * sibling session on the CURRENT SparkContext with the extensions and the
  * graft catalog configured: it temporarily clears the global
  * default/active sessions (otherwise `getOrCreate` returns the host
  * session unchanged), builds, and restores the globals. The sibling shares
  * the context — do NOT `stop()` it. */
object GraftSessions {
  // one derived session per warehouse, not one per call (round-6): a
  // sibling session is ~100 ms of SessionState/analyzer/catalog init, and
  // callers that mutate the same warehouse repeatedly (the gate queries,
  // a REPL user issuing several DMLs) would otherwise rebuild it every
  // statement. Keyed by warehouse; invalidated when its SparkContext was
  // stopped (tests stop and recreate contexts between suites).
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, SparkSession]()

  def withExtensions(warehouse: String): SparkSession = {
    val cached = cache.get(warehouse)
    if (cached != null && !cached.sparkContext.isStopped) return cached
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val s = SparkSession.builder()
        .withExtensions(new GraftExtensions()(_))
        .config("spark.sql.catalog.graft", "graft.catalog.GraftCatalog")
        .config("spark.sql.catalog.graft.warehouse", warehouse)
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
      cache.put(warehouse, s)
      s
    } finally {
      SparkSession.setDefaultSession(prevDefault.orNull)
      SparkSession.setActiveSession(prevActive.orNull)
    }
  }
}
