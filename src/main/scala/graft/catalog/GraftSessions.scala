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
  def withExtensions(warehouse: String): SparkSession = {
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try SparkSession.builder()
      .withExtensions(new GraftExtensions()(_))
      .config("spark.sql.catalog.graft", "graft.catalog.GraftCatalog")
      .config("spark.sql.catalog.graft.warehouse", warehouse)
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    finally {
      SparkSession.setDefaultSession(prevDefault.orNull)
      SparkSession.setActiveSession(prevActive.orNull)
    }
  }
}
