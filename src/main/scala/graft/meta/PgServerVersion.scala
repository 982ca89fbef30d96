package graft.meta

/** Server version / instance sniffing.
  *
  * Mirrors the reference's probe semantics (ref:
  * src/postgres_connection.cpp:122-134, src/postgres_utils.cpp:435-476):
  * parse major.minor.patch out of `version()`, and treat an instance
  * with any `rds%` settings as Aurora. Consequences (ref:
  * src/postgres_scanner.cpp:65-123):
  *   - ctid-range parallel scans are disabled below PG 14 (inefficient
  *     there — the scan falls back to one streaming partition);
  *   - snapshot export is skipped on Aurora and on replicas/instances
  *     in recovery (`pg_is_in_recovery()` / an active wal receiver).
  */
final case class PgServerVersion(
    major: Int, minor: Int, patch: Int, aurora: Boolean) {
  def supportsCtidScan: Boolean = major >= 14
}

object PgServerVersion {
  val unknown: PgServerVersion = PgServerVersion(0, 0, 0, aurora = false)

  private val VerRe = """(\d+)(?:\.(\d+))?(?:\.(\d+))?""".r

  def parse(versionString: String, rdsSettings: Long = 0L): PgServerVersion =
    VerRe.findFirstMatchIn(versionString) match {
      case Some(m) =>
        def g(i: Int): Int = Option(m.group(i)).map(_.toInt).getOrElse(0)
        PgServerVersion(g(1), g(2), g(3), aurora = rdsSettings > 0)
      case None => unknown.copy(aurora = rdsSettings > 0)
    }

  /** One round trip: version string + count of rds% settings. */
  def probe(t: PgTransport): PgServerVersion = {
    val ver = t.query(PgCatalogQueries.versionProbe).head.head
    val rds =
      try t.query(PgCatalogQueries.rdsProbe).head.head.toLong
      catch { case _: Exception => 0L }
    parse(ver, rds)
  }

  // Recovery state is stable for the life of an attached session (a
  // primary→replica flip mid-session forces reconnects anyway), so
  // probe once per DSN instead of once per scan plan — on a remote
  // server the per-plan probe is a full round trip. Cleared by the
  // catalog's pg_clear_cache analogue alongside the table cache.
  private val recoveryCache =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]()

  def inRecoveryCached(dsn: String): Boolean =
    recoveryCache.computeIfAbsent(dsn, { _ =>
      val t = PgTransportFactory.open(dsn)
      try java.lang.Boolean.valueOf(inRecovery(t)) finally t.close()
    }).booleanValue()

  def clearRecoveryCache(): Unit = recoveryCache.clear()

  /** True when exporting a snapshot is pointless/unsupported here:
    * replica / instance in recovery (ref: PostgresGetSnapshot,
    * src/postgres_scanner.cpp:65-100). */
  def inRecovery(t: PgTransport): Boolean =
    try {
      val row = t.query(PgCatalogQueries.recoveryProbe).head
      row.head == "t" || row.head == "true" || row(1).toLong > 0
    } catch {
      case _: Exception =>
        // pre-9.6 has no pg_stat_wal_receiver; fall back to the
        // recovery flag alone, and on total failure skip the snapshot
        try {
          val r = t.query("SELECT pg_is_in_recovery()").head.head
          r == "t" || r == "true"
        } catch { case _: Exception => true }
    }
}
