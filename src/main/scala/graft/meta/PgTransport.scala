package graft.meta

import java.io.{InputStream, OutputStream}

/** Transport boundary to a Postgres server.
  *
  * The reference talks libpq (`PQexec`, `PQgetCopyData`,
  * `PQputCopyData` — ref: src/postgres_connection.cpp,
  * src/postgres_copy_from.cpp:6-13); this trait is the Spark-side
  * equivalent seam. Each scan partition / write task acquires its own
  * transport (the reference likewise opens one libpq connection per
  * parallel task, ref: src/postgres_scanner.cpp:354-383).
  *
  * Implementations:
  *   - [[InMemoryPg]]: an offline endpoint for tests/CI (no server in
  *     this environment) that stores tables as pages and serves/accepts
  *     real PGCOPY binary bytes through the same byte-level contract a
  *     server would.
  *   - a socket implementation of the public PostgreSQL frontend/
  *     backend protocol would plug in here for live use; nothing above
  *     this seam changes.
  */
trait PgTransport extends AutoCloseable {
  /** Run a statement for effect (DDL/DML forwarding — ref:
    * src/postgres_execute.cpp:12-57). */
  def execute(sql: String): Unit

  /** Run a catalog/metadata query; rows of text values (nulls as null).
    * Mirrors libpq text-format result sets used for discovery. */
  def query(sql: String): Seq[Seq[String]]

  /** `COPY (...) TO STDOUT (FORMAT binary)` byte stream. */
  def copyOut(sql: String): InputStream

  /** `COPY ... FROM STDIN (FORMAT binary)`; closing the stream ends the
    * copy. */
  def copyIn(sql: String): OutputStream
}

/** Resolves a DSN to a transport. `mem:<name>` DSNs address in-process
  * [[InMemoryPg]] instances (one per name, shared across the local[*]
  * executor threads — a cluster deployment resolves socket DSNs here
  * instead, one connection per task, pooled per-executor like the
  * reference's 64-connection pool,
  * ref: src/storage/postgres_connection_pool.cpp:43-134). */
object PgTransportFactory {
  @volatile private var poolLimit: Int = 64 // pg_connection_limit default

  def connectionLimit: Int = poolLimit
  def setConnectionLimit(n: Int): Unit = poolLimit = n

  def open(dsn: String): PgTransport =
    if (dsn.startsWith("mem:")) InMemoryPg.forName(dsn.stripPrefix("mem:"))
    else throw new IllegalArgumentException(
      s"unsupported dsn '$dsn': only mem: endpoints are available in this " +
        "offline build; a live server needs the socket transport")
}
