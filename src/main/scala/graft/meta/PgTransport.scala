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

  def open(dsn: String): PgTransport = PgConnectionPool.acquire(dsn)

  private[meta] def openRaw(dsn: String): PgTransport =
    if (dsn.startsWith("mem:")) InMemoryPg.forName(dsn.stripPrefix("mem:"))
    else throw new IllegalArgumentException(
      s"unsupported dsn '$dsn': only mem: endpoints are available in this " +
        "offline build; a live server needs the socket transport")
}

/** Per-JVM transport pool, the reference's connection pool shape
  * (ref: src/storage/postgres_connection_pool.cpp:43-134): at most
  * `connectionLimit` live transports per DSN, idle ones cached and
  * health-checked on reuse, released transports returned rather than
  * torn down. Callers hold a [[PooledTransport]] whose `close()`
  * returns it to the pool.
  *
  * For `mem:` DSNs the underlying endpoint is a shared in-process
  * object, so the pool's role is bookkeeping + the acquire/release
  * contract the socket transport will need; the cap and health-check
  * logic is exercised all the same.
  */
object PgConnectionPool {
  import java.util.concurrent.{ConcurrentHashMap, Semaphore}

  private final class DsnPool(dsn: String) {
    val permits = new Semaphore(PgTransportFactory.connectionLimit)
    val idle = new java.util.concurrent.ConcurrentLinkedQueue[PgTransport]()
    @volatile var acquires: Long = 0L
    @volatile var reuses: Long = 0L
  }

  private val pools = new ConcurrentHashMap[String, DsnPool]()

  def acquire(dsn: String): PgTransport = {
    val pool = pools.computeIfAbsent(dsn, new DsnPool(_))
    pool.permits.acquire()
    pool.acquires += 1
    val cached = pool.idle.poll()
    val raw = cached match {
      case null => PgTransportFactory.openRaw(dsn)
      case t =>
        // health check on reuse (ref: pool reset-on-return + check)
        try { t.query(PgCatalogQueries.versionProbe); pool.reuses += 1; t }
        catch { case _: Exception => PgTransportFactory.openRaw(dsn) }
    }
    new PooledTransport(raw, pool)
  }

  /** (acquires, reuses) counters for a DSN — test observability. */
  def stats(dsn: String): (Long, Long) = {
    val p = pools.get(dsn)
    if (p == null) (0L, 0L) else (p.acquires, p.reuses)
  }

  private final class PooledTransport(underlying: PgTransport, pool: DsnPool)
      extends PgTransport {
    private val closed = new java.util.concurrent.atomic.AtomicBoolean(false)
    override def execute(sql: String): Unit = underlying.execute(sql)
    override def query(sql: String): Seq[Seq[String]] = underlying.query(sql)
    override def copyOut(sql: String): java.io.InputStream = underlying.copyOut(sql)
    override def copyIn(sql: String): java.io.OutputStream = underlying.copyIn(sql)
    override def close(): Unit = if (closed.compareAndSet(false, true)) {
      pool.idle.add(underlying)
      pool.permits.release()
    }
  }
}
