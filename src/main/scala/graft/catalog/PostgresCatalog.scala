package graft.catalog

import java.util.concurrent.ConcurrentHashMap

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.meta.{PgCatalogQueries, PgTransportFactory}
import graft.sources.postgres.{PostgresOptions, PostgresTable}
import graft.sqlgen.PgSqlGen
import graft.types.PgType

/** `spark.sql.catalog.<name> = graft.catalog.PostgresCatalog` — the
  * Spark shape of the reference's ATTACH storage extension
  * (ref: src/postgres_storage.cpp:55-111, SURVEY.md §3.1):
  *
  *   spark.conf: spark.sql.catalog.pg = graft.catalog.PostgresCatalog
  *               spark.sql.catalog.pg.dsn = <dsn>
  *   SELECT * FROM pg.public.lineitem
  *
  * Namespaces map to pg schemas (lazy discovery from pg_namespace,
  * ref: src/storage/postgres_schema_set.cpp:37-82), tables are
  * discovered per-load with a cache + explicit invalidation (the
  * `pg_clear_cache` analogue,
  * ref: src/storage/postgres_clear_cache.cpp:24-51), and DDL is
  * forwarded as SQL (ref: src/storage/postgres_table_set.cpp:292-413).
  */
class PostgresCatalog extends TableCatalog with SupportsNamespaces
    with StagingTableCatalog {

  private var catalogName: String = _
  private var dsn: String = _
  private var extraOptions: Map[String, String] = Map.empty
  private val tableCache = new ConcurrentHashMap[(String, String), PostgresTable]()

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    // explicit dsn wins; otherwise assemble one from secret-style parts
    // (host/port/user/password/database — the CREATE SECRET analogue,
    // ref: src/postgres_storage.cpp:26-98)
    dsn = Option(options.get("dsn"))
      .orElse(graft.meta.PgDsn.assemble(options.asScala.toMap))
      .getOrElse(throw new IllegalArgumentException(
        s"catalog $name requires option 'dsn' or host/user/... connection parts"))
    extraOptions = options.asScala.toMap
    // version probe at attach (ref: src/storage/postgres_catalog.cpp:12-27)
    val t = PgTransportFactory.open(dsn)
    try t.query(PgCatalogQueries.versionProbe) finally t.close()
  }

  override def name(): String = catalogName

  /** `pg_clear_cache` analogue. */
  def invalidateAll(): Unit = {
    tableCache.clear()
    graft.meta.PgServerVersion.clearRecoveryCache()
  }

  /** DETACH analogue (ref: test/sql/storage/attach_detach.test): drop
    * the discovery cache and close every pooled idle connection for
    * this catalog's DSN. Spark unregisters catalogs per-session; this
    * releases the server-side resources that registration acquired.
    * The catalog object stays usable — a later query re-pools, exactly
    * like re-attaching. */
  def close(): Int = {
    invalidateAll()
    graft.meta.PgConnectionPool.drain(dsn)
  }

  override def invalidateTable(ident: Identifier): Unit =
    tableCache.remove((nsOf(ident), ident.name()))

  private def nsOf(ident: Identifier): String =
    if (ident.namespace().isEmpty) "public" else ident.namespace().mkString(".")

  private def withTransport[A](f: graft.meta.PgTransport => A): A = {
    val t = PgTransportFactory.open(dsn)
    try f(t) finally t.close()
  }

  /** READ_ONLY attach: all catalog DDL and `execute` error host-side
    * (ref: attach_read_only.test; the per-table write guard rides the
    * same option through loadTable's PostgresOptions). */
  private def readOnly: Boolean =
    extraOptions.exists { case (k, v) => k.equalsIgnoreCase("readOnly") && v.toBoolean }

  private def assertWritable(what: String): Unit =
    if (readOnly) throw new UnsupportedOperationException(
      s"cannot $what: catalog $catalogName is attached in read-only mode (readOnly=true)")

  // ---------------- namespaces ---------------- //

  /** `pg_temp` is surfaced as a namespace even though the server's
    * pg_namespace lists only the concrete per-session schemas
    * (pg_temp_N): Postgres resolves the alias per connection, and the
    * reference exposes temp tables through its attached catalog the
    * same way (ref: test/sql/storage/attach_temporary_table.test —
    * which upstream marks `mode skip` for the same session-affinity
    * reasons).
    *
    * The namespace is exposed ONLY for `mem:` DSNs, where the offline
    * endpoint is one shared store and the semantics are exact. On a
    * real multi-connection server the surface CANNOT work from a
    * pooled catalog — CREATE TEMPORARY would land on one pooled
    * connection (and die with its release), discovery by
    * nspname='pg_temp' matches nothing, and scans open fresh
    * connections that can never see another session's temp schema —
    * so pg_temp operations over the wire fail fast with a pointer at
    * `PgFunctions.withTransaction`, whose pinned session gives real
    * temp-table semantics for script ports. */
  private val TempNs = "pg_temp"

  /** mem: DSNs always (one shared store, exact semantics); wire DSNs
    * while a `PgFunctions.withTransaction` block pins a session for
    * this DSN — pg_temp operations then route onto that connection
    * ([[PgTempWireTable]]), which is the only place they can work. */
  private def tempNsSupported: Boolean = dsn != null &&
    (dsn.startsWith("mem:") || graft.functions.PgTxnRegistry.lookup(dsn).isDefined)

  private def tempNsOverWire: Boolean = dsn != null && !dsn.startsWith("mem:")

  private def pinnedTransport(what: String): graft.meta.PgTransport =
    graft.functions.PgTxnRegistry.lookup(dsn).getOrElse(
      throw new UnsupportedOperationException(
        s"cannot $what: pg_temp through a pooled catalog has no session affinity " +
          "on a real server — use PgFunctions.withTransaction(dsn) { s => ... } " +
          "and run pg_temp operations inside the block"))

  private def assertTempNsUsable(what: String): Unit =
    if (!tempNsSupported) throw new UnsupportedOperationException(
      s"cannot $what: pg_temp through a pooled catalog has no session affinity on a " +
        "real server — use PgFunctions.withTransaction(dsn) { s => ... } for " +
        "session-scoped temporary tables")

  override def listNamespaces(): Array[Array[String]] = {
    val real = withTransport(_.query(PgCatalogQueries.listSchemas)).map(r => Array(r.head)).toArray
    if (tempNsSupported) real :+ Array(TempNs) else real
  }

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    if (namespace.isEmpty) listNamespaces() else Array.empty

  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.length == 1 && listNamespaces().exists(_.sameElements(namespace))

  override def loadNamespaceMetadata(namespace: Array[String]): java.util.Map[String, String] = {
    if (!namespaceExists(namespace))
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchNamespaceException(namespace)
    Map.empty[String, String].asJava
  }

  override def createNamespace(
      namespace: Array[String],
      metadata: java.util.Map[String, String]): Unit = {
    assertWritable("CREATE SCHEMA")
    withTransport(_.execute(s"CREATE SCHEMA ${PgSqlGen.quoteIdent(namespace.head)}"))
  }

  override def alterNamespace(namespace: Array[String], changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException("ALTER SCHEMA is not forwarded")

  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean = {
    assertWritable("DROP SCHEMA")
    val suffix = if (cascade) " CASCADE" else ""
    withTransport(_.execute(s"DROP SCHEMA ${PgSqlGen.quoteIdent(namespace.head)}$suffix"))
    true
  }

  // ---------------- tables ---------------- //

  override def listTables(namespace: Array[String]): Array[Identifier] =
    if (namespace.headOption.contains(TempNs) && tempNsOverWire) {
      assertTempNsUsable("list pg_temp tables")
      // session temp namespace is pg_temp_N on a real server — resolve
      // through pg_my_temp_schema(), never the 'pg_temp' alias
      pinnedTransport("list pg_temp tables")
        .query(PgCatalogQueries.listTempTables)
        .map(r => Identifier.of(namespace, r.head)).toArray
    } else withTransport(_.query(PgCatalogQueries.listTables(namespace.head)))
      .map(r => Identifier.of(namespace, r.head)).toArray

  override def loadTable(ident: Identifier): Table = {
    val key = (nsOf(ident), ident.name())
    if (key._1 == TempNs) {
      assertTempNsUsable("resolve a pg_temp table")
      // wire DSN: bind over the pinned session connection, uncached —
      // the table dies with the session, so a cached binding would
      // outlive it
      if (tempNsOverWire)
        return try PgTempWireTable.discover(dsn, ident.name())
          catch {
            case e: graft.meta.PgServerErrorException if e.sqlState == "42P01" =>
              throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(ident)
            case e: graft.meta.PgBackendException if e.sqlState == "42P01" =>
              throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(ident)
          }
    }
    val cached = tableCache.get(key)
    if (cached != null) cached
    else {
      val opts = PostgresOptions(extraOptions ++ Map(
        "dsn" -> dsn, "schema" -> key._1, "table" -> key._2))
      val t =
        try PostgresTable.discover(opts)
        catch {
          // wire transports carry the SQLSTATE — branch on the error
          // CLASS (42P01 undefined_table), never on message text: a
          // discovery probe can fail with 'function ... does not
          // exist' or 'column "x" does not exist' and swallowing
          // those as table-not-found hides the real server error
          case e: graft.meta.PgServerErrorException =>
            if (e.sqlState == "42P01")
              throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(ident)
            else throw e
          // the in-process endpoint attaches the state at the raise
          // site too; must match BEFORE the IAE text fallbacks so a
          // typed 42703 (missing column) is never swallowed as
          // table-not-found
          case e: graft.meta.PgBackendException =>
            if (e.sqlState == "42P01")
              throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(ident)
            else throw e
          // legacy in-process raises without a state; message
          // matching stays as ITS classification only
          case e: IllegalArgumentException if e.getMessage != null &&
            e.getMessage.contains("not found") =>
            throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(ident)
          case e: Exception if !e.isInstanceOf[graft.meta.PgServerErrorException] &&
            e.getMessage != null && e.getMessage.contains("does not exist") =>
            throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(ident)
        }
      tableCache.put(key, t)
      t
    }
  }

  override def tableExists(ident: Identifier): Boolean =
    try { loadTable(ident); true }
    catch { case _: org.apache.spark.sql.catalyst.analysis.NoSuchTableException => false }

  /** CREATE TABLE forwarded as DDL
    * (ref: src/storage/postgres_table_set.cpp:292-319). */
  override def createTable(
      ident: Identifier,
      schema: StructType,
      partitions: Array[Transform],
      properties: java.util.Map[String, String]): Table = {
    assertWritable("CREATE TABLE")
    require(partitions.isEmpty, "postgres tables have no Spark partitioning")
    val cols = schema.fields.map { f =>
      val pg = PgType.typeString(PgType.fromSpark(f.dataType))
      val notNull = if (f.nullable) "" else " NOT NULL"
      s"${PgSqlGen.quoteIdent(f.name)} $pg$notNull"
    }.mkString(", ")
    val ns = nsOf(ident)
    // pg_temp: CREATE TEMPORARY TABLE (unqualified — Postgres resolves
    // the temp schema per session; qualifying with pg_temp is the
    // equivalent spelling but TEMPORARY is the canonical DDL)
    if (ns == TempNs) assertTempNsUsable("CREATE TABLE in pg_temp")
    val ddl =
      if (ns == TempNs)
        s"CREATE TEMPORARY TABLE ${PgSqlGen.quoteIdent(ident.name())} ($cols)"
      else
        s"CREATE TABLE ${PgSqlGen.quoteIdent(ns)}.${PgSqlGen.quoteIdent(ident.name())} ($cols)"
    if (ns == TempNs && tempNsOverWire)
      pinnedTransport("CREATE TABLE in pg_temp").execute(ddl)
    else withTransport(_.execute(ddl))
    loadTable(ident)
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    assertWritable("ALTER TABLE")
    val ns = nsOf(ident)
    val qname = s"${PgSqlGen.quoteIdent(ns)}.${PgSqlGen.quoteIdent(ident.name())}"
    changes.foreach {
      case a: TableChange.AddColumn =>
        val pg = PgType.typeString(PgType.fromSpark(a.dataType()))
        withTransport(_.execute(
          s"ALTER TABLE $qname ADD COLUMN ${PgSqlGen.quoteIdent(a.fieldNames().head)} $pg"))
      case d: TableChange.DeleteColumn =>
        withTransport(_.execute(
          s"ALTER TABLE $qname DROP COLUMN ${PgSqlGen.quoteIdent(d.fieldNames().head)}"))
      case r: TableChange.RenameColumn =>
        withTransport(_.execute(
          s"ALTER TABLE $qname RENAME COLUMN ${PgSqlGen.quoteIdent(r.fieldNames().head)} " +
            s"TO ${PgSqlGen.quoteIdent(r.newName())}"))
      case other =>
        throw new UnsupportedOperationException(s"table change $other is not forwarded")
    }
    invalidateTable(ident)
    loadTable(ident)
  }

  override def dropTable(ident: Identifier): Boolean = {
    assertWritable("DROP TABLE")
    val ns = nsOf(ident)
    val existed = tableExists(ident)
    if (existed) {
      // temp tables drop unqualified (the per-session schema name
      // pg_temp_N is not ours to spell)
      val target =
        if (ns == TempNs) PgSqlGen.quoteIdent(ident.name())
        else s"${PgSqlGen.quoteIdent(ns)}.${PgSqlGen.quoteIdent(ident.name())}"
      if (ns == TempNs && tempNsOverWire)
        pinnedTransport("DROP TABLE in pg_temp").execute(s"DROP TABLE $target")
      else withTransport(_.execute(s"DROP TABLE $target"))
      invalidateTable(ident)
    }
    existed
  }

  /** forwarded as ALTER TABLE ... RENAME
    * (ref: src/storage/postgres_table_set.cpp:321-413). */
  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    assertWritable("RENAME TABLE")
    require(nsOf(oldIdent) == nsOf(newIdent),
      "postgres cannot move tables across schemas in RENAME")
    val ns = nsOf(oldIdent)
    withTransport(_.execute(
      s"ALTER TABLE ${PgSqlGen.quoteIdent(ns)}.${PgSqlGen.quoteIdent(oldIdent.name())} " +
        s"RENAME TO ${PgSqlGen.quoteIdent(newIdent.name())}"))
    invalidateTable(oldIdent)
  }

  // ---------------- atomic CTAS / RTAS ---------------- //

  /** Atomic CREATE/REPLACE TABLE AS SELECT: the write lands in a
    * staging-named table which is renamed over the target only at
    * commit — a failed CTAS leaves neither an empty target nor staging
    * debris (the reference plans CTAS inside its catalog transaction,
    * ref: src/storage/postgres_insert.cpp:213-239; rename is the
    * distributed-writer equivalent). */
  private def stage(ident: Identifier, schema: StructType, replace: Boolean): StagedTable = {
    assertWritable("CREATE TABLE AS")
    val ns = nsOf(ident)
    val stagingName = ident.name().take(24) + "__stg_" +
      java.util.UUID.randomUUID().toString.replace("-", "").take(12)
    val stagingIdent = Identifier.of(Array(ns), stagingName)
    val staging = createTable(stagingIdent, schema, Array.empty[Transform],
      java.util.Collections.emptyMap[String, String]())
      .asInstanceOf[graft.sources.postgres.PostgresTable]
    new PostgresStagedTable(this, ns, ident, stagingIdent, staging, replace)
  }

  override def stageCreate(
      ident: Identifier,
      schema: StructType,
      partitions: Array[Transform],
      properties: java.util.Map[String, String]): StagedTable = {
    if (tableExists(ident))
      throw new org.apache.spark.sql.catalyst.analysis.TableAlreadyExistsException(ident)
    stage(ident, schema, replace = false)
  }

  override def stageReplace(
      ident: Identifier,
      schema: StructType,
      partitions: Array[Transform],
      properties: java.util.Map[String, String]): StagedTable = {
    if (!tableExists(ident))
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(ident)
    stage(ident, schema, replace = true)
  }

  override def stageCreateOrReplace(
      ident: Identifier,
      schema: StructType,
      partitions: Array[Transform],
      properties: java.util.Map[String, String]): StagedTable =
    stage(ident, schema, replace = true)

  /** arbitrary SQL passthrough — the `postgres_execute` analogue
    * (ref: src/postgres_execute.cpp:12-57). */
  def execute(sql: String): Unit = {
    assertWritable("postgres_execute")
    withTransport(_.execute(sql))
  }

  /** ref: src/storage/postgres_catalog.cpp:91-102 */
  def databaseSize: Long =
    withTransport(_.query(PgCatalogQueries.databaseSize)).head.head.toLong
}

/** The staged side of an atomic CTAS/RTAS: a real table under a
  * staging name; writes target it; commit renames it over the target
  * (dropping the old table first for REPLACE) inside one transaction,
  * abort just drops it. */
final class PostgresStagedTable(
    catalog: PostgresCatalog,
    ns: String,
    targetIdent: Identifier,
    stagingIdent: Identifier,
    staging: graft.sources.postgres.PostgresTable,
    replace: Boolean)
    extends StagedTable with SupportsWrite {

  import org.apache.spark.sql.connector.write.{LogicalWriteInfo, WriteBuilder}

  override def name(): String = staging.name()
  override def schema(): StructType = staging.schema
  override def capabilities(): java.util.Set[TableCapability] = staging.capabilities()
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    staging.newWriteBuilder(info)

  private def q(ident: Identifier): String =
    s"${PgSqlGen.quoteIdent(ns)}.${PgSqlGen.quoteIdent(ident.name())}"

  override def commitStagedChanges(): Unit = {
    val t = PgTransportFactory.open(staging.opts.dsn)
    try {
      t.execute("BEGIN")
      try {
        if (replace) t.execute(s"DROP TABLE IF EXISTS ${q(targetIdent)}")
        t.execute(s"ALTER TABLE ${q(stagingIdent)} RENAME TO " +
          PgSqlGen.quoteIdent(targetIdent.name()))
        t.execute("COMMIT")
      } catch { case e: Throwable => t.execute("ROLLBACK"); throw e }
    } finally t.close()
    catalog.invalidateTable(stagingIdent)
    catalog.invalidateTable(targetIdent)
  }

  override def abortStagedChanges(): Unit = {
    val t = PgTransportFactory.open(staging.opts.dsn)
    try t.execute(s"DROP TABLE IF EXISTS ${q(stagingIdent)}")
    catch { case _: Exception => () }
    finally t.close()
    catalog.invalidateTable(stagingIdent)
  }
}
