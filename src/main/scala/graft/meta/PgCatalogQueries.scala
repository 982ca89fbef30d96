package graft.meta

/** The catalog discovery SQL the connector sends to the server.
  *
  * Functional ports of the reference's initialize queries
  * (ref: src/storage/postgres_schema_set.cpp:37-49,
  * postgres_table_set.cpp:22-52, postgres_table_set.cpp:177-191,
  * src/postgres_connection.cpp:122-134 version probe). Formatting is
  * simplified to one query per purpose; the information content —
  * schemas from pg_namespace, relations from pg_class filtered to
  * relkind r/v/m/f/p, attributes with typmod and dimension count from
  * pg_attribute — is the same.
  */
object PgCatalogQueries {

  val versionProbe: String = "SELECT version()"

  /** Aurora sniff: RDS instances expose rds% settings
    * (ref: src/postgres_connection.cpp:122-134). */
  val rdsProbe: String =
    "SELECT COUNT(*) FROM pg_settings WHERE name LIKE 'rds%'"

  /** Replica/recovery sniff gating snapshot export
    * (ref: src/postgres_scanner.cpp:65-100). */
  val recoveryProbe: String =
    "SELECT pg_is_in_recovery(), (SELECT COUNT(*) FROM pg_stat_wal_receiver)"

  /** User schemas; pg_* and information_schema flagged out
    * (ref: src/storage/postgres_schema_entry.cpp:28-33). */
  val listSchemas: String =
    """SELECT nspname FROM pg_namespace
      |WHERE nspname NOT LIKE 'pg\_%' AND nspname <> 'information_schema'
      |ORDER BY nspname""".stripMargin

  /** Scannable relations: ordinary/view/matview/foreign/partitioned
    * (ref: relkind IN ('r','v','m','f','p'),
    * src/storage/postgres_table_set.cpp:22-52). */
  def listTables(schema: String): String =
    s"""SELECT c.relname FROM pg_class c
       |JOIN pg_namespace n ON n.oid = c.relnamespace
       |WHERE n.nspname = ${q(schema)} AND c.relkind IN ('r','v','m','f','p')
       |ORDER BY c.relname""".stripMargin

  /** Tables of THIS session's temp namespace. A real server names it
    * pg_temp_N (per backend), so the lookup must go through
    * `pg_my_temp_schema()` — `nspname = 'pg_temp'` matches nothing on
    * a live PostgreSQL (the same reason the COPY targets leave the
    * temp table name unqualified). */
  val listTempTables: String =
    """SELECT c.relname FROM pg_class c
      |JOIN pg_namespace n ON n.oid = c.relnamespace
      |WHERE n.oid = pg_my_temp_schema() AND c.relkind IN ('r','v','m','f','p')
      |ORDER BY c.relname""".stripMargin

  /** Column name, type name, typmod, dims, nullability for one table
    * (ref: src/storage/postgres_table_set.cpp:54-108, 177-191). */
  def tableInfo(schema: String, table: String): String =
    s"""SELECT a.attname, t.typname, a.atttypmod, a.attndims, a.attnotnull
       |FROM pg_attribute a
       |JOIN pg_class c ON c.oid = a.attrelid
       |JOIN pg_namespace n ON n.oid = c.relnamespace
       |JOIN pg_type t ON t.oid = a.atttypid
       |WHERE n.nspname = ${q(schema)} AND c.relname = ${q(table)}
       |  AND a.attnum > 0 AND NOT a.attisdropped
       |ORDER BY a.attnum""".stripMargin

  /** Page count driving parallel task planning
    * (ref: relpages, src/postgres_scanner.cpp:128-135). */
  def relPages(schema: String, table: String): String =
    s"""SELECT c.relpages FROM pg_class c
       |JOIN pg_namespace n ON n.oid = c.relnamespace
       |WHERE n.nspname = ${q(schema)} AND c.relname = ${q(table)}""".stripMargin

  /** Index discovery: name, access method, comma-joined key columns
    * (ref: src/storage/postgres_index_set.cpp:14-27). */
  def listIndexes(schema: String, table: String): String =
    s"""SELECT i.relname, am.amname,
       |  array_to_string(array_agg(a.attname ORDER BY k.ord), ',')
       |FROM pg_index x
       |JOIN pg_class i ON i.oid = x.indexrelid
       |JOIN pg_class c ON c.oid = x.indrelid
       |JOIN pg_namespace n ON n.oid = c.relnamespace
       |JOIN pg_am am ON am.oid = i.relam
       |CROSS JOIN LATERAL unnest(x.indkey) WITH ORDINALITY k(attnum, ord)
       |JOIN pg_attribute a ON a.attrelid = c.oid AND a.attnum = k.attnum
       |WHERE n.nspname = ${q(schema)} AND c.relname = ${q(table)}
       |GROUP BY i.relname, am.amname""".stripMargin

  /** Enum label discovery: (type name, label) in sort order
    * (ref: src/storage/postgres_type_set.cpp:23-82). */
  val enumTypes: String =
    """SELECT t.typname, e.enumlabel FROM pg_enum e
      |JOIN pg_type t ON t.oid = e.enumtypid
      |ORDER BY t.typname, e.enumsortorder""".stripMargin

  /** Composite type discovery: (type name, field name, field type name,
    * typmod, dims) in attribute order
    * (ref: src/storage/postgres_type_set.cpp:84-145). */
  val compositeTypes: String =
    """SELECT t.typname, a.attname, ft.typname, a.atttypmod, a.attndims
      |FROM pg_type t
      |JOIN pg_class c ON c.oid = t.typrelid AND c.relkind = 'c'
      |JOIN pg_attribute a ON a.attrelid = c.oid
      |  AND a.attnum > 0 AND NOT a.attisdropped
      |JOIN pg_type ft ON ft.oid = a.atttypid
      |ORDER BY t.typname, a.attnum""".stripMargin

  /** Database size utility
    * (ref: src/storage/postgres_catalog.cpp:91-102). */
  val databaseSize: String = "SELECT pg_database_size(current_database())"

  /** Snapshot export for consistent parallel reads
    * (ref: src/postgres_scanner.cpp:65-100). */
  val exportSnapshot: String = "SELECT pg_export_snapshot()"

  def setSnapshot(id: String): String =
    s"SET TRANSACTION SNAPSHOT ${q(id)}"

  val beginReadOnly: String =
    "BEGIN TRANSACTION ISOLATION LEVEL REPEATABLE READ READ ONLY"

  private def q(s: String): String = "'" + s.replace("'", "''") + "'"
}
