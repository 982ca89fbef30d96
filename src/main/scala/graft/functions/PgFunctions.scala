package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.meta.{PgCatalogQueries, PgTransportFactory}
import graft.sqlgen.PgSqlGen

/** Session-level helpers mirroring the reference's table functions
  * (SURVEY.md §7.1 `functions` module). */
object PgFunctions {

  /** `postgres_query(db, sql)` — run a remote query as a DataFrame
    * (ref: src/postgres_query.cpp:12-97). */
  def postgresQuery(spark: SparkSession, dsn: String, sql: String): DataFrame =
    spark.read.format("postgres").option("dsn", dsn).option("query", sql).load()

  /** `postgres_execute(db, sql)` — run DDL/DML for effect
    * (ref: src/postgres_execute.cpp:12-57). */
  def postgresExecute(dsn: String, sql: String): Unit = {
    val t = PgTransportFactory.open(dsn)
    try t.execute(sql) finally t.close()
  }

  /** legacy `postgres_attach`: register one temp view per table of a
    * schema (ref: src/postgres_attach.cpp:21-103). */
  def attachViews(
      spark: SparkSession,
      dsn: String,
      sourceSchema: String = "public",
      overwrite: Boolean = false): Seq[String] = {
    val t = PgTransportFactory.open(dsn)
    val tables =
      try t.query(PgCatalogQueries.listTables(sourceSchema)).map(_.head)
      finally t.close()
    tables.foreach { tbl =>
      val df = spark.read.format("postgres")
        .option("dsn", dsn).option("schema", sourceSchema).option("table", tbl)
        .load()
      if (overwrite) df.createOrReplaceTempView(tbl) else df.createTempView(tbl)
    }
    tables
  }

  /** DELETE by row id, batched like the reference's delete sink: the
    * generated `DELETE ... WHERE ctid IN (...)` statement is flushed
    * whenever the tid list exceeds ~3000 characters
    * (ref: src/storage/postgres_delete.cpp:18-92, flush rule :75-78).
    *
    * `ctids` is any DataFrame with a `_ctid` BIGINT column — typically
    * a filtered read of the table with the metadata column selected.
    * Runs distributed: each partition deletes its own ctids over its
    * own connection.
    */
  def deleteByCtid(
      dsn: String,
      schema: String,
      table: String,
      ctids: DataFrame): Unit = {
    val qname = s"${PgSqlGen.quoteIdent(schema)}.${PgSqlGen.quoteIdent(table)}"
    ctids.select("_ctid").foreachPartition {
      (rows: Iterator[org.apache.spark.sql.Row]) =>
        val t = PgTransportFactory.open(dsn)
        try {
          val buf = new StringBuilder
          def flush(): Unit = if (buf.nonEmpty) {
            t.execute(s"DELETE FROM $qname WHERE ctid IN ($buf)")
            buf.clear()
          }
          rows.foreach { r =>
            val packed = r.getLong(0)
            val tid = s"'(${packed >> 16},${packed & 0xffff})'::tid"
            if (buf.nonEmpty) buf.append(", ")
            buf.append(tid)
            if (buf.length > 3000) flush() // ref flush threshold
          }
          flush()
        } finally t.close()
    }
  }
}
