package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    graft.queries.Relational.q01_agg_pricing(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.entries.map { case (k, (fn, _)) => k -> fn } ++
      graft.queries.Relational2.entries.map { case (k, (fn, _)) => k -> fn } ++
      graft.queries.Relational3.entries.map { case (k, (fn, _)) => k -> fn } ++
      graft.queries.PipelineOps.entries.map { case (k, (fn, _)) => k -> fn } ++
      graft.queries.Pipeline2.entries.map { case (k, (fn, _)) => k -> fn } ++
      graft.queries.Pipeline3.entries.map { case (k, (fn, _)) => k -> fn } ++
      graft.queries.Pipeline4.entries.map { case (k, (fn, _)) => k -> fn } ++
      graft.queries.Pipeline5.entries.map { case (k, (fn, _)) => k -> fn } ++
      graft.queries.Pipeline6.entries.map { case (k, (fn, _)) => k -> fn } ++
      graft.queries.Pipeline7.entries.map { case (k, (fn, _)) => k -> fn } ++
      graft.queries.Pipeline8.entries.map { case (k, (fn, _)) => k -> fn } ++
      graft.queries.Pipeline9.entries.map { case (k, (fn, _)) => k -> fn } ++
      graft.queries.Pipeline10.entries.map { case (k, (fn, _)) => k -> fn } ++
      graft.queries.ConnectorOps.entries.map { case (k, (fn, _)) => k -> fn } ++
      graft.queries.TpchCatalog.entries.map { case (k, (fn, _)) => k -> fn } ++
      graft.queries.Tpcds.entries.map { case (k, (fn, _)) => k -> fn } ++
      graft.queries.Tpcds2.entries.map { case (k, (fn, _)) => k -> fn } ++
      graft.queries.Tpcds3.entries.map { case (k, (fn, _)) => k -> fn } ++
      graft.queries.Tpcds4.entries.map { case (k, (fn, _)) => k -> fn } ++
      graft.queries.Tpcds5.entries.map { case (k, (fn, _)) => k -> fn } ++
      graft.queries.Tpcds6.entries.map { case (k, (fn, _)) => k -> fn } ++
      graft.queries.Tpcds7.entries.map { case (k, (fn, _)) => k -> fn } ++
      graft.queries.Tpcds8.entries.map { case (k, (fn, _)) => k -> fn } ++
      graft.queries.Tpcds9.entries.map { case (k, (fn, _)) => k -> fn } ++
      graft.queries.Tpcds10.entries.map { case (k, (fn, _)) => k -> fn } ++
      graft.queries.Tpcds11.entries.map { case (k, (fn, _)) => k -> fn }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.Relational.entries.map { case (k, (_, sql)) => k -> sql } ++
      graft.queries.Relational2.entries.map { case (k, (_, sql)) => k -> sql } ++
      graft.queries.Relational3.entries.collect { case (k, (_, Some(sql))) => k -> sql } ++
      graft.queries.PipelineOps.entries.collect { case (k, (_, Some(sql))) => k -> sql } ++
      graft.queries.Pipeline2.entries.collect { case (k, (_, Some(sql))) => k -> sql } ++
      graft.queries.Pipeline3.entries.collect { case (k, (_, Some(sql))) => k -> sql } ++
      graft.queries.Pipeline4.entries.collect { case (k, (_, Some(sql))) => k -> sql } ++
      graft.queries.Pipeline5.entries.collect { case (k, (_, Some(sql))) => k -> sql } ++
      graft.queries.Pipeline6.entries.collect { case (k, (_, Some(sql))) => k -> sql } ++
      graft.queries.Pipeline7.entries.collect { case (k, (_, Some(sql))) => k -> sql } ++
      graft.queries.Pipeline8.entries.collect { case (k, (_, Some(sql))) => k -> sql } ++
      graft.queries.Pipeline9.entries.collect { case (k, (_, Some(sql))) => k -> sql } ++
      graft.queries.Pipeline10.entries.collect { case (k, (_, Some(sql))) => k -> sql } ++
      graft.queries.ConnectorOps.entries.collect { case (k, (_, Some(sql))) => k -> sql } ++
      graft.queries.TpchCatalog.entries.collect { case (k, (_, Some(sql))) => k -> sql } ++
      graft.queries.Tpcds.entries.collect { case (k, (_, Some(sql))) => k -> sql } ++
      graft.queries.Tpcds2.entries.collect { case (k, (_, Some(sql))) => k -> sql } ++
      graft.queries.Tpcds3.entries.collect { case (k, (_, Some(sql))) => k -> sql } ++
      graft.queries.Tpcds4.entries.collect { case (k, (_, Some(sql))) => k -> sql } ++
      graft.queries.Tpcds5.entries.collect { case (k, (_, Some(sql))) => k -> sql } ++
      graft.queries.Tpcds6.entries.collect { case (k, (_, Some(sql))) => k -> sql } ++
      graft.queries.Tpcds7.entries.collect { case (k, (_, Some(sql))) => k -> sql } ++
      graft.queries.Tpcds8.entries.collect { case (k, (_, Some(sql))) => k -> sql } ++
      graft.queries.Tpcds9.entries.collect { case (k, (_, Some(sql))) => k -> sql } ++
      graft.queries.Tpcds10.entries.collect { case (k, (_, Some(sql))) => k -> sql } ++
      graft.queries.Tpcds11.entries.collect { case (k, (_, Some(sql))) => k -> sql }
}
