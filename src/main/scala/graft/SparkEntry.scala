package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each implemented SURVEY.md §2 operator key appears in `queries`; every
  * SQL-expressible one also appears in `oracleSql` with DuckDB-dialect SQL
  * producing identical columns (names, types, order) — the driver
  * hash-compares at sf0.01.
  */
object SparkEntry {

  /** Flagship query (TPC-H-Q1-shaped pricing summary, SURVEY.md §7.2) on
    * sf0.001; driver smoke-checks rows>0.
    */
  def entry(spark: SparkSession): DataFrame =
    Aggregates.flagship(spark, "/root/testdata/sf0.001")

  private val modules: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (Relational.queries, Relational.oracles),
      (Aggregates.queries, Aggregates.oracles),
      (Joins.queries, Joins.oracles),
      (Windows.queries, Windows.oracles),
      (graft.functions.Scalars.queries, graft.functions.Scalars.oracles),
      (Streams.queries, Streams.oracles),
      (TextOps.queries, TextOps.oracles),
      (VectorOps.queries, VectorOps.oracles),
      (graft.functions.Custom.queries, graft.functions.Custom.oracles),
      (Dialects.queries, Dialects.oracles),
      (Layouts.queries, Layouts.oracles),
      (GraphOps.queries, GraphOps.oracles),
      (Analytics.queries, Analytics.oracles),
      (Profiling.queries, Profiling.oracles),
      (DataQuality.queries, DataQuality.oracles),
      (Composites.queries, Composites.oracles)
    )

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    modules.map(_._2).reduce(_ ++ _)
}
