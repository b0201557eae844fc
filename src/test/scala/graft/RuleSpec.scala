package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.DimBroadcastRule

/** §4.3 custom optimizer rule: DimBroadcastRule must flip an un-hinted
  * dim join to broadcast-hash even with the size threshold disabled, and
  * must not change results.
  */
class RuleSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  val d = TestSpark.sfDir

  private def joinPlan() =
    Tables.customer(spark, d)
      .join(Tables.nation(spark, d), col("c_nationkey") === col("n_nationkey"))
      .select("c_custkey", "n_name")

  test("rule injects BROADCAST hint for registry dim scans; results unchanged") {
    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

      val without = joinPlan().queryExecution.sparkPlan.toString
      assert(without.contains("SortMergeJoin") && !without.contains("BroadcastHashJoin"),
        s"baseline should sort-merge with broadcast disabled:\n$without")

      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ DimBroadcastRule
      try {
        val df = joinPlan()
        val withRule = df.queryExecution.sparkPlan.toString
        assert(withRule.contains("BroadcastHashJoin"),
          s"rule should force broadcast-hash:\n$withRule")
        assert(df.count() === Tables.customer(spark, d).count()) // semantics intact
      } finally {
        spark.experimental.extraOptimizations =
          spark.experimental.extraOptimizations.filterNot(_ == DimBroadcastRule)
      }
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
  }

  test("rule leaves fact-fact joins alone") {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ DimBroadcastRule
    try {
      val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val p = Tables.orders(spark, d)
          .join(Tables.lineitem(spark, d), col("o_orderkey") === col("l_orderkey"))
          .queryExecution.sparkPlan.toString
        assert(!p.contains("BroadcastHashJoin"), s"fact join must not broadcast:\n$p")
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == DimBroadcastRule)
    }
  }

  test("rule is not fooled by a user table whose name merely ENDS in a dim name") {
    // a hint-only rule's one fatal failure mode: pinning BROADCAST on an
    // arbitrarily large user table because ".../myregion.parquet" ends
    // with "region.parquet" — the path match must be separator-anchored
    val tmp = java.nio.file.Files.createTempDirectory("rulespec").toFile
    val decoy = new java.io.File(tmp, "myregion.parquet").getPath
    Tables.orders(spark, d).select("o_orderkey", "o_custkey")
      .write.mode("overwrite").parquet(decoy)
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ DimBroadcastRule
    try {
      val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val p = Tables.customer(spark, d)
          .join(spark.read.parquet(decoy), col("c_custkey") === col("o_custkey"))
          .queryExecution.sparkPlan.toString
        assert(!p.contains("BroadcastHashJoin"),
          s"decoy 'myregion.parquet' must not be hinted:\n$p")
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == DimBroadcastRule)
    }
  }
}
