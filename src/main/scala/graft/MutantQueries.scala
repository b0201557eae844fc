package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables._

/** Gate-sensitivity (mutation) audit registry — scripts/mutcheck.py.
  *
  * The differential gate (Verify + DuckDB oracle, scripts/check.py) is the
  * repo's correctness authority, so its own blind spots are the top risk:
  * an oracle that MIRRORS a Spark-side bug, or a fixture that never
  * exercises the behavior a formula encodes, passes green while wrong
  * (the round-7 vec_pq 16-of-64-dims bug is the canonical example — found
  * by review, not by the gate). The reference itself signals
  * mutation-testing intent (cargo-mutants in /root/reference/.gitignore:12-14);
  * this is that idea applied to the gate instead of the code.
  *
  * Each entry below is a DELIBERATELY WRONG variant of a real
  * `SparkEntry.queries` key — same name, same output schema, one planted
  * defect from a named defect class (boundary off-by-one, window-frame
  * off-by-one, dropped tie-break, swapped NULL ordering, truncated dim
  * loop, wrong denominator, dropped dedup key, …). `graft.MutantVerify`
  * writes their results exactly like Verify; `scripts/mutcheck.py` then
  * runs the UNCHANGED oracle compare and requires it to FAIL every
  * mutant. A surviving mutant means the gate cannot see that defect class
  * on that fixture — either the oracle re-derives nothing (it mirrors),
  * or the fixture lacks the triggering data shape (which is why several
  * mutants run against the hostile EdgeFixtures variants: `nulls` for
  * NULL-path mutants, `ties` for boundary/tie-break mutants, `dupkeys`
  * for duplicate-sensitive ones).
  */
object MutantQueries {

  /** fixture ∈ clean | nulls | ties | dupkeys — which fixture makes the
    * planted defect observable (clean data almost never has sort-key ties
    * or boundary-exact values; that is the point of the variants).
    */
  final case class Mutant(
      key: String,
      clazz: String,
      desc: String,
      fixture: String,
      fn: (SparkSession, String) => DataFrame)

  val mutants: Seq[Mutant] = Seq(

    Mutant("agg_group_multi", "boundary",
      "flagship date filter < instead of <= (inclusive-bound off-by-one)",
      "ties", (s, d) => {
        val disc1 = lit(1).cast(Money) - dec(col("l_discount"))
        val small = DecimalType(6, 4)
        val disc1n = lit(1).cast(small) - col("l_discount").cast(small)
        val tax1n = lit(1).cast(small) + col("l_tax").cast(small)
        val factor = (disc1n * tax1n).cast(DecimalType(9, 8))
        lineitem(s, d)
          .filter(col("l_shipdate") < lit("1998-09-02").cast(TimestampType)) // BUG
          .groupBy("l_returnflag", "l_linestatus")
          .agg(
            outDec(sum(dec(col("l_quantity")))).as("sum_qty"),
            outDec(sum(dec(col("l_extendedprice")))).as("sum_base_price"),
            outDec(sum(dec(col("l_extendedprice")) * disc1)).as("sum_disc_price"),
            outDec(sum(dec(col("l_extendedprice")) * factor)).as("sum_charge"),
            r4(sum(dec(col("l_quantity"))).cast(DoubleType) / count(lit(1))).as("avg_qty"),
            count(lit(1)).as("count_order"))
          .orderBy("l_returnflag", "l_linestatus")
      }),

    Mutant("win_running_sum", "frame-off-by-one",
      "running total frame ends at -1 PRECEDING instead of CURRENT ROW",
      "clean", (s, d) =>
        orders(s, d)
          .select(col("o_orderkey"), col("o_custkey"),
            outDec(sum(dec(col("o_totalprice")))
              .over(Window.partitionBy("o_custkey")
                .orderBy(col("o_orderdate"), col("o_orderkey"))
                .rowsBetween(Window.unboundedPreceding, -1))) // BUG
              .as("run_total"))
          .orderBy("o_orderkey")),

    Mutant("win_moving_avg", "frame-off-by-one",
      "moving average over 3 rows instead of 4 (frame -2..0 not -3..0)",
      "clean", (s, d) => {
        val w = Window.partitionBy("l_suppkey")
          .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_partkey"))
          .rowsBetween(-2, 0) // BUG
        lineitem(s, d)
          .select(col("l_orderkey"), col("l_linenumber"),
            r4(sum(dec(col("l_quantity"))).over(w).cast(DoubleType) /
              count(lit(1)).over(w)).as("mavg_qty"))
          .orderBy("l_orderkey", "l_linenumber", "mavg_qty")
      }),

    // NOTE: desc must be ONE string literal — mutcheck.py re-parses this
    // registry with a regex keyed on the 4 leading literals
    Mutant("win_topk_group", "wrong-tiebreak",
      "top-3 rank tie-break reversed (deterministic face of a dropped tie-break)",
      "ties", (s, d) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_totalprice").desc_nulls_last,
            col("o_orderkey").desc) // BUG: reversed tie-break
        orders(s, d)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3)
          .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
          .orderBy("o_custkey", "rn")
      }),

    Mutant("topk", "limit-off-by-one",
      "top-10 emits 11 rows",
      "clean", (s, d) =>
        orders(s, d).select("o_orderkey", "o_totalprice")
          .orderBy(col("o_totalprice").desc_nulls_last, col("o_orderkey"))
          .limit(11)), // BUG

    Mutant("sort_multi", "null-ordering",
      "secondary sort key NULLS LAST instead of Spark-default NULLS FIRST",
      "nulls", (s, d) =>
        customer(s, d)
          .select("c_custkey", "c_mktsegment", "c_acctbal")
          .orderBy(col("c_mktsegment").desc_nulls_last,
            col("c_acctbal").asc_nulls_last, // BUG
            col("c_custkey"))),

    Mutant("join_asof", "boundary",
      "as-of bound exclusive: equal-ts purchase sorts AFTER the click",
      "ties", (s, d) => {
        val ev = events(s, d)
          .filter(col("event_type").isin("click", "purchase"))
          .select(col("event_id"), col("user_id"), col("ts"), col("event_type"),
            when(col("event_type") === "purchase", col("ts")).as("p_ts"))
        val kind = when(col("event_type") === "purchase", 2).otherwise(1) // BUG
        val w = Window.partitionBy("user_id").orderBy(col("ts"), kind)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ev.withColumn("last_purchase_ts",
            when(col("user_id").isNotNull,
              last(col("p_ts"), ignoreNulls = true).over(w)))
          .filter(col("event_type") === "click")
          .select(col("event_id"), col("user_id"), col("ts"), col("last_purchase_ts"))
          .orderBy("event_id")
      }),

    Mutant("join_theta", "boundary",
      "theta upper bound < instead of <=",
      "ties", (s, d) =>
        customer(s, d).join(supplier(s, d),
            col("s_acctbal") < col("c_acctbal") &&
            col("c_acctbal") < col("s_acctbal") + 500) // BUG
          .select("c_custkey", "s_suppkey", "c_acctbal", "s_acctbal")
          .orderBy("c_custkey", "s_suppkey")),

    Mutant("join_full", "null-ordering",
      "full-join output sorted NULLS LAST instead of NULLS FIRST",
      "clean", (s, d) => {
        val big = orders(s, d).groupBy("o_custkey").agg(count(lit(1)).as("n_orders"))
          .filter(col("n_orders") >= 12)
        val rich = customer(s, d).filter(col("c_acctbal") > 8000)
          .select("c_custkey", "c_acctbal")
        big.join(rich, col("o_custkey") === col("c_custkey"), "full")
          .select("o_custkey", "n_orders", "c_custkey", "c_acctbal")
          .orderBy(col("o_custkey").asc_nulls_last, col("c_custkey").asc_nulls_last) // BUG
      }),

    Mutant("join_semi", "join-type",
      "left-semi replaced by inner + project (fan-out on multi-match)",
      "clean", (s, d) =>
        customer(s, d).join(
            orders(s, d).filter(col("o_orderstatus") === "F"),
            col("c_custkey") === col("o_custkey"), "inner") // BUG
          .select("c_custkey", "c_name").orderBy("c_custkey")),

    Mutant("agg_avg", "wrong-denominator",
      "average divides by count(col) instead of count(*)",
      "nulls", (s, d) =>
        lineitem(s, d).groupBy("l_linestatus")
          .agg(
            r4(sum(dec(col("l_quantity"))).cast(DoubleType) /
              count(col("l_quantity"))).as("avg_qty"), // BUG
            r4(sum(dec(col("l_extendedprice"))).cast(DoubleType) /
              count(col("l_extendedprice"))).as("avg_price")) // BUG
          .orderBy("l_linestatus")),

    Mutant("agg_median", "rank-off-by-one",
      "median picks rank (n+2) div 2 instead of (n+1) div 2",
      "clean", (s, d) => {
        val w = Window.partitionBy("o_orderstatus")
          .orderBy(col("o_totalprice"), col("o_orderkey"))
        val wN = Window.partitionBy("o_orderstatus")
        orders(s, d)
          .filter(col("o_totalprice").isNotNull)
          .withColumn("rn", row_number().over(w))
          .withColumn("n", count(lit(1)).over(wN))
          .filter(col("rn") === expr("(n + 2) div 2")) // BUG
          .select(col("o_orderstatus"), col("n").as("n_orders"),
            col("o_totalprice").as("median_price"))
          .orderBy("o_orderstatus")
      }),

    Mutant("agg_mode", "wrong-tiebreak",
      "mode tie-break reversed (deterministic face of a dropped tie-break)",
      "dupkeys", (s, d) => {
        val w = Window.partitionBy("o_orderstatus")
          .orderBy(col("cnt").desc, col("o_orderpriority").desc) // BUG: reversed
        orders(s, d).groupBy("o_orderstatus", "o_orderpriority")
          .agg(count(lit(1)).as("cnt"))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("o_orderstatus"), col("o_orderpriority").as("mode_priority"),
            col("cnt").as("mode_count"))
          .orderBy("o_orderstatus")
      }),

    Mutant("agg_entropy", "wrong-total",
      "entropy normalizes by count(*) instead of the sum of typed counts",
      "nulls", (s, d) => {
        val types = Seq("view", "click", "purchase", "signup", "error")
        val cnts = types.map(t => count(when(col("event_type") === t, 1)).as(s"c_$t"))
        val g = events(s, d).groupBy("user_id")
          .agg(cnts.head, (cnts.tail :+ count(lit(1)).as("n_all")): _*)
          .withColumn("n_events", col("n_all")) // BUG: counts NULL/unknown types
        val terms = types.map { t =>
          val p = col(s"c_$t").cast(DoubleType) / col("n_events").cast(DoubleType)
          when(col(s"c_$t") > 0, -(p * log(p))).otherwise(lit(0.0))
        }
        g.select(col("user_id"), col("n_events"),
            r4(terms.reduce(_ + _)).as("entropy"))
          .orderBy("user_id")
      }),

    Mutant("fn_surrogate_key", "dropped-null-sentinel",
      "surrogate key concat without NULL sentinels (concat_ws skips NULLs)",
      "nulls", (s, d) => {
        val sk = md5(concat_ws("||", // BUG: (a,NULL,b) collides with (a,b,NULL)
          col("l_orderkey").cast("string"),
          col("l_linenumber").cast("string"),
          col("l_partkey").cast("string"),
          col("l_suppkey").cast("string")))
        lineitem(s, d)
          .select(col("l_orderkey"), col("l_linenumber").cast(LongType).as("l_linenumber"),
            sk.as("surrogate_key"))
          .orderBy("l_orderkey", "l_linenumber", "surrogate_key")
      }),

    Mutant("stream_dedup", "dropped-dedup-key",
      "stateful dedup keyed by user only (event_type dropped)",
      "clean", (s, d) => {
        val w = Window.partitionBy("user_id") // BUG: event_type dropped
          .orderBy(col("ts"), col("event_id"))
        events(s, d).withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select("user_id", "event_type", "event_id", "ts")
          .orderBy("user_id", "event_type")
      }),

    Mutant("stream_tumbling", "window-width",
      "tumbling window 6 minutes instead of 5",
      "clean", (s, d) =>
        events(s, d)
          .groupBy(window(col("ts"), "6 minutes"), col("event_type")) // BUG
          .agg(count(lit(1)).as("cnt"), outDec(sum(dec(col("value")))).as("sum_val"))
          .select(col("window.start").as("w_start"), col("event_type"),
            col("cnt"), col("sum_val"))
          .orderBy("w_start", "event_type")),

    Mutant("win_range_frame", "frame-off-by-one",
      "range frame lower bound -299s instead of -300s",
      "ties", (s, d) => {
        val ev = events(s, d).withColumn("es", expr("unix_micros(ts) div 1000000"))
        val w = Window.partitionBy("event_type").orderBy(col("es"))
          .rangeBetween(-299, 0) // BUG
        ev.select(col("event_id"), col("event_type"), col("es"),
            outDec(sum(dec(col("value"))).over(w)).as("sum_5min"))
          .orderBy("event_id")
      }),

    Mutant("graph_pagerank", "wrong-constant",
      "damping 0.80 instead of 0.85",
      "clean", (s, d) => {
        val e0 = orders(s, d).select(col("o_orderkey"), col("o_custkey"))
          .join(lineitem(s, d).select(col("l_orderkey"), col("l_suppkey")),
            col("l_orderkey") === col("o_orderkey"))
          .filter(col("o_custkey").isNotNull && col("l_suppkey").isNotNull)
          .select((col("o_custkey") * 2).as("src"), (col("l_suppkey") * 2 + 1).as("dst"))
          .distinct()
        val edges = e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
        val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
        val ed = edges.join(deg, "src").localCheckpoint()
        val nodes = customer(s, d).select((col("c_custkey") * 2).as("node"))
          .union(supplier(s, d).select((col("s_suppkey") * 2 + 1).as("node")))
        var ranks = nodes.withColumn("rank_u", lit(1000000L))
        for (_ <- 1 to 3) {
          val contrib = ed.join(ranks, ed("src") === ranks("node"))
            .select(ed("dst"), expr("rank_u DIV deg").as("c"))
            .groupBy("dst").agg(sum(col("c")).as("cs"))
          ranks = nodes.join(contrib, nodes("node") === contrib("dst"), "left")
            .select(nodes("node"),
              (lit(150000L) + expr("(16 * coalesce(cs, 0)) DIV 20")).as("rank_u")) // BUG
        }
        ranks.select(col("node"),
            (col("rank_u").cast(DoubleType) / 1000000.0).as("rank"))
          .orderBy("node")
      }),

    Mutant("sim_cosine_topk", "truncated-dim-loop",
      "cosine dot product over 63 of 64 dims (the vec_pq-class bug)",
      "clean", (s, d) => {
        val e = embeddings(s, d)
        val full = e.withColumn("nrm",
          sqrt(expr("aggregate(zip_with(embedding, embedding, (x, y) -> x * y), " +
            "CAST(0.0 AS DOUBLE), (a, x) -> a + x)")))
        val q = full.filter(col("vec_id") < 10)
          .select(col("vec_id").as("q_id"), col("embedding").as("qv"),
            col("nrm").as("q_norm"))
        val c = full.select(col("vec_id"), col("embedding").as("cv"),
          col("nrm").as("c_norm"))
        val dot63 = expr("aggregate(zip_with(slice(qv, 1, 63), slice(cv, 1, 63), " +
          "(x, y) -> x * y), CAST(0.0 AS DOUBLE), (a, x) -> a + x)") // BUG
        val scored = c.join(broadcast(q), col("q_id") =!= col("vec_id"))
          .withColumn("cos", dot63 / (col("q_norm") * col("c_norm")))
        val w = Window.partitionBy("q_id")
          .orderBy(round(col("cos"), 6).desc, col("vec_id"))
        scored.withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 5)
          .select(col("q_id"), col("rank"), col("vec_id"),
            (r4(col("cos")) + lit(0.0)).as("cos_sim"))
          .orderBy("q_id", "rank")
      }),

    Mutant("dedup_exact", "dropped-normalization",
      "content hash on raw text (no lower/trim normalization)",
      "nulls", (s, d) =>
        documents(s, d)
          .groupBy(md5(col("text")).as("content_hash")) // BUG
          .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
          .orderBy("content_hash"))
  )

  def byFixture: Map[String, Seq[Mutant]] = mutants.groupBy(_.fixture)
}

/** Verify's exact write path, but running the MUTANT queries against the
  * requested fixture dir — so scripts/check.py compares each mutant to the
  * real oracle and scripts/mutcheck.py asserts the compare FAILS.
  */
object MutantVerify {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: graft.MutantVerify <sfDir> <outDir> [key ...]")
    val Array(sfDir, outDir, rest @ _*) = args
    val only: Set[String] = rest.iterator.map(_.trim).filter(_.nonEmpty).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val selected = MutantQueries.mutants
      .filter(m => only.isEmpty || only(m.key))
    selected.foreach { m =>
      try m.fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/${m.key}")
      catch { case e: Throwable =>
        System.err.println(s"[mutant] ${m.key} failed: ${e.getMessage}")
      }
    }
    def q(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val keys = selected.map(_.key).toSet
    val json = SparkEntry.oracleSql.filter { case (k, _) => keys(k) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
