package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}
import graft.Tables._

/** Data-quality profiling + outlier screening — the hygiene pass a
  * training-data pipeline runs before anything else (reference intent:
  * karna's "analytics over tabular files", /root/reference/README.md:2).
  *
  * 100 TB design notes per operator are on the keys below; the common
  * principle is ONE full pass over the fact table, all cross-row state in
  * partial-aggregating shuffles, per-group results broadcast back.
  *
  * Cross-engine determinism: all moments are summed as DECIMAL of inputs
  * pre-rounded to 4 decimals, so the sums are exact and order-independent;
  * every decimal total stays below 2^53 ulps, so the final cast to DOUBLE
  * is exact, and the downstream double arithmetic (mean, variance, z) is
  * written in the same association order in both engines.
  */
object Profiling {

  /** value rounded into money decimal — exact, summation-order-proof. */
  private def v4(c: Column): Column = round(c, 4).cast(DecimalType(18, 4))

  private val d = (c: Column) => c.cast(DoubleType)

  private def zscore(s: SparkSession, dir: String): DataFrame = {
    // pass 1: exact per-type moments (5 groups — a broadcast-size result).
    // sum/sumsq as exact decimals: at sf0.1 |sum| ≤ 5.6e7 → 5.6e11 ulps,
    // |sumsq| ≤ 3.1e10 → 3.1e14 ulps, both < 2^53, so DOUBLE casts are
    // exact and mean/var/sd are bit-identical across engines.
    // NULL values are excluded up front (the ksOf discipline): they carry
    // no position, and a NULL in a window ORDER BY would rank NULLS FIRST
    // in Spark but NULLS LAST under DuckDB's default
    val ev0 = events(s, dir).filter(col("value").isNotNull)
    val stats = ev0.groupBy(col("event_type").as("et")).agg(
      count(lit(1)).as("n"),
      sum(v4(col("value"))).as("sv"),
      sum(round(v4(col("value")) * v4(col("value")), 4).cast(DecimalType(30, 4))).as("svv"))
    // try_divide: a 1-row type has no sample variance — NULL, not an ANSI
    // error. The numerator is then CLAMPED at 0 (NULL folds to 0 too):
    // under heavy duplication a constant-valued type makes the exact
    // variance 0, and float cancellation can land the double a hair BELOW
    // it — where Spark's sqrt answers NaN but DuckDB's sqrt ERRORS (the
    // dupkeys_nulls compound fixture caught exactly this, round 9). sd=0
    // then yields z = try_divide(·, 0) = NULL → row dropped, identically
    // in both engines (the oracle mirrors the CASE).
    val varNum = try_divide(d(col("svv")) - d(col("sv")) * d(col("sv")) / d(col("n")),
      d(col("n")) - lit(1.0))
    val st = stats.select(col("et"), col("n"),
      (d(col("sv")) / d(col("n"))).as("mean"),
      sqrt(when(varNum.isNull || varNum <= 0, lit(0.0)).otherwise(varNum)).as("sd"))
    // pass 2: map-side z against the broadcast stats — no second shuffle
    ev0.join(broadcast(st), col("event_type") === col("et"))
      .withColumn("z", try_divide(col("value") - col("mean"), col("sd")))
      .filter(abs(col("z")) > 3.0)
      .select(col("event_id"), col("event_type"), col("value"), round(col("z"), 4).as("z"))
      .orderBy("event_id")
  }

  private val profCols =
    Seq("l_orderkey", "l_suppkey", "l_quantity", "l_extendedprice", "l_discount", "l_tax")

  private def profile(s: SparkSession, dir: String): DataFrame = {
    // ONE scan: count/min/max fold map-side; the 6 exact count-distincts
    // plan as a single Expand (6× row blowup into one partial-aggregating
    // shuffle) — at 100 TB you'd swap countDistinct for approx_count_distinct
    // per column (same plan shape, sketch-sized state; cf. agg_approx_distinct)
    val aggs = profCols.flatMap { c =>
      Seq(count(col(c)).as(s"nn_$c"),
        countDistinct(col(c)).as(s"nd_$c"),
        min(col(c)).cast(DoubleType).as(s"mn_$c"),
        max(col(c)).cast(DoubleType).as(s"mx_$c"))
    }
    val one = lineitem(s, dir).agg(count(lit(1)).as("n_rows"), aggs: _*)
    // pivot the single row to one row per column WITHOUT re-reading the
    // scan (explode of an inline struct array, not a union of 6 selects)
    val rows = profCols.map { c =>
      struct(lit(c).as("column"),
        (col("n_rows") - col(s"nn_$c")).as("n_nulls"),
        col(s"nd_$c").as("n_distinct"),
        col(s"mn_$c").as("min_v"), col(s"mx_$c").as("max_v"))
    }
    one.select(explode(array(rows: _*)).as("p")).select("p.*").orderBy("column")
  }

  private val topkCols = Seq("o_orderstatus", "o_orderpriority")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "anomaly_zscore" -> ((s, dir) => zscore(s, dir)),

    "anomaly_mad" -> ((s, dir) => {
      // robust outlier detection: median absolute deviation instead of
      // stddev — one fat-fingered value inflates a z-score denominator
      // and HIDES other outliers; MAD is breakdown-50% robust. Both
      // medians are LOWER medians selected by RANK (row_number at
      // (n+1) div 2) — an exact element of the data, identical in both
      // engines, where interpolating medians differ by ulps on even
      // counts ((a+b)/2 vs a+0.5·(b-a)). The 1.4826 normal-consistency
      // scaling is one double product of identical inputs, so the
      // 3-sigma-equivalent cut is cross-engine deterministic. Plan: two
      // rank windows + one broadcast join of the 4-row stats table; at
      // 100 TB the window key is the series key (high-cardinality), as
      // in ts_autocorr.
      import org.apache.spark.sql.expressions.Window
      val ev = events(s, dir).filter(col("value").isNotNull)
      val w1 = Window.partitionBy("event_type").orderBy(col("value"), col("event_id"))
      val n1 = Window.partitionBy("event_type")
      val med = ev
        .withColumn("rn", row_number().over(w1))
        .withColumn("n", count(lit(1)).over(n1))
        .filter(col("rn") === expr("(n + 1) div 2"))
        .select(col("event_type"), col("value").as("med"))
      val dev = ev.join(broadcast(med), "event_type")
        .withColumn("dev", abs(col("value") - col("med")))
      val w2 = Window.partitionBy("event_type").orderBy(col("dev"), col("event_id"))
      val mad = dev
        .withColumn("rn", row_number().over(w2))
        .withColumn("n", count(lit(1)).over(n1))
        .filter(col("rn") === expr("(n + 1) div 2"))
        .select(col("event_type"), col("dev").as("mad"))
      dev.join(broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_rows"),
          r4(max(col("med"))).as("med"),
          r4(max(col("mad"))).as("mad"),
          sum(when(col("dev") > lit(3 * 1.4826) * col("mad"), 1L).otherwise(0L))
            .as("n_outliers"))
        .orderBy("event_type")
    }),
    "profile_columns" -> ((s, dir) => profile(s, dir)),

    "profile_topk_values" -> ((s, dir) => {
      // frequent-value profile (profile_columns' companion): top-3 values
      // + counts per profiled column — the skew/default-value detector a
      // pre-ingest audit runs (a value covering 90% of a column is either
      // a default or a join-key hazard). Per column: one partial-agg
      // keyed shuffle + a bounded top-k window over the DISTINCT VALUE
      // counts (group count ≪ rows — never a window over the row stream);
      // the per-column unions are independent branches of one job. At
      // 100 TB swap the exact counts for CMS estimates (agg_cms_topk).
      import org.apache.spark.sql.expressions.Window
      val ord = orders(s, dir)
      val perCol = topkCols.map { c =>
        val w = Window.partitionBy("col_name")
          .orderBy(col("cnt").desc, col("value"))
        ord.groupBy(col(c).cast("string").as("value"))
          .agg(count(lit(1)).as("cnt"))
          .withColumn("col_name", lit(c)) // "column" is reserved in DuckDB
          .withColumn("rn", row_number().over(w).cast("bigint"))
          .filter(col("rn") <= 3)
      }
      perCol.reduce(_ unionByName _)
        .select("col_name", "value", "cnt", "rn")
        .orderBy("col_name", "rn")
    }),

    "profile_corr_matrix" -> ((s, dir) => {
      // pairwise Pearson correlations across the numeric measure columns
      // — the multicollinearity read before any modeling/feature work
      // (and the one-pass companion to agg_regr's single-pair fit). ALL
      // six pairs fold in ONE scan: each corr is a constant-state
      // co-moment sketch, partial-aggregated map-side; the 1×6 result
      // pivots to rows via the profile_columns inline-struct explode —
      // the fact table is never re-read. round+(-0.0 pin) absorbs the
      // engines' accumulation-order ulps (the ts_autocorr discipline).
      val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      val pairs = for {
        i <- cols.indices; j <- cols.indices if i < j
      } yield (cols(i), cols(j))
      val aggs = pairs.map { case (a, b) =>
        (r4(corr(col(a), col(b))) + lit(0.0)).as(s"c_${a}_$b")
      }
      val one = lineitem(s, dir).agg(aggs.head, aggs.tail: _*)
      val rows = pairs.map { case (a, b) =>
        struct(lit(a).as("col_a"), lit(b).as("col_b"),
          col(s"c_${a}_$b").as("pearson_r"))
      }
      one.select(explode(array(rows: _*)).as("p")).select("p.*")
        .orderBy("col_a", "col_b")
    })
  )

  private def profOracle: String = {
    val aggs = profCols.zipWithIndex.map { case (c, i) =>
      s"count($c) AS nn$i, count(DISTINCT $c) AS nd$i, " +
        s"CAST(min($c) AS DOUBLE) AS mn$i, CAST(max($c) AS DOUBLE) AS mx$i"
    }.mkString(",\n             ")
    val arms = profCols.zipWithIndex.map { case (c, i) =>
      s"SELECT '$c' AS \"column\", n_rows - nn$i AS n_nulls, nd$i AS n_distinct, " +
        s"mn$i AS min_v, mx$i AS max_v FROM a"
    }.mkString("\n           UNION ALL ")
    s"""WITH a AS (SELECT count(*) AS n_rows,
             $aggs
           FROM lineitem)
         SELECT * FROM ($arms)
         ORDER BY "column" NULLS FIRST"""
  }

  val oracles: Map[String, String] = Map(
    "profile_topk_values" ->
      topkCols.map { c =>
        s"""SELECT col_name, value, cnt, rn FROM (
              SELECT '$c' AS col_name, CAST($c AS VARCHAR) AS value,
                count(*) AS cnt,
                CAST(row_number() OVER (ORDER BY count(*) DESC NULLS LAST,
                  CAST($c AS VARCHAR) NULLS FIRST) AS BIGINT) AS rn
              FROM orders GROUP BY $c)
            WHERE rn <= 3"""
      }.mkString("SELECT * FROM (", " UNION ALL ", ") ORDER BY col_name NULLS FIRST, rn NULLS FIRST"),
    "anomaly_mad" ->
      """WITH r1 AS (
           SELECT event_type, event_id, value,
             row_number() OVER (PARTITION BY event_type
               ORDER BY value NULLS FIRST, event_id NULLS FIRST) AS rn,
             count(*) OVER (PARTITION BY event_type) AS n
           FROM events WHERE value IS NOT NULL),
         med AS (SELECT event_type, value AS med FROM r1 WHERE rn = (n + 1) // 2),
         d AS (SELECT e.event_type, e.event_id, abs(e.value - m.med) AS dev, m.med
               FROM events e JOIN med m USING (event_type)
               WHERE e.value IS NOT NULL),
         r2 AS (SELECT *,
             row_number() OVER (PARTITION BY event_type
               ORDER BY dev NULLS FIRST, event_id NULLS FIRST) AS rn,
             count(*) OVER (PARTITION BY event_type) AS n
           FROM d),
         mad AS (SELECT event_type, dev AS mad FROM r2 WHERE rn = (n + 1) // 2)
         SELECT event_type, count(*) AS n_rows,
           round(max(med), 4) AS med, round(max(mad), 4) AS mad,
           CAST(count(*) FILTER (dev > 3 * 1.4826 * mad) AS BIGINT) AS n_outliers
         FROM d JOIN mad USING (event_type)
         GROUP BY 1 ORDER BY event_type NULLS FIRST""",
    "anomaly_zscore" ->
      """WITH m AS (
           SELECT event_type AS et, count(*) AS n,
             sum(CAST(round(value, 4) AS DECIMAL(18,4))) AS sv,
             sum(CAST(round(CAST(round(value, 4) AS DECIMAL(18,4))
                            * CAST(round(value, 4) AS DECIMAL(18,4)), 4)
                      AS DECIMAL(30,4))) AS svv
           FROM events WHERE value IS NOT NULL GROUP BY 1),
         st AS (
           SELECT et,
             CAST(sv AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
             sqrt(CASE WHEN vnum IS NULL OR vnum <= 0 THEN 0 ELSE vnum END) AS sd
           FROM (SELECT et, sv, n,
                   (CAST(svv AS DOUBLE)
                    - CAST(sv AS DOUBLE) * CAST(sv AS DOUBLE) / CAST(n AS DOUBLE))
                   / (CAST(n AS DOUBLE) - 1.0) AS vnum
                 FROM m))
         SELECT event_id, event_type, value,
           round((value - mean) / sd, 4) AS z
         FROM events JOIN st ON event_type = et
         WHERE value IS NOT NULL
           AND abs((value - mean) / sd) > 3.0
         ORDER BY event_id NULLS FIRST""",
    "profile_columns" -> profOracle,
    "profile_corr_matrix" -> {
      val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      val pairs = for {
        i <- cols.indices; j <- cols.indices if i < j
      } yield (cols(i), cols(j))
      val arms = pairs.map { case (a, b) =>
        s"SELECT '$a' AS col_a, '$b' AS col_b, round(corr($a, $b), 4) + 0.0 AS pearson_r FROM lineitem"
      }
      arms.mkString("SELECT * FROM (", " UNION ALL ",
        ") ORDER BY col_a NULLS FIRST, col_b NULLS FIRST")
    }
  )
}
