package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}
import graft.Tables._

/** Data-quality gates + distribution-drift monitors — the contract layer a
  * production ingest runs between "files landed" and "data usable"
  * (reference intent: karna's analytics-over-tabular-files posture,
  * /root/reference/README.md:2; same hygiene family as Profiling, which
  * *describes* columns where this module *verifies* them).
  *
  * Families:
  *   - dq_suite        Deequ-style constraint report (one scan per table)
  *   - dq_referential  FK orphan audit over the declared star-schema edges
  *   - dq_quarantine   row-level rule violations, grouped by reason combo
  *   - dq_freshness    per-source staleness vs the corpus watermark
  *   - drift_psi       population-stability index per value bucket
  *   - drift_ks        two-sample Kolmogorov-Smirnov on a bounded grid
  *   - drift_chi2      categorical-mix chi-squared per day vs global mix
  *   - drift_embedding per-label centroid cosine + norm-ratio drift
  *
  * 100 TB design notes live on each key. The shared principles:
  * constraint metrics fold in ONE partial-aggregated pass per table
  * (state O(#checks), not O(rows)); referential audits shuffle DISTINCT
  * key sets, never the raw child stream; drift statistics are computed on
  * bounded grids (buckets/cells), so the only per-row work is a map-side
  * bucket assignment and one keyed partial-agg shuffle.
  *
  * Cross-engine determinism: every ratio is exact-int / exact-int (one
  * correctly-rounded double, identical in both engines); Σ-folds over
  * buckets are either static literal-order expression chains (the
  * agg_entropy discipline) or integer math (KS uses |ca·nb − cb·na| so the
  * argmax is decided in exact int64 arithmetic, never by double ties).
  */
object DataQuality {

  private val d = (c: Column) => c.cast(DoubleType)

  // ---------------------------------------------------------------- dq_suite

  /** One spec per check — (name, Spark count expression, DuckDB count
    * expression, threshold) — the single list BOTH surfaces derive from
    * (the fkEdgeSpecs discipline), so a threshold or predicate edit
    * cannot drift between the plan and its oracle. The metric is
    * passing-fraction; a check passes when the UNROUNDED fraction
    * >= threshold. Fixed literal order keeps the report deterministic.
    */
  private def ordersCheckSpecs: Seq[(String, Column, String, Double)] = Seq(
    ("pk_unique_o_orderkey", countDistinct(col("o_orderkey")).cast(DoubleType),
      "count(DISTINCT o_orderkey)", 1.0),
    ("status_in_domain",
      count(when(col("o_orderstatus").isin("F", "O", "P"), 1)).cast(DoubleType),
      "count(*) FILTER (o_orderstatus IN ('F','O','P'))", 1.0),
    ("totalprice_positive",
      count(when(col("o_totalprice") > 0, 1)).cast(DoubleType),
      "count(*) FILTER (o_totalprice > 0)", 1.0),
    ("orderdate_in_bounds",
      count(when(col("o_orderdate").between("1990-01-01", "2005-12-31"), 1))
        .cast(DoubleType),
      "count(*) FILTER (o_orderdate BETWEEN '1990-01-01' AND '2005-12-31')", 1.0))

  private def lineitemCheckSpecs: Seq[(String, Column, String, Double)] = Seq(
    ("discount_in_range",
      count(when(col("l_discount").between(0.0, 0.1), 1)).cast(DoubleType),
      "count(*) FILTER (l_discount BETWEEN 0.0 AND 0.1)", 1.0),
    ("quantity_in_range",
      count(when(col("l_quantity").between(1.0, 50.0), 1)).cast(DoubleType),
      "count(*) FILTER (l_quantity BETWEEN 1.0 AND 50.0)", 1.0),
    ("shipdate_not_null",
      count(col("l_shipdate")).cast(DoubleType), "count(l_shipdate)", 1.0),
    ("tax_in_range",
      count(when(col("l_tax").between(0.0, 0.08), 1)).cast(DoubleType),
      "count(*) FILTER (l_tax BETWEEN 0.0 AND 0.08)", 1.0))

  private def documentsCheckSpecs: Seq[(String, Column, String, Double)] = Seq(
    ("pk_unique_doc_id", countDistinct(col("doc_id")).cast(DoubleType),
      "count(DISTINCT doc_id)", 1.0),
    ("nchars_consistent",
      count(when(col("n_chars") === length(col("text")), 1)).cast(DoubleType),
      "count(*) FILTER (n_chars = length(text))", 1.0),
    ("lang_in_domain",
      count(when(col("lang").isin("de", "en", "es", "fr", "zh"), 1))
        .cast(DoubleType),
      "count(*) FILTER (lang IN ('de','en','es','fr','zh'))", 1.0),
    ("text_nonempty",
      count(when(length(col("text")) > 0, 1)).cast(DoubleType),
      "count(*) FILTER (length(text) > 0)", 1.0))

  private def sparkChecks(sp: Seq[(String, Column, String, Double)]) =
    sp.map { case (n, c, _, t) => (n, c, t) }
  private def sqlChecksOf(sp: Seq[(String, Column, String, Double)]) =
    sp.map { case (n, _, q, t) => (n, q, t) }

  private def suiteReport(df: DataFrame, table: String,
                          checks: Seq[(String, Column, Double)]): DataFrame = {
    // ONE scan: every check folds to constant aggregate state map-side
    // (the profile_columns shape) — at 100 TB a 50-check suite is still
    // one pass with O(#checks) bytes of aggregate state per task. The
    // single result row pivots to one row per check via an inline-struct
    // explode, never a re-read.
    val aggs = checks.map { case (n, c, _) => c.as(s"m_$n") }
    val one = df.agg(count(lit(1)).as("n_rows"), aggs: _*)
    val rows = checks.map { case (n, _, thr) =>
      // passed compares the UNROUNDED fraction (exact-int / exact-int —
      // identical in both engines): rounding first would certify up to
      // 0.00005·n violating rows as clean at threshold 1.0. The rounded
      // metric is display only.
      // try_divide: an empty table's fraction is NULL (DuckDB's x/0) —
      // ANSI's plain Divide would error the whole suite on zero rows
      val frac = try_divide(col(s"m_$n"), d(col("n_rows")))
      struct(lit(table).as("table_name"), lit(n).as("check_name"),
        r4(frac).as("metric"), lit(thr).as("threshold"),
        (frac >= lit(thr)).as("passed"))
    }
    one.select(explode(array(rows: _*)).as("c")).select("c.*")
  }

  private def suiteOracleArms(table: String,
                              sqlChecks: Seq[(String, String, Double)]): Seq[String] =
    sqlChecks.map { case (n, cntExpr, thr) =>
      s"""SELECT '$table' AS table_name, '$n' AS check_name,
            round(CAST($cntExpr AS DOUBLE) / CAST(count(*) AS DOUBLE), 4) AS metric,
            CAST($thr AS DOUBLE) AS threshold,
            CAST($cntExpr AS DOUBLE) / CAST(count(*) AS DOUBLE) >= $thr
              AS passed
          FROM $table"""
    }

  // ---------------------------------------------------------- dq_referential

  /** (child table, fk col, parent table, pk col, parent-is-broadcast-size)
    * — the ONE edge list both the Spark plan and the oracle SQL derive
    * from, so the two surfaces cannot drift. Order = output order.
    */
  private val fkEdgeSpecs: Seq[(String, String, String, String, Boolean)] = Seq(
    ("customer", "c_nationkey", "nation", "n_nationkey", true),
    ("lineitem", "l_orderkey", "orders", "o_orderkey", false),
    ("lineitem", "l_partkey", "part", "p_partkey", false),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey", true),
    ("nation", "n_regionkey", "region", "r_regionkey", true),
    ("orders", "o_custkey", "customer", "c_custkey", false),
    ("supplier", "s_nationkey", "nation", "n_nationkey", true))

  private def edgeLabel(e: (String, String, String, String, Boolean)): String =
    s"${e._1}.${e._2}->${e._3}"

  private def tableOf(s: SparkSession, dir: String, name: String): DataFrame =
    name match {
      case "region"   => region(s, dir)
      case "nation"   => nation(s, dir)
      case "customer" => customer(s, dir)
      case "supplier" => supplier(s, dir)
      case "part"     => part(s, dir)
      case "orders"   => orders(s, dir)
      case "lineitem" => lineitem(s, dir)
    }

  private def fkEdges(s: SparkSession, dir: String)
      : Seq[(String, DataFrame, String, DataFrame, String, Boolean)] =
    fkEdgeSpecs.map { case e @ (child, ck, parent, pk, bc) =>
      (edgeLabel(e), tableOf(s, dir, child), ck, tableOf(s, dir, parent), pk, bc)
    }

  private def fkEdgesSql: Seq[(String, String, String, String, String)] =
    fkEdgeSpecs.map { case e @ (child, ck, parent, pk, _) =>
      (edgeLabel(e), child, ck, parent, pk)
    }

  private def referential(s: SparkSession, dir: String): DataFrame = {
    // Per edge: aggregate the child to DISTINCT fk keys + counts FIRST
    // (shuffle volume |keys|, never |child rows| — at 100 TB lineitem
    // streams map-side into its partial agg), then probe the parent pk
    // set: broadcast for catalog-size parents, keyed shuffle of two key
    // sets for fact-fact edges. NULL fks follow SQL FK semantics (not
    // orphans) and are surfaced in their own column instead.
    val edges = fkEdges(s, dir).map { case (label, child, ck, parent, pk, bc) =>
      val keys = child.groupBy(col(ck).as("k")).agg(count(lit(1)).as("cnt"))
      val par = parent.select(col(pk).as("pk")).distinct()
      val j = keys.join(if (bc) broadcast(par) else par, col("k") === col("pk"), "left")
      j.agg(
        sum(col("cnt")).as("child_rows"),
        coalesce(sum(when(col("k").isNotNull && col("pk").isNull, col("cnt"))), lit(0L))
          .as("orphan_rows"),
        coalesce(sum(when(col("k").isNull, col("cnt"))), lit(0L)).as("null_keys"))
        .select(lit(label).as("fk_edge"), col("child_rows"), col("orphan_rows"),
          col("null_keys"),
          ratio4("orphan_rows", "child_rows").as("orphan_rate"))
    }
    edges.reduce(_ unionByName _).orderBy("fk_edge")
  }

  private def referentialOracle: String =
    fkEdgesSql.map { case (label, child, ck, parent, pk) =>
      s"""SELECT '$label' AS fk_edge,
            CAST(sum(cnt) AS BIGINT) AS child_rows,
            CAST(coalesce(sum(CASE WHEN k IS NOT NULL AND pk IS NULL
                               THEN cnt END), 0) AS BIGINT) AS orphan_rows,
            CAST(coalesce(sum(CASE WHEN k IS NULL THEN cnt END), 0) AS BIGINT)
              AS null_keys,
            ${ratio4Duck("""coalesce(sum(CASE WHEN k IS NOT NULL AND pk IS NULL
                             THEN cnt END), 0)""", "sum(cnt)")} AS orphan_rate
          FROM (SELECT $ck AS k, count(*) AS cnt FROM $child GROUP BY 1) c
          LEFT JOIN (SELECT DISTINCT $pk AS pk FROM $parent) p ON c.k = p.pk"""
    }.mkString("SELECT * FROM (", " UNION ALL ", ") ORDER BY fk_edge NULLS FIRST")

  // ----------------------------------------------------------- dq_quarantine

  /** Row rules in fixed literal order — the reasons string concatenates in
    * this order, so the combo label is deterministic.
    */
  private val rowRules: Seq[(String, String)] = Seq(
    ("discount_gt_008", "l_discount > 0.08"),
    ("qty_ge_45", "l_quantity >= 45"),
    ("tax_ge_007", "l_tax >= 0.07"),
    ("price_gt_90k", "l_extendedprice > 90000"))

  private def quarantine(s: SparkSession, dir: String): DataFrame = {
    // Dead-letter accounting: each row is tagged map-side with every rule
    // it violates; violators group by their reason COMBINATION (≤ 2^#rules
    // groups — bounded, so the shuffle carries a handful of partial-agg
    // rows per task regardless of corpus size). The full quarantined row
    // stream would go to a partitioned sink (sink_partitioned) at 100 TB;
    // the report here is the bounded summary a gate alerts on.
    val arms = rowRules.map { case (n, cond) =>
      when(expr(cond), s"$n,").otherwise("")
    }
    lineitem(s, dir)
      .withColumn("reasons", regexp_replace(concat(arms: _*), ",$", ""))
      .filter(col("reasons") =!= "")
      .groupBy("reasons")
      .agg(count(lit(1)).as("n_rows"),
        min(col("l_orderkey")).as("first_orderkey"))
      .orderBy("reasons")
  }

  private def quarantineOracle: String = {
    val arms = rowRules.map { case (n, cond) =>
      s"CASE WHEN $cond THEN '$n,' ELSE '' END"
    }.mkString(" || ")
    s"""SELECT reasons, count(*) AS n_rows, min(l_orderkey) AS first_orderkey
        FROM (SELECT regexp_replace($arms, ',$$', '') AS reasons, l_orderkey
              FROM lineitem)
        WHERE reasons <> ''
        GROUP BY reasons ORDER BY reasons NULLS FIRST"""
  }

  // ------------------------------------------------------------ dq_freshness

  private def freshness(s: SparkSession, dir: String): DataFrame = {
    // Per-source watermark lag vs the corpus max — the "did a feed stop?"
    // monitor. One partial-agg pass to |sources| rows; the corpus max is
    // a broadcast 1-row re-agg of those rows (the fact table is read
    // once). Lag math in exact µs integers; minutes as one division.
    val per = events(s, dir).groupBy("event_type")
      .agg(max(col("ts")).as("last_ts"), count(lit(1)).as("n_events"))
    // corpus max via a global window over the |sources| aggregate rows —
    // NOT a second branch off `per` (a branch would re-scan the fact
    // table; a single-partition window over the bounded aggregate is the
    // adjudicated profile_topk_values shape)
    val wAll = Window.orderBy("event_type")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val lagMin =
      r4(d(unix_micros(max(col("last_ts")).over(wAll)) - unix_micros(col("last_ts")))
        / lit(6.0e7))
    per.select(col("event_type"), col("n_events"), col("last_ts"),
        lagMin.as("lag_minutes"), (lagMin > lit(30.0)).as("stale"))
      .orderBy("event_type")
  }

  private val freshnessOracle: String =
    """WITH per AS (SELECT event_type, max(ts) AS last_ts, count(*) AS n_events
                    FROM events GROUP BY 1),
         g AS (SELECT max(last_ts) AS corpus_max FROM per)
       SELECT event_type, n_events, last_ts,
         round(CAST(epoch_us(corpus_max) - epoch_us(last_ts) AS DOUBLE)
               / 6.0e7, 4) AS lag_minutes,
         round(CAST(epoch_us(corpus_max) - epoch_us(last_ts) AS DOUBLE)
               / 6.0e7, 4) > 30.0 AS stale
       FROM per, g ORDER BY event_type NULLS FIRST"""

  // --------------------------------------------------------------- drift_psi

  private def psi(s: SparkSession, dir: String): DataFrame = {
    // Population-stability index of the value distribution, reference
    // window (days 1-15) vs current (16-31), per event_type × fixed-width
    // bucket. Per-row work is a map-side bucket assignment; ONE keyed
    // partial-agg shuffle to |types × buckets| cells; per-type totals are
    // a window over the bounded cell grid (NOT a second branch off the
    // cells — a branch would re-scan the fact table; the window shuffles
    // only |cells| rows). Reported per bucket (the drill-down a drift
    // dashboard needs) rather than as a cross-bucket double sum — each
    // psi term is a pure function of four exact ints, so the output is
    // bit-identical across engines and parallelism (no accumulation
    // order exists to drift). ε=1e-6 clamps empty-cell probabilities, the
    // standard PSI smoothing.
    psiOf(events(s, dir))
  }

  /** psi core over any events-shaped frame (ts/event_type/value) —
    * split out so PropertySpec can feed planted distributions.
    */
  private[graft] def psiOf(ev: DataFrame): DataFrame = {
    val eps = lit(1.0e-6)
    // NULL values carry no distribution information: least/greatest skip
    // NULLs in both engines, so an unfiltered NULL would silently land in
    // bucket 9 and skew the statistic the day NULLs appear (ksOf already
    // filters; mirrored by WHERE value IS NOT NULL in the oracle).
    val cells = ev
      .filter(col("value").isNotNull)
      .withColumn("bucket",
        greatest(lit(0L), least(lit(9L), floor(col("value") / 50.0).cast(LongType))))
      .groupBy("event_type", "bucket")
      .agg(count(when(dayofmonth(col("ts")) <= 15, 1)).as("n_ref"),
        count(when(dayofmonth(col("ts")) > 15, 1)).as("n_cur"))
    val wType = Window.partitionBy("event_type")
    // greatest(total, 1): a type with zero rows in one half would divide
    // 0/0 — NULL in Spark but IEEE NaN in DuckDB, and NaN survives
    // greatest (it sorts highest), so the engines would diverge; with the
    // floor, every probability in the empty half is exactly 0 → eps —
    // the complete-displacement signal, identical cross-engine
    val tr = greatest(sum(col("n_ref")).over(wType), lit(1L))
    val tc = greatest(sum(col("n_cur")).over(wType), lit(1L))
    val pr = greatest(d(col("n_ref")) / d(tr), eps)
    val pc = greatest(d(col("n_cur")) / d(tc), eps)
    cells.select(col("event_type"), col("bucket"), col("n_ref"), col("n_cur"),
        round((pc - pr) * log(pc / pr), 6).as("psi_term"))
      .orderBy("event_type", "bucket")
  }

  private val psiOracle: String =
    """WITH cells AS (
         SELECT event_type,
           greatest(0, least(9, CAST(floor(value / 50.0) AS BIGINT))) AS bucket,
           count(*) FILTER (EXTRACT(day FROM ts) <= 15) AS n_ref,
           count(*) FILTER (EXTRACT(day FROM ts) > 15) AS n_cur
         FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
       tots AS (SELECT event_type AS et,
                  greatest(sum(n_ref), 1) AS tr, greatest(sum(n_cur), 1) AS tc
                FROM cells GROUP BY 1)
       SELECT event_type, bucket,
         CAST(n_ref AS BIGINT) AS n_ref, CAST(n_cur AS BIGINT) AS n_cur,
         round((greatest(CAST(n_cur AS DOUBLE) / CAST(tc AS DOUBLE), 1.0e-6)
                - greatest(CAST(n_ref AS DOUBLE) / CAST(tr AS DOUBLE), 1.0e-6))
               * ln(greatest(CAST(n_cur AS DOUBLE) / CAST(tc AS DOUBLE), 1.0e-6)
                    / greatest(CAST(n_ref AS DOUBLE) / CAST(tr AS DOUBLE), 1.0e-6)),
               6) AS psi_term
       FROM cells JOIN tots ON event_type IS NOT DISTINCT FROM et
       ORDER BY event_type NULLS FIRST, bucket NULLS FIRST"""

  // ---------------------------------------------------------------- drift_ks

  private def ks(s: SparkSession, dir: String): DataFrame = {
    // Two-sample Kolmogorov-Smirnov between the click and purchase value
    // distributions on a unit-width grid. The raw streams reduce map-side
    // to ≤ ~500 grid cells in ONE keyed shuffle — the fact table is
    // scanned ONCE: ECDFs, totals, and the sup all come from window
    // passes over the same bounded grid (deliberate single-partition
    // windows over O(grid) rows, never over the row stream — the
    // profile_topk_values adjudication; a `tot = cells.agg(...)` branch
    // would instead re-scan the corpus per branch). The sup statistic is
    // decided in exact int64 arithmetic — |ca·nb − cb·na| — so the argmax
    // never hinges on a double tie; the one division happens after the
    // max is chosen.
    ksOf(events(s, dir), "click", "purchase")
  }

  /** ks core over any events-shaped frame and type pair — split out so
    * PropertySpec can feed planted distributions.
    */
  private[graft] def ksOf(ev: DataFrame, typeA: String, typeB: String): DataFrame = {
    // NULL values carry no position on the real line — and a NULL bucket
    // would cumulate NULLS-FIRST in Spark vs NULLS-LAST in DuckDB's
    // default window order, silently shifting every ECDF step
    val cells = ev
      .filter(col("event_type").isin(typeA, typeB) && col("value").isNotNull)
      .withColumn("bucket", floor(col("value")).cast(LongType))
      .groupBy("bucket")
      .agg(count(when(col("event_type") === typeA, 1)).as("ca"),
        count(when(col("event_type") === typeB, 1)).as("cb"))
    val wCum = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    val wAll = Window.orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val diffs = cells.select(col("bucket"),
      sum(col("ca")).over(wCum).as("cca"), sum(col("cb")).over(wCum).as("ccb"),
      sum(col("ca")).over(wAll).as("na"), sum(col("cb")).over(wAll).as("nb"))
      .withColumn("diff", abs(col("cca") * col("nb") - col("ccb") * col("na")))
      .withColumn("md", max(col("diff")).over(wAll))
    diffs.filter(col("diff") === col("md"))
      .agg(min(col("bucket")).as("at_bucket"), max(col("na")).as("n_click"),
        max(col("nb")).as("n_purchase"), max(col("diff")).as("mdiff"))
      .select(col("n_click"), col("n_purchase"),
        round(d(col("mdiff")) / (d(col("n_click")) * d(col("n_purchase"))), 6)
          .as("ks_stat"),
        col("at_bucket"))
  }

  private val ksOracle: String =
    """WITH cells AS (
         SELECT CAST(floor(value) AS BIGINT) AS bucket,
           count(*) FILTER (event_type = 'click') AS ca,
           count(*) FILTER (event_type = 'purchase') AS cb
         FROM events
         WHERE event_type IN ('click', 'purchase') AND value IS NOT NULL
         GROUP BY 1),
       cum AS (SELECT bucket,
                 sum(ca) OVER (ORDER BY bucket NULLS FIRST
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cca,
                 sum(cb) OVER (ORDER BY bucket NULLS FIRST
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ccb
               FROM cells),
       tot AS (SELECT sum(ca) AS na, sum(cb) AS nb FROM cells),
       diffs AS (SELECT bucket, abs(cca * nb - ccb * na) AS diff, na, nb
                 FROM cum, tot),
       m AS (SELECT max(diff) AS md FROM diffs)
       SELECT CAST(max(na) AS BIGINT) AS n_click,
         CAST(max(nb) AS BIGINT) AS n_purchase,
         round(CAST(max(diff) AS DOUBLE)
               / (CAST(max(na) AS DOUBLE) * CAST(max(nb) AS DOUBLE)), 6)
           AS ks_stat,
         min(bucket) AS at_bucket
       FROM diffs JOIN m ON diff = md"""

  // --------------------------------------------------------- drift_embedding

  private def embeddingDrift(s: SparkSession, dir: String): DataFrame = {
    // Embedding-space drift: per label, the cosine between the REFERENCE
    // centroid (even vec_ids) and the CURRENT one (odd vec_ids), plus the
    // centroid-norm ratio — direction drift and magnitude drift, the two
    // signals an embedding-model or feature-pipeline change shows first.
    // Exactness: cos(centroid_a, centroid_b) = cos(sum_a, sum_b) (scale-
    // invariant), so we never divide by n — components round to 1e-6
    // scaled integers (the vec_centroid_label/cluster_kmeans discipline)
    // and all sums/products stay exact integers (DECIMAL(38,0) products:
    // int64 would overflow around SF1) until ONE final double conversion
    // per output. Plan: posexplode is a narrow 64× map fan-out; the
    // (label,pos) partial agg carries |labels|·dims cells; the final
    // (label) agg |labels| rows. No joins, no windows, one fact scan.
    import org.apache.spark.sql.types.DecimalType
    val dec = DecimalType(38, 0)
    val e = embeddings(s, dir)
      .withColumn("is_ref", col("vec_id") % 2 === 0)
      .select(col("label"), col("is_ref"), posexplode(col("embedding")).as(Seq("pos", "comp")))
      .withColumn("su", round(col("comp") * 1000000.0, 0).cast("bigint"))
    val perDim = e.groupBy("label", "pos").agg(
      coalesce(sum(when(col("is_ref"), col("su"))), lit(0L)).as("sr"),
      coalesce(sum(when(!col("is_ref"), col("su"))), lit(0L)).as("sc"),
      count(when(col("is_ref"), 1)).as("nr"),
      count(when(!col("is_ref"), 1)).as("nc"))
    val agg = perDim.groupBy("label").agg(
      sum((col("sr").cast(dec) * col("sc").cast(dec)).cast(dec)).as("dot"),
      sum((col("sr").cast(dec) * col("sr").cast(dec)).cast(dec)).as("na2"),
      sum((col("sc").cast(dec) * col("sc").cast(dec)).cast(dec)).as("nb2"),
      max(col("nr")).as("n_ref"), max(col("nc")).as("n_cur"))
    // Guarded denominators: a label whose ref or cur half is empty (or
    // all-zero) gives na2/nb2 = 0 — Spark Divide returns NULL but DuckDB
    // returns NaN/Inf, the cross-engine divergence psiOf clamps against.
    // Emit an explicit NULL in both engines instead.
    agg.select(col("label"), col("n_ref"), col("n_cur"),
        when(d(col("na2")) > 0 && d(col("nb2")) > 0,
          r4(d(col("dot")) / (sqrt(d(col("na2"))) * sqrt(d(col("nb2"))))) + lit(0.0))
          .as("centroid_cos"),
        when(d(col("na2")) > 0 && col("n_cur") > 0,
          r4(sqrt(d(col("nb2"))) * d(col("n_ref"))
            / (sqrt(d(col("na2"))) * d(col("n_cur"))))).as("norm_ratio"))
      .orderBy("label")
  }

  private val embeddingDriftOracle: String =
    """WITH e AS (SELECT label, vec_id % 2 = 0 AS is_ref,
                    CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       x AS (SELECT label, is_ref, i - 1 AS pos,
               CAST(round(v[i] * 1000000, 0) AS BIGINT) AS su
             FROM (SELECT label, is_ref, v,
                     unnest(range(1, len(v) + 1)) AS i FROM e)),
       pd AS (SELECT label, pos,
                CAST(coalesce(sum(su) FILTER (is_ref), 0) AS HUGEINT) AS sr,
                CAST(coalesce(sum(su) FILTER (NOT is_ref), 0) AS HUGEINT) AS sc,
                count(*) FILTER (is_ref) AS nr,
                count(*) FILTER (NOT is_ref) AS nc
              FROM x GROUP BY 1, 2),
       a AS (SELECT label, sum(sr * sc) AS dot, sum(sr * sr) AS na2,
               sum(sc * sc) AS nb2,
               max(nr) AS n_ref, max(nc) AS n_cur
             FROM pd GROUP BY 1)
       SELECT label, CAST(n_ref AS BIGINT) AS n_ref, CAST(n_cur AS BIGINT) AS n_cur,
         CASE WHEN CAST(na2 AS DOUBLE) > 0 AND CAST(nb2 AS DOUBLE) > 0 THEN
           round(CAST(dot AS DOUBLE)
                 / (sqrt(CAST(na2 AS DOUBLE)) * sqrt(CAST(nb2 AS DOUBLE))), 4) + 0.0
         END AS centroid_cos,
         CASE WHEN CAST(na2 AS DOUBLE) > 0 AND n_cur > 0 THEN
           round(sqrt(CAST(nb2 AS DOUBLE)) * CAST(n_ref AS DOUBLE)
                 / (sqrt(CAST(na2 AS DOUBLE)) * CAST(n_cur AS DOUBLE)), 4)
         END AS norm_ratio
       FROM a ORDER BY label NULLS FIRST"""

  // -------------------------------------------------------------- drift_chi2

  private val chiTypes = Seq("view", "click", "purchase", "signup", "error")

  private def chi2(s: SparkSession, dir: String): DataFrame = {
    // Categorical-mix drift: chi-squared distance of each day's
    // event_type mix from the global mix. Cells reduce map-side to
    // |days| rows of 5 static counts (the agg_entropy static-pivot rule:
    // the Σ (obs−exp)²/exp fold is a literal-order expression chain, not
    // a dynamic sum over shuffled rows); the global mix comes from a
    // global window over the ≤31 day rows — one fact scan, not a re-agg
    // branch. Day counts and type totals are exact ints, so exp and
    // every chi2 term are identical doubles in both engines.
    // Types OUTSIDE the declared list (new categories, NULLs) fold into
    // an 'other' column — the appearance of a new category is precisely
    // the mix change this monitor exists to flag, and day_n must report
    // the day's true volume. Every term is guarded on its type's global
    // total (a type absent from the whole corpus contributes 0, not 0/0).
    val cnts = chiTypes.map(t =>
      count(when(col("event_type") === t, 1)).as(s"c_$t")) :+
      count(when(col("event_type").isNull ||
        !col("event_type").isin(chiTypes: _*), 1)).as("c_other")
    val allCols = chiTypes.map(t => s"c_$t") :+ "c_other"
    val wAll = Window.orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val perDay = events(s, dir)
      .groupBy(dayofmonth(col("ts")).as("day"))
      .agg(cnts.head, cnts.tail: _*)
      .withColumn("day_n", allCols.map(col).reduce(_ + _))
    val withGlob = perDay
      .withColumn("grand", sum(col("day_n")).over(wAll))
    val terms = allCols.map { c =>
      val tot = sum(col(c)).over(wAll)
      val exp = d(col("day_n")) * d(tot) / d(col("grand"))
      when(tot > 0,
        (d(col(c)) - exp) * (d(col(c)) - exp) / exp).otherwise(lit(0.0))
    }
    withGlob
      .select(col("day").cast(LongType).as("day"), col("day_n").as("n_events"),
        r4(terms.reduce(_ + _)).as("chi2"))
      .orderBy("day")
  }

  private def chi2Oracle: String = {
    val inList = chiTypes.map(t => s"'$t'").mkString(", ")
    val cnts = (chiTypes.map(t =>
      s"count(*) FILTER (event_type = '$t') AS c_$t") :+
      s"count(*) FILTER (event_type IS NULL OR event_type NOT IN ($inList)) AS c_other")
      .mkString(", ")
    val allCols = chiTypes.map(t => s"c_$t") :+ "c_other"
    val dayN = allCols.mkString(" + ")
    val term = (c: String) =>
      s"""(CASE WHEN t_$c > 0 THEN
            ((CAST($c AS DOUBLE)
              - CAST(day_n AS DOUBLE) * CAST(t_$c AS DOUBLE) / CAST(grand AS DOUBLE))
             * (CAST($c AS DOUBLE)
                - CAST(day_n AS DOUBLE) * CAST(t_$c AS DOUBLE) / CAST(grand AS DOUBLE))
             / (CAST(day_n AS DOUBLE) * CAST(t_$c AS DOUBLE) / CAST(grand AS DOUBLE)))
           ELSE CAST(0.0 AS DOUBLE) END)"""
    s"""WITH pd0 AS (SELECT EXTRACT(day FROM ts) AS day, $cnts
                     FROM events GROUP BY 1),
        pd AS (SELECT *, $dayN AS day_n FROM pd0),
        g AS (SELECT ${allCols.map(c => s"sum($c) AS t_$c").mkString(", ")},
                sum(day_n) AS grand FROM pd)
        SELECT CAST(day AS BIGINT) AS day, CAST(day_n AS BIGINT) AS n_events,
          round(${allCols.map(term).mkString(" + ")}, 4) AS chi2
        FROM pd, g ORDER BY day NULLS FIRST"""
  }

  // ----------------------------------------------------------- registrations

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dq_suite" -> ((s, dir) =>
      suiteReport(orders(s, dir), "orders", sparkChecks(ordersCheckSpecs))
        .unionByName(suiteReport(lineitem(s, dir), "lineitem",
          sparkChecks(lineitemCheckSpecs)))
        .unionByName(suiteReport(documents(s, dir), "documents",
          sparkChecks(documentsCheckSpecs)))
        .orderBy("table_name", "check_name")),
    "dq_referential" -> ((s, dir) => referential(s, dir)),
    "dq_quarantine" -> ((s, dir) => quarantine(s, dir)),
    "dq_freshness" -> ((s, dir) => freshness(s, dir)),
    "drift_psi" -> ((s, dir) => psi(s, dir)),
    "drift_ks" -> ((s, dir) => ks(s, dir)),
    "drift_embedding" -> ((s, dir) => embeddingDrift(s, dir)),
    "drift_chi2" -> ((s, dir) => chi2(s, dir)))

  val oracles: Map[String, String] = Map(
    "dq_suite" ->
      (suiteOracleArms("orders", sqlChecksOf(ordersCheckSpecs)) ++
        suiteOracleArms("lineitem", sqlChecksOf(lineitemCheckSpecs)) ++
        suiteOracleArms("documents", sqlChecksOf(documentsCheckSpecs)))
        .mkString("SELECT * FROM (", " UNION ALL ",
          ") ORDER BY table_name NULLS FIRST, check_name NULLS FIRST"),
    "dq_referential" -> referentialOracle,
    "dq_quarantine" -> quarantineOracle,
    "dq_freshness" -> freshnessOracle,
    "drift_psi" -> psiOracle,
    "drift_ks" -> ksOracle,
    "drift_embedding" -> embeddingDriftOracle,
    "drift_chi2" -> chi2Oracle)
}
