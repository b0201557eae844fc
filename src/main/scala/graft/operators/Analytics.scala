package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}
import graft.Tables._

/** Classic BI / customer-analytics operators over the star schema —
  * association pairs, concentration indices, heavy-hitter audits, RFM
  * segmentation (reference intent: karna's "analytics over tabular files",
  * /root/reference/README.md:2).
  *
  * 100 TB design notes sit on each key; the shared principles are
  * (a) fan-out is always bounded by a domain cap applied BEFORE any
  * self-join, (b) rank/quantile work happens over aggregated group tables
  * (|customers|, |parts|), never the raw fact stream, and (c) every
  * emitted double derives from exact integer/decimal aggregates through
  * an expression written identically in both engines.
  */
object Analytics {

  /** Baskets larger than this are dropped before the pair self-join: a
    * k-item basket emits k(k-1)/2 pairs, so one bot/wholesale order with
    * 10^4 items would emit 5·10^7 pairs — the same hot-bucket discipline
    * as dedup_near's shingle-df cap (TextOps.scala). TPC-H baskets are
    * ≤ 7 items, so the fixture result is unchanged; the cap is the
    * 100 TB guard, mirrored verbatim in the oracle.
    */
  private val basketCap = 25

  private def marketBasket(s: SparkSession, dir: String): DataFrame = {
    // market-basket association: for each co-purchased part pair,
    // support count + lift = P(a,b)/(P(a)P(b)). Plan: distinct
    // (order, part) → basket-size cap (semi-join on the already-keyed
    // aggregate) → self-join WITHIN an order key (bounded ≤ C(25,2)
    // pairs/order) → pair-keyed partial-agg shuffle. Item frequencies
    // join pair-keyed (|parts| is corpus-proportional — NOT broadcast);
    // the 1-row order total IS broadcast. Lift is a double quotient of
    // exact int64 products (≤ 2^53), bit-identical cross-engine; final
    // top-20 goes through TakeOrderedAndProject, never a global sort.
    val items = lineitem(s, dir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct()
    val okOrders = items.groupBy("ok").agg(count(lit(1)).as("n_items"))
      .filter(col("n_items").between(2, basketCap)).select("ok")
    val capped = items.join(okOrders, Seq("ok"), "left_semi")
      // 3 consumers (pair join ×2 branches + item counts + order total):
      // materialize once, not three basket-cap recomputes
      .localCheckpoint(true)
    val itemN = capped.groupBy("pk").agg(count(lit(1)).as("n_item"))
    val totals = capped.agg(countDistinct(col("ok")).as("n_orders"))
    val pairs = capped.toDF("ok", "a").join(capped.toDF("ok", "b"), "ok")
      .filter(col("a") < col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= 2)
    pairs
      .join(itemN.toDF("a", "n_a"), "a")
      .join(itemN.toDF("b", "n_b"), "b")
      .crossJoin(broadcast(totals))
      .withColumn("lift",
        (col("n_ab") * col("n_orders")).cast(DoubleType) /
          (col("n_a") * col("n_b")).cast(DoubleType))
      .orderBy(col("lift").desc, col("a"), col("b")).limit(20)
      .select(col("a"), col("b"), col("n_ab"), col("n_a"), col("n_b"),
        r4(col("lift")).as("lift"))
  }

  private def keySkew(s: SparkSession, dir: String): DataFrame = {
    // heavy-hitter / join-key-skew audit: top-10 part keys by lineitem
    // row count, each with its share of all rows and its ratio to the
    // mean per-key count — the number you read before deciding whether a
    // join needs salting (join_skew_salted is the cure; this is the
    // diagnosis). One partial-agg keyed shuffle to |keys| counts; the
    // 1-row total/mean aggregate broadcasts; top-10 over the COUNTS
    // table (|keys| rows, never the fact stream) via
    // TakeOrderedAndProject. share/skew are double quotients of exact
    // int64s — bit-identical cross-engine.
    val cnts = lineitem(s, dir)
      .groupBy(col("l_partkey").as("key")).agg(count(lit(1)).as("cnt"))
    val tot = cnts.agg(sum(col("cnt")).as("n_rows"), count(lit(1)).as("n_keys"))
    cnts.crossJoin(broadcast(tot))
      .withColumn("share_pct",
        col("cnt").cast(DoubleType) * lit(100.0) / col("n_rows").cast(DoubleType))
      .withColumn("skew_ratio",
        (col("cnt") * col("n_keys")).cast(DoubleType) / col("n_rows").cast(DoubleType))
      .orderBy(col("cnt").desc, col("key")).limit(10)
      .select(col("key"), col("cnt"), r4(col("share_pct")).as("share_pct"),
        r4(col("skew_ratio")).as("skew_ratio"))
  }

  private def gini(s: SparkSession, dir: String): DataFrame = {
    // per-nation Gini coefficient of customer spend — the revenue-
    // concentration index ("do 20% of customers carry 80%?"; abc_analysis
    // is the cumulative-share view, this is the scalar). Rank formula
    // G = 2·Σ(rank·x)/(n·Σx) − (n+1)/n over spend ranked ascending within
    // nation. Plan: orders → per-customer decimal spend (one keyed
    // partial agg), keyed join to customer for the nation, ONE window
    // partitioned by nation (25 partitions of |customers|/25 — at 100 TB
    // the partition key is the segmentation dimension, same shape as
    // anomaly_mad), one final 25-row agg. Σ(rank·x) as DECIMAL(38,4) is
    // exact; the gini double is computed in one identical association in
    // both engines from decimals < 2^53 ulps.
    import org.apache.spark.sql.expressions.Window
    val spend = orders(s, dir).groupBy(col("o_custkey"))
      .agg(sum(dec(col("o_totalprice"))).as("spend"))
    val cust = customer(s, dir).select(col("c_custkey"), col("c_nationkey"))
    val nat = nation(s, dir).select(col("n_nationkey"), col("n_name"))
    val w = Window.partitionBy("c_nationkey").orderBy(col("spend"), col("o_custkey"))
    val ranked = spend.join(cust, col("o_custkey") === col("c_custkey"))
      .withColumn("rk", row_number().over(w))
    val d = (c: Column) => c.cast(DoubleType)
    ranked.groupBy("c_nationkey")
      .agg(count(lit(1)).as("n_customers"),
        sum(col("spend")).as("s0"),
        sum((col("spend") * col("rk")).cast(DecimalType(38, 4))).as("s1"))
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"), col("n_customers"),
        round(lit(2.0) * d(col("s1")) / (d(col("n_customers")) * d(col("s0")))
          - (d(col("n_customers")) + lit(1.0)) / d(col("n_customers")), 6).as("gini"))
      .orderBy("n_name")
  }

  private def rfm(s: SparkSession, dir: String): DataFrame = {
    // RFM segmentation: per-customer Recency (days since last order, vs
    // the corpus max date), Frequency (#orders), Monetary (decimal spend),
    // each quartiled 1..4 over ALL customers, then rolled up to segment
    // cells. The three global quartiles use globalNtile (Windows.scala) —
    // range-repartition + broadcast offsets, NEVER a single-partition
    // window — over the per-customer aggregate (|customers| rows, not the
    // fact stream). Quartile order ties break on custkey (unique), so the
    // NTILE is cross-engine deterministic; avg metrics are exact decimal /
    // int quotients emitted once as doubles.
    val maxd = orders(s, dir).agg(max(col("o_orderdate")).as("dmax"))
    val base = orders(s, dir).groupBy(col("o_custkey"))
      .agg(max(col("o_orderdate")).as("last_o"),
        count(lit(1)).as("freq"),
        sum(dec(col("o_totalprice"))).as("mon"))
      .crossJoin(broadcast(maxd))
      .withColumn("rec_days", datediff(col("dmax"), col("last_o")))
      .drop("dmax", "last_o")
    val q = Seq(
      ("rec_days", "r_q"), ("freq", "f_q"), ("mon", "m_q")
    ).foldLeft(base) { case (df, (metric, out)) =>
      Windows.globalNtile(df, 4, Seq(col(metric), col("o_custkey")), out)
    }
    q.groupBy("r_q", "f_q", "m_q")
      .agg(count(lit(1)).as("n_customers"),
        sum(col("freq")).as("sf"), sum(col("mon")).as("sm"))
      .select(col("r_q"), col("f_q"), col("m_q"), col("n_customers"),
        r4(col("sf").cast(DoubleType) / col("n_customers").cast(DoubleType))
          .as("avg_frequency"),
        r4(col("sm").cast(DoubleType) / col("n_customers")).as("avg_monetary"))
      .orderBy("r_q", "f_q", "m_q")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "market_basket" -> (marketBasket _),
    "profile_key_skew" -> (keySkew _),
    "agg_gini" -> (gini _),
    "rfm_segments" -> (rfm _),

    "ts_seasonality" -> ((s, dir) => {
      // hour-of-day seasonality profile per event type — the diurnal
      // fingerprint read before setting stream watermarks or anomaly
      // baselines (a 3 a.m. spike is an incident; the same spike at noon
      // is lunch). ONE partial-aggregating keyed shuffle; output bounded
      // by |types|·24 forever. Sums are pre-rounded decimals (exact,
      // partition-order-free — the anomaly_zscore discipline); the mean
      // is one double quotient written identically in both engines.
      events(s, dir)
        .groupBy(col("event_type"), hour(col("ts")).cast("bigint").as("hod"))
        .agg(count(lit(1)).as("n_events"),
          sum(round(col("value"), 4).cast(DecimalType(18, 4))).as("sv"))
        .select(col("event_type"), col("hod"), col("n_events"),
          r4(col("sv").cast(DoubleType) / col("n_events").cast(DoubleType))
            .as("avg_value"))
        .orderBy("event_type", "hod")
    }),

    "ts_pct_change" -> ((s, dir) => {
      // month-over-month revenue growth per nation — the trend panel
      // every revenue dashboard opens with. Monthly totals are exact
      // decimal sums (one keyed partial agg, output bounded by
      // |nations|·|months|); lag runs per-nation (the window key is the
      // series key — parallelizes across nations at any scale); the
      // growth rate is one double expression over exact decimals,
      // written identically in both engines. First month per nation is
      // NULL by construction (no prior period).
      import org.apache.spark.sql.expressions.Window
      val nat = nation(s, dir).select(col("n_nationkey"), col("n_name"))
      val monthly = orders(s, dir)
        .join(customer(s, dir).select(col("c_custkey"), col("c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
        // trunc() emits DateType — DuckDB's date_trunc('month', ts) is a
        // DATE, and Spark's date_trunc is a TIMESTAMP (schema mismatch)
        .groupBy(col("n_name"), trunc(col("o_orderdate"), "month").as("mth"))
        .agg(sum(dec(col("o_totalprice"))).as("t"))
      val w = Window.partitionBy("n_name").orderBy("mth")
      monthly.withColumn("p", lag(col("t"), 1).over(w))
        .select(col("n_name"), col("mth"),
          outDec(col("t")).as("total"),
          r4((col("t") - col("p")).cast(DoubleType) / col("p").cast(DoubleType)
            * lit(100.0)).as("pct_change"))
        .orderBy("n_name", "mth")
    }),

    "agg_hhi" -> ((s, dir) => {
      // supplier-concentration histogram: per part, the Herfindahl-
      // Hirschman index of supplier revenue shares (HHI = Σ shareᵢ² —
      // 1/k for k equal suppliers, 1.0 for sole-source), bucketed into
      // deciles — single-source risk at a glance. The algebra avoids
      // materializing shares: HHI = Σrᵢ²/ (Σrᵢ)², with rᵢ exact
      // whole-unit BIGINTs (deterministically rounded decimals — both
      // engines' round-half-away agree), so the double quotient is
      // bit-identical cross-engine. Two keyed partial aggs (part,supp →
      // part) + one ≤11-group rollup; squares stay < 2⁶³ through sf100
      // (rᵢ ≤ ~4·10⁸ ⇒ rᵢ² ≤ 1.6·10¹⁷; beyond that, scale rᵢ to
      // thousands — same determinism argument).
      val rev = lineitem(s, dir)
        .groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(sum(dec(col("l_extendedprice"))).as("r"))
        .select(col("l_partkey"),
          round(col("r"), 0).cast("bigint").as("ru"))
      val hhi = rev.groupBy("l_partkey")
        .agg(count(lit(1)).as("n_suppliers"),
          sum(col("ru") * col("ru")).as("ssq"),
          sum(col("ru")).as("tot"))
        .withColumn("hhi", r4(col("ssq").cast(DoubleType) /
          (col("tot").cast(DoubleType) * col("tot").cast(DoubleType))))
      hhi.groupBy(floor(col("hhi") * 10).cast("bigint").as("hhi_decile"))
        .agg(count(lit(1)).as("n_parts"),
          r4(min(col("hhi"))).as("min_hhi"),
          r4(max(col("hhi"))).as("max_hhi"))
        .orderBy("hhi_decile")
    })
  )

  val oracles: Map[String, String] = Map(
    "market_basket" ->
      s"""WITH items AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
         okord AS (SELECT ok FROM items GROUP BY ok
                   HAVING count(*) BETWEEN 2 AND $basketCap),
         capped AS (SELECT i.* FROM items i SEMI JOIN okord USING (ok)),
         itemn AS (SELECT pk, count(*) AS n_item FROM capped GROUP BY pk),
         tot AS (SELECT count(DISTINCT ok) AS n_orders FROM capped),
         pairs AS (SELECT x.pk AS a, y.pk AS b, count(*) AS n_ab
                   FROM capped x JOIN capped y ON x.ok = y.ok AND x.pk < y.pk
                   GROUP BY 1, 2 HAVING count(*) >= 2)
         SELECT a, b, n_ab, ia.n_item AS n_a, ib.n_item AS n_b,
           round(CAST(n_ab * n_orders AS DOUBLE)
                 / CAST(ia.n_item * ib.n_item AS DOUBLE), 4) AS lift
         FROM pairs
         JOIN itemn ia ON pairs.a = ia.pk
         JOIN itemn ib ON pairs.b = ib.pk
         CROSS JOIN tot
         ORDER BY CAST(n_ab * n_orders AS DOUBLE)
                  / CAST(ia.n_item * ib.n_item AS DOUBLE) DESC, a, b
         LIMIT 20""",
    "profile_key_skew" ->
      """WITH c AS (SELECT l_partkey AS key, count(*) AS cnt FROM lineitem GROUP BY 1),
         t AS (SELECT sum(cnt) AS n_rows, count(*) AS n_keys FROM c)
         SELECT key, cnt,
           round(CAST(cnt AS DOUBLE) * 100.0 / CAST(n_rows AS DOUBLE), 4) AS share_pct,
           round(CAST(cnt * n_keys AS DOUBLE) / CAST(n_rows AS DOUBLE), 4) AS skew_ratio
         FROM c CROSS JOIN t
         ORDER BY cnt DESC, key LIMIT 10""",
    "agg_gini" ->
      """WITH sp AS (SELECT o_custkey, sum(CAST(o_totalprice AS DECIMAL(18,4))) AS spend
                     FROM orders GROUP BY 1),
         rk AS (SELECT c_nationkey, spend,
                  row_number() OVER (PARTITION BY c_nationkey
                    ORDER BY spend, o_custkey) AS rk
                FROM sp JOIN customer ON o_custkey = c_custkey),
         g AS (SELECT c_nationkey, count(*) AS n_customers,
                 sum(spend) AS s0,
                 sum(CAST(spend * rk AS DECIMAL(38,4))) AS s1
               FROM rk GROUP BY 1)
         SELECT n_name, n_customers,
           round(2.0 * CAST(s1 AS DOUBLE)
                   / (CAST(n_customers AS DOUBLE) * CAST(s0 AS DOUBLE))
                 - (CAST(n_customers AS DOUBLE) + 1.0)
                   / CAST(n_customers AS DOUBLE), 6) AS gini
         FROM g JOIN nation ON c_nationkey = n_nationkey
         ORDER BY n_name NULLS FIRST""",
    "rfm_segments" ->
      """WITH dm AS (SELECT max(o_orderdate) AS dmax FROM orders),
         b AS (SELECT o_custkey,
                 date_diff('day', CAST(max(o_orderdate) AS DATE),
                           CAST((SELECT dmax FROM dm) AS DATE)) AS rec_days,
                 count(*) AS freq,
                 sum(CAST(o_totalprice AS DECIMAL(18,4))) AS mon
               FROM orders GROUP BY 1),
         q AS (SELECT o_custkey, freq, mon,
                 ntile(4) OVER (ORDER BY rec_days, o_custkey) AS r_q,
                 ntile(4) OVER (ORDER BY freq, o_custkey) AS f_q,
                 ntile(4) OVER (ORDER BY mon, o_custkey) AS m_q
               FROM b)
         SELECT r_q, f_q, m_q, count(*) AS n_customers,
           round(CAST(sum(freq) AS DOUBLE) / CAST(count(*) AS DOUBLE), 4)
             AS avg_frequency,
           round(CAST(sum(mon) AS DOUBLE) / count(*), 4) AS avg_monetary
         FROM q GROUP BY 1, 2, 3
         ORDER BY r_q NULLS FIRST, f_q NULLS FIRST, m_q NULLS FIRST""",
    "ts_seasonality" ->
      """SELECT event_type, hour(ts) AS hod, count(*) AS n_events,
         round(CAST(sum(CAST(round(value, 4) AS DECIMAL(18,4))) AS DOUBLE)
               / CAST(count(*) AS DOUBLE), 4) AS avg_value
         FROM events GROUP BY 1, 2
         ORDER BY event_type NULLS FIRST, hod NULLS FIRST""",
    "ts_pct_change" ->
      """WITH m AS (
           SELECT n_name, date_trunc('month', o_orderdate) AS mth,
             sum(CAST(o_totalprice AS DECIMAL(18,4))) AS t
           FROM orders
           JOIN customer ON o_custkey = c_custkey
           JOIN nation ON c_nationkey = n_nationkey
           GROUP BY 1, 2),
         l AS (SELECT n_name, mth, t,
             lag(t, 1) OVER (PARTITION BY n_name ORDER BY mth) AS p
           FROM m)
         SELECT n_name, mth,
           CAST(round(t, 4) AS DOUBLE) AS total,
           round(CAST(t - p AS DOUBLE) / CAST(p AS DOUBLE) * 100.0, 4) AS pct_change
         FROM l ORDER BY n_name NULLS FIRST, mth NULLS FIRST""",
    "agg_hhi" ->
      """WITH rev AS (
           SELECT l_partkey,
             CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))), 0) AS BIGINT) AS ru
           FROM lineitem GROUP BY l_partkey, l_suppkey),
         h AS (
           SELECT l_partkey, count(*) AS n_suppliers,
             round(CAST(sum(ru * ru) AS DOUBLE)
                   / (CAST(sum(ru) AS DOUBLE) * CAST(sum(ru) AS DOUBLE)), 4) AS hhi
           FROM rev GROUP BY 1)
         SELECT CAST(floor(hhi * 10) AS BIGINT) AS hhi_decile,
           count(*) AS n_parts,
           round(min(hhi), 4) AS min_hhi,
           round(max(hhi), 4) AS max_hhi
         FROM h GROUP BY 1 ORDER BY hhi_decile NULLS FIRST"""
  )
}
