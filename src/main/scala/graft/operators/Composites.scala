package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables._

/** TPC-H-shaped composite analyst queries (SURVEY.md §5.2.5): multi-join +
  * aggregate + top-k END-TO-END compositions of the §2 operator families,
  * adapted to the fixture star schema (FIXTURES.md — no partsupp table, no
  * o_shippriority/l_commitdate columns, so Q3/Q10 use the nearest declared
  * column). Every single-operator key proves one shape in isolation; these
  * prove the shapes compose into the queries a karna analyst would actually
  * run against `README.md:2`'s SQL surface.
  *
  * Scale design (the 100 TB story, shared across the suite):
  *  - SMALL dimensions (region/nation/supplier/part, and customer where
  *    it arrives pre-filtered, e.g. Q3's one-segment slice) carry
  *    explicit `broadcast()` hints: those dim→fact joins are map-side.
  *    UNFILTERED customer (Q5/Q7/Q10) is deliberately NOT hinted — at
  *    TPC-H scale customer is 150k rows × SF (15 B rows at SF100k), far
  *    past broadcast range, so it joins orders through the keyed
  *    shuffle like the fact it effectively is;
  *  - the two fact tables (orders/lineitem) join on their shared key via
  *    one keyed shuffle (AQE may further convert at small SF — fine);
  *  - date-range predicates sit directly on scan columns → parquet
  *    PushedFilters + row-group pruning (asserted in PlanEvidenceSpec);
  *  - aggregates reduce BEFORE any top-k; top-k plans
  *    TakeOrderedAndProject (never a global sort);
  *  - money math runs the §7.1 DECIMAL discipline end-to-end.
  */
object Composites {

  /** The per-row revenue expression of the §7.1 decimal discipline —
    * declared ONCE so the money invariant can't drift between the suite's
    * consumers (revenueSpark's sum, q_promo_revenue, q_market_share,
    * q_product_profit), mirroring the already-factored revenueDuck.
    */
  private def revenueExpr =
    dec(col("l_extendedprice")) * (lit(1).cast(Money) - dec(col("l_discount")))

  private val revenueSpark = sum(revenueExpr)

  private val revenueDuck =
    "sum(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4))))"

  private def ts(s: String) = lit(s).cast(TimestampType)

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    wave12 ++ wave3

  private def wave12: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- Q1 analog: full pricing summary (flagship + avg_price/avg_disc) --
    "q_pricing_summary" -> ((s, d) => {
      val disc1 = lit(1).cast(Money) - dec(col("l_discount"))
      val small  = DecimalType(6, 4)
      val disc1n = lit(1).cast(small) - col("l_discount").cast(small)
      val tax1n  = lit(1).cast(small) + col("l_tax").cast(small)
      val factor = (disc1n * tax1n).cast(DecimalType(9, 8)) // exact, see flagship
      lineitem(s, d)
        .filter(col("l_shipdate") <= ts("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          outDec(sum(dec(col("l_quantity")))).as("sum_qty"),
          outDec(sum(dec(col("l_extendedprice")))).as("sum_base_price"),
          outDec(sum(dec(col("l_extendedprice")) * disc1)).as("sum_disc_price"),
          outDec(sum(dec(col("l_extendedprice")) * factor)).as("sum_charge"),
          // avg4 (exact half-up): the round-11 unicode edge variant hit a
          // literal 4-dp half here (427168.9100 / 8) — see Tables.avg4
          avg4("sum(CAST(l_quantity AS DECIMAL(18,4)))", "count(1)").as("avg_qty"),
          avg4("sum(CAST(l_extendedprice AS DECIMAL(18,4)))", "count(1)").as("avg_price"),
          avg4("sum(CAST(l_discount AS DECIMAL(18,4)))", "count(1)").as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // ---- Q3 analog: shipping priority (segment dim-filter → 3-way join →
    // group → top-10 by revenue). o_orderpriority stands in for the
    // fixture-absent o_shippriority. Deterministic top-k tiebreak on the
    // unique group key.
    "q_shipping_priority" -> ((s, d) =>
      broadcast(customer(s, d).filter(col("c_mktsegment") === "BUILDING"))
        .join(orders(s, d).filter(col("o_orderdate") < ts("1996-06-15")),
          col("c_custkey") === col("o_custkey"))
        .join(lineitem(s, d).filter(col("l_shipdate") > ts("1996-06-15")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(outDec(revenueSpark).as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderdate").asc, col("l_orderkey").asc)
        .limit(10)),

    // ---- Q5 analog: local-supplier volume (region-filtered 6-way star
    // join where customer and supplier must share a nation; one group key).
    "q_local_supplier_volume" -> ((s, d) =>
      customer(s, d)
        .join(orders(s, d)
            .filter(col("o_orderdate") >= ts("1996-01-01") &&
                    col("o_orderdate") <  ts("1997-01-01")),
          col("c_custkey") === col("o_custkey"))
        .join(lineitem(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(supplier(s, d)),
          col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(nation(s, d)), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(region(s, d).filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy("n_name")
        .agg(outDec(revenueSpark).as("revenue"))
        .orderBy(col("revenue").desc, col("n_name").asc)),

    // ---- Q15 analog: top supplier (derived revenue-per-supplier agg,
    // scalar-max subquery as a broadcast 1-row join — no second corpus
    // pass, no window; equality on outDec doubles is exact cross-engine
    // per the Tables.outDec contract).
    "q_top_supplier" -> ((s, d) => {
      val rev = lineitem(s, d)
        .filter(col("l_shipdate") >= ts("1996-01-01") &&
                col("l_shipdate") <  ts("1996-04-01"))
        .groupBy("l_suppkey")
        .agg(outDec(revenueSpark).as("total_revenue"))
      val maxRev = rev.agg(max(col("total_revenue")).as("max_rev"))
      broadcast(supplier(s, d))
        .join(rev, col("s_suppkey") === col("l_suppkey"))
        .join(broadcast(maxRev), col("total_revenue") === col("max_rev"))
        .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
        .orderBy("s_suppkey")
    }),

    // ---- Q4 analog: order-priority checking (EXISTS lowered to a LEFT
    // SEMI join on the order key — one probe per order, no fan-out; the
    // fixture lacks l_commitdate/l_receiptdate, so "late" becomes "has a
    // returned line", same plan shape).
    "q_order_priority" -> ((s, d) =>
      orders(s, d)
        .filter(col("o_orderdate") >= ts("1996-01-01") &&
                col("o_orderdate") <  ts("1996-04-01"))
        .join(lineitem(s, d).filter(col("l_returnflag") === "R"),
          col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority")),

    // ---- Q7 analog: volume shipping between two nations, both
    // directions, by ship year. The nation pair filter sits on two
    // broadcast dims; the fact side is one orderkey shuffle.
    "q_volume_shipping" -> ((s, d) =>
      lineitem(s, d)
        .filter(col("l_shipdate") >= ts("1996-01-01") &&
                col("l_shipdate") <  ts("1998-01-01"))
        .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(broadcast(supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(nation(s, d).select(col("n_nationkey").as("sk"),
          col("n_name").as("supp_nation"))), col("s_nationkey") === col("sk"))
        .join(broadcast(nation(s, d).select(col("n_nationkey").as("ck"),
          col("n_name").as("cust_nation"))), col("c_nationkey") === col("ck"))
        .filter((col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_7") ||
                (col("supp_nation") === "NATION_7" && col("cust_nation") === "NATION_2"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).cast("bigint").as("l_year"))
        .agg(outDec(revenueSpark).as("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")),

    // ---- Q14 analog: promo revenue share for one month — conditional
    // decimal sums in ONE pass, the share a double ratio of exact sums
    // (both engines divide identical doubles, then round).
    "q_promo_revenue" -> ((s, d) => {
      val rev = revenueExpr
      lineitem(s, d)
        .filter(col("l_shipdate") >= ts("1996-03-01") &&
                col("l_shipdate") <  ts("1996-04-01"))
        .join(broadcast(part(s, d)), col("l_partkey") === col("p_partkey"))
        .agg(
          r4(lit(100.0) * sum(when(col("p_type") === "PROMO", rev)
              .otherwise(lit(0).cast(Money))).cast(DoubleType)
            / sum(rev).cast(DoubleType)).as("promo_share_pct"),
          outDec(sum(when(col("p_type") === "PROMO", rev)
            .otherwise(lit(0).cast(Money)))).as("promo_revenue"))
    }),

    // ---- Q22 analog: positive-balance customers with no recent orders
    // (NOT EXISTS lowered to a LEFT ANTI join against the deduped
    // recent-buyer keys — the probe side is |recent customers|, not the
    // order stream), rolled up by segment.
    "q_cust_no_recent" -> ((s, d) =>
      customer(s, d).filter(col("c_acctbal") > 0)
        .join(orders(s, d)
            .filter(col("o_orderdate") >= ts("1999-01-01"))
            .select(col("o_custkey")).distinct(),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("numcust"),
          outDec(sum(dec(col("c_acctbal")))).as("totacctbal"))
        .orderBy("c_mktsegment")),

    // ---- Q18 analog: large-volume orders (IN-subquery over a grouped
    // HAVING lowered to a semi join against the aggregated key set —
    // |qualifying orders| rows, never the line stream; then dims +
    // re-aggregation + deterministic top-20).
    "q_large_orders" -> ((s, d) => {
      val big = lineitem(s, d).groupBy("l_orderkey")
        .agg(sum(dec(col("l_quantity"))).as("q"))
        .filter(col("q") > 280)
        .select("l_orderkey")
      orders(s, d)
        .join(big, col("o_orderkey") === col("l_orderkey"), "left_semi")
        .join(broadcast(customer(s, d).select(col("c_custkey"), col("c_name"))),
          col("o_custkey") === col("c_custkey"))
        .join(lineitem(s, d).select(col("l_orderkey").as("lk"), col("l_quantity")),
          col("o_orderkey") === col("lk"))
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(outDec(sum(dec(col("l_quantity")))).as("total_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(20)
    }),

    // ---- Q2 analog: min-cost supplier per part. Q2's correlated scalar
    // min is hand-decorrelated into ONE lexicographic struct-min partial
    // aggregate — (min price, then min suppkey among ties) per part, the
    // agg_minmax_by determinism discipline — exactly the aggregate-then-
    // join shape Catalyst itself rewrites correlated scalar subqueries
    // into, but with zero second fact pass.
    "q_min_cost_supplier" -> ((s, d) =>
      // candidates need BOTH fields: a NULL price would win the struct min
      // (Spark sorts NULL struct fields low where DuckDB's min skips them —
      // the agg_minmax_by discipline), and a NULL suppkey can't name a
      // supplier; oracle mirrors the WHERE
      lineitem(s, d)
        .filter(col("l_extendedprice").isNotNull && col("l_suppkey").isNotNull)
        .groupBy("l_partkey")
        .agg(min(struct(col("l_extendedprice"), col("l_suppkey"))).as("m"))
        .select(col("l_partkey"), col("m.l_extendedprice").as("min_price"),
          col("m.l_suppkey").as("suppkey"))
        .join(broadcast(part(s, d).select(col("p_partkey"), col("p_name"))),
          col("l_partkey") === col("p_partkey"))
        .join(broadcast(supplier(s, d).select(col("s_suppkey"), col("s_name"))),
          col("suppkey") === col("s_suppkey"))
        .select(col("p_partkey"), col("p_name"), col("s_name"), col("min_price"))
        .orderBy("p_partkey")),

    // ---- Q10 analog: returned items (quarter of orders × returned lines ×
    // customer/nation dims → per-customer revenue → top-20).
    "q_returned_items" -> ((s, d) =>
      customer(s, d)
        .join(orders(s, d)
            .filter(col("o_orderdate") >= ts("1996-01-01") &&
                    col("o_orderdate") <  ts("1996-04-01")),
          col("c_custkey") === col("o_custkey"))
        .join(lineitem(s, d).filter(col("l_returnflag") === "R"),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(outDec(revenueSpark).as("revenue"))
        .select(col("c_custkey"), col("c_name"), col("revenue"),
          col("c_acctbal"), col("n_name"))
        .orderBy(col("revenue").desc, col("c_custkey").asc)
        .limit(20))
  )

  /** Third wave — the 11 remaining TPC-H shapes (Q6/Q8/Q9/Q11/Q12/Q13/
    * Q16/Q17/Q19/Q20/Q21 analogs), completing the 22-query suite. The
    * partsupp-dependent ones (Q11/Q16/Q17/Q20) substitute lineitem as the
    * part↔supplier bridge; absolute HAVING thresholds become
    * scale-free relative ones (×avg) so the same query is meaningful at
    * every SF. Threshold compares run on doubles derived from exact
    * decimal sums — deterministic cross-engine (no FP accumulation).
    */
  private def wave3: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- Q6 analog: forecasting revenue change — pure scan-side
    // conjunctive filter (all three predicates reach PushedFilters) into
    // a single global decimal sum. The simplest composite on purpose:
    // it proves the pushdown + partial-agg path with zero joins.
    "q_forecast_revenue" -> ((s, d) =>
      lineitem(s, d)
        .filter(col("l_shipdate") >= ts("1996-01-01") &&
                col("l_shipdate") <  ts("1997-01-01") &&
                col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
                col("l_quantity") < 24)
        .agg(outDec(sum(dec(col("l_extendedprice")) * dec(col("l_discount"))))
          .as("revenue"))),

    // ---- Q8 analog: national market share — NATION_2's share of PROMO
    // volume sold into ASIA, by order year. Every dim is broadcast; the
    // two facts meet in one orderkey shuffle; the share is a conditional
    // decimal sum ratio in the SAME aggregate pass (no second scan).
    "q_market_share" -> ((s, d) => {
      val vol = revenueExpr
      lineitem(s, d)
        .join(broadcast(part(s, d).filter(col("p_type") === "PROMO")
          .select("p_partkey")), col("l_partkey") === col("p_partkey"))
        .join(orders(s, d)
            .filter(col("o_orderdate") >= ts("1995-01-01") &&
                    col("o_orderdate") <  ts("1997-01-01")),
          col("l_orderkey") === col("o_orderkey"))
        .join(customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(broadcast(nation(s, d).select(col("n_nationkey").as("cnk"),
          col("n_regionkey"))), col("c_nationkey") === col("cnk"))
        .join(broadcast(region(s, d).filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .join(broadcast(supplier(s, d).select("s_suppkey", "s_nationkey")),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(nation(s, d).select(col("n_nationkey").as("snk"),
          col("n_name").as("supp_nation"))), col("s_nationkey") === col("snk"))
        .groupBy(year(col("o_orderdate")).cast("bigint").as("o_year"))
        .agg(r4(sum(when(col("supp_nation") === "NATION_2", vol)
            .otherwise(lit(0).cast(Money))).cast(DoubleType)
          / sum(vol).cast(DoubleType)).as("mkt_share"))
        .orderBy("o_year")
    }),

    // ---- Q9 analog: product-type profit by supplier nation and year.
    // No partsupp ⇒ cost is p_retailprice × quantity (broadcast from the
    // part dim). The p_name LIKE filter prunes part BEFORE broadcast.
    "q_product_profit" -> ((s, d) => {
      val profit =
        revenueExpr -
          dec(col("p_retailprice")) * dec(col("l_quantity"))
      lineitem(s, d)
        .join(broadcast(part(s, d).filter(col("p_name").like("red %"))
          .select("p_partkey", "p_retailprice")),
          col("l_partkey") === col("p_partkey"))
        .join(broadcast(supplier(s, d).select("s_suppkey", "s_nationkey")),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(nation(s, d)), col("s_nationkey") === col("n_nationkey"))
        .join(orders(s, d).select("o_orderkey", "o_orderdate"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("n_name").as("nation"),
          year(col("o_orderdate")).cast("bigint").as("o_year"))
        .agg(outDec(sum(profit)).as("sum_profit"))
        .orderBy(col("nation").asc, col("o_year").desc)
    }),

    // ---- Q11 analog: important parts — per-part revenue above 1.5× the
    // all-parts average (Q11's absolute fraction made scale-free). The
    // global (total, count) is a 1-row broadcast; the compare multiplies
    // instead of divides so both engines do one exact-input double op.
    "q_important_parts" -> ((s, d) => {
      val value = lineitem(s, d).groupBy("l_partkey")
        .agg(sum(dec(col("l_extendedprice"))).as("v"))
      val total = value.agg(sum(col("v")).as("tot"), count(lit(1)).as("np"))
      value.crossJoin(broadcast(total))
        .filter(col("v").cast(DoubleType) * col("np") >
          lit(1.5) * col("tot").cast(DoubleType))
        .select(col("l_partkey"), outDec(col("v")).as("value"))
        .orderBy(col("value").desc, col("l_partkey").asc)
    }),

    // ---- Q12 analog: shipping-priority classes by line status (the
    // fixture's stand-in for l_shipmode) — one fact-fact join, then
    // conditional counts in a single pass.
    "q_priority_class" -> ((s, d) =>
      lineitem(s, d)
        .filter(col("l_shipdate") >= ts("1996-01-01") &&
                col("l_shipdate") <  ts("1997-01-01"))
        .join(orders(s, d).select("o_orderkey", "o_orderpriority"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_linestatus")
        .agg(
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
            .otherwise(0L)).as("high_line_count"),
          sum(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
            .otherwise(0L)).as("low_line_count"))
        .orderBy("l_linestatus")),

    // ---- Q13 analog: customer order-count distribution — LEFT OUTER
    // join with an ON-clause filter on the right side (zero-order
    // customers must survive), then a two-level aggregation: per-customer
    // count, then the histogram of those counts.
    "q_cust_order_dist" -> ((s, d) =>
      customer(s, d).select("c_custkey")
        .join(orders(s, d).filter(col("o_orderpriority") =!= "5-LOW")
            .select("o_custkey", "o_orderkey"),
          col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy("c_count")
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)),

    // ---- Q16 analog: supplier count by part attributes. lineitem's
    // distinct (part,supp) pairs stand in for partsupp; "complaint"
    // suppliers (negative balance) leave via a broadcast ANTI join
    // (Q16's NOT IN); countDistinct per attribute group.
    "q_parts_supplier_count" -> ((s, d) =>
      lineitem(s, d).select("l_partkey", "l_suppkey").distinct()
        .join(broadcast(part(s, d)
            .filter(col("p_brand") =!= "Brand#3" && col("p_type") =!= "PROMO" &&
              col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35))
            .select("p_partkey", "p_brand", "p_type", "p_size")),
          col("l_partkey") === col("p_partkey"))
        .join(broadcast(supplier(s, d).filter(col("s_acctbal") < 0)
          .select("s_suppkey")),
          col("l_suppkey") === col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand").asc,
          col("p_type").asc, col("p_size").asc)),

    // ---- Q17 analog: small-quantity-order revenue. The correlated
    // per-part avg decorrelates into one (sum, count) agg over the SAME
    // brand-filtered line set, re-joined on partkey; `qty < 0.2·avg`
    // rearranges to `5·qty·n < sum` so the compare is exact decimal ×
    // integer — no division anywhere until the final /7.
    "q_small_qty_revenue" -> ((s, d) => {
      val pf = broadcast(part(s, d)
        .filter(col("p_brand") === "Brand#1" && col("p_type") === "ECONOMY")
        .select("p_partkey"))
      val li = lineitem(s, d).join(pf, col("l_partkey") === col("p_partkey"))
      val stats = li.groupBy(col("l_partkey").as("pk"))
        .agg(sum(dec(col("l_quantity"))).as("sumq"), count(lit(1)).as("nq"))
      li.join(stats, col("l_partkey") === col("pk"))
        .filter(lit(5).cast(Money) * dec(col("l_quantity")) * col("nq") <
          col("sumq"))
        .agg(r4(sum(dec(col("l_extendedprice"))).cast(DoubleType) / 7.0)
          .as("avg_yearly"))
    }),

    // ---- Q19 analog: disjunctive-bracket revenue. The OR references
    // both sides so it can't push down whole — but its part-side
    // implication (brand ∈ {1,2,3} ∧ size ≤ 20) prunes the broadcast
    // BEFORE the join, the classic Q19 rewrite.
    "q_disjunctive_revenue" -> ((s, d) =>
      lineitem(s, d)
        .join(broadcast(part(s, d)
            .filter(col("p_brand").isin("Brand#1", "Brand#2", "Brand#3") &&
              col("p_size").between(1, 20))
            .select("p_partkey", "p_brand", "p_size")),
          col("l_partkey") === col("p_partkey"))
        .filter(
          (col("p_brand") === "Brand#1" && col("p_size").between(1, 10) &&
            col("l_quantity").between(1, 11)) ||
          (col("p_brand") === "Brand#2" && col("p_size").between(1, 15) &&
            col("l_quantity").between(10, 20)) ||
          (col("p_brand") === "Brand#3" && col("p_size").between(1, 20) &&
            col("l_quantity").between(20, 30)))
        .agg(outDec(revenueSpark).as("revenue"))),

    // ---- Q20 analog: promotion-candidate suppliers — shipped more than
    // 1.1× the per-supplier average of 'red' parts in 1996 (Q20's
    // half-of-availqty threshold made scale-free). Same 1-row-broadcast
    // + multiply-not-divide discipline as Q11.
    "q_promo_suppliers" -> ((s, d) => {
      val red = broadcast(part(s, d).filter(col("p_name").like("red %"))
        .select("p_partkey"))
      val shipped = lineitem(s, d)
        .filter(col("l_shipdate") >= ts("1996-01-01") &&
                col("l_shipdate") <  ts("1997-01-01"))
        .join(red, col("l_partkey") === col("p_partkey"))
        .groupBy("l_suppkey")
        .agg(sum(dec(col("l_quantity"))).as("qty"))
      val norm = shipped.agg(sum(col("qty")).as("tot"), count(lit(1)).as("ns"))
      shipped.crossJoin(broadcast(norm))
        .filter(col("qty").cast(DoubleType) * col("ns") >
          lit(1.1) * col("tot").cast(DoubleType))
        .join(broadcast(supplier(s, d).select("s_suppkey", "s_name")),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), outDec(col("qty")).as("red_qty"))
        .orderBy("s_suppkey")
    }),

    // ---- Q21 analog: suppliers who kept orders waiting. The paired
    // EXISTS / NOT-EXISTS over other suppliers' lines decorrelates into
    // ONE per-order aggregate: distinct suppliers ns and distinct
    // RETURNED suppliers nrs — "another supplier exists" ⇔ ns≥2,
    // "no OTHER supplier returned" ⇔ nrs=1 (l1 itself is returned, so
    // the lone returned supplier must be l1's). One keyed agg + one semi
    // join replaces two correlated probes; zero fan-out.
    "q_waiting_suppliers" -> ((s, d) => {
      val stats = lineitem(s, d).groupBy(col("l_orderkey").as("ok"))
        .agg(countDistinct(col("l_suppkey")).as("ns"),
          countDistinct(when(col("l_returnflag") === "R", col("l_suppkey")))
            .as("nrs"))
        .filter(col("ns") >= 2 && col("nrs") === 1)
        .select("ok")
      lineitem(s, d).filter(col("l_returnflag") === "R")
        .join(orders(s, d).filter(col("o_orderstatus") === "F")
          .select("o_orderkey"), col("l_orderkey") === col("o_orderkey"))
        .join(stats, col("l_orderkey") === col("ok"), "left_semi")
        .join(broadcast(supplier(s, d).select("s_suppkey", "s_name")),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy("s_name")
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name").asc)
        .limit(10)
    })
  )

  val oracles: Map[String, String] = wave3Oracles ++ Map(
    "q_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
         CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
         CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))), 4) AS DOUBLE) AS sum_disc_price,
         CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST((1 - CAST(l_discount AS DECIMAL(6,4))) * (1 + CAST(l_tax AS DECIMAL(6,4))) AS DECIMAL(9,8))), 4) AS DOUBLE) AS sum_charge,
         CAST((2 * CAST((sum(CAST(l_quantity AS DECIMAL(18,4)))) * 10000 AS BIGINT) + (count(*))) // (2 * (count(*))) AS DOUBLE) / 10000.0 AS avg_qty,
         CAST((2 * CAST((sum(CAST(l_extendedprice AS DECIMAL(18,4)))) * 10000 AS BIGINT) + (count(*))) // (2 * (count(*))) AS DOUBLE) / 10000.0 AS avg_price,
         CAST((2 * CAST((sum(CAST(l_discount AS DECIMAL(18,4)))) * 10000 AS BIGINT) + (count(*))) // (2 * (count(*))) AS DOUBLE) / 10000.0 AS avg_disc,
         count(*) AS count_order
         FROM lineitem
         WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
         GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""",
    "q_shipping_priority" ->
      s"""SELECT l_orderkey, o_orderdate, o_orderpriority,
         CAST(round($revenueDuck, 4) AS DOUBLE) AS revenue
         FROM customer, orders, lineitem
         WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
           AND l_orderkey = o_orderkey
           AND o_orderdate < TIMESTAMP '1996-06-15 00:00:00'
           AND l_shipdate  > TIMESTAMP '1996-06-15 00:00:00'
         GROUP BY l_orderkey, o_orderdate, o_orderpriority
         ORDER BY revenue DESC NULLS LAST, o_orderdate NULLS FIRST, l_orderkey NULLS FIRST
         LIMIT 10""",
    "q_local_supplier_volume" ->
      s"""SELECT n_name, CAST(round($revenueDuck, 4) AS DOUBLE) AS revenue
         FROM customer, orders, lineitem, supplier, nation, region
         WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
           AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
           AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
           AND r_name = 'ASIA'
           AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
           AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
         GROUP BY n_name
         ORDER BY revenue DESC NULLS LAST, n_name NULLS FIRST""",
    "q_top_supplier" ->
      s"""WITH revenue AS (
           SELECT l_suppkey, CAST(round($revenueDuck, 4) AS DOUBLE) AS total_revenue
           FROM lineitem
           WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
             AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
           GROUP BY l_suppkey)
         SELECT s_suppkey, s_name, total_revenue
         FROM supplier, revenue
         WHERE s_suppkey = l_suppkey
           AND total_revenue = (SELECT max(total_revenue) FROM revenue)
         ORDER BY s_suppkey NULLS FIRST""",
    "q_order_priority" ->
      """SELECT o_orderpriority, count(*) AS order_count
         FROM orders o
         WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
           AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
           AND EXISTS (SELECT 1 FROM lineitem l
                       WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
         GROUP BY o_orderpriority
         ORDER BY o_orderpriority NULLS FIRST""",
    "q_volume_shipping" ->
      s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(year(l_shipdate) AS BIGINT) AS l_year,
         CAST(round($revenueDuck, 4) AS DOUBLE) AS revenue
         FROM supplier, lineitem, orders, customer, nation n1, nation n2
         WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
           AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
           AND c_nationkey = n2.n_nationkey
           AND ((n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_7')
             OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_2'))
           AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
           AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
         GROUP BY 1, 2, 3
         ORDER BY supp_nation NULLS FIRST, cust_nation NULLS FIRST, l_year NULLS FIRST""",
    "q_promo_revenue" ->
      """SELECT
         round(100.0 * CAST(sum(CASE WHEN p_type = 'PROMO'
             THEN CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))
             ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
           / CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE), 4)
           AS promo_share_pct,
         CAST(round(sum(CASE WHEN p_type = 'PROMO'
             THEN CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))
             ELSE CAST(0 AS DECIMAL(18,4)) END), 4) AS DOUBLE) AS promo_revenue
         FROM lineitem, part
         WHERE l_partkey = p_partkey
           AND l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
           AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'""",
    "q_cust_no_recent" ->
      """SELECT c_mktsegment, count(*) AS numcust,
         CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS totacctbal
         FROM customer c
         WHERE c_acctbal > 0
           AND NOT EXISTS (SELECT 1 FROM orders o
                           WHERE o.o_custkey = c.c_custkey
                             AND o.o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
         GROUP BY c_mktsegment
         ORDER BY c_mktsegment NULLS FIRST""",
    "q_large_orders" ->
      """SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
         CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS total_qty
         FROM customer, orders, lineitem
         WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                              GROUP BY l_orderkey
                              HAVING sum(CAST(l_quantity AS DECIMAL(18,4))) > 280)
           AND c_custkey = o_custkey AND o_orderkey = l_orderkey
         GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
         ORDER BY o_totalprice DESC NULLS LAST, o_orderkey NULLS FIRST
         LIMIT 20""",
    "q_min_cost_supplier" ->
      """WITH v AS (
           SELECT l_partkey, l_extendedprice, l_suppkey FROM lineitem
           WHERE l_extendedprice IS NOT NULL AND l_suppkey IS NOT NULL),
         m AS (
           SELECT l_partkey, min(l_extendedprice) AS mp FROM v
           GROUP BY l_partkey),
         pick AS (
           SELECT l.l_partkey, m.mp AS min_price, min(l.l_suppkey) AS suppkey
           FROM v l JOIN m
             ON l.l_partkey = m.l_partkey AND l.l_extendedprice = m.mp
           GROUP BY l.l_partkey, m.mp)
         SELECT p_partkey, p_name, s_name, min_price
         FROM pick
         JOIN part ON l_partkey = p_partkey
         JOIN supplier ON suppkey = s_suppkey
         ORDER BY p_partkey NULLS FIRST""",
    "q_returned_items" ->
      s"""SELECT c_custkey, c_name, CAST(round($revenueDuck, 4) AS DOUBLE) AS revenue,
         c_acctbal, n_name
         FROM customer, orders, lineitem, nation
         WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
           AND c_nationkey = n_nationkey AND l_returnflag = 'R'
           AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
           AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
         GROUP BY c_custkey, c_name, c_acctbal, n_name
         ORDER BY revenue DESC NULLS LAST, c_custkey NULLS FIRST
         LIMIT 20"""
  )

  private def wave3Oracles: Map[String, String] = Map(
    "q_forecast_revenue" ->
      """SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))
           * CAST(l_discount AS DECIMAL(18,4))), 4) AS DOUBLE) AS revenue
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
           AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
           AND l_discount >= 0.05 AND l_discount <= 0.07
           AND l_quantity < 24""",
    "q_market_share" ->
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
         round(CAST(sum(CASE WHEN n2.n_name = 'NATION_2'
             THEN CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))
             ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
           / CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE), 4)
           AS mkt_share
         FROM part, lineitem, orders, customer, supplier, nation n1, region, nation n2
         WHERE p_partkey = l_partkey AND l_orderkey = o_orderkey
           AND o_custkey = c_custkey AND c_nationkey = n1.n_nationkey
           AND n1.n_regionkey = r_regionkey AND r_name = 'ASIA'
           AND l_suppkey = s_suppkey AND s_nationkey = n2.n_nationkey
           AND p_type = 'PROMO'
           AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
           AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
         GROUP BY 1 ORDER BY 1 NULLS FIRST""",
    "q_product_profit" ->
      """SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
         CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))
           - CAST(p_retailprice AS DECIMAL(18,4)) * CAST(l_quantity AS DECIMAL(18,4))), 4) AS DOUBLE)
           AS sum_profit
         FROM lineitem, part, supplier, nation, orders
         WHERE l_partkey = p_partkey AND l_suppkey = s_suppkey
           AND s_nationkey = n_nationkey AND l_orderkey = o_orderkey
           AND p_name LIKE 'red %'
         GROUP BY 1, 2 ORDER BY nation NULLS FIRST, o_year DESC NULLS LAST""",
    "q_important_parts" ->
      """WITH v AS (
           SELECT l_partkey, sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS v
           FROM lineitem GROUP BY 1),
         t AS (SELECT sum(v) AS tot, count(*) AS np FROM v)
         SELECT l_partkey, CAST(round(v, 4) AS DOUBLE) AS value
         FROM v, t
         WHERE CAST(v AS DOUBLE) * np > 1.5 * CAST(tot AS DOUBLE)
         ORDER BY value DESC NULLS LAST, l_partkey NULLS FIRST""",
    "q_priority_class" ->
      """SELECT l_linestatus,
         CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
         CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
           AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
         GROUP BY l_linestatus ORDER BY l_linestatus NULLS FIRST""",
    "q_cust_order_dist" ->
      """SELECT c_count, count(*) AS custdist
         FROM (SELECT c_custkey, count(o_orderkey) AS c_count
               FROM customer LEFT JOIN orders
                 ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
               GROUP BY c_custkey)
         GROUP BY c_count
         ORDER BY custdist DESC NULLS LAST, c_count DESC NULLS LAST""",
    "q_parts_supplier_count" ->
      """SELECT p_brand, p_type, p_size,
         count(DISTINCT l_suppkey) AS supplier_cnt
         FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
         JOIN part ON l_partkey = p_partkey
         WHERE p_brand <> 'Brand#3' AND p_type <> 'PROMO'
           AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
           AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
         GROUP BY 1, 2, 3
         ORDER BY supplier_cnt DESC NULLS LAST, p_brand NULLS FIRST, p_type NULLS FIRST, p_size NULLS FIRST""",
    "q_small_qty_revenue" ->
      """WITH pf AS (
           SELECT p_partkey FROM part
           WHERE p_brand = 'Brand#1' AND p_type = 'ECONOMY'),
         li AS (SELECT l.* FROM lineitem l JOIN pf ON l_partkey = p_partkey),
         st AS (
           SELECT l_partkey AS pk, sum(CAST(l_quantity AS DECIMAL(18,4))) AS sumq,
             count(*) AS nq
           FROM li GROUP BY 1)
         SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / 7.0, 4)
           AS avg_yearly
         FROM li JOIN st ON l_partkey = pk
         WHERE 5 * CAST(l_quantity AS DECIMAL(18,4)) * nq < sumq""",
    "q_disjunctive_revenue" ->
      s"""SELECT CAST(round($revenueDuck, 4) AS DOUBLE) AS revenue
         FROM lineitem JOIN part ON l_partkey = p_partkey
         WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 1 AND 11)
            OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 10 AND 20)
            OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 20 AND l_quantity BETWEEN 20 AND 30)""",
    "q_promo_suppliers" ->
      """WITH red AS (SELECT p_partkey FROM part WHERE p_name LIKE 'red %'),
         sh AS (
           SELECT l_suppkey, sum(CAST(l_quantity AS DECIMAL(18,4))) AS qty
           FROM lineitem JOIN red ON l_partkey = p_partkey
           WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
             AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
           GROUP BY 1),
         n AS (SELECT sum(qty) AS tot, count(*) AS ns FROM sh)
         SELECT s_suppkey, s_name, CAST(round(qty, 4) AS DOUBLE) AS red_qty
         FROM sh, n, supplier
         WHERE l_suppkey = s_suppkey
           AND CAST(qty AS DOUBLE) * ns > 1.1 * CAST(tot AS DOUBLE)
         ORDER BY s_suppkey NULLS FIRST""",
    "q_waiting_suppliers" ->
      """SELECT s_name, count(*) AS numwait
         FROM supplier, lineitem l1, orders
         WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
           AND o_orderstatus = 'F' AND l1.l_returnflag = 'R'
           AND EXISTS (SELECT 1 FROM lineitem l2
                       WHERE l2.l_orderkey = l1.l_orderkey
                         AND l2.l_suppkey <> l1.l_suppkey)
           AND NOT EXISTS (SELECT 1 FROM lineitem l3
                           WHERE l3.l_orderkey = l1.l_orderkey
                             AND l3.l_suppkey <> l1.l_suppkey
                             AND l3.l_returnflag = 'R')
         GROUP BY s_name
         ORDER BY numwait DESC NULLS LAST, s_name NULLS FIRST
         LIMIT 10"""
  )
}
