package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType
import graft.Tables._

/** §2.3 joins + subqueries (SURVEY.md). All joins are declared logically and
  * physically planned by Catalyst's JoinSelection; `join_broadcast` pins the
  * broadcast-hash strategy explicitly — at 100 TB the dimension tables
  * (region/nation/supplier, and customer after filters) are exactly the
  * sides you broadcast to avoid shuffling the fact table.
  */
object Joins {

  /** As-of join (SURVEY.md §2.3 `join_asof`, §4.3): each `click` event is
    * enriched with the latest `purchase` event of the same user at/before
    * its timestamp. Spark has no native ASOF; the scale formulation is NOT
    * a range join (clicks ⋈ all-prior-purchases fans out
    * |clicks_u|×|purchases_u| per user — one hot user makes a key
    * quadratic at 100 TB) but a MERGE over one per-user event stream:
    * union both event kinds, order by (ts, kind), and forward-fill the
    * purchase timestamp with last(..., ignoreNulls) over
    * rows-unbounded-preceding — the win_fill_forward machinery. One
    * shuffle on user_id, one sort, ZERO fan-out: each input row is
    * touched exactly once regardless of per-user history length.
    *
    * Tie discipline: at equal ts a purchase sorts BEFORE the click
    * (kind 0 < 1), so the `p_ts <= ts` boundary is inclusive — matching
    * DuckDB ASOF's `>=` bound. Only p_ts is emitted, so order among
    * equal-ts purchases (same p_ts value) cannot affect the result.
    */
  def asof(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"),
        when(col("event_type") === "purchase", col("ts")).as("p_ts"))
    val kind = when(col("event_type") === "purchase", 0).otherwise(1)
    val w = Window.partitionBy("user_id").orderBy(col("ts"), kind)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // NULL user_id never matches under join semantics (DuckDB ASOF
    // equality), but Spark's window groups the NULL keys into ONE
    // partition and would happily fill across them — mask it out
    ev.withColumn("last_purchase_ts",
        when(col("user_id").isNotNull,
          last(col("p_ts"), ignoreNulls = true).over(w)))
      .filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"), col("last_purchase_ts"))
      .orderBy("event_id")
  }

  /** Forward as-of: earliest `purchase` at/after each click — the "time to
    * next conversion" shape. [[asof]] mirrored: same single per-user
    * stream, `first(..., ignoreNulls)` over rows
    * current-row-to-unbounded-following, with the tie order flipped (a
    * click sorts BEFORE an equal-ts purchase, so `p_ts >= ts` stays
    * inclusive). Same zero-fan-out plan: one shuffle, one sort.
    */
  def asofForward(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"),
        when(col("event_type") === "purchase", col("ts")).as("p_ts"))
    val kind = when(col("event_type") === "purchase", 1).otherwise(0)
    val w = Window.partitionBy("user_id").orderBy(col("ts"), kind)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    // mask NULL user_id (window groups NULL keys; join semantics don't)
    // AND NULL ts: a NULL-ts click sorts NULLS-FIRST and its forward frame
    // would otherwise see every purchase — DuckDB ASOF yields no match
    ev.withColumn("next_purchase_ts",
        when(col("user_id").isNotNull && col("ts").isNotNull,
          first(col("p_ts"), ignoreNulls = true).over(w)))
      .filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"), col("next_purchase_ts"))
      .orderBy("event_id")
  }

  /** Nearest-neighbor as-of: the purchase closest IN EITHER DIRECTION to
    * each click (backward ties win — the pandas merge_asof
    * direction='nearest' contract). Both directional fills run over ONE
    * window ordering (purchase sorts before an equal-ts click, so the
    * backward frame is inclusive and an equal-ts purchase scores
    * distance 0 through it; the forward frame starting AT the click
    * correctly sees only later purchases): Catalyst plans a single
    * exchange + sort for both window functions — same zero-fan-out
    * posture as [[asof]], one shuffle regardless of history length. The
    * distance compare is exact µs integers. Oracle is an INDEPENDENT
    * formulation (per-user join + arg_min with the tie encoded into the
    * scalar key), so the merge re-plan is differentially checked against
    * the naive semantics, not against itself.
    */
  def asofNearest(s: SparkSession, d: String): DataFrame = {
    // kind is MATERIALIZED (not an inline ordering expression) so both
    // window specs order by the same attributes and Catalyst drops the
    // second local sort — one exchange, ONE sort for both fills
    val ev = events(s, d)
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"),
        when(col("event_type") === "purchase", col("ts")).as("p_ts"),
        when(col("event_type") === "purchase", 0).otherwise(1).as("kind"))
    val ord = Window.partitionBy("user_id")
      .orderBy(col("ts"), col("kind"), col("event_id"))
    val back = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = ord.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    ev.withColumn("b", last(col("p_ts"), ignoreNulls = true).over(back))
      .withColumn("f", first(col("p_ts"), ignoreNulls = true).over(fwd))
      .filter(col("event_type") === "click")
      .withColumn("db", unix_micros(col("ts")) - unix_micros(col("b")))
      .withColumn("df", unix_micros(col("f")) - unix_micros(col("ts")))
      .withColumn("nearest_purchase_ts",
        // joinable guard first: NULL user_id or NULL ts matches nothing
        // under the oracle's join semantics (window fills would leak)
        when(col("user_id").isNull || col("ts").isNull, lit(null))
          .when(col("b").isNull, col("f"))
          .when(col("f").isNull, col("b"))
          .when(col("db") <= col("df"), col("b"))
          .otherwise(col("f")))
      .withColumn("dist_us",
        when(col("user_id").isNull || col("ts").isNull, lit(null))
          .otherwise(least(col("db"), col("df"))))
      .select(col("event_id"), col("user_id"), col("ts"),
        col("nearest_purchase_ts"), col("dist_us"))
      .orderBy("event_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "join_asof_forward" -> (asofForward _),
    "join_asof_nearest" -> (asofNearest _),
    "join_inner" -> ((s, d) =>
      orders(s, d).join(customer(s, d), col("o_custkey") === col("c_custkey"), "inner")
        .select("o_orderkey", "c_custkey", "c_name", "o_totalprice")
        .orderBy("o_orderkey")),
    "join_multikey" -> ((s, d) => {
      val li = lineitem(s, d)
      val dim = li.groupBy(col("l_partkey").as("d_partkey"), col("l_suppkey").as("d_suppkey"))
        .agg(min(col("l_extendedprice")).as("min_price"))
      li.join(dim,
          col("l_partkey") === col("d_partkey") && col("l_suppkey") === col("d_suppkey"))
        .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey", "min_price")
        // (l_orderkey, l_linenumber, l_partkey, l_suppkey) is the minimal
        // unique lineitem key in the fixture
        .orderBy("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
    }),
    "join_left" -> ((s, d) =>
      customer(s, d).join(orders(s, d), col("c_custkey") === col("o_custkey"), "left")
        .select("c_custkey", "o_orderkey")
        .orderBy(col("c_custkey"), col("o_orderkey").asc_nulls_first)),
    "join_right" -> ((s, d) =>
      orders(s, d).join(customer(s, d), col("o_custkey") === col("c_custkey"), "right")
        .select("c_custkey", "o_orderkey")
        .orderBy(col("c_custkey"), col("o_orderkey").asc_nulls_first)),
    "join_full" -> ((s, d) => {
      val big = orders(s, d).groupBy("o_custkey").agg(count(lit(1)).as("n_orders"))
        .filter(col("n_orders") >= 12)
      val rich = customer(s, d).filter(col("c_acctbal") > 8000)
        .select("c_custkey", "c_acctbal")
      big.join(rich, col("o_custkey") === col("c_custkey"), "full")
        .select("o_custkey", "n_orders", "c_custkey", "c_acctbal")
        .orderBy(col("o_custkey").asc_nulls_first, col("c_custkey").asc_nulls_first)
    }),
    "join_semi" -> ((s, d) =>
      customer(s, d).join(
          orders(s, d).filter(col("o_orderstatus") === "F"),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name").orderBy("c_custkey")),
    "join_anti" -> ((s, d) =>
      customer(s, d).join(
          orders(s, d).filter(col("o_orderstatus") === "F"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name").orderBy("c_custkey")),
    "join_cross" -> ((s, d) =>
      region(s, d).crossJoin(nation(s, d))
        .select("r_regionkey", "r_name", "n_nationkey", "n_name")
        .orderBy("r_regionkey", "n_nationkey")),
    "join_theta" -> ((s, d) =>
      // acctbal band join: both bounds must be ACTIVE on fixture domains —
      // the earlier part-price form had p ≈ 850-950 against s+2000 ≥ 1000,
      // so the upper bound was vacuously true for every pair and a <= vs <
      // boundary bug was structurally undetectable (mutation audit).
      // Customer and supplier balances share the same [-1000, 10000]
      // domain, so a 500-wide band filters on both edges at every sf.
      customer(s, d).join(supplier(s, d),
          col("s_acctbal") < col("c_acctbal") &&
          col("c_acctbal") <= col("s_acctbal") + 500)
        .select("c_custkey", "s_suppkey", "c_acctbal", "s_acctbal")
        .orderBy("c_custkey", "s_suppkey")),
    "join_broadcast" -> ((s, d) =>
      customer(s, d).join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .select("c_custkey", "n_name").orderBy("c_custkey")),
    "join_star" -> ((s, d) => {
      // TPC-H Q5-shaped star join — the headline multi-dimension
      // analytics plan: fact (lineitem) × fact (orders) × three
      // dimensions + region filter, revenue per nation. Scale shape:
      // lineitem⋈orders is the one genuine fact-fact shuffle (on the
      // join key; bucketed co-location — join_bucketed — removes even
      // that); customer/nation/region are broadcast-joined so the fact
      // stream is never re-shuffled for a dimension, and the final
      // aggregate exchanges only (n_name) partials. Supplier closes the
      // Q5 cycle (s_nationkey = c_nationkey) map-side off a broadcast.
      val disc1 = lit(1).cast(Money) - dec(col("l_discount"))
      lineitem(s, d)
        .join(orders(s, d)
            .filter(col("o_orderdate") >= lit("1996-01-01").cast(TimestampType) &&
              col("o_orderdate") < lit("1998-01-01").cast(TimestampType)),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(customer(s, d)), col("o_custkey") === col("c_custkey"))
        .join(broadcast(supplier(s, d)),
          col("l_suppkey") === col("s_suppkey") &&
          col("s_nationkey") === col("c_nationkey"))
        .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(region(s, d).filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy("n_name")
        .agg(outDec(sum(dec(col("l_extendedprice")) * disc1)).as("revenue"),
          count(lit(1)).as("n_lineitems"))
        .orderBy("n_name")
    }),
    "join_temporal_snapshot" -> ((s, d) => {
      // Point-in-time (temporal snapshot) join — the consumer side of
      // scd2_history: probe each fact timestamp against the dimension
      // version valid at that instant. Probes are the same orders
      // shifted 30 days back, so they hit HISTORICAL versions, not just
      // the open one. Versions per key are non-overlapping half-open
      // ranges [valid_from, valid_to), so the key-EQUI join fans out to
      // at most versions-per-key rows (tens, bounded by entity change
      // rate — never |facts|×|history|) before the range predicate keeps
      // exactly one — THE standard warehouse temporal-join plan; no
      // theta join, no per-row window over history.
      val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
      val dim = orders(s, d).filter(col("o_custkey") < 50)
        .select(col("o_custkey").as("d_custkey"),
          col("o_orderkey").as("version_key"),
          col("o_totalprice").as("version_price"),
          col("o_orderdate").as("valid_from"),
          lead(col("o_orderdate"), 1).over(w).as("valid_to"))
      val probe = orders(s, d).filter(col("o_custkey") < 50)
        .select(col("o_orderkey").as("fact_key"), col("o_custkey"),
          (col("o_orderdate") - expr("INTERVAL 30 DAY")).as("snap_ts"))
      probe.join(dim,
          probe("o_custkey") === dim("d_custkey") &&
          probe("snap_ts") >= dim("valid_from") &&
          (dim("valid_to").isNull || probe("snap_ts") < dim("valid_to")),
          "left")
        .select(col("fact_key"), col("snap_ts"),
          col("version_key"), col("version_price"))
        .orderBy("fact_key")
    }),
    "join_asof" -> (asof _),
    "join_fuzzy" -> ((s, d) => {
      // entity resolution by BLOCKED edit distance — the dirty-name-to-
      // reference-dictionary match every ingestion pipeline runs. A dirty
      // variant of each distinct part name is synthesized deterministically
      // (drop the (h60(name) % len)+1-th char — the same
      // synthesize-from-fixture precedent as dedup_url), then matched
      // back: block on the first 2 chars (an EQUI join — never a cross
      // join), verify levenshtein ≤ 2 map-side, keep the best match (min
      // distance, then name) per dirty string. 100 TB posture: matching
      // runs on the DISTINCT NAME DICTIONARY, not the row stream — a
      // dictionary is orders of magnitude smaller than the table (here
      // ~10² names vs 10⁵ rows), so Σ|block|² stays tiny and the resolved
      // mapping then broadcast-joins back onto rows for free. A deletion
      // in the first 2 chars escapes its block (bounded, deterministic
      // recall loss both engines share) — the standard
      // blocking-recall trade; multi-pass blocking (first-2 + last-2)
      // would close it at scale.
      // non-empty names only: the deterministic dirty-variant derivation
      // takes h60 % length(name), which is an ANSI divide-by-zero on ""
      // (and a NULL name has no block anyway) — mirrored in the oracle
      val names = part(s, d).select(col("p_name").as("name"))
        .filter(length(col("name")) > 0).distinct()
      val drop = s"CAST(${h60Spark("name")} % length(name) AS INT)" // 0-based
      val dirty = names
        .select(expr(s"concat(substring(name, 1, $drop), " +
          s"substring(name, $drop + 2))").as("dirty"))
        .distinct()
      // byte-mode distance (round 12): edit distance over UTF-8 bytes —
      // DuckDB's levenshtein semantics — so the match set is engine-equal
      // on EVERY input, multibyte included (the code-point built-in
      // diverged on the unicode edge variant; for ASCII dictionaries the
      // two are identical). The UDF runs on Σ|block|² dictionary pairs,
      // not the row stream, so losing codegen costs nothing measurable.
      val levBy = udf((a: String, b: String) =>
        if (a == null || b == null) null
        else Integer.valueOf(graft.functions.Custom.levenshteinBytes(a, b)))
      val cand = dirty.withColumn("blk", substring(col("dirty"), 1, 2))
        .join(names.withColumn("blk", substring(col("name"), 1, 2)), "blk")
        .withColumn("lev", levBy(col("dirty"), col("name")))
        .filter(col("lev") <= 2)
      val w = Window.partitionBy("dirty").orderBy(col("lev"), col("name"))
      cand.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("dirty"), col("name").as("matched"),
          col("lev").cast("bigint").as("distance"))
        .orderBy("dirty")
    }),
    "join_range_bucket" -> ((s, d) => {
      // non-equi time-range join done the scale way: a naive date-in-range
      // theta join plans as a nested-loop cross product (fine when one side
      // is tiny, quadratic at big×big). Bucketing the time axis turns it
      // into an EQUI join: each 7-day range overlaps ≤2 week buckets
      // (exploded — bounded ×2 duplication), each probe row maps to exactly
      // ONE bucket, the join shuffles on the bucket key, and the true
      // containment predicate verifies inside matched buckets. This is the
      // range-join optimization commercial engines apply automatically,
      // hand-lowered onto Catalyst; the oracle is the PLAIN theta join, so
      // result equality proves the bucketing loses nothing.
      val wk = 7L * 86400L * 1000000L
      val r = orders(s, d).filter(col("o_orderkey") % 1000 === 0)
        .select(col("o_orderkey").as("range_id"),
          unix_micros(col("o_orderdate")).as("s_us"))
        .withColumn("bucket",
          explode(expr(s"sequence(s_us div $wk, (s_us + $wk - 1) div $wk)")))
      val li = lineitem(s, d)
        .select(col("l_quantity"), unix_micros(col("l_shipdate")).as("ship_us"))
        .withColumn("bucket", expr(s"ship_us div $wk"))
      li.join(r, Seq("bucket"))
        .filter(col("ship_us") >= col("s_us") && col("ship_us") < col("s_us") + lit(wk))
        .groupBy("range_id")
        .agg(count(lit(1)).as("n_lines"),
          outDec(sum(dec(col("l_quantity")))).as("sum_qty"))
        .orderBy("range_id")
    }),

    "join_asof_tolerance" -> ((s, d) => {
      // as-of with a MAX-GAP tolerance — the production variant of
      // join_asof ("latest purchase at/before the click, but only if
      // within 24 h"): stale matches are no better than no match for
      // attribution. The tolerance tightens the range join's lower bound,
      // which SHRINKS the candidate set (at scale it is what makes the
      // time-bucketed formulation bounded: candidates live in ≤2 24 h
      // buckets instead of all history). Only max(p_ts) is emitted, so
      // the aggregate formulation replaces the per-row top-1 window —
      // one keyed aggregate, tie-free by construction.
      val ev = events(s, d).select("event_id", "user_id", "ts", "event_type")
      // aggregate DISTINCT click keys, then re-expand by the duplicate
      // count: a groupBy alone would silently collapse duplicate-pk click
      // rows where the oracle's correlated subquery is per-row (dupkeys
      // edge fixture) — the join itself still fans only distinct keys
      val clicks = ev.filter(col("event_type") === "click")
        .groupBy("event_id", "user_id", "ts").agg(count(lit(1)).as("nc"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"), col("ts").as("p_ts"))
      clicks.join(purchases,
          col("user_id") === col("p_user") && col("p_ts") <= col("ts") &&
          col("p_ts") >= col("ts") - expr("INTERVAL 24 HOURS"), "left")
        .groupBy("event_id", "user_id", "ts", "nc")
        .agg(max(col("p_ts")).as("last_purchase_ts"))
        .withColumn("__rep", explode(expr("sequence(1, nc)")))
        .select("event_id", "user_id", "ts", "last_purchase_ts")
        .orderBy("event_id")
    }),

    "join_interval_overlap" -> ((s, d) => {
      // interval×interval OVERLAP join (a.s < b.e AND b.s < a.e) — the
      // sibling of join_range_bucket's point-in-interval: both sides are
      // ranges (order validity windows × shipment windows). Same
      // bucketed-equi-join lowering: each interval explodes to the week
      // buckets it touches (7-day and 3-day intervals → ≤2 each, bounded
      // duplication), the join shuffles on the bucket key, the exact
      // overlap predicate verifies inside the bucket — and the pair is
      // emitted ONLY in the canonical bucket containing the overlap start
      // (bucket == greatest(a.s, b.s) div W), so a pair matching in two
      // buckets surfaces exactly once WITHOUT a distinct: dedup by
      // construction, no second shuffle. Oracle = the naive theta join,
      // proving the decomposition exact.
      val wk = 7L * 86400L * 1000000L
      val aDur = 7L * 86400L * 1000000L
      val bDur = 3L * 86400L * 1000000L
      val a = orders(s, d).filter(col("o_orderkey") % 200 === 0)
        .select(col("o_orderkey").as("a_id"),
          unix_micros(col("o_orderdate")).as("a_s"))
        .withColumn("a_e", col("a_s") + lit(aDur))
        .withColumn("bucket",
          explode(expr(s"sequence(a_s div $wk, (a_e - 1) div $wk)")))
      val b = lineitem(s, d).filter(col("l_orderkey") % 100 === 0 &&
          col("l_linenumber") === 1)
        .select(col("l_orderkey").as("b_id"),
          unix_micros(col("l_shipdate")).as("b_s"))
        .withColumn("b_e", col("b_s") + lit(bDur))
        .withColumn("bucket",
          explode(expr(s"sequence(b_s div $wk, (b_e - 1) div $wk)")))
      a.join(b, Seq("bucket"))
        .filter(col("a_s") < col("b_e") && col("b_s") < col("a_e") &&
          col("bucket") === expr(s"greatest(a_s, b_s) div $wk"))
        .select(col("a_id"), col("b_id"),
          (least(col("a_e"), col("b_e")) -
            greatest(col("a_s"), col("b_s"))).as("overlap_us"))
        // (l_orderkey, l_linenumber) is NOT unique in the fixture, so a
        // b_id can carry two ship windows: overlap_us completes the order
        .orderBy("a_id", "b_id", "overlap_us")
    }),

    "join_spatial_grid" -> ((s, d) => {
      // 2-D ε-distance self-join via grid-cell blocking — the spatial
      // sibling of join_range_bucket: a naive distance predicate plans as
      // an O(n²) nested loop; snapping points to ε-sized cells and
      // replicating ONE side to its 3×3 cell neighborhood (bounded ×9)
      // turns candidate generation into an EQUI join on the cell key —
      // any pair within ε differs by ≤1 in each cell coordinate, so no
      // true pair escapes the blocking. The exact distance predicate then
      // verifies inside matched cells. Oracle is the plain theta join, so
      // result equality proves the grid loses nothing. Points are derived
      // deterministically from customer columns; identical IEEE double
      // distance math on both sides keeps the ε boundary bit-agreed.
      val eps = 50.0
      val pts = customer(s, d).select(
        col("c_custkey").as("id"),
        col("c_acctbal").cast("double").as("x"),
        ((col("c_custkey") * 7919) % 10000).cast("double").as("y"))
      def cx(c: org.apache.spark.sql.Column) = floor(c / eps).cast("long")
      val left = pts
        .withColumn("cellx", cx(col("x"))).withColumn("celly", cx(col("y")))
        .select(col("id").as("id_a"), col("x").as("xa"), col("y").as("ya"),
          col("cellx"), col("celly"))
      val right = pts
        .withColumn("cellx", explode(array(cx(col("x")) - 1, cx(col("x")), cx(col("x")) + 1)))
        .withColumn("celly", explode(array(cx(col("y")) - 1, cx(col("y")), cx(col("y")) + 1)))
        .select(col("id").as("id_b"), col("x").as("xb"), col("y").as("yb"),
          col("cellx"), col("celly"))
      val d2 = (col("xa") - col("xb")) * (col("xa") - col("xb")) +
        (col("ya") - col("yb")) * (col("ya") - col("yb"))
      left.join(right, Seq("cellx", "celly"))
        .filter(col("id_a") < col("id_b") && d2 <= eps * eps)
        .select(col("id_a"), col("id_b"), r4(sqrt(d2)).as("dist"))
        .orderBy("id_a", "id_b")
    }),

    "merge_upsert" -> ((s, d) => {
      // CDC upsert (MERGE INTO semantics, storage-format-free): changes =
      // deterministic derivation from the fixture (updates: +10% price on
      // key%10=0; inserts: key%17=0 re-keyed past the id space), applied
      // via full-outer join + coalesce — change side wins. At scale this
      // is a sort-merge on the key with AQE; table formats (Delta/Iceberg)
      // layer file-level pruning on the same logical plan.
      val base = orders(s, d)
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
      val updates = base.filter(col("o_orderkey") % 10 === 0)
        .withColumn("o_totalprice", r4(col("o_totalprice") * 1.1))
      val inserts = base.filter(col("o_orderkey") % 17 === 0)
        .withColumn("o_orderkey", col("o_orderkey") + lit(100000000L))
      val changes = updates.unionByName(inserts)
        .select(col("o_orderkey").as("c_key"), col("o_custkey").as("c_cust"),
          col("o_orderstatus").as("c_status"), col("o_totalprice").as("c_price"))
      base.join(changes, col("o_orderkey") === col("c_key"), "full_outer")
        .select(
          coalesce(col("o_orderkey"), col("c_key")).as("o_orderkey"),
          coalesce(col("c_cust"), col("o_custkey")).as("o_custkey"),
          coalesce(col("c_status"), col("o_orderstatus")).as("o_orderstatus"),
          coalesce(col("c_price"), col("o_totalprice")).as("o_totalprice"))
        .orderBy("o_orderkey")
    }),
    "subq_in" -> ((s, d) => {
      orders(s, d).createOrReplaceTempView("orders")
      customer(s, d).createOrReplaceTempView("customer")
      s.sql("""SELECT o_orderkey, o_custkey FROM orders
               WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 9000)
               ORDER BY o_orderkey NULLS FIRST""")
    }),
    "subq_scalar" -> ((s, d) => {
      lineitem(s, d).createOrReplaceTempView("lineitem")
      // l_quantity is integral: the double avg is exact in both engines
      s.sql("""SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
               WHERE l_quantity > 1.8 * (SELECT avg(l_quantity) FROM lineitem)
               ORDER BY l_orderkey NULLS FIRST, l_linenumber NULLS FIRST, l_quantity NULLS FIRST""")
    }),
    "subq_exists" -> ((s, d) => {
      // correlated EXISTS — decorrelated by Catalyst into a left-semi join
      orders(s, d).createOrReplaceTempView("orders")
      customer(s, d).createOrReplaceTempView("customer")
      s.sql("""SELECT c_custkey, c_name FROM customer c
               WHERE EXISTS (SELECT 1 FROM orders o
                             WHERE o.o_custkey = c.c_custkey
                               AND o.o_totalprice > 400000)
               ORDER BY c_custkey NULLS FIRST""")
    }),
    "cte_recursive" -> ((s, d) => {
      // WITH RECURSIVE (Spark 4 finally ships it): generate a 60-day
      // calendar spine, LEFT JOIN the fact so empty days survive as 0 —
      // the gap-free time-dimension pattern. The recursion materializes
      // 60 rows on the driver side of the plan (broadcast-size by
      // construction); the fact side stays a single scan + hash agg.
      orders(s, d).createOrReplaceTempView("orders")
      s.sql("""WITH RECURSIVE days(d) AS (
                 SELECT TIMESTAMP '1995-01-01 00:00:00'
                 UNION ALL
                 SELECT d + INTERVAL 1 DAY FROM days
                 WHERE d < TIMESTAMP '1995-03-01 00:00:00')
               SELECT d, count(o_orderkey) AS n_orders
               FROM days LEFT JOIN orders ON date_trunc('DAY', o_orderdate) = d
               GROUP BY d ORDER BY d NULLS FIRST""")
    }),
    "join_lateral" -> ((s, d) => {
      // correlated LATERAL with ORDER BY + LIMIT — top-2 orders per
      // customer as the SQL-surface twin of win_topk_group. Catalyst
      // decorrelates to a partitioned rank filter, so the plan is one
      // shuffle on the correlation key, never a per-row re-execution.
      orders(s, d).createOrReplaceTempView("orders")
      customer(s, d).createOrReplaceTempView("customer")
      s.sql("""SELECT c_custkey, o_orderkey, o_totalprice
               FROM customer c,
               LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
                        WHERE o.o_custkey = c.c_custkey
                        ORDER BY o_totalprice DESC NULLS LAST, o_orderkey NULLS FIRST LIMIT 2) t
               ORDER BY c_custkey NULLS FIRST, o_totalprice DESC NULLS LAST, o_orderkey NULLS FIRST""")
    }),
    "subq_correlated" -> ((s, d) => {
      // correlated scalar subquery in the SELECT list — Catalyst
      // decorrelates it into a left outer aggregate join, and the COUNT
      // edge case (an empty correlated group yields 0, not NULL) is the
      // classic decorrelation trap both engines must agree on
      nation(s, d).createOrReplaceTempView("nation")
      customer(s, d).createOrReplaceTempView("customer")
      s.sql("""SELECT n_nationkey, n_name,
                 (SELECT count(*) FROM customer WHERE c_nationkey = n_nationkey) AS n_cust
               FROM nation ORDER BY n_nationkey NULLS FIRST""")
    }),
    "subq_not_in" -> ((s, d) => {
      // NOT IN three-valued semantics, both branches in one row: with a
      // manufactured NULL in the list every candidate is UNKNOWN → count 0
      // (Catalyst plans a null-aware anti join — semantics plain LEFT ANTI
      // can't express); the NULL-free branch counts normally
      orders(s, d).createOrReplaceTempView("orders")
      customer(s, d).createOrReplaceTempView("customer")
      s.sql(notInSql)
    })
  )

  /** Identical text runs on both engines — it IS the oracle. */
  private val notInSql =
    """SELECT
       (SELECT count(*) FROM customer WHERE c_custkey NOT IN
          (SELECT CASE WHEN o_custkey % 2 = 0 THEN NULL ELSE o_custkey END
           FROM orders WHERE o_orderstatus = 'F')) AS n_with_null,
       (SELECT count(*) FROM customer WHERE c_custkey NOT IN
          (SELECT o_custkey FROM orders
           WHERE o_orderstatus = 'F' AND o_custkey % 2 <> 0)) AS n_no_null"""

  val oracles: Map[String, String] = Map(
    "join_fuzzy" ->
      s"""WITH names AS (SELECT DISTINCT p_name AS name FROM part
                        WHERE length(p_name) > 0),
         dirty AS (SELECT DISTINCT
             concat(substr(name, 1, CAST(${h60Duck("name")} % length(name) AS INT)),
                    substr(name, CAST(${h60Duck("name")} % length(name) AS INT) + 2))
               AS dirty
           FROM names),
         cand AS (SELECT d.dirty, n.name, levenshtein(d.dirty, n.name) AS lev
           FROM dirty d JOIN names n ON substr(d.dirty, 1, 2) = substr(n.name, 1, 2)
           WHERE levenshtein(d.dirty, n.name) <= 2),
         best AS (SELECT dirty, name, lev,
             row_number() OVER (PARTITION BY dirty ORDER BY lev NULLS FIRST, name NULLS FIRST) AS rn
           FROM cand)
         SELECT dirty, name AS matched, CAST(lev AS BIGINT) AS distance
         FROM best WHERE rn = 1 ORDER BY dirty NULLS FIRST""",
    "join_asof_forward" ->
      // CASE mask: same NULL-probe-ts convention as join_asof
      """SELECT e.event_id, e.user_id, e.ts,
         CASE WHEN e.ts IS NOT NULL THEN p.ts END AS next_purchase_ts
         FROM (SELECT * FROM events WHERE event_type = 'click') e
         ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
         ON e.user_id = p.user_id AND e.ts <= p.ts
         ORDER BY e.event_id NULLS FIRST""",
    "cte_recursive" ->
      """WITH RECURSIVE days(d) AS (
           SELECT TIMESTAMP '1995-01-01 00:00:00'
           UNION ALL
           SELECT d + INTERVAL 1 DAY FROM days
           WHERE d < TIMESTAMP '1995-03-01 00:00:00')
         SELECT d, count(o_orderkey) AS n_orders
         FROM days LEFT JOIN orders ON date_trunc('day', o_orderdate) = d
         GROUP BY d ORDER BY d NULLS FIRST""",
    "join_lateral" ->
      """SELECT c_custkey, o_orderkey, o_totalprice
         FROM customer c,
         LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                  ORDER BY o_totalprice DESC NULLS LAST, o_orderkey NULLS FIRST LIMIT 2) t
         ORDER BY c_custkey NULLS FIRST, o_totalprice DESC NULLS LAST,
                  o_orderkey NULLS FIRST""",
    "join_asof_tolerance" ->
      // correlated-aggregate formulation (max within the tolerance
      // window) — semantically identical to tolerance-bounded ASOF
      """SELECT e.event_id, e.user_id, e.ts,
           (SELECT max(p.ts) FROM events p
            WHERE p.event_type = 'purchase' AND p.user_id = e.user_id
              AND p.ts <= e.ts AND p.ts >= e.ts - INTERVAL 24 HOURS)
             AS last_purchase_ts
         FROM events e WHERE e.event_type = 'click'
         ORDER BY e.event_id NULLS FIRST""",
    "join_interval_overlap" ->
      // the NAIVE overlap theta join (DuckDB IEJoin): equality with the
      // bucketed plan proves the canonical-bucket dedup loses nothing
      """WITH a AS (SELECT o_orderkey AS a_id, epoch_us(o_orderdate) AS a_s,
                      epoch_us(o_orderdate) + 604800000000 AS a_e
                    FROM orders WHERE o_orderkey % 200 = 0),
         b AS (SELECT l_orderkey AS b_id, epoch_us(l_shipdate) AS b_s,
                 epoch_us(l_shipdate) + 259200000000 AS b_e
               FROM lineitem WHERE l_orderkey % 100 = 0 AND l_linenumber = 1)
         SELECT a_id, b_id,
           least(a_e, b_e) - greatest(a_s, b_s) AS overlap_us
         FROM a JOIN b ON a_s < b_e AND b_s < a_e
         ORDER BY a_id NULLS FIRST, b_id NULLS FIRST, overlap_us NULLS FIRST""",
    "join_range_bucket" ->
      // deliberately the NAIVE theta formulation (DuckDB's IEJoin handles
      // it at fixture scale): equality with the bucketed plan proves the
      // bucket decomposition exact
      """WITH r AS (SELECT o_orderkey AS range_id, epoch_us(o_orderdate) AS s_us
                    FROM orders WHERE o_orderkey % 1000 = 0)
         SELECT range_id, count(*) AS n_lines,
           CAST(round(sum(CAST(l_quantity AS DECIMAL(18,4))), 4) AS DOUBLE) AS sum_qty
         FROM r JOIN lineitem
           ON epoch_us(l_shipdate) >= s_us AND epoch_us(l_shipdate) < s_us + 604800000000
         GROUP BY 1 ORDER BY range_id NULLS FIRST""",
    "merge_upsert" ->
      """WITH base AS (
           SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM orders),
         changes AS (
           SELECT o_orderkey AS c_key, o_custkey AS c_cust,
             o_orderstatus AS c_status, round(o_totalprice * 1.1, 4) AS c_price
           FROM base WHERE o_orderkey % 10 = 0
           UNION ALL
           SELECT o_orderkey + 100000000, o_custkey, o_orderstatus, o_totalprice
           FROM base WHERE o_orderkey % 17 = 0)
         SELECT coalesce(o_orderkey, c_key) AS o_orderkey,
           coalesce(c_cust, o_custkey) AS o_custkey,
           coalesce(c_status, o_orderstatus) AS o_orderstatus,
           coalesce(c_price, o_totalprice) AS o_totalprice
         FROM base FULL JOIN changes ON o_orderkey = c_key
         ORDER BY o_orderkey NULLS FIRST""",
    "join_inner" ->
      """SELECT o_orderkey, c_custkey, c_name, o_totalprice
         FROM orders JOIN customer ON o_custkey = c_custkey
         ORDER BY o_orderkey NULLS FIRST""",
    "join_multikey" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, min_price
         FROM lineitem JOIN (
           SELECT l_partkey AS d_partkey, l_suppkey AS d_suppkey,
                  min(l_extendedprice) AS min_price
           FROM lineitem GROUP BY 1, 2) dim
         ON l_partkey = d_partkey AND l_suppkey = d_suppkey
         ORDER BY l_orderkey NULLS FIRST, l_linenumber NULLS FIRST,
                  l_partkey NULLS FIRST, l_suppkey NULLS FIRST""",
    "join_left" ->
      """SELECT c_custkey, o_orderkey
         FROM customer LEFT JOIN orders ON c_custkey = o_custkey
         ORDER BY c_custkey NULLS FIRST, o_orderkey ASC NULLS FIRST""",
    "join_right" ->
      """SELECT c_custkey, o_orderkey
         FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
         ORDER BY c_custkey NULLS FIRST, o_orderkey ASC NULLS FIRST""",
    "join_full" ->
      """SELECT o_custkey, n_orders, c_custkey, c_acctbal
         FROM (SELECT o_custkey, count(*) AS n_orders FROM orders GROUP BY 1 HAVING count(*) >= 12) big
         FULL JOIN (SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal > 8000) rich
         ON o_custkey = c_custkey
         ORDER BY o_custkey ASC NULLS FIRST, c_custkey ASC NULLS FIRST""",
    "join_semi" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
         ORDER BY c_custkey NULLS FIRST""",
    "join_anti" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
         ORDER BY c_custkey NULLS FIRST""",
    "join_cross" ->
      """SELECT r_regionkey, r_name, n_nationkey, n_name FROM region CROSS JOIN nation
         ORDER BY r_regionkey NULLS FIRST, n_nationkey NULLS FIRST""",
    "join_theta" ->
      """SELECT c_custkey, s_suppkey, c_acctbal, s_acctbal
         FROM customer JOIN supplier
         ON s_acctbal < c_acctbal AND c_acctbal <= s_acctbal + 500
         ORDER BY c_custkey NULLS FIRST, s_suppkey NULLS FIRST""",
    "join_broadcast" ->
      """SELECT c_custkey, n_name FROM customer JOIN nation ON c_nationkey = n_nationkey
         ORDER BY c_custkey NULLS FIRST""",
    "join_asof" ->
      // CASE mask: DuckDB ASOF treats a NULL probe ts as an infinity and
      // still matches; the operator's contract is no-match on NULL ts
      """SELECT e.event_id, e.user_id, e.ts,
         CASE WHEN e.ts IS NOT NULL THEN p.ts END AS last_purchase_ts
         FROM (SELECT * FROM events WHERE event_type = 'click') e
         ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
         ON e.user_id = p.user_id AND e.ts >= p.ts
         ORDER BY e.event_id NULLS FIRST""",
    "join_asof_nearest" ->
      // aggregate per DISTINCT click key, then re-expand onto the raw
      // click rows (NULL-safe join): GROUP BY alone collapses
      // duplicate-pk clicks the Spark window formulation keeps per-row
      """WITH c AS (SELECT event_id, user_id, ts FROM events
                    WHERE event_type = 'click'),
         ck AS (SELECT DISTINCT event_id, user_id, ts FROM c),
         a AS (SELECT ck.event_id, ck.user_id, ck.ts,
                 arg_min(p.ts, abs(epoch_us(p.ts) - epoch_us(ck.ts)) * 2
                   + CASE WHEN p.ts <= ck.ts THEN 0 ELSE 1 END) AS nearest_purchase_ts,
                 CAST(min(abs(epoch_us(p.ts) - epoch_us(ck.ts))) AS BIGINT) AS dist_us
               FROM ck
               LEFT JOIN (SELECT user_id, ts FROM events
                          WHERE event_type = 'purchase') p USING (user_id)
               GROUP BY ck.event_id, ck.user_id, ck.ts)
         SELECT c.event_id, c.user_id, c.ts, a.nearest_purchase_ts, a.dist_us
         FROM c JOIN a ON c.event_id IS NOT DISTINCT FROM a.event_id
           AND c.user_id IS NOT DISTINCT FROM a.user_id
           AND c.ts IS NOT DISTINCT FROM a.ts
         ORDER BY c.event_id NULLS FIRST""",
    "join_star" ->
      """SELECT n_name,
         CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))
           * (1 - CAST(l_discount AS DECIMAL(18,4)))), 4) AS DOUBLE) AS revenue,
         count(*) AS n_lineitems
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         WHERE r_name = 'ASIA'
           AND o_orderdate >= TIMESTAMP '1996-01-01'
           AND o_orderdate < TIMESTAMP '1998-01-01'
         GROUP BY n_name ORDER BY n_name NULLS FIRST""",
    "join_temporal_snapshot" ->
      """WITH v AS (
           SELECT o_custkey AS d_custkey, o_orderkey AS version_key,
             o_totalprice AS version_price, o_orderdate AS valid_from,
             lead(o_orderdate, 1) OVER (PARTITION BY o_custkey
               ORDER BY o_orderdate NULLS FIRST, o_orderkey NULLS FIRST) AS valid_to
           FROM orders WHERE o_custkey < 50),
         p AS (
           SELECT o_orderkey AS fact_key, o_custkey,
             o_orderdate - INTERVAL 30 DAY AS snap_ts
           FROM orders WHERE o_custkey < 50)
         SELECT fact_key, snap_ts, version_key, version_price
         FROM p LEFT JOIN v ON p.o_custkey = v.d_custkey
           AND p.snap_ts >= v.valid_from
           AND (v.valid_to IS NULL OR p.snap_ts < v.valid_to)
         ORDER BY fact_key NULLS FIRST""",
    "subq_in" ->
      """SELECT o_orderkey, o_custkey FROM orders
         WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 9000)
         ORDER BY o_orderkey NULLS FIRST""",
    "subq_scalar" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
         WHERE l_quantity > 1.8 * (SELECT avg(l_quantity) FROM lineitem)
         ORDER BY l_orderkey NULLS FIRST, l_linenumber NULLS FIRST, l_quantity NULLS FIRST""",
    "subq_exists" ->
      """SELECT c_custkey, c_name FROM customer c
         WHERE EXISTS (SELECT 1 FROM orders o
                       WHERE o.o_custkey = c.c_custkey
                         AND o.o_totalprice > 400000)
         ORDER BY c_custkey NULLS FIRST""",
    "subq_correlated" ->
      """SELECT n_nationkey, n_name,
         (SELECT count(*) FROM customer WHERE c_nationkey = n_nationkey) AS n_cust
         FROM nation ORDER BY n_nationkey NULLS FIRST""",
    "join_spatial_grid" ->
      // deliberately the NAIVE all-pairs theta formulation: equality with
      // the grid-blocked Spark plan proves the blocking is lossless
      """WITH p AS (
           SELECT c_custkey AS id, CAST(c_acctbal AS DOUBLE) AS x,
                  CAST((c_custkey * 7919) % 10000 AS DOUBLE) AS y
           FROM customer)
         SELECT a.id AS id_a, b.id AS id_b,
           round(sqrt((a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y)), 4) AS dist
         FROM p a, p b
         WHERE a.id < b.id
           AND (a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y) <= 2500.0
         ORDER BY id_a NULLS FIRST, id_b NULLS FIRST""",
    "subq_not_in" -> notInSql
  )
}
