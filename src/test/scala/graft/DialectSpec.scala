package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.dialects.{GraphQL, LlmTranslator, NlGate, NlToSql}
import graft.sources.TableRegistry
import graft.operators.Dialects

/** §2.9 dialect front-ends: translator behavior incl. failure modes. */
class DialectSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  val d = TestSpark.sfDir

  test("GraphQL -field orderBy sorts descending with ascending tie-break") {
    val out = GraphQL.run(spark, d, Dialects.gqlOrderDescQuery).collect()
    assert(out.length === 25)
    val prices = out.map(_.getDouble(1))
    assert(prices.zip(prices.drop(1)).forall { case (a, b) => a >= b },
      "prices not descending")
    // a bare field still sorts ascending (no regression)
    val asc = GraphQL.run(spark, d,
      """{ orders(orderBy: ["o_orderkey"], limit: 5) { o_orderkey } }""").collect()
    val keys = asc.map(_.getLong(0))
    assert(keys.toSeq === keys.sorted.toSeq)
  }

  test("GraphQL parses filters, orderBy, limit, nesting") {
    val f = GraphQL.parse(
      """{ orders(filter: {o_orderstatus: {eq: "O"}}, limit: 5) {
           o_orderkey customer { c_name } } }""")
    assert(f.name === "orders")
    assert(f.args.map(_._1) === List("filter", "limit"))
    assert(f.selections.map(_.name) === List("o_orderkey", "customer"))
    assert(f.selections(1).selections.map(_.name) === List("c_name"))
  }

  test("GraphQL executes: filter + nested join + limit") {
    val out = GraphQL.run(spark, d,
      """{ orders(filter: {o_totalprice: {gt: 100000}}, orderBy: ["o_orderkey"], limit: 7) {
           o_orderkey o_totalprice customer { c_name } } }""")
    val rows = out.collect()
    assert(rows.length === 7)
    assert(out.columns.toSeq === Seq("o_orderkey", "o_totalprice", "c_name"))
    assert(rows.forall(_.getDouble(1) > 100000))
  }

  test("GraphQL IN and LIKE ops") {
    val out = GraphQL.run(spark, d,
      """{ nation(filter: {n_name: {in: ["NATION_1", "NATION_2"]}}) { n_nationkey n_name } }""")
    assert(out.count() === 2)
    val like = GraphQL.run(spark, d,
      """{ part(filter: {p_name: {like: "%dget%"}}) { p_partkey p_name } }""")
    assert(like.count() > 0)
  }

  test("GraphQL @skip/@include prune fields, relations, and fail loudly") {
    // static skip removes a scalar; include(false) removes a subtree
    val out = GraphQL.run(spark, d,
      """{ orders(orderBy: ["o_orderkey"], limit: 3) {
           o_orderkey
           o_totalprice @skip(if: true)
           customer @include(if: false) { c_name } } }""")
    assert(out.columns.toSeq === Seq("o_orderkey"))
    // variable-driven: the SAME document flips shape with its variables
    val q = """query($c: Boolean!) { orders(orderBy: ["o_orderkey"], limit: 3) {
               o_orderkey customer @include(if: $c) { c_name } } }"""
    assert(GraphQL.runWithVariables(spark, d, q,
      Map("c" -> GraphQL.VBool(true))).columns.toSeq === Seq("o_orderkey", "c_name"))
    assert(GraphQL.runWithVariables(spark, d, q,
      Map("c" -> GraphQL.VBool(false))).columns.toSeq === Seq("o_orderkey"))
    // unknown directive name, non-boolean if, and a fully-pruned
    // selection set must all raise, not plan half a query
    assertThrows[IllegalArgumentException](
      GraphQL.run(spark, d, "{ orders { o_orderkey @deprecated(if: true) } }"))
    assertThrows[IllegalArgumentException](
      GraphQL.run(spark, d, "{ orders { o_orderkey @skip(if: 1) } }"))
    assertThrows[IllegalArgumentException](
      GraphQL.run(spark, d, "{ orders { o_orderkey @skip(if: true) } }"))
  }

  test("GraphQL rejects malformed input and unknown relations") {
    assertThrows[IllegalArgumentException](GraphQL.parse("{ orders"))
    assertThrows[IllegalArgumentException](
      GraphQL.run(spark, d, "{ orders { o_orderkey part { p_name } } }"))
    assertThrows[IllegalArgumentException](
      GraphQL.run(spark, d, """{ orders(filter: {o_orderkey: {zz: 1}}) { o_orderkey } }"""))
    // unterminated string literal must raise, not spin (round-1 ADVICE.md)
    assertThrows[IllegalArgumentException](
      GraphQL.parse("""{ orders(filter: {o_orderstatus: {eq: "O}) { o_orderkey } }"""))
  }

  test("GraphQL aggregation root groups, filters, and applies money discipline") {
    val rows = GraphQL.run(spark, d,
      """{ orders_agg(groupBy: ["o_orderstatus"], orderBy: ["o_orderstatus"]) {
           o_orderstatus count sum_o_totalprice } }""").collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getLong(1)).sum > 0)
    val direct = Tables.orders(spark, d).count()
    assert(rows.map(_.getLong(1)).sum === direct) // counts partition the table
    assertThrows[IllegalArgumentException](
      GraphQL.run(spark, d, "{ orders_agg(groupBy: [\"o_orderstatus\"]) { o_orderstatus wat_x } }"))
    // dotted groupBy joins the related dim; counts still partition the fact
    val joined = GraphQL.run(spark, d,
      """{ orders_agg(groupBy: ["customer.c_mktsegment"],
                      orderBy: ["customer_c_mktsegment"]) {
           customer_c_mktsegment count } }""").collect()
    assert(joined.map(_.getLong(1)).sum === direct)
    assert(joined.length === Tables.customer(spark, d)
      .select("c_mktsegment").distinct().count())
    assertThrows[IllegalArgumentException](
      GraphQL.run(spark, d,
        "{ orders_agg(groupBy: [\"moon.m_x\"]) { moon_m_x count } }"))
    // offset paginates the grouped result (shared applyOrderPage path)
    val paged = GraphQL.run(spark, d,
      """{ orders_agg(groupBy: ["o_orderstatus"], orderBy: ["o_orderstatus"],
           offset: 1, limit: 1) { o_orderstatus count } }""").collect()
    assert(paged.length === 1 && paged(0).getString(0) === rows(1).getString(0))
  }

  test("GraphQL agg root orders by an AGGREGATED field (leaderboard shape)") {
    // round 9 (gql_agg_orderby): orderBy applies AFTER grouping, on the
    // emitted money-disciplined DOUBLE — emitted rows must be the top-k
    // groups by the aggregate, in non-increasing order
    val rows = GraphQL.run(spark, d,
      """{ orders_agg(groupBy: ["o_orderpriority"], filter: {o_orderstatus: {eq: "O"}},
                      orderBy: ["-sum_o_totalprice", "o_orderpriority"], limit: 3) {
           o_orderpriority count sum_o_totalprice } }""").collect()
    assert(rows.length === 3)
    val sums = rows.map(_.getDouble(2))
    sums.sliding(2).foreach { case Array(a, b) => assert(a >= b); case _ => () }
    // the 3 emitted sums are the 3 LARGEST group sums overall
    val all = GraphQL.run(spark, d,
      """{ orders_agg(groupBy: ["o_orderpriority"], filter: {o_orderstatus: {eq: "O"}},
                      orderBy: ["-sum_o_totalprice", "o_orderpriority"]) {
           o_orderpriority sum_o_totalprice } }""").collect().map(_.getDouble(1))
    assert(sums.toSeq === all.sortBy(-_).take(3).toSeq)
  }

  test("NL filter + date-range composition narrows both predicates") {
    // round 9 (nl_range_where): the composed production must apply BOTH
    // the equality filter and the half-open calendar range
    sources.TableRegistry.registerAll(spark, d)
    val sql = NlToSql.translate(
      "total order price by status where priority is 1-URGENT between 1995-01-01 and 1996-06-30")
    assert(sql.contains("= '1-URGENT'"))
    assert(sql.contains(">= TIMESTAMP '1995-01-01 00:00:00'"))
    assert(sql.contains("< TIMESTAMP '1996-07-01 00:00:00'")) // inclusive end day
    val composed = spark.sql(sql).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    // vs the two single-predicate productions: the composition is a
    // subset-total of each
    val whereOnly = spark.sql(NlToSql.translate(
      "total order price by status where priority is 1-URGENT"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val rangeOnly = spark.sql(NlToSql.translate(
      "total order price by status between 1995-01-01 and 1996-06-30"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(composed.nonEmpty)
    composed.foreach { case (k, v) =>
      assert(v <= whereOnly(k) + 1e-6, s"status $k: composed > where-only")
      assert(v <= rangeOnly(k) + 1e-6, s"status $k: composed > range-only")
    }
  }

  test("GraphQL agg root counts DISTINCT values (countd_ aggregate)") {
    // round 9 (gql_agg_distinct): countd_x is an EXACT distinct count per
    // group — cross-checked against a direct distinct-count over the same
    // frame, and bounded above by the plain row count
    val rows = GraphQL.run(spark, d,
      """{ orders_agg(groupBy: ["o_orderstatus"], orderBy: ["o_orderstatus"]) {
           o_orderstatus count countd_o_custkey } }""").collect()
    assert(rows.nonEmpty)
    val direct = Tables.orders(spark, d)
      .groupBy("o_orderstatus")
      .agg(org.apache.spark.sql.functions.count_distinct(
        org.apache.spark.sql.functions.col("o_custkey")).as("nd"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val (st, n, nd) = (r.getString(0), r.getLong(1), r.getLong(2))
      assert(nd === direct(st), s"status $st: countd mismatch")
      assert(nd <= n, s"status $st: distinct count exceeds row count")
    }
  }

  test("NL time-boxed leaderboard composes TopN with the date range") {
    // round 9 (nl_topk_range): the composed production must rank inside
    // the window only — each emitted total is bounded by the same
    // customer's all-time total, and the window total re-derives from the
    // date-range production's grand total semantics (half-open end bound)
    sources.TableRegistry.registerAll(spark, d)
    val sql = NlToSql.translate(
      "top 3 customers by total order price between 1995-01-01 and 1996-06-30")
    assert(sql.contains(">= TIMESTAMP '1995-01-01 00:00:00'"))
    assert(sql.contains("< TIMESTAMP '1996-07-01 00:00:00'")) // inclusive end day
    val windowed = spark.sql(sql).collect()
    assert(windowed.length === 3)
    val totals = windowed.map(_.getDouble(2))
    totals.sliding(2).foreach { case Array(a, b) => assert(a >= b); case _ => () }
    val allTime = spark.sql(NlToSql.translate(
      "top 1000 customers by total order price")).collect()
      .map(r => r.get(0) -> r.getDouble(2)).toMap
    windowed.foreach { r =>
      assert(r.getDouble(2) <= allTime(r.get(0)) + 1e-6,
        s"customer ${r.get(0)}: windowed total exceeds all-time total")
    }
  }

  test("NL star-routed group-by composes with the date range (nation)") {
    // round 10 (nl_nation_range): the dimension is two pk=fk hops off the
    // fact table — the translation must route FROM through the
    // orders→customer→nation join path AND keep the half-open range
    sources.TableRegistry.registerAll(spark, d)
    val sql = NlToSql.translate(
      "total order price by nation between 1995-01-01 and 1996-06-30")
    assert(sql.contains("JOIN customer ON o_custkey = c_custkey"))
    assert(sql.contains("JOIN nation ON c_nationkey = n_nationkey"))
    assert(sql.contains(">= TIMESTAMP '1995-01-01 00:00:00'"))
    assert(sql.contains("< TIMESTAMP '1996-07-01 00:00:00'")) // inclusive end day
    val byNation = spark.sql(sql).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(byNation.nonEmpty)
    // windowed per-nation total is bounded by the all-time per-nation
    // total (same star routing, no range — the TotalBy production)
    val allTime = spark.sql(NlToSql.translate("total order price by nation"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    byNation.foreach { case (n, v) =>
      assert(v <= allTime(n) + 1e-6, s"nation $n: windowed > all-time")
    }
    // the nation partition re-totals to the status partition of the SAME
    // window (both are the windowed orders sum, carved differently; each
    // group rounds to 4dp so grand totals agree within group-count·1e-4)
    val byStatus = spark.sql(NlToSql.translate(
      "total order price by status between 1995-01-01 and 1996-06-30"))
      .collect().map(_.getDouble(1)).sum
    assert(math.abs(byNation.values.sum - byStatus) < 0.01,
      s"partition totals diverge: ${byNation.values.sum} vs $byStatus")
  }

  test("GraphQL agg root paginates the leaderboard (offset through _agg)") {
    // round 10 (gql_agg_page): offset+limit must slice the SAME ordering
    // the unpaged leaderboard emits — page 2 of the priority leaderboard
    // is rows [2, 4) of the full ordered result, exactly
    val page = GraphQL.run(spark, d,
      """{ orders_agg(groupBy: ["o_orderpriority"],
                      orderBy: ["-sum_o_totalprice", "o_orderpriority"],
                      offset: 2, limit: 2) {
           o_orderpriority count sum_o_totalprice } }""").collect()
    assert(page.length === 2)
    val full = GraphQL.run(spark, d,
      """{ orders_agg(groupBy: ["o_orderpriority"],
                      orderBy: ["-sum_o_totalprice", "o_orderpriority"]) {
           o_orderpriority count sum_o_totalprice } }""").collect()
    assert(page.map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq ===
      full.slice(2, 4).map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq)
  }

  test("NL per-group leaderboard composes with the date range") {
    // round 10 (nl_topk_group_range): the rank window must partition by
    // the dimension AND the half-open range must sit in the innermost
    // aggregate's WHERE (scan-pushable, below the window)
    sources.TableRegistry.registerAll(spark, d)
    val sql = NlToSql.translate(
      "top 2 customers by total order price per status between 1995-01-01 and 1996-06-30")
    assert(sql.contains("PARTITION BY o_orderstatus"))
    assert(sql.contains(">= TIMESTAMP '1995-01-01 00:00:00'"))
    assert(sql.contains("< TIMESTAMP '1996-07-01 00:00:00'")) // inclusive end day
    val windowed = spark.sql(sql).collect()
    assert(windowed.nonEmpty)
    // at most 2 rows per status, totals descending within each group
    windowed.groupBy(_.getString(0)).foreach { case (st, rows) =>
      assert(rows.length <= 2, s"status $st emitted ${rows.length} rows")
      rows.map(_.getDouble(3)).sliding(2).foreach {
        case Array(a, b) => assert(a >= b); case _ => ()
      }
    }
    // windowed per-(status, customer) total never exceeds the all-time
    // total for the same pair (huge-n TopNPerDim = the unranged truth)
    val allTime = spark.sql(NlToSql.translate(
      "top 100000 customers by total order price per status")).collect()
      .map(r => (r.getString(0), r.get(1)) -> r.getDouble(3)).toMap
    windowed.foreach { r =>
      assert(r.getDouble(3) <= allTime((r.getString(0), r.get(1))) + 1e-6)
    }
    // a range covering the whole orders date domain (FIXTURES.md:
    // [1992-01-01, 2001-08-02)) must reproduce the unranged grouped
    // leaderboard EXACTLY — composition degenerates to TopNPerDim
    val fullRange = spark.sql(NlToSql.translate(
      "top 2 customers by total order price per status between 1992-01-01 and 2001-08-01"))
      .collect().map(r => (r.getString(0), r.get(1), r.getDouble(3))).toSeq
    val unranged = spark.sql(NlToSql.translate(
      "top 2 customers by total order price per status"))
      .collect().map(r => (r.getString(0), r.get(1), r.getDouble(3))).toSeq
    assert(fullRange === unranged)
  }

  test("GraphQL nested rollup supports distinct count (countd_ behind the join-back)") {
    // round 10 (gql_nested_distinct): countd_ through the fk-grouped
    // aggregate-then-join path must equal a directly-computed per-nation
    // distinct count; parents with no children keep NULL (count -> 0)
    sources.TableRegistry.registerAll(spark, d)
    val rows = GraphQL.run(spark, d,
      """{ nation(orderBy: ["n_nationkey"]) {
           n_nationkey n_name
           customer_agg { count countd_c_mktsegment } } }""").collect()
    assert(rows.nonEmpty)
    val direct = spark.sql(
      """SELECT c_nationkey, count(DISTINCT c_mktsegment) AS d, count(*) AS n
         FROM customer GROUP BY c_nationkey""").collect()
      .map(r => r.get(0) -> (r.getLong(1), r.getLong(2))).toMap
    rows.foreach { r =>
      val key = r.get(0)
      direct.get(key) match {
        case Some((d2, n)) =>
          assert(r.getLong(2) === n, s"nation $key count")
          assert(r.getLong(3) === d2, s"nation $key distinct segments")
        case None =>
          assert(r.getLong(2) === 0L, s"childless nation $key count must be 0")
          assert(r.isNullAt(3), s"childless nation $key countd must stay NULL")
      }
    }
  }

  test("NL translator covers its grammar; SQL runs in Spark") {
    val sqls = Seq(
      "top 3 customers by total order price",
      "count of orders by status",
      "average quantity by return flag",
      "total order price by priority",
      "total order price by market segment", // cross-table: joins customer
      "number of unique customers by status", // distinct-count, no join
      "average account balance by market segment",
      "total order price by status where priority is 1-URGENT or 2-HIGH",
      "total order price by month in 1995",
      "average order price by status where priority is 1-URGENT").map(NlToSql.translate)
    TableRegistry.registerAll(spark, d)
    sqls.foreach(sql => assert(spark.sql(sql).count() > 0))
    // the cross-table production emits the declared join path
    assert(NlToSql.translate("total order price by market segment")
      .contains("orders JOIN customer ON o_custkey = c_custkey"))
    // an unreachable dimension still fails loudly
    assertThrows[IllegalArgumentException](
      NlToSql.translate("total event value by market segment"))
    // distinct-count counts the fk directly — no join in the emitted SQL
    val dc = NlToSql.translate("number of unique customers by status")
    assert(dc.contains("count(DISTINCT o_custkey)") && !dc.contains("JOIN"))
    // a dimension off the entity's fact table fails loudly
    assertThrows[IllegalArgumentException](
      NlToSql.translate("number of unique customers by return flag"))
  }

  test("GraphQL resolves two-level nesting (orders -> customer -> nation)") {
    val out = GraphQL.run(spark, d,
      """{ orders(orderBy: ["o_orderkey"], limit: 5) {
           o_orderkey customer { c_name nation { n_name } } } }""")
    assert(out.columns.toSeq === Seq("o_orderkey", "c_name", "n_name"))
    val rows = out.collect()
    assert(rows.length === 5)
    assert(rows.forall(r => r.getString(2).startsWith("NATION_")))
  }

  test("NL where-clause patterns filter with case-preserved values") {
    val sql = NlToSql.translate("count of orders by priority where status is F")
    assert(sql.contains("o_orderstatus = 'F'"))
    TableRegistry.registerAll(spark, d)
    val out = spark.sql(sql).collect()
    assert(out.nonEmpty)
    val total = NlToSql.translate("total order price by priority where status is O")
    assert(spark.sql(total).count() > 0)
    // filter dimension must live on the grouped table
    assertThrows[IllegalArgumentException](
      NlToSql.translate("count of orders by priority where language is en"))
  }

  test("NL distinct-count routes the filter dim one many-to-one star hop") {
    // status is orders'; the suppliers fk fact is lineitem — the filter
    // routes through lineitem ⋈ orders (many-to-one, distinct basis
    // untouched); round ≤13 rejected this shape (nl_distinct_star)
    val sql = NlToSql.translate(
      "number of unique suppliers by return flag where status is F")
    assert(sql.contains("JOIN orders ON l_orderkey = o_orderkey"), sql)
    assert(sql.contains("count(DISTINCT l_suppkey)"), sql)
    TableRegistry.registerAll(spark, d)
    assert(spark.sql(sql).count() > 0)
    // the REVERSE (one-to-many) direction lowers to EXISTS (round 16):
    // well-defined for distinct counts — the order qualifies iff ANY of
    // its lines matches — and never a row-duplicating join
    val rev = NlToSql.translate(
      "number of unique customers by status where return flag is R")
    assert(rev.contains("EXISTS"), rev)
    assert(rev.contains("count(DISTINCT o_custkey)"), rev)
    assert(!rev.toLowerCase.contains("join"), s"EXISTS, not a join: $rev")
    assert(spark.sql(rev).count() > 0)
    // the SAME route stays rejected for basis-sensitive aggregates: a
    // fan-out filter under sum/count(*) would change the row basis
    assertThrows[IllegalArgumentException](NlToSql.translate(
      "total order price by status where return flag is R"))
    assertThrows[IllegalArgumentException](NlToSql.translate(
      "number of orders by status where return flag is R"))
  }

  test("NL cross-fact ratio aggregates each side to |dims| then joins NULL-safely") {
    val sql = NlToSql.translate("ratio of order price to quantity by status")
    assert(sql.contains("FULL JOIN"), sql)
    assert(sql.contains("IS NOT DISTINCT FROM"), sql)
    // each measure aggregates over ITS OWN fact (quantity's side routes
    // the dim through lineitem ⋈ orders; order price's side is orders
    // alone) — no single FROM mixes the two bases
    assert(sql.contains("sum(CAST(o_totalprice AS DECIMAL(18,4)))"), sql)
    assert(sql.contains("sum(CAST(l_quantity AS DECIMAL(18,4)))"), sql)
    TableRegistry.registerAll(spark, d)
    val out = spark.sql(sql)
    assert(out.columns.toSeq ===
      Seq("o_orderstatus", "total_num", "total_den", "ratio_bp"))
    assert(out.count() > 0)
    // one side unreachable from the dim (events ↛ return flag) — loud
    assertThrows[IllegalArgumentException](NlToSql.translate(
      "ratio of event value to quantity by return flag"))
  }

  test("NL aggregate filter dims route through one declared star path") {
    // filter on customer, measure + group on orders (one hop)
    val sql = NlToSql.translate(
      "total order price by status where market segment is BUILDING")
    assert(sql.contains("JOIN customer ON o_custkey = c_custkey"), sql)
    assert(sql.contains("c_mktsegment = 'BUILDING'"), sql)
    // group dim (nation, two hops) AND filter dim (customer, one hop)
    // carried by the single nation path, which passes through customer
    val two = NlToSql.translate(
      "total order price by nation where market segment is BUILDING")
    assert(two.contains("JOIN nation ON c_nationkey = n_nationkey"), two)
    assert(two.contains("c_mktsegment = 'BUILDING'"), two)
    TableRegistry.registerAll(spark, d)
    assert(spark.sql(sql).count() > 0 && spark.sql(two).count() > 0)
    // row basis unchanged by the routed filterless join: the filtered
    // total must equal the same measure filtered via an IN subquery
    val viaIn = spark.sql(
      """SELECT CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,4))),4) AS DOUBLE)
         FROM orders WHERE o_custkey IN
           (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')""")
      .first().getDouble(0)
    val viaJoin = spark.sql(sql).agg(org.apache.spark.sql.functions.sum("total"))
      .first().getDouble(0)
    assert(math.abs(viaIn - viaJoin) < 1e-6, s"$viaIn vs $viaJoin")
    // dims on genuinely disjoint paths must reject loudly
    assertThrows[IllegalArgumentException](
      NlToSql.translate("total quantity by nation where status is F"))
  }

  test("NL qualified dims route the named nation edge off lineitem") {
    // round 15 (verdict item 3): bare "nation" off lineitem is ambiguous
    // (supplier edge vs orders→customer edge) — the rejection must NAME
    // the resolving qualifiers, not just say "no path"
    val err = intercept[IllegalArgumentException](
      NlToSql.translate("total quantity by nation"))
    assert(err.getMessage.contains("supplier nation")
      && err.getMessage.contains("customer nation"), err.getMessage)
    val err2 = intercept[IllegalArgumentException](
      NlToSql.translate("total quantity by nation where status is F"))
    assert(err2.getMessage.contains("supplier nation"), err2.getMessage)
    // the qualified forms route the named edge
    val viaSupp = NlToSql.translate("total quantity by supplier nation")
    assert(viaSupp.contains("JOIN nation ON s_nationkey = n_nationkey"), viaSupp)
    assert(!viaSupp.contains("c_nationkey"), viaSupp)
    val viaCust = NlToSql.translate("total quantity by customer nation")
    assert(viaCust.contains("JOIN nation ON c_nationkey = n_nationkey"), viaCust)
    assert(!viaCust.contains("s_nationkey"), viaCust)
    // customer-qualified + orders filter rides the single declared path
    // (it passes through orders)
    val custWhere = NlToSql.translate(
      "total quantity by customer nation where status is F")
    assert(custWhere.contains("o_orderstatus = 'F'")
      && custWhere.contains("c_nationkey"), custWhere)
    // supplier-qualified + orders filter needs the MECHANICAL MERGE of
    // two disjoint many-to-one chains off lineitem
    val merged = NlToSql.translate(
      "total quantity by supplier nation where status is F")
    assert(merged.contains("JOIN supplier ON l_suppkey = s_suppkey")
      && merged.contains("JOIN nation ON s_nationkey = n_nationkey")
      && merged.contains("JOIN orders ON l_orderkey = o_orderkey")
      && !merged.contains("c_nationkey"), merged)
    TableRegistry.registerAll(spark, d)
    // semantic cross-check: the two edges give genuinely different
    // answers on the fixture, and the merged plan's total equals the
    // unmerged supplier-edge total filtered via an IN subquery
    assert(spark.sql(viaSupp).count() > 0 && spark.sql(viaCust).count() > 0)
    val viaInSql =
      """SELECT CAST(round(sum(CAST(l_quantity AS DECIMAL(18,4))),4) AS DOUBLE)
         FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
         WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F')"""
    val viaIn = spark.sql(viaInSql).first().getDouble(0)
    val viaMerge = spark.sql(merged)
      .agg(org.apache.spark.sql.functions.sum("total")).first().getDouble(0)
    assert(math.abs(viaIn - viaMerge) < 1e-6, s"$viaIn vs $viaMerge")
  }

  test("gql distinct_on keeps one deterministic row per key; sloppy forms reject") {
    val out = GraphQL.run(spark, d,
      """{ orders(distinct_on: ["o_custkey"], filter: {o_orderstatus: {eq: "O"}},
                  orderBy: ["o_custkey", "-o_totalprice", "o_orderkey"]) {
           o_custkey o_orderkey o_totalprice } }""").collect()
    assert(out.nonEmpty)
    // one row per distinct key, and it is the per-key max price
    assert(out.map(_.getLong(0)).distinct.length == out.length)
    // Hasura's rule: orderBy must exist and start with the distinct_on
    // column(s)…
    assertThrows[IllegalArgumentException](GraphQL.run(spark, d,
      """{ orders(distinct_on: ["o_custkey"]) { o_custkey o_orderkey } }"""))
    assertThrows[IllegalArgumentException](GraphQL.run(spark, d,
      """{ orders(distinct_on: ["o_custkey"],
                  orderBy: ["-o_totalprice", "o_custkey"]) { o_custkey } }"""))
    // …and the engine's determinism rule: it must CONTINUE past them
    // with a tie-break, or "first row per key" is arbitrary
    assertThrows[IllegalArgumentException](GraphQL.run(spark, d,
      """{ orders(distinct_on: ["o_custkey"],
                  orderBy: ["o_custkey"]) { o_custkey o_orderkey } }"""))
  }

  test("gql object-relation filter keeps the parent and nulls the object") {
    val rows = GraphQL.run(spark, d,
      """{ orders(filter: {o_orderstatus: {eq: "F"}}, orderBy: ["o_orderkey"], limit: 200) {
           o_orderkey customer(filter: {c_mktsegment: {eq: "BUILDING"}}) {
             c_mktsegment } } }""").collect()
    assert(rows.length == 200, "parents must NOT be dropped by the object filter")
    val segs = rows.map(r => Option(r.getString(1))).distinct
    assert(segs.contains(None), "a missed filter must null the object, not drop the row")
    assert(segs.flatten.forall(_ == "BUILDING"))
    // ordering/paging on an object relation stays meaningless → loud
    assertThrows[IllegalArgumentException](GraphQL.run(spark, d,
      """{ orders(orderBy: ["o_orderkey"], limit: 5) {
           o_orderkey customer(limit: 1) { c_name } } }"""))
  }

  test("gql boolean filter combinators lower to one tree; malformed forms reject") {
    // round 16 (verdict item 1): _and/_or/_not nest arbitrarily and AND
    // with sibling column entries; parity against the literal SQL tree
    TableRegistry.registerAll(spark, d)
    val viaGql = GraphQL.run(spark, d,
      """{ orders(filter: {_or: [{o_orderstatus: {eq: "P"}},
                                 {_and: [{o_totalprice: {gt: 300000}},
                                         {_not: {o_orderstatus: {eq: "O"}}}]}],
                           o_orderpriority: {ne: "5-LOW"}},
                  orderBy: ["o_orderkey"]) { o_orderkey } }""")
      .collect().map(_.getLong(0))
    val viaSql = spark.sql(
      """SELECT o_orderkey FROM orders
         WHERE (o_orderstatus = 'P'
                OR (o_totalprice > 300000 AND NOT o_orderstatus = 'O'))
           AND o_orderpriority <> '5-LOW'
         ORDER BY o_orderkey""").collect().map(_.getLong(0))
    assert(viaGql.nonEmpty && viaGql.sameElements(viaSql))
    // having takes combinators through the SAME filterCond lowering
    val hav = GraphQL.run(spark, d,
      """{ orders_agg(groupBy: ["o_orderstatus"],
                      having: {_not: {count: {lt: 1}}},
                      orderBy: ["o_orderstatus"]) { o_orderstatus count } }""")
      .collect()
    assert(hav.nonEmpty)
    // strictness: empty combinator list, non-list _and/_or operand,
    // non-object _not operand all fail loudly — an empty _or planning as
    // FALSE (or TRUE) would silently mislabel the whole result
    assertThrows[IllegalArgumentException](GraphQL.run(spark, d,
      """{ orders(filter: {_or: []}, limit: 5) { o_orderkey } }"""))
    assertThrows[IllegalArgumentException](GraphQL.run(spark, d,
      """{ orders(filter: {_and: {o_orderstatus: {eq: "O"}}}, limit: 5) {
            o_orderkey } }"""))
    assertThrows[IllegalArgumentException](GraphQL.run(spark, d,
      """{ orders(filter: {_not: [{o_orderstatus: {eq: "O"}}]}, limit: 5) {
            o_orderkey } }"""))
    assertThrows[IllegalArgumentException](GraphQL.run(spark, d,
      """{ orders(filter: {_or: [5]}, limit: 5) { o_orderkey } }"""))
  }

  test("NL twin-qualified nation dims merge under aliases (q_volume_shipping shape)") {
    // round 16 (verdict item 2): both qualified edges meet the same
    // physical nation table — the merge aliases it instead of rejecting
    val sql = NlToSql.translate("total quantity by supplier nation and customer nation")
    assert(sql.contains("nation n_sup") && sql.contains("nation n_cust"), sql)
    assert(sql.contains("AS supplier_nation") && sql.contains("AS customer_nation"), sql)
    TableRegistry.registerAll(spark, d)
    val out = spark.sql(sql)
    assert(out.columns.toSeq === Seq("supplier_nation", "customer_nation", "total"))
    assert(out.count() > 0)
    // the twin group-by cannot change the fact-row basis: its grand total
    // equals the single-edge total (quantities are integers — sums exact)
    val single = spark.sql(NlToSql.translate("total quantity by supplier nation"))
    val a = out.agg(org.apache.spark.sql.functions.sum("total")).first().getDouble(0)
    val b = single.agg(org.apache.spark.sql.functions.sum("total")).first().getDouble(0)
    assert(math.abs(a - b) < 1e-4, s"$a vs $b")
    // reversed qualifier order works and swaps the output aliases
    val rev = NlToSql.translate("total quantity by customer nation and supplier nation")
    assert(rev.contains("n_cust.n_name AS customer_nation")
      && rev.contains("n_sup.n_name AS supplier_nation"), rev)
    // round-16 continuation: the where-twin now routes too — the filter
    // column is qualified by ITS edge's alias, so grouping by the
    // seller's nation while filtering the buyer's is unambiguous
    val tw = NlToSql.translate(
      "total quantity by supplier nation where customer nation is NATION_7")
    assert(tw.contains("n_cust.n_name = 'NATION_7'"), tw)
    assert(tw.contains("GROUP BY n_sup.n_name"), tw)
    val twOut = spark.sql(tw)
    assert(twOut.columns.toSeq === Seq("supplier_nation", "total"))
    // basis check: the filtered twin's grand total equals the twin
    // group-by's NATION_7 customer slice
    val slice = out.where(org.apache.spark.sql.functions
        .col("customer_nation") === "NATION_7")
      .agg(org.apache.spark.sql.functions.sum("total")).first().getDouble(0)
    val twSum = twOut.agg(org.apache.spark.sql.functions.sum("total"))
      .first().getDouble(0)
    assert(math.abs(slice - twSum) < 1e-4, s"$slice vs $twSum")
    // the reversed roles swap alias and filter edge
    val twRev = NlToSql.translate(
      "total quantity by customer nation where supplier nation is NATION_7")
    assert(twRev.contains("n_sup.n_name = 'NATION_7'")
      && twRev.contains("GROUP BY n_cust.n_name"), twRev)
    // bare "nation" stays ambiguous in BOTH slots
    assertThrows[IllegalArgumentException](NlToSql.translate(
      "total quantity by nation where customer nation is NATION_7"))
  }

  test("NL derived revenue measure: exact decimal expression through the productions") {
    // revenue = extendedprice × (1−discount) — the measure slot carries a
    // full SQL expression; the 2dp×2dp product is exact at 4dp, so the
    // decimal disciplines hold unchanged in both engines
    TableRegistry.registerAll(spark, d)
    val sql = NlToSql.translate("total revenue by return flag")
    assert(sql.contains("l_extendedprice") && sql.contains("1 - CAST(l_discount"), sql)
    val out = spark.sql(sql).collect()
    assert(out.nonEmpty)
    // identity: sum(revenue) <= sum(extendedprice) strictly when any
    // discount is positive, and both are exact 4dp doubles
    val rev = out.map(_.getDouble(1)).sum
    val ext = spark.sql(NlToSql.translate("total extended price by return flag"))
      .collect().map(_.getDouble(1)).sum
    assert(rev > 0 && rev < ext, s"rev=$rev ext=$ext")
    // min/max normalize the widened decimal product to DOUBLE
    val mm = NlToSql.translate("maximum revenue by return flag")
    assert(mm.contains("CAST(max(") && mm.contains("AS DOUBLE) AS extreme"), mm)
    assert(spark.sql(mm).schema("extreme").dataType ===
      org.apache.spark.sql.types.DoubleType)
    // ratio with the derived measure keeps the same-fact basis
    val ratio = spark.sql(NlToSql.translate(
      "ratio of revenue to extended price by return flag")).collect()
    assert(ratio.forall(r => r.getLong(3) > 0 && r.getLong(3) <= 10000),
      "revenue/extendedprice must sit in (0, 1] basis points")
    // unknown derived measures keep rejecting
    assertThrows[IllegalArgumentException](NlToSql.translate(
      "total profit by return flag"))
  }

  test("NL raw-column questions over fixture tables resolve the declared contract") {
    // round-16: the column-level productions work on fixtures via the
    // DECLARED TableRegistry.fixtureSchemas (no session, no request
    // history) — same loud-rejection discipline as registered datasets
    TableRegistry.registerAll(spark, d)
    val cnt = NlToSql.translate("how many rows in orders where o_orderstatus is F")
    assert(cnt.contains("o_orderstatus = 'F'"), cnt)
    assert(spark.sql(cnt).first().getLong(0) > 0)
    // numeric filter column types the literal bare (scan-pushable)
    val numCnt = NlToSql.translate("how many rows in nation where n_regionkey is 1")
    assert(numCnt.contains("n_regionkey = 1") && !numCnt.contains("'1'"), numCnt)
    // grouped total + topk over raw fixture columns
    val tot = spark.sql(NlToSql.translate(
      "total o_totalprice in orders by o_orderstatus")).collect()
    assert(tot.length === 3) // F, O, P
    val topk = spark.sql(NlToSql.translate(
      "top 3 rows of orders by o_totalprice")).collect()
    assert(topk.length === 3)
    assert(topk(0).getAs[Double]("o_totalprice") >=
      topk(2).getAs[Double]("o_totalprice"))
    // grouped min/max and exact distinct counts over raw columns
    val mm = spark.sql(NlToSql.translate(
      "maximum o_totalprice in orders by o_orderstatus")).collect()
    assert(mm.length === 3 && mm.forall(_.getDouble(1) > 0))
    val dst = spark.sql(NlToSql.translate(
      "number of distinct l_suppkey in lineitem by l_returnflag")).collect()
    assert(dst.length === 3 && dst.forall(_.getLong(1) > 0))
    val dstScalar = spark.sql(NlToSql.translate(
      "count of unique n_regionkey in nation")).first().getLong(0)
    assert(dstScalar === 5L)
    // unknown column rejects naming the real list; type mismatch and
    // non-numeric measure reject like registered datasets
    val e = intercept[IllegalArgumentException](NlToSql.translate(
      "how many rows in orders where o_bogus is 3"))
    assert(e.getMessage.contains("o_orderkey"), e.getMessage)
    assertThrows[IllegalArgumentException](NlToSql.translate(
      "how many rows in nation where n_regionkey is GERMANY"))
    assertThrows[IllegalArgumentException](NlToSql.translate(
      "total n_name in nation by n_regionkey"))
  }

  test("GraphQL roots resolve registered datasets like fixtures (gql_catalog)") {
    import graft.sources.{CatalogStore, DatasetRegistry}
    DatasetRegistry.register(CatalogStore.Entry(
      "gql_spec_nations", s"$d/nation.parquet", "parquet"), Some(spark))
    try {
      val out = GraphQL.run(spark, d,
        """{ gql_spec_nations(filter: {n_regionkey: {between: [1, 3]}},
                              orderBy: ["n_nationkey"]) {
             n_nationkey n_name n_regionkey } }""").collect()
      assert(out.nonEmpty)
      assert(out.forall(r => r.getInt(2) >= 1 && r.getInt(2) <= 3))
      // unknown columns reject loudly against the LOADED schema — the
      // same analyzer-level rejection fixture roots give (GqlFuzz's
      // rej_unknown_column row), naming the missing column
      val e = intercept[Exception](GraphQL.run(spark, d,
        """{ gql_spec_nations(orderBy: ["n_nationkey"]) { bogus } }"""))
      assert(e.getMessage != null && e.getMessage.contains("bogus"),
        e.getMessage)
      // introspection lists the registered root alongside the fixtures
      val names = GraphQL.run(spark, d, Dialects.gqlIntrospectQuery)
        .collect().map(_.getString(0))
      assert(names.contains("gql_spec_nations"))
    } finally DatasetRegistry.unregister("gql_spec_nations")
  }

  test("GraphQL nin/between/is_null/ilike filter and reject malformed operands") {
    val out = GraphQL.run(spark, d, Dialects.gqlFilterOpsQuery).collect()
    assert(out.nonEmpty)
    assert(out.forall { r =>
      val p = r.getAs[String]("o_orderpriority")
      val t = r.getAs[Double]("o_totalprice")
      p != "1-URGENT" && p != "5-LOW" && t >= 56800 && t <= 87800
    })
    // ilike is case-insensitive where like is not
    val il = GraphQL.run(spark, d,
      """{ orders(filter: {o_orderpriority: {ilike: "1-urgent"}},
                  orderBy: ["o_orderkey"], limit: 5) { o_orderkey o_orderpriority } }""")
      .collect()
    assert(il.nonEmpty && il.forall(_.getString(1) == "1-URGENT"))
    // operand-shape rejections are loud and name the op
    def rejects(gql: String, frag: String): Unit = {
      val e = intercept[IllegalArgumentException](GraphQL.run(spark, d, gql))
      assert(e.getMessage.contains(frag), e.getMessage)
    }
    rejects("""{ orders(filter: {o_totalprice: {between: [1, 2, 3]}},
                 orderBy: ["o_orderkey"], limit: 5) { o_orderkey } }""", "between")
    rejects("""{ orders(filter: {o_orderdate: {is_null: "yes"}},
                 orderBy: ["o_orderkey"], limit: 5) { o_orderkey } }""", "is_null")
    rejects("""{ orders(filter: {o_orderstatus: {nin: "P"}},
                 orderBy: ["o_orderkey"], limit: 5) { o_orderkey } }""", "nin")
    // the Hasura empty-list contract: in:[] = no rows, nin:[] = all rows
    assert(GraphQL.run(spark, d,
      """{ orders(filter: {o_orderstatus: {in: []}},
           orderBy: ["o_orderkey"], limit: 5) { o_orderkey } }""").count() === 0)
    assert(GraphQL.run(spark, d,
      """{ orders(filter: {o_orderstatus: {nin: []}},
           orderBy: ["o_orderkey"], limit: 5) { o_orderkey } }""").count() === 5)
    rejects("""{ orders(filter: {o_orderpriority: {like: 5}},
                 orderBy: ["o_orderkey"], limit: 5) { o_orderkey } }""", "like")
  }

  test("NL aggregates over a registered dataset: typed, money-disciplined; non-numeric rejects") {
    // round 16 (verdict item 3): total/average resolve the measure column
    // AND its type from the registry's cached schema
    import graft.sources.{CatalogStore, DatasetRegistry}
    DatasetRegistry.register(CatalogStore.Entry(
      "reg_nat_agg", s"$d/nation.parquet", "parquet"), Some(spark))
    try {
      TableRegistry.registerAll(spark, d) // materialize the view for spark.sql
      val sql = NlToSql.translate("total n_nationkey in reg_nat_agg by n_regionkey")
      assert(sql.contains("DECIMAL(18,4)") && sql.contains("GROUP BY n_regionkey"), sql)
      val out = spark.sql(sql)
      assert(out.columns.toSeq === Seq("n_regionkey", "total") && out.count() > 0)
      // scalar form: nation keys are 0..24, sum 300 at every SF
      val scalar = NlToSql.translate("total n_nationkey in reg_nat_agg")
      assert(spark.sql(scalar).first().getDouble(0) === 300.0)
      val avg = NlToSql.translate("average n_nationkey in reg_nat_agg by n_regionkey")
      assert(spark.sql(avg).count() > 0)
      // non-numeric measure rejects loudly, NAMING the real type
      val e1 = intercept[IllegalArgumentException](
        NlToSql.translate("total n_name in reg_nat_agg by n_regionkey"))
      assert(e1.getMessage.contains("numeric"), e1.getMessage)
      // unknown group column rejects with the real column list
      assertThrows[IllegalArgumentException](
        NlToSql.translate("total n_nationkey in reg_nat_agg by bogus"))
      // fixture tables resolve too since round 16 (the declared
      // fixtureSchemas contract) — covered by the raw-column test above
      // round 16: the equality-filtered total — string filter quoted,
      // numeric filter bare; both literal typings from the cached schema
      val fw = NlToSql.translate(
        "total n_nationkey in reg_nat_agg where n_name is GERMANY")
      assert(fw.contains("WHERE n_name = 'GERMANY'"), fw)
      val fn = NlToSql.translate(
        "total n_nationkey in reg_nat_agg where n_regionkey is 1")
      assert(fn.contains("WHERE n_regionkey = 1") && !fn.contains("'1'"), fn)
      assert(spark.sql(fn).columns.toSeq === Seq("total"))
      // non-numeric measure, type-mismatched literal, unknown filter
      // column: all loud
      assertThrows[IllegalArgumentException](NlToSql.translate(
        "total n_name in reg_nat_agg where n_regionkey is 1"))
      val e2 = intercept[IllegalArgumentException](NlToSql.translate(
        "total n_nationkey in reg_nat_agg where n_regionkey is GERMANY"))
      assert(e2.getMessage.contains("not numeric"), e2.getMessage)
      assertThrows[IllegalArgumentException](NlToSql.translate(
        "total n_nationkey in reg_nat_agg where bogus_col is 1"))
    } finally DatasetRegistry.unregister("reg_nat_agg")
  }

  test("NL superlative: singular top/bottom-1, optional sargable year window") {
    val sql = NlToSql.translate("which supplier had the highest total quantity in 1996")
    assert(sql.contains("LIMIT 1") && sql.contains("DESC"))
    assert(sql.contains("l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'") &&
      sql.contains("< TIMESTAMP '1997-01-01 00:00:00'"),
      s"year must lower to a half-open range: $sql")
    TableRegistry.registerAll(spark, d)
    assert(spark.sql(sql).count() === 1)
    // lowest mirrors to ASC; no year -> no WHERE
    val lo = NlToSql.translate("which customer had the lowest total order price")
    assert(lo.contains("ASC") && !lo.contains("WHERE") && lo.contains("LIMIT 1"))
    assert(spark.sql(lo).count() === 1)
    assertThrows[IllegalArgumentException](
      NlToSql.translate("which moon had the highest total cheese"))
  }

  test("NL translator fails loudly on unknown input") {
    assertThrows[IllegalArgumentException](NlToSql.translate("delete everything"))
    assertThrows[IllegalArgumentException](NlToSql.translate("top 5 moons by total cheese"))
  }

  test("GraphQL nested aggregation composes with variables; wrong direction fails loudly") {
    import graft.operators.Dialects
    // the shipped key's shape, with the child filter bound via a variable
    val df = GraphQL.runWithVariables(spark, d,
      """query($st: String = "F") {
           customer(orderBy: ["c_custkey"], limit: 10) {
             c_custkey orders_agg(filter: {o_orderstatus: {eq: $st}}) {
               count sum_o_totalprice } } }""", Map.empty)
    val rows = df.collect()
    assert(rows.length === 10)
    assert(df.columns.toSeq === Seq("c_custkey", "count", "sum_o_totalprice"))
    // count coalesces to 0 for parents with no matching children, and the
    // corresponding sum stays NULL (SQL LEFT JOIN semantics)
    assert(rows.forall(r => !r.isNullAt(1)))
    // aggregating a many-to-one relation (orders -> its parent customer)
    // is not a rollup — fails loudly, never plans a 1:1 "aggregate"
    assertThrows[IllegalArgumentException](GraphQL.run(spark, d,
      "{ orders(limit: 1) { o_orderkey customer_agg { count } } }"))
    // unknown aggregate field inside the subtree fails loudly
    assertThrows[IllegalArgumentException](GraphQL.run(spark, d,
      "{ customer(limit: 1) { c_custkey orders_agg { median_o_totalprice } } }"))
  }

  test("GraphQL nested aggregation: sibling _aggs and an _agg one level deep") {
    // two sibling rollups on one parent (nation → its customers AND its
    // suppliers) — each is its own aggregate-then-join; both counts are
    // selected, so one must carry an alias (a duplicate output name
    // fails loudly below)
    val sib = GraphQL.run(spark, d,
      """{ nation(orderBy: ["n_nationkey"], limit: 5) {
           n_nationkey customer_agg { count avg_c_acctbal }
           supplier_agg { n_supp: count max_s_acctbal } } }""")
    assert(sib.columns.toSeq ===
      Seq("n_nationkey", "count", "avg_c_acctbal", "n_supp", "max_s_acctbal"))
    assert(sib.count() === 5)
    // unaliased colliding outputs fail loudly, never plan ambiguous
    assertThrows[IllegalArgumentException](GraphQL.run(spark, d,
      "{ nation(limit: 1) { n_nationkey customer_agg { count } supplier_agg { count } } }"))
    // an _agg INSIDE a nested relation subtree (orders → customer →
    // that customer's full order rollup): attach recurses, the rollup
    // joins at the depth it appears — and works whether or not the join
    // key (c_custkey) is itself selected as a scalar
    val deep = GraphQL.run(spark, d,
      """{ orders(orderBy: ["o_orderkey"], limit: 3) {
           o_orderkey customer { c_custkey orders_agg { count } } } }""")
    assert(deep.columns.toSeq === Seq("o_orderkey", "c_custkey", "count"))
    val rows = deep.collect()
    assert(rows.length === 3)
    // every order's customer has at least that one order
    assert(rows.forall(_.getLong(2) >= 1))
    val deepNoKey = GraphQL.run(spark, d,
      """{ orders(orderBy: ["o_orderkey"], limit: 3) {
           o_orderkey customer { c_name orders_agg { count } } } }""")
    assert(deepNoKey.columns.toSeq === Seq("o_orderkey", "c_name", "count"))
    assert(deepNoKey.collect().forall(_.getLong(2) >= 1))
  }

  test("NL translator seam: LLM adapter output is gated — parse, read-only, catalog-only") {
    // a fake completion stands in for the model call (the only piece an
    // offline container cannot run); everything else — prompt grounding,
    // validation, execution — is the real path
    def llm(answer: String) = new LlmTranslator(_ => answer)
    val good = NlGate.run(spark, d,
      llm("SELECT o_orderstatus, count(*) AS n FROM orders GROUP BY 1"), "how many orders per status?")
    assert(good.count() === 3)
    // prompt grounding carries the catalog
    var seen: String = null
    new LlmTranslator(p => { seen = p; "SELECT 1 AS one" }).translate("q")
    assert(seen.contains("orders") && seen.contains("lineitem") && seen.contains("q"))
    // DDL/DML from a hostile or confused completion never reaches the engine
    assertThrows[IllegalArgumentException](
      NlGate.run(spark, d, llm("DROP TABLE orders"), "q"))
    assertThrows[IllegalArgumentException](
      NlGate.run(spark, d, llm("INSERT INTO orders SELECT * FROM orders"), "q"))
    // hallucinated tables fail loudly
    assertThrows[IllegalArgumentException](
      NlGate.run(spark, d, llm("SELECT * FROM secret_users"), "q"))
    // non-SQL babble fails at parse
    assertThrows[IllegalArgumentException](
      NlGate.run(spark, d, llm("Sure! Here is the SQL you asked for:"), "q"))
    // CTE queries are legal (the alias is locally-known) AND their
    // definitions are checked — the two halves of the WITH-handling
    NlGate.validate(spark,
      "WITH t AS (SELECT o_orderkey FROM orders) SELECT count(*) FROM t")
    assertThrows[IllegalArgumentException](NlGate.validate(spark,
      "WITH t AS (SELECT x FROM secret_tbl) SELECT count(*) FROM t"))
    // relations inside subquery EXPRESSIONS are gated too
    assertThrows[IllegalArgumentException](NlGate.validate(spark,
      "SELECT count(*) FROM orders WHERE o_custkey IN (SELECT c FROM secret_tbl)"))
    assertThrows[IllegalArgumentException](NlGate.validate(spark,
      "SELECT count(*) FROM orders WHERE EXISTS (SELECT 1 FROM secret_tbl)"))
    // and every shipped grammar production passes the same gate
    import graft.operators.Dialects._
    Seq(nlQuestion, nlAvgQuestion, nlYearQuestion, nlOrQuestion, nlMonthQuestion,
        nlLastDaysQuestion, nlNotInQuestion, nlTopkPerGroupQuestion, nlShareQuestion)
      .foreach(q => NlGate.validate(spark, NlToSql.translate(q)))
  }

  test("NL relative-time production: sargable anchored range; no anchor = loud failure") {
    val sql = NlToSql.translate("total event value by event type in the last 30 days")
    // half-open [anchor-30d, anchor) on the fixture-contract anchor
    assert(sql.contains("ts >= TIMESTAMP '2024-01-01 00:00:00'") &&
      sql.contains("ts < TIMESTAMP '2024-01-31 00:00:00'"), sql)
    // a fact with no declared date/anchor fails loudly, never wall-clock
    assertThrows[IllegalArgumentException](NlToSql.translate(
      "total account balance by market segment in the last 30 days"))
    // orders anchor differs from events'
    assert(NlToSql.translate("total order price by status in the last 7 days")
      .contains("o_orderdate < TIMESTAMP '2001-08-02 00:00:00'"))
  }

  test("NL negation production: NOT IN lowering, both phrasings") {
    val sql = NlToSql.translate(
      "total order price by status where priority is not 1-URGENT or 5-LOW")
    assert(sql.contains("o_orderpriority NOT IN ('1-URGENT', '5-LOW')"), sql)
    val excl = NlToSql.translate("total order price by status excluding priority 1-URGENT")
    assert(excl.contains("o_orderpriority NOT IN ('1-URGENT')"), excl)
    TableRegistry.registerAll(spark, d)
    assert(spark.sql(sql).count() > 0 && spark.sql(excl).count() > 0)
  }

  test("GraphQL variables: defaults fold in, strict binding both ways") {
    import graft.operators.Dialects
    // exemplar: $status takes its declared default, $minPrice/$n provided
    val df = GraphQL.runWithVariables(spark, d,
      Dialects.gqlVariablesQuery, Dialects.gqlVariablesVars)
    val rows = df.collect()
    assert(rows.length === 25)
    assert(rows.forall(_.getDouble(1) > 200000.0))
    // a declared variable with no default must be provided
    assertThrows[IllegalArgumentException](GraphQL.runWithVariables(spark, d,
      Dialects.gqlVariablesQuery, Dialects.gqlVariablesVars - "minPrice"))
    // a provided variable must be declared
    assertThrows[IllegalArgumentException](GraphQL.runWithVariables(spark, d,
      Dialects.gqlVariablesQuery, Dialects.gqlVariablesVars +
        ("typo" -> GraphQL.VInt(1))))
    // an undeclared $reference in the body fails loudly, never plans NULL
    assertThrows[IllegalArgumentException](GraphQL.run(spark, d,
      """{ orders(filter: {o_totalprice: {gt: $nope}}, limit: 1) { o_orderkey } }"""))
  }

  test("NL multi-dimension and numeric-between productions") {
    // both dims on the fact table
    assert(NlToSql.translate("number of orders by status and priority")
      .contains("GROUP BY o_orderstatus, o_orderpriority"))
    // one dim a star-schema hop away routes through the join path
    val twoDim = NlToSql.translate("total order price by market segment and status")
    assert(twoDim.contains("JOIN customer") &&
      twoDim.contains("GROUP BY c_mktsegment, o_orderstatus"))
    // numeric between
    assert(NlToSql.translate(
        "total order price by status where order price is between 150000 and 300000")
      .contains("BETWEEN 150000 AND 300000"))
    // dims on two different non-fact tables still fail loudly
    assertThrows[IllegalArgumentException](
      NlToSql.translate("number of orders by market segment and language"))
  }

  test("GraphQL fragments inline strictly: unknown, cycle, wrong type all fail") {
    // spreads inline at both depths and execute
    val rows = GraphQL.run(spark, d, graft.operators.Dialects.gqlFragmentsQuery).collect()
    assert(rows.nonEmpty &&
      rows.head.schema.fieldNames.toSet ==
        Set("o_orderkey", "o_totalprice", "c_name", "c_mktsegment"))
    // unknown fragment
    assertThrows[IllegalArgumentException](GraphQL.run(spark, d,
      """{ orders(limit: 1) { ...nope } }"""))
    // type condition must match the enclosing table
    assertThrows[IllegalArgumentException](GraphQL.run(spark, d,
      """{ orders(limit: 1) { ...c } } fragment c on customer { c_name }"""))
    // spread cycle
    assertThrows[IllegalArgumentException](GraphQL.run(spark, d,
      """{ orders(limit: 1) { ...a } }
         fragment a on orders { ...b } fragment b on orders { ...a }"""))
    // duplicate fragment names
    assertThrows[IllegalArgumentException](GraphQL.run(spark, d,
      """{ orders(limit: 1) { ...a } }
         fragment a on orders { o_orderkey } fragment a on orders { o_orderkey }"""))
  }

  test("GraphQL aliases rename scalars; relation/_agg aliases fail loudly") {
    val rows = GraphQL.run(spark, d, graft.operators.Dialects.gqlAliasQuery).collect()
    assert(rows.head.schema.fieldNames.toSeq === Seq("id", "price", "name"))
    // alias on a relation
    assertThrows[IllegalArgumentException](GraphQL.run(spark, d,
      """{ orders(limit: 1) { o_orderkey c: customer { c_name } } }"""))
    // alias on an _agg selection
    assertThrows[IllegalArgumentException](GraphQL.run(spark, d,
      """{ orders_agg(groupBy: ["o_orderstatus"]) { o_orderstatus n: count } }"""))
    // aliases compose with fragments (spread inlines an aliased scalar)
    val viaFrag = GraphQL.run(spark, d,
      """{ orders(orderBy: ["k"], limit: 2) { ...f } }
         fragment f on orders { k: o_orderkey }""").collect()
    assert(viaFrag.head.schema.fieldNames.toSeq === Seq("k"))
  }

  test("NL having and min/max productions") {
    val having = NlToSql.translate(
      "total order price by priority having total above 220000000")
    assert(having.contains("HAVING sum(CAST(o_totalprice AS DECIMAL(18,4))) > 220000000"))
    assert(NlToSql.translate("maximum order price by status")
      .contains("max(o_totalprice)"))
    assert(NlToSql.translate("minimum event value by event type")
      .contains("min(value)"))
    // a having filter on a dimension from another table fails loudly
    assertThrows[IllegalArgumentException](
      NlToSql.translate("total order price by language having total above 5"))
  }

  test("NL bottom-k and by-year productions") {
    val bottom = NlToSql.translate("bottom 5 customers by total order price")
    assert(bottom.contains("ORDER BY total ASC NULLS FIRST"))
    assert(bottom.contains("LIMIT 5"))
    val byYear = NlToSql.translate("total order price by year")
    assert(byYear.contains("CAST(year(o_orderdate) AS BIGINT)"))
    assert(byYear.contains("GROUP BY 1"))
    // 'by year' routes through the derived-bucket production, not the
    // catalog-dimension one — an unknown plain dimension still fails
    assertThrows[IllegalArgumentException](
      NlToSql.translate("total order price by month"))
    // bottom-k without a join path fails loudly like top-k does
    assertThrows[IllegalArgumentException](
      NlToSql.translate("bottom 3 widgets by total order price"))
  }

  test("NL per-group top-k production compiles to a rank-window subquery") {
    val sql = NlToSql.translate("top 2 customers by total order price per status")
    assert(sql.contains("row_number() OVER (PARTITION BY o_orderstatus"))
    assert(sql.contains("WHERE rn <= 2"))
    // ranks on the EXACT decimal sum, not the rounded presentation value
    assert(sql.contains("ORDER BY texact DESC, c_custkey"))
    // every status group carries exactly k rows with ranks led by rank 1
    val rows = operators.Dialects.queries("nl_topk_per_group")(spark, d).collect()
    val byStatus = rows.groupBy(_.getString(0))
    assert(byStatus.nonEmpty && byStatus.values.forall(_.length == 2))
    // an off-fact dimension fails loudly
    assertThrows[IllegalArgumentException](
      NlToSql.translate("top 2 customers by total order price per language"))
  }

  test("NL share-of-total production sums to ~10000 bp") {
    val sql = NlToSql.translate("share of orders by priority")
    assert(sql.contains("CROSS JOIN") && sql.contains("10000.0"))
    val rows = operators.Dialects.queries("nl_share_of_total")(spark, d).collect()
    val bp = rows.map(_.getLong(2)).sum
    assert(bp <= 10000 && bp > 10000 - rows.length)
    assertThrows[IllegalArgumentException](
      NlToSql.translate("share of orders by moon phase"))
  }

  test("NL count/share productions validate the entity noun against the table") {
    // "number of parts by market segment" would count CUSTOMER rows and
    // label them parts — must fail loudly, not answer a different question
    assertThrows[IllegalArgumentException](
      NlToSql.translate("number of parts by market segment"))
    assertThrows[IllegalArgumentException](
      NlToSql.translate("share of customers by status"))
    // matching entities still translate
    assert(NlToSql.translate("number of customers by market segment").contains("customer"))
    assert(NlToSql.translate("share of orders by status").contains("orders"))
  }

  test("NL between-dates lowers to a half-open range including the final day") {
    val sql = NlToSql.translate(
      "total event value by event type between 2024-01-01 and 2024-01-15")
    assert(sql.contains(">= TIMESTAMP '2024-01-01 00:00:00'"), sql)
    assert(sql.contains("< TIMESTAMP '2024-01-16 00:00:00'"), sql)
    assert(!sql.contains("BETWEEN"), s"inclusive-BETWEEN drops the final intraday rows: $sql")
  }

  test("GraphQL rejects non-filter args on object relations; supports multi-op ranges") {
    // round 15: FILTER on a many-to-one relation is now supported (Hasura
    // object semantics); orderBy/limit stay loud rejections (an
    // at-most-one-row object has nothing to order or page)
    assertThrows[IllegalArgumentException](GraphQL.run(spark, d,
      """{ orders(limit: 5) { o_orderkey
           customer(orderBy: ["c_name"]) { c_name } } }"""))
    val ranged = GraphQL.run(spark, d,
      """{ orders(filter: {o_totalprice: {gte: 100000, lte: 200000}},
                  orderBy: ["o_orderkey"], limit: 50) { o_orderkey o_totalprice } }""")
      .collect()
    assert(ranged.nonEmpty)
    assert(ranged.forall { r =>
      val p = r.getDouble(1); p >= 100000 && p <= 200000
    })
    // an unquoted t/f-leading bare word must fail, not silently parse false
    assertThrows[IllegalArgumentException](GraphQL.run(spark, d,
      """{ events(filter: {event_type: {eq: follow}}) { event_id } }"""))
  }

  test("TableRegistry loads every fixture table; unknown name errors") {
    TableRegistry.tables.keys.foreach { t =>
      assert(TableRegistry.load(spark, d, t).count() > 0, s"table $t empty")
    }
    assertThrows[IllegalArgumentException](TableRegistry.load(spark, d, "nope"))
  }

  test("rejected catalog mutations leave NO side effect (validate-before-write)") {
    import graft.sources.DatasetRegistry
    // result-field validation fires BEFORE the write: the name must not
    // appear in the registry after the rejection (GqlFuzz pins the
    // rejection itself; THIS pins the absence of a half-applied write)
    assertThrows[IllegalArgumentException](GraphQL.run(spark, d,
      s"""mutation { registerDataset(name: "never_applied",
            path: "$d/region.parquet", format: "parquet") { name owner } }"""))
    assert(DatasetRegistry.list.forall(_.name != "never_applied"),
      "a rejected registerDataset mutated the registry")
    // same for a disallowed format (write-path gate) and a bad name
    assertThrows[IllegalArgumentException](GraphQL.run(spark, d,
      s"""mutation { registerDataset(name: "evil2",
            path: "$d/region.parquet", format: "jdbc") { name } }"""))
    assert(DatasetRegistry.list.forall(_.name != "evil2"))
  }

  test("catalog resolution is plan-transparent: registered name scans like the direct read") {
    import graft.sources.{CatalogStore, DatasetRegistry}
    DatasetRegistry.register(CatalogStore.Entry(
      "plan_regions", s"$d/region.parquet", "parquet"))
    try {
      val viaName = graft.server.Server.handle(spark,
        graft.server.Server.ServeRequest("sql",
          "SELECT r_regionkey, r_name FROM plan_regions", d))
      val plan = viaName.queryExecution.executedPlan.toString
      // one parquet scan of the registered path, no exchange, pruned schema
      assert(plan.contains("region.parquet"), plan)
      assert(!plan.contains("Exchange"), s"registered-name scan shuffled:\n$plan")
      assert(viaName.queryExecution.executedPlan.collectLeaves().size === 1)
      assert(plan.contains("r_regionkey") && !plan.contains("r_comment"),
        s"column pruning lost through the catalog seam:\n$plan")
    } finally DatasetRegistry.unregister("plan_regions")
  }

  // ---- round 14: per-relation arguments on one-to-many subtrees ----

  test("nested one-to-many topk: ≤k ordered child rows per parent; childless parents keep a NULL row") {
    val rows = GraphQL.run(spark, d,
      """{ customer(filter: {c_mktsegment: {eq: "BUILDING"}},
                    orderBy: ["c_custkey", "o_orderkey"]) {
           c_custkey orders(filter: {o_orderstatus: {eq: "O"}},
                            orderBy: ["-o_totalprice", "o_orderkey"], limit: 3) {
             o_orderkey o_totalprice } } }""").collect()
    val byParent = rows.groupBy(_.getLong(0))
    assert(byParent.values.forall(_.length <= 3),
      "a parent carried more than k child rows")
    // the selected rows are the TRUE per-parent top-3 by (price desc,
    // key asc) — recomputed directly from the child table
    val spark2 = spark
    import spark2.implicits._
    val allO = Tables.orders(spark, d).filter($"o_orderstatus" === "O")
      .select($"o_custkey", $"o_orderkey", $"o_totalprice").collect()
      .groupBy(_.getLong(0))
    byParent.foreach { case (ck, g) =>
      val selected = g.filterNot(_.isNullAt(1)).map(_.getLong(1)).toSet
      val expected = allO.getOrElse(ck, Array.empty)
        .sortBy(r => (-r.getDouble(2), r.getLong(1))).take(3)
        .map(_.getLong(1)).toSet
      assert(selected === expected, s"parent $ck: $selected vs $expected")
    }
    // GraphQL empty-list semantics in the flattened frame: a BUILDING
    // customer with no O-status orders still appears, child cols NULL
    val parents = Tables.customer(spark, d)
      .filter($"c_mktsegment" === "BUILDING").count()
    assert(byParent.size.toLong === parents,
      s"expected one group per BUILDING customer ($parents), got ${byParent.size}")
    // force childless parents with a sparse per-relation filter: every
    // customer still appears, the childless ones with NULL child columns
    val sparse = GraphQL.run(spark, d,
      """{ customer(orderBy: ["c_custkey", "o_orderkey"]) {
           c_custkey orders(filter: {o_totalprice: {gt: 400000}},
                            orderBy: ["-o_totalprice", "o_orderkey"], limit: 1) {
             o_orderkey } } }""").collect()
    val allCust = Tables.customer(spark, d).count()
    assert(sparse.exists(_.isNullAt(1)), "childless parents must keep a NULL row")
    assert(sparse.map(_.getLong(0)).distinct.length.toLong === allCust,
      "the LEFT join must keep every parent")
  }

  test("nested one-to-many offset skips the per-parent leader") {
    val rows = GraphQL.run(spark, d,
      """{ nation(orderBy: ["n_nationkey", "c_custkey"]) {
           n_nationkey customer(orderBy: ["-c_acctbal", "c_custkey"],
                                offset: 1, limit: 2) {
             c_custkey c_acctbal } } }""").collect()
    assert(rows.groupBy(_.getAs[Number](0).longValue).values.forall(_.length <= 2))
    // the per-nation rank-1 customer (acctbal desc, custkey tie-break)
    // must NOT appear (offset 1 skips the leader)
    val spark2 = spark
    import spark2.implicits._
    val leaders = Tables.customer(spark, d)
      .select($"c_nationkey", $"c_custkey", $"c_acctbal").collect()
      .groupBy(_.getAs[Number](0).longValue)
      .map { case (nk, g) =>
        nk -> g.sortBy(r => (-r.getDouble(2), r.getLong(1))).head.getLong(1) }
    rows.filterNot(_.isNullAt(1)).foreach { r =>
      assert(r.getLong(1) !== leaders(r.getAs[Number](0).longValue),
        s"offset 1 must skip the per-parent leader: $r")
    }
  }

  test("nested-relation args fail loudly where semantics would silently lie") {
    // limit without orderBy: nondeterministic per-parent selection
    assertThrows[IllegalArgumentException](GraphQL.run(spark, d,
      """{ customer(orderBy: ["c_custkey"]) {
           c_custkey orders(limit: 3) { o_orderkey } } }"""))
    // root limit over a row-multiplying subtree pages flattened rows
    assertThrows[IllegalArgumentException](GraphQL.run(spark, d,
      """{ customer(orderBy: ["c_custkey"], limit: 5) {
           c_custkey orders(orderBy: ["o_orderkey"], limit: 2) { o_orderkey } } }"""))
    // round 15: FILTER on a many-to-one relation now plans (Hasura object
    // semantics — gql_object_filter); row-SELECTION args stay rejected
    // because an object has no row set to select from
    assertThrows[IllegalArgumentException](GraphQL.run(spark, d,
      """{ orders(orderBy: ["o_orderkey"], limit: 5) {
           o_orderkey customer(offset: 1) { c_name } } }"""))
    // unknown argument names on the new surface reject like everywhere
    assertThrows[IllegalArgumentException](GraphQL.run(spark, d,
      """{ customer(orderBy: ["c_custkey"]) {
           c_custkey orders(having: {count: {gt: 1}}) { o_orderkey } } }"""))
  }

  // ---- round 14: NL compositions (verdict items 2–3) ----

  test("NL filter × calendar-year composes; share/ratio dims route the star schema") {
    val sql = NlToSql.translate(
      "total order price by status where priority is 1-URGENT in 1996")
    assert(sql.contains("o_orderpriority = '1-URGENT'") &&
      sql.contains("1996-01-01") && sql.contains("1997-01-01"), sql)
    // share-not with the filter dim one declared hop away (NLFUZZ q208)
    val sn = NlToSql.translate("share of orders where market segment is not BUILDING")
    assert(sn.contains("JOIN customer") && sn.contains("NOT IN ('BUILDING')"), sn)
    // grouped form routes too
    val snb = NlToSql.translate(
      "share of orders where market segment is not BUILDING by status")
    assert(snb.contains("JOIN customer") && snb.contains("GROUP BY o_orderstatus"), snb)
    // ratio group dim two declared hops away (customer→orders→lineitem)
    val rb = NlToSql.translate("ratio of extended price to quantity by market segment")
    assert(rb.contains("JOIN orders") && rb.contains("JOIN customer"), rb)
    // the ONE-TO-MANY hop (round 17): negation across the fan-out edge is
    // universal quantification, lowered as correlated NOT EXISTS inside
    // the aggregate FILTER — the fan-out table is never joined in, so the
    // share's row basis stays the fact table
    val swn = NlToSql.translate("share of orders where return flag is not R by status")
    assert(swn.contains("NOT EXISTS") && swn.contains("l_returnflag = 'R'")
      && !swn.contains("JOIN lineitem"), swn)
    // share-by routed dim: denominator stays the entity table
    val sb = NlToSql.translate("share of orders by market segment")
    assert(sb.contains("FROM orders") && sb.contains("JOIN customer"), sb)
  }
}
