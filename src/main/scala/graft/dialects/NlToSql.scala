package graft.dialects

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.sources.TableRegistry

/** Natural-language dialect front-end (SURVEY.md §2.9, §3.2 EP3): the
  * reference's third declared query language (reference README.md:2).
  *
  * Deterministic grammar/template translator over the fixture catalog — no
  * LLM in-harness (SURVEY.md §2.9: the interface is the seam an LLM
  * translator would plug into; `translate` is referentially transparent so
  * the oracle can replay its output). The generated SQL stays inside the
  * Spark∩DuckDB common dialect: the SQL string itself IS the oracle.
  */
/** Typed ambiguous-dimension rejection (round 17, verdict item 5): an
  * IllegalArgumentException — so every catch-site, fuzzer claim table,
  * and message-text assertion behaves exactly as before — that ALSO
  * carries the ambiguous term and the resolving qualifier phrases as
  * data, letting the serving layer answer with structured JSON
  * (`{"error":…, "ambiguous":…, "candidates":[…]}`) and the console
  * render the choices clickably instead of asking the user to parse
  * prose.
  */
final class AmbiguousDimensionException(
    message: String,
    val ambiguous: String,
    val candidates: Seq[String])
  extends IllegalArgumentException(message)

object NlToSql {

  /** Catalog nouns → relations/columns the grammar understands. */
  private val measures = Map(
    "order price" -> ("orders", "o_totalprice"),
    "quantity" -> ("lineitem", "l_quantity"),
    // second lineitem measure (round 13): gives the ratio production a
    // same-fact measure pair, and every existing production over it
    "extended price" -> ("lineitem", "l_extendedprice"),
    // DERIVED measure (round 16, NLFUZZ q266's family): discounted
    // revenue = extendedprice × (1 − discount). The slot carries a full
    // SQL expression — every production interpolates the measure inside
    // CAST(… AS DECIMAL(18,4)), and the expression computes EXACTLY in
    // decimal in both engines (2dp × 2dp = 4dp, no rounding at the cast),
    // so the sum/avg/ratio disciplines hold unchanged. "profit" stays an
    // unknown measure: it would need a supply-cost column the fixture
    // does not carry.
    "revenue" ->
      ("lineitem",
        "(CAST(l_extendedprice AS DECIMAL(18,4)) * " +
          "(1 - CAST(l_discount AS DECIMAL(18,4))))"),
    "account balance" -> ("customer", "c_acctbal"),
    "event value" -> ("events", "value"))

  private val entities = Map(
    "customers" -> ("customer", "c_custkey", "c_name"),
    "suppliers" -> ("supplier", "s_suppkey", "s_name"),
    "parts" -> ("part", "p_partkey", "p_name"))

  private val dims = Map(
    "status" -> ("orders", "o_orderstatus"),
    "priority" -> ("orders", "o_orderpriority"),
    "market segment" -> ("customer", "c_mktsegment"),
    "nation" -> ("nation", "n_name"),
    // edge-QUALIFIED nation dimensions (round 15, verdict item 3): off a
    // fact that reaches nation via TWO star edges (lineitem → supplier
    // and lineitem → orders → customer), bare "nation" is genuinely
    // ambiguous and keeps rejecting loudly (the rejection now NAMES these
    // qualifiers); "supplier nation" / "customer nation" route the named
    // edge. The pseudo-table keys ("nation@supplier") exist so path
    // coverage can never satisfy a supplier-qualified dimension with a
    // path that reaches nation over the customer edge.
    "supplier nation" -> ("nation@supplier", "n_name"),
    "customer nation" -> ("nation@customer", "n_name"),
    "return flag" -> ("lineitem", "l_returnflag"),
    "language" -> ("documents", "lang"),
    "event type" -> ("events", "event_type"))

  /** The fact table's fk for each entity — distinct-count productions
    * count the fk directly (fk values ARE the entity's pk), so no join.
    */
  private val entityFk = Map(
    "customers" -> ("orders", "o_custkey"),
    "suppliers" -> ("lineitem", "l_suppkey"),
    "parts" -> ("lineitem", "l_partkey"))

  /** One declared many-to-one join path from a dimension/entity-table key
    * to a fact. `covers` is the EXPLICIT set of dim-table keys the path
    * serves (round-15 ADVICE: membership used to be inferred by
    * string-matching "JOIN <table> " inside the SQL — exact then, but it
    * would silently break the moment a path string changed formatting or
    * one table name became a prefix of another). Keys are dim-table
    * identifiers exactly as `dims` declares them, INCLUDING the qualified
    * pseudo-tables ("nation@supplier"), so an edge-qualified dimension can
    * never be satisfied by a path that reaches the same physical table
    * over the other edge. Every covers set contains the fact itself.
    * `tables` is the set of PHYSICAL tables the SQL joins (fact included)
    * — the mechanical-merge guard: two paths whose table sets overlap
    * beyond the fact cannot be concatenated (the same table would appear
    * twice unaliased — "by supplier nation where customer nation is X"
    * joins nation over both edges and must reject, not emit broken SQL).
    */
  private final case class Path(covers: Set[String], tables: Set[String],
                                sql: String)

  /** How a dimension/entity table reaches a measure's fact table. Every
    * edge here is many-to-one pk=fk (each fact row joins at most one dim
    * row), which is the invariant that lets group AND filter dims route
    * through these paths without changing the aggregation's row basis.
    * The REVERSE direction (orders → lineitem) is one-to-many and is
    * deliberately absent: routing a filter through it would silently
    * change the row basis (and the question's meaning) — those questions
    * keep rejecting loudly. All hops are pk=fk inner joins against dims a
    * real deployment broadcasts; the translated SQL leaves strategy to
    * Catalyst, which plans them as broadcast hash joins under the scan.
    */
  private val joinPath: Map[(String, String), Path] = {
    val nationViaCustomerToOrders = Path(
      Set("orders", "customer", "nation", "nation@customer"),
      Set("orders", "customer", "nation"),
      "orders JOIN customer ON o_custkey = c_custkey " +
        "JOIN nation ON c_nationkey = n_nationkey")
    Map(
      ("customer", "orders") -> Path(Set("orders", "customer"),
        Set("orders", "customer"),
        "orders JOIN customer ON o_custkey = c_custkey"),
      ("supplier", "lineitem") -> Path(Set("lineitem", "supplier"),
        Set("lineitem", "supplier"),
        "lineitem JOIN supplier ON l_suppkey = s_suppkey"),
      ("part", "lineitem") -> Path(Set("lineitem", "part"),
        Set("lineitem", "part"),
        "lineitem JOIN part ON l_partkey = p_partkey"),
      // two-hop star path: nation reaches orders THROUGH customer
      // ("revenue by nation") — off orders the customer edge is the ONLY
      // declared one, so bare "nation" stays unambiguous here and the
      // explicit "customer nation" qualifier resolves to the same path
      ("nation", "orders") -> nationViaCustomerToOrders,
      ("nation@customer", "orders") -> nationViaCustomerToOrders,
      // two-hop: customer reaches lineitem through orders ("ratio of
      // extended price to quantity by market segment", round 14)
      ("customer", "lineitem") -> Path(Set("lineitem", "orders", "customer"),
        Set("lineitem", "orders", "customer"),
        "lineitem JOIN orders ON l_orderkey = o_orderkey " +
          "JOIN customer ON o_custkey = c_custkey"),
      // one-hop: orders attributes reachable FROM lineitem ("number of
      // unique suppliers by return flag where status is F", round 14)
      ("orders", "lineitem") -> Path(Set("lineitem", "orders"),
        Set("lineitem", "orders"),
        "lineitem JOIN orders ON l_orderkey = o_orderkey"),
      // the two EDGE-QUALIFIED nation paths off lineitem (round 15):
      // bare ("nation", "lineitem") is deliberately absent — lineitem
      // reaches nation via BOTH edges, and guessing would silently pick a
      // semantics (the supplier's nation vs the buyer's); the qualified
      // pseudo-tables carry the user's explicit choice. Note each covers
      // set names its OWN pseudo-key only: a supplier-qualified filter
      // can never ride the customer-edge path.
      ("nation@supplier", "lineitem") -> Path(
        Set("lineitem", "supplier", "nation@supplier"),
        Set("lineitem", "supplier", "nation"),
        "lineitem JOIN supplier ON l_suppkey = s_suppkey " +
          "JOIN nation ON s_nationkey = n_nationkey"),
      ("nation@customer", "lineitem") -> Path(
        Set("lineitem", "orders", "customer", "nation@customer"),
        Set("lineitem", "orders", "customer", "nation"),
        "lineitem JOIN orders ON l_orderkey = o_orderkey " +
          "JOIN customer ON o_custkey = c_custkey " +
          "JOIN nation ON c_nationkey = n_nationkey"))
  }

  /** ALIASED variants of the edge-qualified paths, for the TWIN case
    * (round 16, verdict item 2 — NLFUZZ q168 "total quantity by supplier
    * nation and customer nation"): both qualified edges meet the same
    * physical nation table, so the mechanical merge must alias it
    * (`nation n_sup` / `nation n_cust` — the q_volume_shipping SQL shape)
    * instead of rejecting. Keyed by (pseudo-table, fact); each entry is
    * the JOIN-clause tail (fact excluded) with the terminal nation
    * aliased, plus the alias the dim column must be qualified with. The
    * merge guard stays mechanical: the two entries' INTERMEDIATE tables
    * (supplier vs orders+customer) are disjoint, so concatenating the
    * tails under one fact preserves the many-to-one row basis, and the
    * aliases keep the twice-joined nation unambiguous. Bare "nation"
    * stays rejected (ambiguousPath) — only the user's explicit qualifiers
    * reach this table.
    */
  private val aliasedQualified: Map[(String, String), (String, String)] = Map(
    ("nation@supplier", "lineitem") -> (
      ("JOIN supplier ON l_suppkey = s_suppkey " +
        "JOIN nation n_sup ON s_nationkey = n_sup.n_nationkey", "n_sup")),
    ("nation@customer", "lineitem") -> (
      ("JOIN orders ON l_orderkey = o_orderkey " +
        "JOIN customer ON o_custkey = c_custkey " +
        "JOIN nation n_cust ON c_nationkey = n_cust.n_nationkey", "n_cust")))

  /** Dimension/fact pairs that are reachable but AMBIGUOUS — the
    * rejection text must NAME the qualifiers that resolve it (round 15:
    * NLFUZZ q169's principled rejection, upgraded from unhelpful to
    * actionable).
    */
  private val ambiguousPath: Map[(String, String), String] = Map(
    ("nation", "lineitem") ->
      ("dimension 'nation' reaches lineitem via BOTH supplier and " +
        "orders→customer — qualify it: 'supplier nation' or 'customer nation'"))

  /** The machine-readable half of [[ambiguousPath]] (round 17, verdict
    * item 5): the ambiguous TERM as the user typed it plus the resolving
    * qualifier phrases, carried on the typed rejection so the serving
    * layer can emit `{"error":…, "ambiguous":…, "candidates":[…]}` and
    * the console can render the choices clickably instead of making the
    * user parse prose. Keyed identically to ambiguousPath; a key present
    * in one and not the other is a bug the rejection helper throws on.
    */
  private val ambiguousCandidates: Map[(String, String), (String, Seq[String])] =
    Map(("nation", "lineitem") ->
      (("nation", Seq("supplier nation", "customer nation"))))

  /** Reject a (dim table, fact) pair with the typed ambiguity error when
    * one exists — still an IllegalArgumentException, so every existing
    * rejection path (fuzzer claim tables, serving error mapping, specs
    * asserting message text) is unchanged; the structured fields ride
    * along for the layers that want them.
    */
  private def rejectPath(dimTable: String, fact: String,
                         fallback: => String): Nothing =
    ambiguousPath.get((dimTable, fact)) match {
      case Some(msg) =>
        val (term, cands) = ambiguousCandidates((dimTable, fact))
        throw new AmbiguousDimensionException(msg, term, cands)
      case None => throw new IllegalArgumentException(fallback)
    }

  /** Declared one-to-MANY edges, usable ONLY through an EXISTS lowering
    * (round 16, NLFUZZ q201): (manyTable, fact) → the correlated
    * subquery head joining the many side back to the fact row. Kept
    * separate from joinPath on purpose — sum/avg/count(*) productions
    * must never route a dim through a fan-out edge (it changes their row
    * basis), and keeping the edge out of the many-to-one map makes that
    * impossible rather than merely unlikely. Only the basis-insensitive
    * distinct-count production consults this map.
    */
  private val fanoutExists: Map[(String, String), String] = Map(
    ("lineitem", "orders") ->
      "SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey")

  /** The canonical event-time column of each fact table (date-range
    * productions).
    */
  private val dateCols = Map(
    "orders" -> "o_orderdate",
    "lineitem" -> "l_shipdate",
    "events" -> "ts")

  /** Fixture-contract "now" per fact table — the EXCLUSIVE upper bound of
    * each fact's event-time domain (day after its max date; verified
    * identical across sf0.001/0.01/0.1, FIXTURES.md date domains).
    * Relative-time productions ("in the last N days") anchor here so the
    * translation is referentially transparent — the SQL string is still
    * the oracle, with no runtime max() subquery whose value the plan
    * can't see. A fact without a declared anchor fails loudly (the
    * unknown-anchor discipline: no silent "now = wall clock" guessing —
    * wall-clock now against a 2001-dated fixture would silently return
    * empty).
    */
  private val nowAnchor = Map(
    "events" -> "2024-01-31",
    "orders" -> "2001-08-02",
    "lineitem" -> "2001-11-05")

  // (?i) case-insensitive keywords; captured VALUES keep their case (column
  // values like status 'F' are case-sensitive), noun captures are
  // lowercased before catalog lookup
  // generic over ANY resolvable table — fixture or dynamically
  // registered dataset (round 13: the NL leg of the karna-db surface;
  // validation defers to TableRegistry.allNames at translate time)
  private val RowCount = """(?i)how many rows (?:are )?in (\w+)\s*\??""".r
  // round 15 (verdict item 6): COLUMN-level generic productions over
  // dynamically REGISTERED datasets — the registry's schema cache (filled
  // by the register-time loadability probe) resolves column names and
  // types at translate time, so a registered CSV/parquet is first-class
  // in the NL dialect beyond bare row counts. Round 16: FIXTURE tables
  // resolve here too, against the declared fixtureSchemas contract — the
  // catalog-noun grammar and the raw-column grammar are both first-class.
  private val RegCountWhere =
    """(?i)how many rows (?:are )?in (\w+) where (\w+) is ([\w-]+)\s*\??""".r
  private val RegTopK = """(?i)top (\d+) rows of (\w+) by (\w+)""".r
  // grouped count over a registered dataset ("number of rows in X by
  // COL") — cannot collide with CountBy: its entity capture is the
  // literal word "rows" followed by " in <table>", which CountBy's
  // `<entity> by <dim>` shape cannot span
  private val RegCountBy =
    """(?i)(?:number|count) of rows in (\w+) by (\w+)""".r
  // round 16 (verdict item 3): AGGREGATES over registered datasets —
  // "total <col> in X [by <col>]" / "average <col> in X by <col>". The
  // measure column resolves (and type-checks: numeric only, loud reject
  // otherwise) against the registry's cached schema like the other
  // column-level productions. Cannot collide with the catalog-noun
  // grammar: these require " in <table>" directly after a SINGLE-word
  // column, which the fixture measures' multi-word phrases never produce,
  // and table names with digits/underscores are outside the fixture
  // productions' [a-z ] captures anyway.
  private val RegTotalBy =
    """(?i)total (\w+) in (\w+)(?: by (\w+))?""".r
  private val RegAvgBy =
    """(?i)average (\w+) in (\w+) by (\w+)""".r
  // round 16 continuation: grouped extremes over any resolvable table's
  // raw column ("maximum o_totalprice in orders by o_orderstatus") —
  // numeric-gated like the other column-level aggregates. Cannot shadow
  // the catalog-noun MinMaxBy: that production's [a-z ] captures cannot
  // span an underscored column name or the " in <table>" clause.
  private val RegMinMaxBy =
    """(?i)(minimum|maximum) (\w+) in (\w+) by (\w+)""".r
  // exact distinct count over a raw column ("number of distinct l_suppkey
  // in lineitem [by l_returnflag]") — any type counts (strings included;
  // NULLs not counted, both engines agree). Cannot shadow the catalog-noun
  // DistinctCountBy: that production has no " in <table>" clause and its
  // entity capture never carries underscores.
  private val RegDistinctBy =
    """(?i)(?:number|count) of (?:unique|distinct) (\w+) in (\w+)(?: by (\w+))?""".r
  // round 16: equality-FILTERED total over a registered dataset ("total
  // value in X where event_type is click") — the RegCountWhere filter
  // typing (numeric columns take a bare literal, string columns a quoted
  // one) composed with the RegTotalBy measure discipline. Cannot collide
  // with RegTotalBy: Scala regex cases are FULL matches, so the trailing
  // where-clause keeps this out of its optional-by capture.
  private val RegTotalWhere =
    """(?i)total (\w+) in (\w+) where (\w+) is ([\w-]+)\s*\??""".r
  private val TopN = """(?i)top (\d+) (\w+) by total ([a-z ]+)""".r
  private val BottomN = """(?i)bottom (\d+) (\w+) by total ([a-z ]+)""".r
  private val TotalByYearDim = """(?i)total ([a-z ]+) by year""".r
  private val TopNWhere =
    """(?i)top (\d+) (\w+) by total ([a-z ]+) where ([a-z ]+) is ([\w-]+)""".r
  private val TopNPerDim =
    """(?i)top (\d+) (\w+) by total ([a-z ]+) per ([a-z ]+)""".r
  // per-group leaderboard over a calendar window — TopNPerDim COMPOSED
  // with the inclusive date range ("top 2 customers by total order price
  // per status between 1995-01-01 and 1996-06-30"): the grouped ranking
  // ask time-boxed the way analysts actually phrase it. Matched before
  // TopNPerDim (whose dim capture [a-z ]+ has no digits, so it cannot
  // full-match a ranged question — this arm exists to make the
  // composition producible, not to disambiguate) and before
  // TopNDateRange (whose greedy measure capture would swallow
  // " per status" and fail the catalog lookup loudly).
  private val TopNPerDimDateRange =
    """(?i)top (\d+) (\w+) by total ([a-z ]+) per ([a-z ]+) between (\d{4}-\d{2}-\d{2}) and (\d{4}-\d{2}-\d{2})""".r
  // leaderboard over a calendar window — the TopN production COMPOSED
  // with the inclusive date range ("top 3 customers by total order price
  // between 1995-01-01 and 1996-06-30"): the analyst's most common
  // time-boxed ranking ask. No shadowing risk with TopN: its measure
  // class [a-z ] excludes digits, so TopN cannot full-match a question
  // with a range tail.
  private val TopNDateRange =
    """(?i)top (\d+) (\w+) by total ([a-z ]+) between (\d{4}-\d{2}-\d{2}) and (\d{4}-\d{2}-\d{2})""".r
  private val TotalByDateRange =
    """(?i)total ([a-z ]+) by ([a-z ]+) between (\d{4}-\d{2}-\d{2}) and (\d{4}-\d{2}-\d{2})""".r
  // equality filter COMPOSED with a calendar range — the two productions
  // users chain most ("...where priority is 1-URGENT between 1995-01-01
  // and 1996-06-30"); round-8 verdict flagged the composition as
  // unproducible even though each half existed
  private val TotalByWhereDateRange =
    """(?i)total ([a-z ]+) by ([a-z ]+) where ([a-z ]+) is ([\w-]+) between (\d{4}-\d{2}-\d{2}) and (\d{4}-\d{2}-\d{2})""".r
  private val CountBy = """(?i)(?:number|count) of (\w+) by ([a-z ]+?)""".r
  private val DistinctCountBy =
    """(?i)(?:number|count) of (?:unique|distinct) (\w+) by ([a-z ]+)""".r
  private val CountByWhere =
    """(?i)(?:number|count) of (\w+) by ([a-z ]+) where ([a-z ]+) is ([\w-]+)""".r
  private val TotalByWhere =
    """(?i)total ([a-z ]+) by ([a-z ]+) where ([a-z ]+) is ([\w-]+)""".r
  private val TotalByWhereOr =
    """(?i)total ([a-z ]+) by ([a-z ]+) where ([a-z ]+) is ([\w-]+) or ([\w-]+)""".r
  private val TotalByMonthIn =
    """(?i)total ([a-z ]+) by month in (\d{4})""".r
  private val TotalByCompare =
    """(?i)total ([a-z ]+) by ([a-z ]+) where ([a-z ]+) is (above|below) (\d+)""".r
  private val TotalByNumRange =
    """(?i)total ([a-z ]+) by ([a-z ]+) where ([a-z ]+) is between (\d+(?:\.\d+)?) and (\d+(?:\.\d+)?)""".r
  private val TotalByTwoDims =
    """(?i)total ([a-z ]+) by ([a-z ]+) and ([a-z ]+)""".r
  private val CountByTwoDims =
    """(?i)(?:number|count) of (\w+) by ([a-z ]+) and ([a-z ]+)""".r
  private val AvgBy = """(?i)average ([a-z ]+) by ([a-z ]+)""".r
  private val AvgByWhere =
    """(?i)average ([a-z ]+) by ([a-z ]+) where ([a-z ]+) is ([\w-]+)""".r
  // ---- round-11 compositions: the NL matrix fuzzer (graft.NlFuzz)
  // enumerated every production × modifier cross and these seven were
  // REJECTED while being natural analyst asks — each is its base
  // production composed with the calendar-range / equality-filter
  // modifier that already existed elsewhere. All are matched before
  // their shorter siblings in translate() so greedy captures cannot
  // shadow them into loud-but-needless failures.
  private val AvgByDateRange =
    """(?i)average ([a-z ]+) by ([a-z ]+) between (\d{4}-\d{2}-\d{2}) and (\d{4}-\d{2}-\d{2})""".r
  private val MinMaxByDateRange =
    """(?i)(minimum|maximum) ([a-z ]+) by ([a-z ]+) between (\d{4}-\d{2}-\d{2}) and (\d{4}-\d{2}-\d{2})""".r
  private val CountByDateRange =
    """(?i)(?:number|count) of (\w+) by ([a-z ]+) between (\d{4}-\d{2}-\d{2}) and (\d{4}-\d{2}-\d{2})""".r
  private val DistinctCountByWhere =
    """(?i)(?:number|count) of (?:unique|distinct) (\w+) by ([a-z ]+) where ([a-z ]+) is ([\w-]+)""".r
  private val TopNWhereDateRange =
    """(?i)top (\d+) (\w+) by total ([a-z ]+) where ([a-z ]+) is ([\w-]+) between (\d{4}-\d{2}-\d{2}) and (\d{4}-\d{2}-\d{2})""".r
  private val TopNPerDimWhere =
    """(?i)top (\d+) (\w+) by total ([a-z ]+) per ([a-z ]+) where ([a-z ]+) is ([\w-]+)""".r
  private val BottomNDateRange =
    """(?i)bottom (\d+) (\w+) by total ([a-z ]+) between (\d{4}-\d{2}-\d{2}) and (\d{4}-\d{2}-\d{2})""".r
  private val TotalBy = """(?i)total ([a-z ]+) by ([a-z ]+)""".r
  private val TotalByYear =
    """(?i)total ([a-z ]+) by ([a-z ]+) in (\d{4})""".r
  // equality filter COMPOSED with a calendar year (round 14, verdict item
  // 2 — 7 of NLFUZZ's 20 rejections were exactly this shape): both halves
  // existed (TotalByWhere, TotalByYear); the composition did not. Matched
  // before TotalByYear, whose digit-free dimension capture cannot span a
  // hyphen-or-digit value anyway but CAN swallow an all-letter one
  // ("where status is F in 1996") and fail the catalog lookup loudly —
  // this arm exists to make the composition producible.
  private val TotalByWhereYear =
    """(?i)total ([a-z ]+) by ([a-z ]+) where ([a-z ]+) is ([\w-]+) in (\d{4})""".r
  private val TotalByHaving =
    """(?i)total ([a-z ]+) by ([a-z ]+) having total (above|below) (\d+(?:\.\d+)?)""".r
  private val TotalByLastDays =
    """(?i)total ([a-z ]+) by ([a-z ]+) in the last (\d+) days""".r
  private val TotalByWhereNot =
    """(?i)total ([a-z ]+) by ([a-z ]+) (?:where ([a-z ]+) is not|excluding ([a-z ]+)) ([\w-]+)(?: or ([\w-]+))?""".r
  private val MinMaxBy = """(?i)(minimum|maximum) ([a-z ]+) by ([a-z ]+)""".r
  private val ShareBy = """(?i)share of (\w+) by ([a-z ]+)""".r
  // round 13 (verdict item 6): compositional negation + ratio — the two
  // analyst questions the grammar still rejected. Grouped-negated-share
  // before scalar (prefix collision).
  private val ShareNotBy =
    """(?i)share of (\w+) where ([a-z ]+) is not ([\w-]+) by ([a-z ]+)""".r
  private val ShareNot =
    """(?i)share of (\w+) where ([a-z ]+) is not ([\w-]+)""".r
  private val RatioBy =
    """(?i)ratio of ([a-z ]+?) to ([a-z ]+?) by ([a-z ]+)""".r
  private val Superlative =
    """(?i)which (\w+) had the (highest|lowest) total ([a-z ]+?)(?: in (\d{4}))?""".r

  private def dim(name: String): (String, String) =
    dims.getOrElse(name.trim.toLowerCase,
      throw new IllegalArgumentException(s"unknown dimension: $name"))

  /** Exact HALF-UP 4-dp average in the Spark∩DuckDB COMMON dialect —
    * the NL translation's SQL string is its own oracle, so it cannot use
    * engine-specific integer division (`div` vs `//`). round() on a
    * DOUBLE quotient is engine-divergent at exact 4-dp half-points
    * (Tables.avg4 — the round-11 unicode-variant finding), so the
    * half-up round is computed in scaled-integer space with operators
    * BOTH dialects share: `%` (identical for non-negative operands) and
    * float `/` of an exact multiple (exact while |v| < 2⁵³ — the outDec
    * scale caveat; fixture sums sit orders of magnitude below).
    */
  private def avgExactSql(mcol: String): String = {
    val v = s"(2 * CAST(sum(CAST($mcol AS DECIMAL(18,4))) * 10000 AS BIGINT) + count(*))"
    val den = "(2 * count(*))"
    s"CAST(($v - $v % $den) / $den AS DOUBLE) / 10000.0"
  }

  private def sqlLit(v: String): String = "'" + v.replace("'", "''") + "'"

  /** NL question → SQL in the Spark∩DuckDB common dialect.
    * Unrecognized input fails loudly (no silent guessing).
    */
  /** The captured entity noun must BE the table the counted rows live on
    * (plural or singular): "number of parts by market segment" must fail
    * loudly rather than count CUSTOMER rows and label them parts — entity
    * counting is DistinctCountBy's job ("number of unique X by ...").
    */
  private def requireEntityOn(entity: String, table: String): Unit = {
    val e = entity.trim.toLowerCase
    require(e.stripSuffix("s") == table.stripSuffix("s"),
      s"entity '$entity' is not the $table table these rows come from " +
        s"(row counts take the dimension's own table; for entity counts " +
        s"ask 'number of unique $entity by ...')")
  }

  /** The ROW-BASIS table a counted noun names ("orders" → orders,
    * "customers" → customer) — the share productions' denominator table.
    * Singular/plural tolerant like [[requireEntityOn]]; unknown nouns
    * fail loudly (round 14: share/ratio dims may now sit one declared
    * star hop OFF this table, so the noun must resolve independently of
    * the dimension's table).
    */
  private def entityTable(entity: String): String = {
    val e = entity.trim.toLowerCase.stripSuffix("s")
    TableRegistry.tables.keySet.find(_.stripSuffix("s") == e).getOrElse(
      throw new IllegalArgumentException(s"unknown entity table: $entity"))
  }

  /** Resolve (table, column) against a resolvable table's schema — the
    * column-level productions' shared front door. REGISTERED datasets
    * resolve against the registry's cached schema (filled by the
    * register-time loadability probe); FIXTURE tables (round 16) against
    * the DECLARED fixture contract ([[TableRegistry.fixtureSchemas]] —
    * static, so `translate` stays referentially transparent), which makes
    * raw-column questions ("how many rows in nation where n_name is
    * GERMANY", "total o_totalprice in orders by o_orderstatus") first-class
    * alongside the catalog-noun grammar. Unknown tables and unknown
    * columns reject loudly, the last with the real column list.
    */
  private def regColumn(table: String, column: String):
      (String, org.apache.spark.sql.types.StructField,
       org.apache.spark.sql.types.StructType) = {
    val t = table.toLowerCase
    // round-16 ADVICE: "count of unique parts in 1996" is a YEAR phrasing
    // that the \w+ table capture swallows — point at the catalog grammar
    // instead of the baffling "unknown table: 1996"
    require(!t.matches("\\d+"),
      s"'$table' looks like a year, not a table — the raw-column grammar " +
        "is '<verb> <column> in <table>'; for calendar windows use the " +
        "catalog phrasing, e.g. 'between 1996-01-01 and 1996-12-31'")
    require(TableRegistry.allNames(t), s"unknown table: $table")
    val schema = TableRegistry.cachedSchema(t)
      .orElse(TableRegistry.fixtureSchemas.get(t)).getOrElse(
        throw new IllegalArgumentException(
          // round-15 ADVICE: a replayed registration whose warm-up probe
          // failed must not masquerade as an unknown-table rejection
          s"dataset '$t' is registered but its schema is not loaded yet " +
            "(its path may be unreadable; run any SQL query against it " +
            "or re-register to load the schema)"))
    val f = schema.fields.find(_.name.equalsIgnoreCase(column)).getOrElse(
      throw new IllegalArgumentException(
        s"table '$t' has no column '$column' " +
          s"(columns: ${schema.fieldNames.mkString(", ")})"))
    (t, f, schema)
  }

  /** The column-level aggregates' shared numeric gate: 'total'/'average'/
    * 'minimum'/'maximum' need a numeric measure; the rejection names the
    * real type and the asking verb.
    */
  private def requireNumeric(f: org.apache.spark.sql.types.StructField,
                             verb: String): Unit =
    require(f.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"column '${f.name}' is ${f.dataType.simpleString} — '$verb' needs a " +
        "numeric column")

  def translate(question: String): String = question.trim match {
    case RegCountWhere(table, column, value) =>
      // equality-filtered row count over a registered dataset; the
      // literal is typed from the cached schema (numeric columns take a
      // bare literal — and reject a non-numeric value loudly — string
      // columns a quoted one), so the predicate is scan-pushable in both
      // engines
      val (t, f, _) = regColumn(table, column)
      val lit = f.dataType match {
        case _: org.apache.spark.sql.types.NumericType =>
          require(value.matches("-?\\d+(\\.\\d+)?"),
            s"column '${f.name}' is ${f.dataType.simpleString}; '$value' is not numeric")
          value
        case _ => sqlLit(value)
      }
      s"SELECT count(*) AS n_rows FROM $t WHERE ${f.name} = $lit"
    case RegCountBy(table, column) =>
      // grouped row count over a registered dataset — the groupBy column
      // resolves against the cached schema like the other column-level
      // productions; plain partial-aggregated count, scan stays pruned to
      // the one column
      val (t, f, _) = regColumn(table, column)
      s"""SELECT ${f.name}, count(*) AS cnt FROM $t
         GROUP BY ${f.name} ORDER BY ${f.name} NULLS FIRST"""
    case RegTotalWhere(column, table, fcol, value) =>
      // most-specific first: the where-clause form outranks RegTotalBy.
      // Measure: numeric-only, exact-decimal discipline (its own oracle);
      // filter: typed from the cached schema so the predicate is
      // scan-pushable in both engines
      val (t, f, _) = regColumn(table, column)
      requireNumeric(f, "total")
      val (_, ff, _) = regColumn(table, fcol)
      val flit = ff.dataType match {
        case _: org.apache.spark.sql.types.NumericType =>
          require(value.matches("-?\\d+(\\.\\d+)?"),
            s"column '${ff.name}' is ${ff.dataType.simpleString}; '$value' is not numeric")
          value
        case _ => sqlLit(value)
      }
      s"""SELECT CAST(round(sum(CAST(${f.name} AS DECIMAL(18,4))), 4) AS DOUBLE) AS total
         FROM $t WHERE ${ff.name} = $flit"""
    case RegTotalBy(column, table, group) =>
      // money-disciplined sum over a registered dataset's NUMERIC column
      // (round 16): exact DECIMAL(18,4) accumulation, rounded once, cast
      // DOUBLE — order- and parallelism-independent, so the SQL is its
      // own oracle. Non-numeric measures reject loudly with the real
      // type; the optional group column resolves against the same cached
      // schema. Plain partial-aggregated sum; the scan stays pruned to
      // the one or two referenced columns.
      val (t, f, _) = regColumn(table, column)
      requireNumeric(f, "total")
      val total =
        s"CAST(round(sum(CAST(${f.name} AS DECIMAL(18,4))), 4) AS DOUBLE) AS total"
      if (group == null) s"SELECT $total FROM $t"
      else {
        val (_, g, _) = regColumn(table, group)
        s"""SELECT ${g.name}, $total FROM $t
           GROUP BY ${g.name} ORDER BY ${g.name} NULLS FIRST"""
      }
    case RegAvgBy(column, table, group) =>
      // grouped mean over a registered dataset — the avgExactSql half-up
      // discipline (exact scaled-integer rounding in the Spark∩DuckDB
      // common dialect), same numeric type gate as RegTotalBy
      val (t, f, _) = regColumn(table, column)
      requireNumeric(f, "average")
      val (_, g, _) = regColumn(table, group)
      s"""SELECT ${g.name}, ${avgExactSql(f.name)} AS avg_val FROM $t
         GROUP BY ${g.name} ORDER BY ${g.name} NULLS FIRST"""
    case RegDistinctBy(column, table, group) =>
      // exact distinct count over a raw column — Catalyst expands it to
      // the two-phase partial-dedup aggregate (shuffle carries distinct
      // (group, value) pairs, never a per-group set on one reducer);
      // CAST to BIGINT unifies both engines' count types
      val (t, f, _) = regColumn(table, column)
      if (group == null)
        s"SELECT CAST(count(DISTINCT ${f.name}) AS BIGINT) AS n_distinct FROM $t"
      else {
        val (_, g, _) = regColumn(table, group)
        s"""SELECT ${g.name}, CAST(count(DISTINCT ${f.name}) AS BIGINT) AS n_distinct
           FROM $t GROUP BY ${g.name} ORDER BY ${g.name} NULLS FIRST"""
      }
    case RegMinMaxBy(which, column, table, group) =>
      // grouped extremes over a raw column — min/max are order- and
      // parallelism-independent, so the raw column value is exact in both
      // engines; numeric-gated like the other column-level aggregates
      val (t, f, _) = regColumn(table, column)
      requireNumeric(f, which.toLowerCase)
      val (_, g, _) = regColumn(table, group)
      val fn = if (which.toLowerCase == "maximum") "max" else "min"
      s"""SELECT ${g.name}, $fn(${f.name}) AS extreme FROM $t
         GROUP BY ${g.name} ORDER BY ${g.name} NULLS FIRST"""
    case RegTopK(n, table, column) =>
      // project-top-k over a registered dataset: all columns, ranked by
      // the named one. Deterministic by construction: the remaining
      // columns tie-break in schema order (fully identical rows are
      // interchangeable — hash-equal either way). Both engines' null
      // placement is explicit. The plan is TakeOrderedAndProject — the
      // k rows never materialize a global sort.
      val (t, f, schema) = regColumn(table, column)
      val ties = schema.fieldNames.filterNot(_ == f.name)
        .map(c => s", $c NULLS FIRST").mkString
      s"SELECT * FROM $t ORDER BY ${f.name} DESC NULLS LAST$ties LIMIT $n"
    case RowCount(table) =>
      // works for dynamically registered datasets too: the check is
      // against the LIVE registry (fixtures + POST /datasets state), the
      // same allowlist NlGate enforces downstream
      val t = table.toLowerCase
      require(graft.sources.TableRegistry.allNames(t),
        s"unknown table: $table")
      s"SELECT count(*) AS n_rows FROM $t"
    // ---- round-11 fuzzer-found compositions, most-specific first ----
    case AvgByDateRange(measure, d, from, to) =>
      val (fact, mcol) = measures.getOrElse(measure.trim.toLowerCase,
        throw new IllegalArgumentException(s"unknown measure: $measure"))
      val (table, dcol) = dim(d)
      val dateCol = dateCols.getOrElse(fact,
        throw new IllegalArgumentException(s"no date column for $fact"))
      val toExcl = java.time.LocalDate.parse(to).plusDays(1)
      s"""SELECT $dcol,
         ${avgExactSql(mcol)} AS avg_val
         FROM ${factFrom(table, fact)}
         WHERE $dateCol >= TIMESTAMP '$from 00:00:00'
           AND $dateCol < TIMESTAMP '$toExcl 00:00:00'
         GROUP BY $dcol ORDER BY $dcol NULLS FIRST"""
    case MinMaxByDateRange(which, measure, d, from, to) =>
      val (fact, mcol) = measures.getOrElse(measure.trim.toLowerCase,
        throw new IllegalArgumentException(s"unknown measure: $measure"))
      val (table, dcol) = dim(d)
      val dateCol = dateCols.getOrElse(fact,
        throw new IllegalArgumentException(s"no date column for $fact"))
      val toExcl = java.time.LocalDate.parse(to).plusDays(1)
      val fn = if (which.toLowerCase == "maximum") "max" else "min"
      // CAST … AS DOUBLE: a no-op for the DOUBLE fixture columns, and the
      // type normalizer for the derived decimal-expression measure
      // (Spark and DuckDB widen decimal products to different precisions;
      // the values are exact 4dp either way, so the double is identical)
      s"""SELECT $dcol, CAST($fn($mcol) AS DOUBLE) AS extreme
         FROM ${factFrom(table, fact)}
         WHERE $dateCol >= TIMESTAMP '$from 00:00:00'
           AND $dateCol < TIMESTAMP '$toExcl 00:00:00'
         GROUP BY $dcol ORDER BY $dcol NULLS FIRST"""
    case CountByDateRange(entity, d, from, to) =>
      val (table, dcol) = dim(d)
      requireEntityOn(entity, table)
      val dateCol = dateCols.getOrElse(table,
        throw new IllegalArgumentException(s"no date column for $table"))
      val toExcl = java.time.LocalDate.parse(to).plusDays(1)
      s"""SELECT $dcol, count(*) AS cnt FROM $table
         WHERE $dateCol >= TIMESTAMP '$from 00:00:00'
           AND $dateCol < TIMESTAMP '$toExcl 00:00:00'
         GROUP BY $dcol ORDER BY $dcol NULLS FIRST"""
    case DistinctCountByWhere(entity, dname, fdim, value) =>
      val (fact, fk) = entityFk.getOrElse(entity.toLowerCase,
        throw new IllegalArgumentException(s"unknown entity: $entity"))
      val (dt, dcol) = dim(dname)
      require(dt == fact, s"dimension $dname not on $fact")
      // the FILTER dim may live one (or two) declared many-to-one star
      // hops off the fact ("… suppliers by return flag where STATUS is
      // F": status is orders', the fk fact is lineitem) — factFrom
      // resolves the declared path or fails loudly. DISTINCT counting is
      // basis-insensitive, and every joinPath edge is many-to-one, so
      // the routed join can neither duplicate nor drop counted keys.
      val (ft, fcol) = dim(fdim)
      if (pathOf(ft, fact).isDefined)
        s"""SELECT $dcol, count(DISTINCT $fk) AS n_distinct
           FROM ${factFrom(ft, fact)} WHERE $fcol = ${sqlLit(value)}
           GROUP BY $dcol ORDER BY $dcol NULLS FIRST"""
      else fanoutExists.get((ft, fact)).map { corr =>
        // round 16 (NLFUZZ q201): the filter dim lives across a declared
        // ONE-TO-MANY edge ("unique customers by status where RETURN FLAG
        // is R" — return flag is lineitem's, the fk fact is orders).
        // Sum/avg productions must keep rejecting this (the fan-out
        // changes their row basis), but a distinct count composed with an
        // EXISTS filter is well-defined: the fact row qualifies iff ANY
        // child row matches. EXISTS — not join+distinct — is also the
        // 100 TB plan: both engines lower it to a semi join whose probe
        // side never duplicates fact rows (plan-pinned LeftSemi).
        s"""SELECT $dcol, count(DISTINCT $fk) AS n_distinct
           FROM $fact
           WHERE EXISTS ($corr AND $fcol = ${sqlLit(value)})
           GROUP BY $dcol ORDER BY $dcol NULLS FIRST"""
      }.getOrElse(rejectPath(ft, fact, s"no join path $ft -> $fact"))
    case TopNWhereDateRange(n, entity, measure, fdim, value, from, to) =>
      val (table, pk, nameCol) = entities.getOrElse(entity.toLowerCase,
        throw new IllegalArgumentException(s"unknown entity: $entity"))
      val (fact, mcol) = measures.getOrElse(measure.trim.toLowerCase,
        throw new IllegalArgumentException(s"unknown measure: $measure"))
      val (ftable, fcol) = dim(fdim)
      require(ftable == fact, s"filter dimension $fdim not on $fact")
      val from_ = factFrom(table, fact)
      val dateCol = dateCols.getOrElse(fact,
        throw new IllegalArgumentException(s"no date column for $fact"))
      val toExcl = java.time.LocalDate.parse(to).plusDays(1)
      s"""SELECT $pk, $nameCol,
         CAST(round(sum(CAST($mcol AS DECIMAL(18,4))), 4) AS DOUBLE) AS total
         FROM $from_
         WHERE $fcol = ${sqlLit(value)}
           AND $dateCol >= TIMESTAMP '$from 00:00:00'
           AND $dateCol < TIMESTAMP '$toExcl 00:00:00'
         GROUP BY $pk, $nameCol
         ORDER BY total DESC NULLS LAST, $pk NULLS FIRST
         LIMIT $n"""
    case TopNPerDimWhere(n, entity, measure, dname, fdim, value) =>
      // grouped leaderboard composed with the equality filter: the
      // TopNPerDim rank-window subquery with the filter in the innermost
      // aggregate's WHERE, so the predicate reaches the scan below the
      // window; exact-decimal rank total + pk tie-break as always
      val (table, pk, nameCol) = entities.getOrElse(entity.toLowerCase,
        throw new IllegalArgumentException(s"unknown entity: $entity"))
      val (fact, mcol) = measures.getOrElse(measure.trim.toLowerCase,
        throw new IllegalArgumentException(s"unknown measure: $measure"))
      val (dtable, dcol) = dim(dname)
      require(dtable == fact, s"dimension $dname not on $fact")
      val (ftable, fcol) = dim(fdim)
      require(ftable == fact, s"filter dimension $fdim not on $fact")
      val from_ = factFrom(table, fact)
      s"""SELECT $dcol, $pk, $nameCol, CAST(round(texact, 4) AS DOUBLE) AS total
         FROM (
           SELECT $dcol, $pk, $nameCol, texact,
             row_number() OVER (PARTITION BY $dcol
               ORDER BY texact DESC, $pk) AS rn
           FROM (
             SELECT $dcol, $pk, $nameCol,
               sum(CAST($mcol AS DECIMAL(18,4))) AS texact
             FROM $from_
             WHERE $fcol = ${sqlLit(value)}
             GROUP BY $dcol, $pk, $nameCol) g) r
         WHERE rn <= $n
         ORDER BY $dcol NULLS FIRST, rn NULLS FIRST"""
    case BottomNDateRange(n, entity, measure, from, to) =>
      val (table, pk, nameCol) = entities.getOrElse(entity.toLowerCase,
        throw new IllegalArgumentException(s"unknown entity: $entity"))
      val (fact, mcol) = measures.getOrElse(measure.trim.toLowerCase,
        throw new IllegalArgumentException(s"unknown measure: $measure"))
      val from_ = factFrom(table, fact)
      val dateCol = dateCols.getOrElse(fact,
        throw new IllegalArgumentException(s"no date column for $fact"))
      val toExcl = java.time.LocalDate.parse(to).plusDays(1)
      s"""SELECT $pk, $nameCol,
         CAST(round(sum(CAST($mcol AS DECIMAL(18,4))), 4) AS DOUBLE) AS total
         FROM $from_
         WHERE $dateCol >= TIMESTAMP '$from 00:00:00'
           AND $dateCol < TIMESTAMP '$toExcl 00:00:00'
         GROUP BY $pk, $nameCol
         ORDER BY total ASC NULLS FIRST, $pk NULLS FIRST
         LIMIT $n"""
    case DistinctCountBy(entity, dname) =>
      // "number of unique customers by status" — distinct entities per
      // fact dimension; counts the fact's fk (fk values ARE the entity
      // pks), so the plan is one distinct-aggregate, no join. Matched
      // before CountBy (whose single-word entity capture cannot swallow
      // "unique customers", so the two productions cannot shadow).
      val (fact, fk) = entityFk.getOrElse(entity.toLowerCase,
        throw new IllegalArgumentException(s"unknown entity: $entity"))
      val (dt, dcol) = dim(dname)
      require(dt == fact, s"dimension $dname not on $fact")
      s"""SELECT $dcol, count(DISTINCT $fk) AS n_distinct
         FROM $fact GROUP BY $dcol ORDER BY $dcol NULLS FIRST"""
    case TopNPerDimDateRange(n, entity, measure, dname, from, to) =>
      // grouped leaderboard composed with the calendar range: the
      // TopNPerDim rank-window subquery with TopNDateRange's half-open
      // timestamp discipline (inclusive final day = exclusive next-day
      // bound, computed at translation time). The range predicate lands
      // in the innermost aggregate's WHERE, so it reaches the scan
      // before the group-by; the rank keeps the exact-decimal total +
      // pk tie-break, so group membership can never flip on a rounding
      // boundary.
      val (table, pk, nameCol) = entities.getOrElse(entity.toLowerCase,
        throw new IllegalArgumentException(s"unknown entity: $entity"))
      val (fact, mcol) = measures.getOrElse(measure.trim.toLowerCase,
        throw new IllegalArgumentException(s"unknown measure: $measure"))
      val (dtable, dcol) = dim(dname)
      require(dtable == fact, s"dimension $dname not on $fact")
      val from_ = factFrom(table, fact)
      val dateCol = dateCols.getOrElse(fact,
        throw new IllegalArgumentException(s"no date column for $fact"))
      val toExcl = java.time.LocalDate.parse(to).plusDays(1)
      s"""SELECT $dcol, $pk, $nameCol, CAST(round(texact, 4) AS DOUBLE) AS total
         FROM (
           SELECT $dcol, $pk, $nameCol, texact,
             row_number() OVER (PARTITION BY $dcol
               ORDER BY texact DESC, $pk) AS rn
           FROM (
             SELECT $dcol, $pk, $nameCol,
               sum(CAST($mcol AS DECIMAL(18,4))) AS texact
             FROM $from_
             WHERE $dateCol >= TIMESTAMP '$from 00:00:00'
               AND $dateCol < TIMESTAMP '$toExcl 00:00:00'
             GROUP BY $dcol, $pk, $nameCol) g) r
         WHERE rn <= $n
         ORDER BY $dcol NULLS FIRST, rn NULLS FIRST"""
    case TopNPerDim(n, entity, measure, dname) =>
      // per-group top-k: "top 2 customers by total order price per
      // status" — the grouped-leaderboard production, compiled to a
      // rank-window subquery (the Spark∩DuckDB form; neither needs
      // QUALIFY). Matched before TopN, whose greedy measure capture
      // would swallow " per status" and fail the catalog lookup. The
      // rank orders by the EXACT decimal sum with a pk tie-break, so
      // group membership can never flip on a rounding boundary; Spark
      // plans WindowGroupLimit both sides of the exchange for the rn
      // filter (the win_topk_group shape).
      val (table, pk, nameCol) = entities.getOrElse(entity.toLowerCase,
        throw new IllegalArgumentException(s"unknown entity: $entity"))
      val (fact, mcol) = measures.getOrElse(measure.trim.toLowerCase,
        throw new IllegalArgumentException(s"unknown measure: $measure"))
      val (dtable, dcol) = dim(dname)
      require(dtable == fact, s"dimension $dname not on $fact")
      val from = factFrom(table, fact)
      s"""SELECT $dcol, $pk, $nameCol, CAST(round(texact, 4) AS DOUBLE) AS total
         FROM (
           SELECT $dcol, $pk, $nameCol, texact,
             row_number() OVER (PARTITION BY $dcol
               ORDER BY texact DESC, $pk) AS rn
           FROM (
             SELECT $dcol, $pk, $nameCol,
               sum(CAST($mcol AS DECIMAL(18,4))) AS texact
             FROM $from GROUP BY $dcol, $pk, $nameCol) g) r
         WHERE rn <= $n
         ORDER BY $dcol NULLS FIRST, rn NULLS FIRST"""
    case TopNDateRange(n, entity, measure, from, to) =>
      // time-boxed leaderboard: the TopN production composed with the
      // inclusive calendar range ("top 3 customers by total order price
      // between 1995-01-01 and 1996-06-30"). Same half-open timestamp
      // discipline as TotalByDateRange (inclusive final day = exclusive
      // next-day bound, computed at translation time); same exact-decimal
      // total + pk tie-break as TopNWhere, so ranking can never flip on a
      // float boundary. The date predicate is scan-pushable; the plan is
      // filter → partial agg → TakeOrderedAndProject.
      val (table, pk, nameCol) = entities.getOrElse(entity.toLowerCase,
        throw new IllegalArgumentException(s"unknown entity: $entity"))
      val (fact, mcol) = measures.getOrElse(measure.trim.toLowerCase,
        throw new IllegalArgumentException(s"unknown measure: $measure"))
      val from_ = factFrom(table, fact)
      val dateCol = dateCols.getOrElse(fact,
        throw new IllegalArgumentException(s"no date column for $fact"))
      val toExcl = java.time.LocalDate.parse(to).plusDays(1)
      s"""SELECT $pk, $nameCol,
         CAST(round(sum(CAST($mcol AS DECIMAL(18,4))), 4) AS DOUBLE) AS total
         FROM $from_
         WHERE $dateCol >= TIMESTAMP '$from 00:00:00'
           AND $dateCol < TIMESTAMP '$toExcl 00:00:00'
         GROUP BY $pk, $nameCol
         ORDER BY total DESC NULLS LAST, $pk NULLS FIRST
         LIMIT $n"""
    case TopNWhere(n, entity, measure, fdim, value) =>
      // top-k with a dimension filter on the fact table: "top 5 customers
      // by total order price where status is F" (value keeps its case)
      val (table, pk, nameCol) = entities.getOrElse(entity.toLowerCase,
        throw new IllegalArgumentException(s"unknown entity: $entity"))
      val (fact, mcol) = measures.getOrElse(measure.trim.toLowerCase,
        throw new IllegalArgumentException(s"unknown measure: $measure"))
      val (ftable, fcol) = dim(fdim)
      require(ftable == fact, s"filter dimension $fdim not on $fact")
      val from = factFrom(table, fact)
      s"""SELECT $pk, $nameCol,
         CAST(round(sum(CAST($mcol AS DECIMAL(18,4))), 4) AS DOUBLE) AS total
         FROM $from
         WHERE $fcol = ${sqlLit(value)}
         GROUP BY $pk, $nameCol
         ORDER BY total DESC NULLS LAST, $pk NULLS FIRST
         LIMIT $n"""
    case TotalByWhereDateRange(measure, d, fdim, value, from, to) =>
      // the TotalByWhere equality + the TotalByDateRange half-open
      // timestamp range, conjoined — both predicates scan-pushable.
      // Matched before TotalByDateRange (whose dimension capture has no
      // digits/hyphens, so it cannot swallow the where-clause — this
      // arm exists to make the composition producible, not to
      // disambiguate) and before TotalByWhere (whose single-token value
      // capture cannot span the range clause).
      val (fact, mcol) = measures.getOrElse(measure.trim.toLowerCase,
        throw new IllegalArgumentException(s"unknown measure: $measure"))
      val (table, dcol) = dim(d)
      val (ftable, fcol) = dim(fdim)
      // group dim routes through the star schema (round 11: the NL
      // matrix fuzzer found this modifier x cross-table-dim composition
      // unproducible); the FILTER dim stays on the fact
      require(ftable == fact, s"filter dimension not on $fact")
      val dateCol = dateCols.getOrElse(fact,
        throw new IllegalArgumentException(s"no date column for $fact"))
      val toExcl = java.time.LocalDate.parse(to).plusDays(1)
      s"""SELECT $dcol,
         CAST(round(sum(CAST($mcol AS DECIMAL(18,4))), 4) AS DOUBLE) AS total
         FROM ${factFrom(table, fact)}
         WHERE $fcol = ${sqlLit(value)}
           AND $dateCol >= TIMESTAMP '$from 00:00:00'
           AND $dateCol < TIMESTAMP '$toExcl 00:00:00'
         GROUP BY $dcol ORDER BY $dcol NULLS FIRST"""
    case TotalByDateRange(measure, d, from, to) =>
      // inclusive calendar-date range on the fact's canonical event-time
      // column: "total order price by status between 1995-01-01 and
      // 1996-06-30". INCLUSIVE of the final day means a HALF-OPEN
      // timestamp range (ts >= from, ts < to + 1 day — the nl_year
      // discipline): `BETWEEN ... AND 'to 00:00:00'` would silently drop
      // every intraday row on the last requested day. The exclusive
      // bound is computed at translation time, so both engines see plain
      // TIMESTAMP literals.
      val (fact, mcol) = measures.getOrElse(measure.trim.toLowerCase,
        throw new IllegalArgumentException(s"unknown measure: $measure"))
      val (table, dcol) = dim(d)
      // round 10: the dimension may live off the fact table ("total order
      // price by nation between X and Y") — FROM routes through the
      // declared join path like TotalBy, instead of requiring a fact dim
      val dateCol = dateCols.getOrElse(fact,
        throw new IllegalArgumentException(s"no date column for $fact"))
      val toExcl = java.time.LocalDate.parse(to).plusDays(1)
      s"""SELECT $dcol,
         CAST(round(sum(CAST($mcol AS DECIMAL(18,4))), 4) AS DOUBLE) AS total
         FROM ${factFrom(table, fact)}
         WHERE $dateCol >= TIMESTAMP '$from 00:00:00'
           AND $dateCol < TIMESTAMP '$toExcl 00:00:00'
         GROUP BY $dcol ORDER BY $dcol NULLS FIRST"""
    case TotalByNumRange(measure, d, fmeasure, lo, hi) =>
      // inclusive numeric range on a measure of the same fact table:
      // "total order price by status where order price is between 150000
      // and 300000". Matched before TotalByWhere (whose single-token value
      // capture cannot span "between X and Y") and before TotalByTwoDims
      // (digits are outside its dimension character class).
      val (fact, mcol) = measures.getOrElse(measure.trim.toLowerCase,
        throw new IllegalArgumentException(s"unknown measure: $measure"))
      val (ftable, fcol) = measures.getOrElse(fmeasure.trim.toLowerCase,
        throw new IllegalArgumentException(s"unknown filter measure: $fmeasure"))
      val (table, dcol) = dim(d)
      require(table == fact && ftable == fact, s"terms must be on $fact")
      s"""SELECT $dcol,
         CAST(round(sum(CAST($mcol AS DECIMAL(18,4))), 4) AS DOUBLE) AS total
         FROM $fact WHERE $fcol BETWEEN $lo AND $hi
         GROUP BY $dcol ORDER BY $dcol NULLS FIRST"""
    case TotalByMonthIn(measure, year) =>
      // monthly trend within a calendar year: "total order price by
      // month in 1995" — GROUP BY a derived month bucket under a
      // SARGABLE year range (the nl_year discipline; YEAR(col)=y would
      // not push to the scan). Matched before TotalByYear, whose
      // dimension capture would swallow 'month' and fail the catalog
      // lookup. CAST to BIGINT unifies Spark's INT month() with
      // DuckDB's BIGINT.
      val (fact, mcol) = measures.getOrElse(measure.trim.toLowerCase,
        throw new IllegalArgumentException(s"unknown measure: $measure"))
      val dateCol = dateCols.getOrElse(fact,
        throw new IllegalArgumentException(s"no date column for $fact"))
      val (y0, y1) = (year.toInt, year.toInt + 1)
      s"""SELECT CAST(month($dateCol) AS BIGINT) AS mth,
         CAST(round(sum(CAST($mcol AS DECIMAL(18,4))), 4) AS DOUBLE) AS total
         FROM $fact
         WHERE $dateCol >= TIMESTAMP '$y0-01-01 00:00:00'
           AND $dateCol < TIMESTAMP '$y1-01-01 00:00:00'
         GROUP BY 1 ORDER BY mth NULLS FIRST"""
    case TotalByWhereOr(measure, d, fdim, v1, v2) =>
      // disjunctive filter: "total order price by status where priority
      // is 1-URGENT or 2-HIGH" — an IN list, the form both engines
      // rewrite to an OR-of-equalities that pushes to the scan. Matched
      // before TotalByWhere (whose single-value capture cannot span
      // ' or ' anyway — the explicit order documents the intent).
      val (fact, mcol) = measures.getOrElse(measure.trim.toLowerCase,
        throw new IllegalArgumentException(s"unknown measure: $measure"))
      val (table, dcol) = dim(d)
      val (ftable, fcol) = dim(fdim)
      // group dim routes through the star schema (round 11: the NL
      // matrix fuzzer found this modifier x cross-table-dim composition
      // unproducible); the FILTER dim stays on the fact
      require(ftable == fact, s"filter dimension not on $fact")
      s"""SELECT $dcol,
         CAST(round(sum(CAST($mcol AS DECIMAL(18,4))), 4) AS DOUBLE) AS total
         FROM ${factFrom(table, fact)} WHERE $fcol IN (${sqlLit(v1)}, ${sqlLit(v2)})
         GROUP BY $dcol ORDER BY $dcol NULLS FIRST"""
    case TotalByLastDays(measure, d, n) =>
      // relative time: "total event value by event type in the last 30
      // days" — anchored to the fixture-contract "now" (nowAnchor: the
      // exclusive upper bound of the fact's date domain), lowered to a
      // half-open [anchor-N, anchor) TIMESTAMP range — the nl_year
      // sargable discipline, so the predicate pushes to the scan. A fact
      // with no declared anchor fails loudly rather than guessing
      // wall-clock now.
      val (fact, mcol) = measures.getOrElse(measure.trim.toLowerCase,
        throw new IllegalArgumentException(s"unknown measure: $measure"))
      val (table, dcol) = dim(d)
      // group dim routes through the star schema (round 11: the NL
      // matrix fuzzer found this modifier x cross-table-dim composition
      // unproducible)
      val dateCol = dateCols.getOrElse(fact,
        throw new IllegalArgumentException(s"no date column for $fact"))
      val anchor = nowAnchor.getOrElse(fact,
        throw new IllegalArgumentException(s"no 'now' anchor declared for $fact"))
      val start = java.time.LocalDate.parse(anchor).minusDays(n.toLong)
      s"""SELECT $dcol,
         CAST(round(sum(CAST($mcol AS DECIMAL(18,4))), 4) AS DOUBLE) AS total
         FROM ${factFrom(table, fact)}
         WHERE $dateCol >= TIMESTAMP '$start 00:00:00'
           AND $dateCol < TIMESTAMP '$anchor 00:00:00'
         GROUP BY $dcol ORDER BY $dcol NULLS FIRST"""
    case TotalByWhereNot(measure, d, fdimWhere, fdimExcl, v1, v2) =>
      // negation: "total order price by status where priority is not
      // 1-URGENT [or 5-LOW]" / "… excluding priority 1-URGENT" — lowered
      // to NOT IN over a literal list (the filter_in path negated; both
      // engines rewrite to a conjunction of ≠ that pushes to the scan).
      // The filter column is a catalog dim (non-null by fixture
      // contract), so NOT IN's null-semantics trap can't bite; matched
      // before TotalByWhere, whose single-token value capture cannot
      // span "not X" anyway.
      val (fact, mcol) = measures.getOrElse(measure.trim.toLowerCase,
        throw new IllegalArgumentException(s"unknown measure: $measure"))
      val (table, dcol) = dim(d)
      val (ftable, fcol) = dim(if (fdimWhere != null) fdimWhere else fdimExcl)
      // group dim routes through the star schema (round 11: the NL
      // matrix fuzzer found this modifier x cross-table-dim composition
      // unproducible); the FILTER dim stays on the fact
      require(ftable == fact, s"filter dimension not on $fact")
      val vals = Seq(Option(v1), Option(v2)).flatten.map(sqlLit).mkString(", ")
      s"""SELECT $dcol,
         CAST(round(sum(CAST($mcol AS DECIMAL(18,4))), 4) AS DOUBLE) AS total
         FROM ${factFrom(table, fact)} WHERE $fcol NOT IN ($vals)
         GROUP BY $dcol ORDER BY $dcol NULLS FIRST"""
    case TotalByWhereYear(measure, d, fdim, value, year) =>
      // TotalByWhere's scan-pushable equality + TotalByYear's half-open
      // sargable year range, conjoined — the group dim routes through the
      // star schema, the FILTER dim stays on the fact (the nine-arm
      // round-11 routing discipline).
      val (fact, mcol) = measures.getOrElse(measure.trim.toLowerCase,
        throw new IllegalArgumentException(s"unknown measure: $measure"))
      val (table, dcol) = dim(d)
      val (ftable, fcol) = dim(fdim)
      require(ftable == fact, s"filter dimension not on $fact")
      val dateCol = dateCols.getOrElse(fact,
        throw new IllegalArgumentException(s"no date column for $fact"))
      val (y0, y1) = (year.toInt, year.toInt + 1)
      s"""SELECT $dcol,
         CAST(round(sum(CAST($mcol AS DECIMAL(18,4))), 4) AS DOUBLE) AS total
         FROM ${factFrom(table, fact)}
         WHERE $fcol = ${sqlLit(value)}
           AND $dateCol >= TIMESTAMP '$y0-01-01 00:00:00'
           AND $dateCol < TIMESTAMP '$y1-01-01 00:00:00'
         GROUP BY $dcol ORDER BY $dcol NULLS FIRST"""
    case TotalByYear(measure, d, year) =>
      // calendar-year filter on the fact's canonical event-time column:
      // "total order price by status in 1995" — a half-open [Jan 1,
      // next Jan 1) range, the form that stays sargable (pushes to the
      // scan) where YEAR(col) = 1995 would not.
      val (fact, mcol) = measures.getOrElse(measure.trim.toLowerCase,
        throw new IllegalArgumentException(s"unknown measure: $measure"))
      val (table, dcol) = dim(d)
      // group dim routes through the star schema (round 11: the NL
      // matrix fuzzer found this modifier x cross-table-dim composition
      // unproducible)
      val dateCol = dateCols.getOrElse(fact,
        throw new IllegalArgumentException(s"no date column for $fact"))
      val (y0, y1) = (year.toInt, year.toInt + 1)
      s"""SELECT $dcol,
         CAST(round(sum(CAST($mcol AS DECIMAL(18,4))), 4) AS DOUBLE) AS total
         FROM ${factFrom(table, fact)}
         WHERE $dateCol >= TIMESTAMP '$y0-01-01 00:00:00'
           AND $dateCol < TIMESTAMP '$y1-01-01 00:00:00'
         GROUP BY $dcol ORDER BY $dcol NULLS FIRST"""
    case TotalByHaving(measure, d, dir, n) =>
      // post-aggregation filter: "total order price by status having
      // total above 200000000" — HAVING on the grouped sum. Matched
      // before TotalByTwoDims ("having total" would otherwise parse as a
      // second dimension). The predicate compares the EXACT decimal sum
      // (not the rounded double presentation), so group membership can
      // never flip on a rounding boundary.
      val (fact, mcol) = measures.getOrElse(measure.trim.toLowerCase,
        throw new IllegalArgumentException(s"unknown measure: $measure"))
      val (table, dcol) = dim(d)
      // group dim routes through the star schema (round 11: the NL
      // matrix fuzzer found this modifier x cross-table-dim composition
      // unproducible)
      val op = if (dir.toLowerCase == "above") ">" else "<"
      s"""SELECT $dcol,
         CAST(round(sum(CAST($mcol AS DECIMAL(18,4))), 4) AS DOUBLE) AS total
         FROM ${factFrom(table, fact)} GROUP BY $dcol
         HAVING sum(CAST($mcol AS DECIMAL(18,4))) $op $n
         ORDER BY $dcol NULLS FIRST"""
    case ShareNotBy(entity, fdname, v, dname) =>
      // compositional negation (round 13): "share of orders where status
      // is not F by priority" — per-group, what fraction of rows is NOT
      // the named value. Filter via NOT IN like TotalByWhereNot (catalog
      // dims are non-null by fixture contract, so the null-semantics
      // trap can't bite); the share keeps ShareBy's floor-over-exact-
      // counts discipline (both engines compute the identical double
      // quotient of exact int64s); nullif guards the degenerate empty
      // group set. Round 14 (verdict item 3): the filter/group dims may
      // sit one declared star hop OFF the entity table — the hop is
      // many-to-one pk=fk, so each entity row joins exactly one dim row
      // and the share's row basis is unchanged.
      val fact = entityTable(entity)
      val (dtable, dcol) = dim(dname)
      val (ftable, fcol) = dim(fdname)
      fanoutExists.get((ftable, fact)).filter(_ => ftable != fact) match {
        case Some(corr) =>
          // round 17 (NLFUZZ q283): the FILTER dim lives across a declared
          // ONE-TO-MANY edge ("share of orders where RETURN FLAG is not R
          // by status" — return flag is lineitem's). The share's row basis
          // is the fact table, which the fan-out edge must never join into
          // (it would multiply counted rows) — but negation over the edge
          // is well-defined as universal quantification: the fact row
          // qualifies iff NO child row carries the value (an order "is not
          // R" when none of its lineitems is; childless facts qualify
          // vacuously). Lowered as correlated NOT EXISTS inside the
          // aggregate FILTER — the same corr head the distinct-count
          // production uses (q201) — which both engines plan as an
          // existence/anti semi join on the child key: the fact side is
          // never duplicated, the child side is aggregated to matching
          // keys, and at 100 TB that is one key-shuffle with no fan-out.
          // The group dim may still route its own many-to-one hop.
          val from = if (dtable == fact) fact else factFrom(dtable, fact)
          val notHas = s"NOT EXISTS ($corr AND $fcol = ${sqlLit(v)})"
          s"""SELECT $dcol,
             count(*) FILTER (WHERE $notHas) AS cnt_not,
             count(*) AS cnt,
             CAST(floor(count(*) FILTER (WHERE $notHas) * 10000.0
                        / nullif(count(*), 0)) AS BIGINT) AS share_bp
             FROM $from GROUP BY $dcol ORDER BY $dcol NULLS FIRST"""
        case None =>
          val offFact = Set(dtable, ftable) - fact
          require(offFact.size <= 1,
            s"dimensions must share at most one non-$fact table, got $offFact")
          val from = offFact.headOption.map(factFrom(_, fact)).getOrElse(fact)
          s"""SELECT $dcol,
             count(*) FILTER (WHERE $fcol NOT IN (${sqlLit(v)})) AS cnt_not,
             count(*) AS cnt,
             CAST(floor(count(*) FILTER (WHERE $fcol NOT IN (${sqlLit(v)})) * 10000.0
                        / nullif(count(*), 0)) AS BIGINT) AS share_bp
             FROM $from GROUP BY $dcol ORDER BY $dcol NULLS FIRST"""
      }
    case ShareNot(entity, fdname, v) =>
      // scalar form: "share of orders where status is not F" — one row,
      // the corpus-wide negated share. Round 14: the filter dim may sit
      // one declared many-to-one star hop off the entity table ("share
      // of orders where market segment is not BUILDING" — NLFUZZ q208).
      val fact = entityTable(entity)
      val (ftable, fcol) = dim(fdname)
      fanoutExists.get((ftable, fact)).filter(_ => ftable != fact) match {
        case Some(corr) =>
          // scalar twin of the grouped fan-out negation above (round 17):
          // universal quantification over the one-to-many edge, same
          // NOT-EXISTS-in-FILTER lowering
          val notHas = s"NOT EXISTS ($corr AND $fcol = ${sqlLit(v)})"
          s"""SELECT count(*) FILTER (WHERE $notHas) AS cnt_not,
             count(*) AS cnt,
             CAST(floor(count(*) FILTER (WHERE $notHas) * 10000.0
                        / nullif(count(*), 0)) AS BIGINT) AS share_bp
             FROM $fact"""
        case None =>
          val from = if (ftable == fact) fact else factFrom(ftable, fact)
          s"""SELECT count(*) FILTER (WHERE $fcol NOT IN (${sqlLit(v)})) AS cnt_not,
             count(*) AS cnt,
             CAST(floor(count(*) FILTER (WHERE $fcol NOT IN (${sqlLit(v)})) * 10000.0
                        / nullif(count(*), 0)) AS BIGINT) AS share_bp
             FROM $from"""
      }
    case RatioBy(ma, mb, dname) =>
      // ratio production (round 13): "ratio of extended price to
      // quantity by return flag" — both measures must live on the SAME
      // fact (a cross-fact ratio has no defined row basis and rejects
      // loudly); the group dim routes through the star schema. Sums are
      // exact DECIMAL(18,4); the ratio is floor-of-basis-points over the
      // two sums cast to DOUBLE — both engines perform the identical
      // correctly-rounded decimal→double conversions, multiply, divide,
      // floor, so the result is bit-equal (the ShareBy argument); nullif
      // keeps a zero denominator NULL in both engines instead of ANSI
      // divide-error vs NULL divergence.
      val (fa, acol) = measures.getOrElse(ma.trim.toLowerCase,
        throw new IllegalArgumentException(s"unknown measure: $ma"))
      val (fb, bcol) = measures.getOrElse(mb.trim.toLowerCase,
        throw new IllegalArgumentException(s"unknown measure: $mb"))
      val (dtable, dcol) = dim(dname)
      if (fa == fb)
        s"""SELECT $dcol,
           CAST(round(sum(CAST($acol AS DECIMAL(18,4))), 4) AS DOUBLE) AS total_num,
           CAST(round(sum(CAST($bcol AS DECIMAL(18,4))), 4) AS DOUBLE) AS total_den,
           CAST(floor(CAST(sum(CAST($acol AS DECIMAL(18,4))) AS DOUBLE) * 10000.0
                      / nullif(CAST(sum(CAST($bcol AS DECIMAL(18,4))) AS DOUBLE), 0.0))
                AS BIGINT) AS ratio_bp
           FROM ${factFrom(dtable, fa)} GROUP BY $dcol ORDER BY $dcol NULLS FIRST"""
      else {
        // CROSS-fact ratio (round 16, NLFUZZ q263: "ratio of order price
        // to quantity by status" — orders vs lineitem). A single-FROM
        // formulation has no defined row basis, but each side aggregated
        // INDEPENDENTLY to |dims| rows does: two partial-aggregated fact
        // scans, then a tiny join of the two aggregate tables on the dim
        // (NULL-safe via IS NOT DISTINCT FROM; FULL so a dim value with
        // only one side present surfaces with a NULL ratio, never
        // disappears). Both facts must reach the dim over declared
        // many-to-one paths — unreachable sides keep rejecting loudly
        // (q264's event-value × lineitem-dim cross stays rejected). The
        // ratio keeps the same floor-basis-points double discipline as
        // the same-fact form. At scale each side is map-side combined to
        // |dims| rows before any join — no fact-fact shuffle exists.
        def side(f: String, mcol: String, alias: String): String = {
          val from = if (dtable == f) f else factFrom(dtable, f)
          s"""(SELECT $dcol, sum(CAST($mcol AS DECIMAL(18,4))) AS s$alias
             FROM $from GROUP BY $dcol) $alias"""
        }
        s"""SELECT COALESCE(a.$dcol, b.$dcol) AS $dcol,
           CAST(round(a.sa, 4) AS DOUBLE) AS total_num,
           CAST(round(b.sb, 4) AS DOUBLE) AS total_den,
           CAST(floor(CAST(a.sa AS DOUBLE) * 10000.0
                      / nullif(CAST(b.sb AS DOUBLE), 0.0)) AS BIGINT) AS ratio_bp
           FROM ${side(fa, acol, "a")}
           FULL JOIN ${side(fb, bcol, "b")}
             ON a.$dcol IS NOT DISTINCT FROM b.$dcol
           ORDER BY $dcol NULLS FIRST"""
      }
    case ShareBy(entity, dname) =>
      // percent-of-total: "share of orders by status" — per-group count
      // plus its share of the table in basis points. The share stays in
      // the Spark∩DuckDB common dialect as floor(n·10000/total) over
      // exact integer counts: the double quotient's ulp (~1e-12) is far
      // below the 1/total gap between expressible ratios, so the floor
      // is the true integer floor in both engines, and exact-multiple
      // quotients are exactly representable. The 1-row total attaches by
      // cross join (broadcast in Spark) — no second table pass per group.
      // Round 14: the group dim may sit one declared many-to-one star hop
      // off the entity table ("share of orders by market segment") — the
      // denominator stays the ENTITY table's row count, and the pk=fk hop
      // preserves the numerator's row basis, so group shares still sum to
      // one.
      val fact = entityTable(entity)
      val (dtable, dcol) = dim(dname)
      val from = if (dtable == fact) fact else factFrom(dtable, fact)
      s"""SELECT $dcol, count(*) AS cnt,
         CAST(floor(count(*) * 10000.0 / t.total) AS BIGINT) AS share_bp
         FROM $from CROSS JOIN (SELECT count(*) AS total FROM $fact) t
         GROUP BY $dcol, t.total ORDER BY $dcol NULLS FIRST"""
    case MinMaxBy(which, measure, d) =>
      // extremes per dimension: "maximum order price by status" — min/max
      // are order- and parallelism-independent, so no decimal/rounding
      // discipline is needed; the raw column value is exact in both
      // engines.
      val (fact, mcol) = measures.getOrElse(measure.trim.toLowerCase,
        throw new IllegalArgumentException(s"unknown measure: $measure"))
      val (table, dcol) = dim(d)
      // group dim routes through the star schema (round 11: the NL
      // matrix fuzzer found this modifier x cross-table-dim composition
      // unproducible)
      val fn = if (which.toLowerCase == "maximum") "max" else "min"
      // CAST … AS DOUBLE: no-op for DOUBLE columns, type normalizer for
      // the derived decimal-expression measure (see MinMaxByDateRange)
      s"""SELECT $dcol, CAST($fn($mcol) AS DOUBLE) AS extreme
         FROM ${factFrom(table, fact)} GROUP BY $dcol ORDER BY $dcol NULLS FIRST"""
    case TotalByTwoDims(measure, d1, d2) =>
      // multi-dimension group-by: "total order price by market segment
      // and status" — dimensions may live on the fact table or one
      // declared star-schema hop away (the join path resolves it)
      val (fact, mcol) = measures.getOrElse(measure.trim.toLowerCase,
        throw new IllegalArgumentException(s"unknown measure: $measure"))
      val (t1, c1) = dim(d1)
      val (t2, c2) = dim(d2)
      // TWIN edge-qualified dims (round 16, verdict item 2 — NLFUZZ q168):
      // both dims reach the same physical table over DISJOINT declared
      // edges ("by supplier nation and customer nation") — the aliased
      // merge joins it twice under distinct aliases and emits each dim
      // column under its qualifier-derived output name (both are n_name;
      // unaliased they would collide). Catalyst broadcasts both aliased
      // nation sides like the single-edge paths.
      twinAliased(t1, t2, fact) match {
        case Some((from, q1, q2)) =>
          val a1 = d1.trim.toLowerCase.replace(' ', '_')
          val a2 = d2.trim.toLowerCase.replace(' ', '_')
          // the shared twinAliased merge (broadcast rationale there); the
          // SF-dependent intermediates (supplier / orders / customer)
          // deliberately stay Catalyst/AQE's call, per the NL discipline
          // above.
          s"""SELECT /*+ BROADCAST($q1), BROADCAST($q2) */
             $q1.$c1 AS $a1, $q2.$c2 AS $a2,
             CAST(round(sum(CAST($mcol AS DECIMAL(18,4))), 4) AS DOUBLE) AS total
             FROM $from GROUP BY $q1.$c1, $q2.$c2
             ORDER BY $a1 NULLS FIRST, $a2 NULLS FIRST"""
        case None =>
          val offFact = Set(t1, t2) - fact
          require(offFact.size <= 1,
            s"dimensions must share at most one non-fact table, got $offFact")
          val from = offFact.headOption.map(factFrom(_, fact)).getOrElse(fact)
          s"""SELECT $c1, $c2,
             CAST(round(sum(CAST($mcol AS DECIMAL(18,4))), 4) AS DOUBLE) AS total
             FROM $from GROUP BY $c1, $c2
             ORDER BY $c1 NULLS FIRST, $c2 NULLS FIRST"""
      }
    case CountByTwoDims(entity, d1, d2) =>
      // "number of orders by status and priority" — both dimensions must
      // live on one table (no measure anchors a join here)
      val (t1, c1) = dim(d1)
      val (t2, c2) = dim(d2)
      require(t1 == t2, s"dimensions $d1 and $d2 must be on one table")
      requireEntityOn(entity, t1)
      s"""SELECT $c1, $c2, count(*) AS cnt FROM $t1
         GROUP BY $c1, $c2
         ORDER BY $c1 NULLS FIRST, $c2 NULLS FIRST"""
    case TotalByCompare(measure, d, fmeasure, dir, n) =>
      // numeric-comparison filter on a (possibly different) measure of the
      // same fact table: "total order price by status where order price is
      // above 100000"
      val (fact, mcol) = measures.getOrElse(measure.trim.toLowerCase,
        throw new IllegalArgumentException(s"unknown measure: $measure"))
      val (ftable, fcol) = measures.getOrElse(fmeasure.trim.toLowerCase,
        throw new IllegalArgumentException(s"unknown filter measure: $fmeasure"))
      val (table, dcol) = dim(d)
      require(table == fact && ftable == fact, s"terms must be on $fact")
      val op = if (dir.toLowerCase == "above") ">" else "<"
      s"""SELECT $dcol,
         CAST(round(sum(CAST($mcol AS DECIMAL(18,4))), 4) AS DOUBLE) AS total
         FROM $fact WHERE $fcol $op $n
         GROUP BY $dcol ORDER BY $dcol NULLS FIRST"""
    case CountByWhere(entity, d, fdim, value) =>
      val (table, dcol) = dim(d)
      val (ftable, fcol) = dim(fdim)
      requireEntityOn(entity, table)
      // the filter dim may route one declared many-to-one hop off the
      // counted table (round 14): the hop cannot change the row count
      s"""SELECT $dcol, count(*) AS cnt FROM ${factFrom2(table, ftable, table)}
         WHERE $fcol = ${sqlLit(value)}
         GROUP BY $dcol ORDER BY $dcol NULLS FIRST"""
    case AvgByWhere(measure, d, fdim, value) =>
      // filtered mean: "average order price by status where priority is
      // 1-URGENT" — the agg_avg money discipline (exact decimal sum cast
      // DOUBLE once, then one division) under a scan-pushable equality.
      // Matched before AvgBy, whose dimension capture would swallow the
      // where-clause and fail the catalog lookup.
      val (fact, mcol) = measures.getOrElse(measure.trim.toLowerCase,
        throw new IllegalArgumentException(s"unknown measure: $measure"))
      val (table, dcol) = dim(d)
      val (ftable, fcol) = dim(fdim)
      // group dim routing since round 11; round 14 lets the FILTER dim
      // route a many-to-one hop too (factFrom2 — basis unchanged); round
      // 16 routes the twin-qualified pair via the shared aliased merge,
      // so "average …" carries the same surface as "total …"
      twinAliased(table, ftable, fact) match {
        case Some((from, qd, qf)) =>
          val ad = d.trim.toLowerCase.replace(' ', '_')
          s"""SELECT /*+ BROADCAST($qd), BROADCAST($qf) */
             $qd.$dcol AS $ad, ${avgExactSql(mcol)} AS avg
             FROM $from WHERE $qf.$fcol = ${twinLit(fcol, value)}
             GROUP BY $qd.$dcol ORDER BY $ad NULLS FIRST"""
        case None =>
          s"""SELECT $dcol,
             ${avgExactSql(mcol)} AS avg
             FROM ${factFrom2(table, ftable, fact)} WHERE $fcol = ${sqlLit(value)}
             GROUP BY $dcol ORDER BY $dcol NULLS FIRST"""
      }
    case TotalByWhere(measure, d, fdim, value) =>
      val (fact, mcol) = measures.getOrElse(measure.trim.toLowerCase,
        throw new IllegalArgumentException(s"unknown measure: $measure"))
      val (table, dcol) = dim(d)
      val (ftable, fcol) = dim(fdim)
      // group dim routing since round 11; round 14 lets the FILTER dim
      // route a many-to-one hop too (factFrom2 — basis unchanged)
      // TWIN edge-qualified group + FILTER dims (round 16, NLFUZZ q212:
      // "total quantity by supplier nation where customer nation is
      // NATION_7"): the shared twinAliased merge — the filter predicate
      // sits on the broadcast side's 25-row scan
      twinAliased(table, ftable, fact) match {
        case Some((from, qd, qf)) =>
          val ad = d.trim.toLowerCase.replace(' ', '_')
          s"""SELECT /*+ BROADCAST($qd), BROADCAST($qf) */
             $qd.$dcol AS $ad,
             CAST(round(sum(CAST($mcol AS DECIMAL(18,4))), 4) AS DOUBLE) AS total
             FROM $from WHERE $qf.$fcol = ${twinLit(fcol, value)}
             GROUP BY $qd.$dcol ORDER BY $ad NULLS FIRST"""
        case None =>
          s"""SELECT $dcol,
             CAST(round(sum(CAST($mcol AS DECIMAL(18,4))), 4) AS DOUBLE) AS total
             FROM ${factFrom2(table, ftable, fact)} WHERE $fcol = ${sqlLit(value)}
             GROUP BY $dcol ORDER BY $dcol NULLS FIRST"""
      }
    case other => translateBase(other.toLowerCase)
  }

  /** TWIN edge-qualified (group dim, filter dim) resolution (round 16):
    * when BOTH dims are qualified pseudo-tables meeting the same physical
    * table over disjoint edges ("by supplier nation where customer nation
    * is X"), return the aliased FROM tail plus each side's alias so any
    * grouped-aggregate production can emit the merge — the group column
    * qualified by its edge's alias, the filter column by the other's.
    * One definition serves every production (TotalByWhere, AvgByWhere,
    * TotalByTwoDims), so the twin shape cannot drift per-production.
    * Both aliased sides carry the explicit BROADCAST hint — nation is the
    * one scale-invariant dim (25 rows at ANY SF); DuckDB reads the hint
    * as a plain block comment, so the SQL stays its own oracle.
    */
  private def twinAliased(dTable: String, fTable: String, fact: String):
      Option[(String, String, String)] =
    if (dTable == fTable) None
    else for {
      (jd, qd) <- aliasedQualified.get((dTable, fact))
      (jf, qf) <- aliasedQualified.get((fTable, fact))
    } yield (s"$fact $jd $jf", qd, qf)

  /** Literal typing for the twin-qualified WHERE (round-16 ADVICE):
    * every aliasedQualified entry today terminates in nation, whose only
    * filterable dim column (n_name) is a string, so quoting via sqlLit
    * is correct — but that was an unstated assumption. This makes it a
    * loud contract: a new qualified pair whose filter column is NUMERIC
    * must be declared here with bare-literal typing (like RegCountWhere
    * does from the cached schema), or the quoted literal would silently
    * defeat typed scan pushdown and risk Spark-vs-DuckDB coercion drift.
    */
  private val twinStringFilterCols = Set("n_name")
  private def twinLit(fcol: String, value: String): String = {
    require(twinStringFilterCols(fcol),
      s"twin-qualified filter column '$fcol' has no declared literal " +
        "type; declare it in twinStringFilterCols (string) or add a " +
        "numeric-typed branch before quoting")
    sqlLit(value)
  }

  /** The (dim table, fact) pair's declared path — the fact itself acts as
    * the trivial path (its covers set is just the fact).
    */
  private def pathOf(t: String, fact: String): Option[Path] =
    if (t == fact) Some(Path(Set(fact), Set(fact), fact))
    else joinPath.get((t, fact))

  /** Resolve the FROM clause for a (dimension table, fact) pair: same
    * table → plain scan; otherwise the declared star-schema join path
    * ("total order price by market segment" ⇒ orders ⋈ customer). A
    * reachable-but-ambiguous pair rejects with the text that NAMES the
    * resolving qualifiers.
    */
  private def factFrom(dimTable: String, fact: String): String =
    pathOf(dimTable, fact).map(_.sql).getOrElse(
      rejectPath(dimTable, fact, s"no join path $dimTable -> $fact"))

  /** FROM clause when a production has a GROUP dim AND a FILTER dim, each
    * possibly on the fact or one-to-two declared many-to-one hops off it
    * (round 14: "total order price by status where MARKET SEGMENT is
    * BUILDING" — the filter dim was previously required on the fact).
    * Every joinPath edge is many-to-one, so routing either dim preserves
    * the fact-row basis: sums/counts/averages are unchanged by the join.
    * Resolution, in order: the group dim's declared path if its covers
    * set carries the filter table (the two-hop paths pass THROUGH the
    * intermediate dim, so "by nation where market segment is X" rides the
    * nation path's customer hop); else the filter dim's path if it
    * carries the group table; else — round 15 — the MECHANICAL MERGE of
    * the two paths when their PHYSICAL table sets are disjoint beyond the
    * shared fact root ("total quantity by supplier nation where status is
    * F": the supplier-nation edge plus the orders hop). The merge is safe
    * under that guard: both operands are many-to-one chains rooted at the
    * same fact over disjoint physical tables, so concatenating the JOIN
    * clauses preserves the fact-row basis and no table appears twice.
    * Pairs whose paths meet the same physical table over different edges
    * ("by supplier nation where customer nation is X" — nation twice)
    * reject loudly, and an ambiguous bare dimension rejects with the
    * qualifier-naming text.
    */
  private def factFrom2(dimTable: String, filterTable: String,
                        fact: String): String = {
    val viaDim = pathOf(dimTable, fact)
    val viaFil = pathOf(filterTable, fact)
    def covered(p: Path, t: String): Boolean = t == fact || p.covers(t)
    viaDim.filter(p => filterTable == dimTable || covered(p, filterTable))
      .orElse(viaFil.filter(p => covered(p, dimTable)))
      .map(_.sql)
      .orElse(for {
        pd <- viaDim; pf <- viaFil
        // merge guard on PHYSICAL tables: disjoint beyond the shared fact
        // root, or the concatenation would join one table twice unaliased
        if (pd.tables intersect pf.tables) == Set(fact)
      } yield pd.sql + " " + pf.sql.stripPrefix(fact).trim)
      .getOrElse {
        val ambKey = Seq((dimTable, fact), (filterTable, fact))
          .find(ambiguousPath.contains)
        rejectPath(ambKey.map(_._1).getOrElse(dimTable), fact,
          s"no single declared join path from $fact covers both the grouped " +
            s"dimension ($dimTable) and the filter dimension ($filterTable)")
      }
  }

  private def translateBase(question: String): String = question match {
    case Superlative(entity, dirWord, measure, year) =>
      // "which supplier had the highest total quantity [in 1996]" — the
      // singular top/bottom-1 phrasing of TopN/BottomN: the same
      // aggregate-then-order plan with LIMIT 1 and a pk tie-break, so a
      // revenue tie can never make the answer nondeterministic. The
      // optional year lowers to the nl_year half-open sargable range
      // (never YEAR(col) = y, which would not push to the scan). The
      // entity noun is singular here; the catalog is keyed plural, so
      // lookup tries both forms.
      val key = entity.toLowerCase
      val (table, pk, nameCol) = entities.get(key)
        .orElse(entities.get(key + "s"))
        .getOrElse(throw new IllegalArgumentException(s"unknown entity: $entity"))
      val (fact, mcol) = measures.getOrElse(measure.trim.toLowerCase,
        throw new IllegalArgumentException(s"unknown measure: $measure"))
      val from = factFrom(table, fact)
      val order = if (dirWord.toLowerCase == "highest") "DESC" else "ASC"
      val where = Option(year).map { y =>
        val dateCol = dateCols.getOrElse(fact,
          throw new IllegalArgumentException(s"no date column for $fact"))
        s"""WHERE $dateCol >= TIMESTAMP '${y.toInt}-01-01 00:00:00'
           AND $dateCol < TIMESTAMP '${y.toInt + 1}-01-01 00:00:00'"""
      }.getOrElse("")
      s"""SELECT $pk, $nameCol,
         CAST(round(sum(CAST($mcol AS DECIMAL(18,4))), 4) AS DOUBLE) AS total
         FROM $from
         $where
         GROUP BY $pk, $nameCol
         ORDER BY total $order NULLS LAST, $pk NULLS FIRST
         LIMIT 1"""
    case TopN(n, entity, measure) =>
      val (table, pk, nameCol) = entities.getOrElse(entity,
        throw new IllegalArgumentException(s"unknown entity: $entity"))
      val (fact, mcol) = measures.getOrElse(measure.trim,
        throw new IllegalArgumentException(s"unknown measure: $measure"))
      val from = factFrom(table, fact)
      s"""SELECT $pk, $nameCol,
         CAST(round(sum(CAST($mcol AS DECIMAL(18,4))), 4) AS DOUBLE) AS total
         FROM $from
         GROUP BY $pk, $nameCol
         ORDER BY total DESC NULLS LAST, $pk NULLS FIRST
         LIMIT $n"""
    case CountBy(entity, dim) =>
      val (table, dcol) = dims.getOrElse(dim.trim,
        throw new IllegalArgumentException(s"unknown dimension: $dim"))
      requireEntityOn(entity, table)
      s"""SELECT $dcol, count(*) AS cnt FROM $table
         GROUP BY $dcol ORDER BY $dcol NULLS FIRST"""
    case AvgBy(measure, dim) =>
      val (fact, mcol) = measures.getOrElse(measure.trim,
        throw new IllegalArgumentException(s"unknown measure: $measure"))
      val (table, dcol) = dims.getOrElse(dim.trim,
        throw new IllegalArgumentException(s"unknown dimension: $dim"))
      s"""SELECT $dcol,
         ${avgExactSql(mcol)} AS avg_val
         FROM ${factFrom(table, fact)} GROUP BY $dcol ORDER BY $dcol NULLS FIRST"""
    case BottomN(n, entity, measure) =>
      // "bottom 5 customers by total order price" — the ascending mirror
      // of TopN: same join routing, ORDER BY total ASC. NULLS FIRST on
      // the ascending measure keeps both engines' (identical) default
      // explicit.
      val (table, pk, nameCol) = entities.getOrElse(entity.toLowerCase,
        throw new IllegalArgumentException(s"unknown entity: $entity"))
      val (fact, mcol) = measures.getOrElse(measure.trim.toLowerCase,
        throw new IllegalArgumentException(s"unknown measure: $measure"))
      val from = factFrom(table, fact)
      s"""SELECT $pk, $nameCol,
         CAST(round(sum(CAST($mcol AS DECIMAL(18,4))), 4) AS DOUBLE) AS total
         FROM $from
         GROUP BY $pk, $nameCol
         ORDER BY total ASC NULLS FIRST, $pk NULLS FIRST
         LIMIT $n"""
    case TotalByYearDim(measure) =>
      // "total order price by year" — GROUP BY a DERIVED calendar bucket
      // of the fact's canonical event-time column (nl_year filters one
      // year; this production groups by all of them). Matched before
      // TotalBy, whose dimension capture would swallow 'year' and fail
      // the catalog lookup. CAST to BIGINT: Spark's year() yields INT,
      // DuckDB's BIGINT — the cast unifies the output schema.
      val (fact, mcol) = measures.getOrElse(measure.trim.toLowerCase,
        throw new IllegalArgumentException(s"unknown measure: $measure"))
      val dateCol = dateCols.getOrElse(fact,
        throw new IllegalArgumentException(s"no date column for $fact"))
      s"""SELECT CAST(year($dateCol) AS BIGINT) AS yr,
         CAST(round(sum(CAST($mcol AS DECIMAL(18,4))), 4) AS DOUBLE) AS total
         FROM $fact GROUP BY 1 ORDER BY yr NULLS FIRST"""
    case TotalBy(measure, dim) =>
      val (fact, mcol) = measures.getOrElse(measure.trim,
        throw new IllegalArgumentException(s"unknown measure: $measure"))
      val (table, dcol) = dims.getOrElse(dim.trim,
        throw new IllegalArgumentException(s"unknown dimension: $dim"))
      s"""SELECT $dcol,
         CAST(round(sum(CAST($mcol AS DECIMAL(18,4))), 4) AS DOUBLE) AS total
         FROM ${factFrom(table, fact)} GROUP BY $dcol ORDER BY $dcol NULLS FIRST"""
    case other =>
      throw new IllegalArgumentException(s"cannot translate: '$other'")
  }

  /** Translate and execute through the SQL entry point (EP2). */
  /** Grammar translation through the SAME gate every translator uses
    * (NlGate: parse + read-only + catalog-only) — uniformity means the
    * gate is exercised on every shipped NL key, not just in the LLM
    * adapter's tests.
    */
  def run(s: SparkSession, dir: String, question: String): DataFrame =
    NlGate.run(s, dir, GrammarTranslator, question)
}
