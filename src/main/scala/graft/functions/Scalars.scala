package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables._

/** §2.8 scalar-function families (SURVEY.md): one `queries` key per family,
  * each a projection exercising the whole family so one oracle checks all.
  *
  * Cross-dialect care (SURVEY.md §7.4): Spark's int-valued functions
  * (length/instr/year/...) return INT where DuckDB returns BIGINT — every
  * such output is cast to LongType on the Spark side. Spark regexp_replace
  * is replace-all; the DuckDB oracle needs the 'g' flag. DuckDB dayofweek
  * is 0-based Sunday; Spark's is 1-based.
  */
object Scalars {

  private val L = LongType

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "fn_string" -> ((s, d) =>
      part(s, d).select(
        col("p_partkey"),
        upper(col("p_name")).as("up"),
        lower(col("p_brand")).as("lo"),
        length(col("p_name")).cast(L).as("len"),
        trim(concat(lit("  "), col("p_name"), lit("  "))).as("trimmed"),
        ltrim(concat(lit("xx"), col("p_name")), "x").as("ltrimmed"),
        rtrim(concat(col("p_name"), lit("yy")), "y").as("rtrimmed"),
        substring(col("p_name"), 1, 4).as("sub4"),
        concat(col("p_brand"), lit("-"), col("p_type")).as("cat"),
        concat_ws("/", col("p_brand"), col("p_type"), col("p_name")).as("catws"),
        regexp_replace(col("p_name"), lit(" "), lit("_")).as("replaced"),
        lpad(col("p_brand"), 12, "*").as("lpadded"),
        rpad(col("p_type"), 10, ".").as("rpadded"),
        instr(col("p_name"), "e").cast(L).as("pos_e"),
        reverse(col("p_name")).as("rev"))
        .orderBy("p_partkey")),
    "fn_regex" -> ((s, d) =>
      customer(s, d).select(
        col("c_custkey"),
        regexp_extract(col("c_name"), "([0-9]+)$", 1).as("cust_num"),
        regexp_replace(col("c_name"), "0+", "0").as("squeezed"),
        col("c_name").rlike("00[1-4]").cast(L).as("has_digit_run"))
        .orderBy("c_custkey")),
    "fn_date" -> ((s, d) =>
      orders(s, d).select(
        col("o_orderkey"),
        year(col("o_orderdate")).cast(L).as("y"),
        month(col("o_orderdate")).cast(L).as("m"),
        dayofmonth(col("o_orderdate")).cast(L).as("dom"),
        dayofweek(col("o_orderdate")).cast(L).as("dow1"),
        date_trunc("month", col("o_orderdate")).as("month_start"),
        date_add(col("o_orderdate").cast(DateType), 30).as("plus30"),
        datediff(lit("2002-01-01").cast(DateType), col("o_orderdate").cast(DateType))
          .cast(L).as("days_to_2002"),
        last_day(col("o_orderdate")).as("eom"),
        make_date(year(col("o_orderdate")), month(col("o_orderdate")), lit(1)).as("made"),
        col("o_orderdate").cast(DateType).as("as_date"),
        unix_micros(col("o_orderdate")).as("epoch_us"))
        .orderBy("o_orderkey")),
    "fn_trig" -> ((s, d) =>
      // trigonometric family over small integral arguments (≈-rule r4:
      // JVM Math vs libm can differ by an ulp, invisible at 4 decimals)
      customer(s, d).select(
        col("c_custkey"),
        r4(sin(col("c_custkey") % 7)).as("sin_v"),
        r4(cos(col("c_custkey") % 7)).as("cos_v"),
        r4(tan(col("c_custkey") % 5)).as("tan_v"),
        r4(atan2((col("c_custkey") % 3).cast(DoubleType), lit(2.0))).as("atan2_v"),
        r4(degrees(col("c_custkey") % 4)).as("deg_v"),
        r4(radians(col("c_custkey") % 360)).as("rad_v"))
        .orderBy("c_custkey")),

    "fn_math" -> ((s, d) =>
      customer(s, d).select(
        col("c_custkey"),
        abs(col("c_acctbal")).as("abs_bal"),
        round(dec(col("c_acctbal")), 1).cast(DecimalType(18, 1))
          .cast(DoubleType).as("bal_r1"),
        floor(col("c_acctbal")).as("fl"),
        ceil(col("c_acctbal")).as("ce"),
        (col("c_custkey") % 7).as("mod7"),
        pow(col("c_custkey").cast(DoubleType), lit(2.0)).as("sq"),
        r4(sqrt(abs(col("c_acctbal")))).as("sqrt_bal"),
        r4(exp(col("c_custkey") / lit(1000.0))).as("exp_k"),
        r4(log(abs(col("c_acctbal")) + lit(1.0))).as("ln_bal"),
        r4(log10(abs(col("c_acctbal")) + lit(1.0))).as("log10_bal"),
        signum(col("c_acctbal")).as("sgn"),
        greatest(col("c_acctbal"), lit(0.0)).as("pos_part"),
        least(col("c_acctbal"), lit(0.0)).as("neg_part"))
        .orderBy("c_custkey")),
    "fn_conditional" -> ((s, d) =>
      orders(s, d).select(
        col("o_orderkey"),
        when(col("o_orderstatus") === "F", "done")
          .when(col("o_orderstatus") === "O", "open")
          .otherwise("other").as("status_word"),
        coalesce(nullif(col("o_orderstatus"), lit("P")), lit("pending")).as("coal"),
        nullif(col("o_orderpriority"), lit("1-URGENT")).as("prio_or_null"),
        when(col("o_totalprice") > 200000, lit("big")).otherwise(lit("small")).as("size_word"))
        .orderBy("o_orderkey")),
    "fn_cast" -> ((s, d) =>
      customer(s, d).select(
        col("c_custkey"),
        col("c_custkey").cast(StringType).as("key_str"),
        // nullif: a no-match extract is '' and CAST('' AS BIGINT) is an
        // ANSI error in Spark (and DuckDB) — no-match means NULL
        nullif(regexp_extract(col("c_name"), "([0-9]+)$", 1), lit("")).cast(L)
          .as("num_from_str"),
        col("c_acctbal").cast(DecimalType(12, 2)).cast(DoubleType).as("bal_dec"),
        col("c_nationkey").cast(DoubleType).as("nk_dbl"),
        (col("c_acctbal") > 0).cast(L).as("is_pos"),
        lit("1996-07-01").cast(DateType).as("lit_date"),
        lit("1996-07-01 12:30:00").cast(TimestampType).as("lit_ts"))
        .orderBy("c_custkey")),
    "fn_try" -> ((s, d) =>
      // error-safe expression family: malformed input degrades to NULL
      // instead of failing the job — at 100 TB a single dirty row must
      // never kill a 10-hour pipeline; try_* is the per-expression
      // equivalent of PERMISSIVE scan mode (cf. scan_csv_malformed)
      customer(s, d).select(
        col("c_custkey"),
        // parses for even keys (numeric string), NULL for names
        expr("try_cast(CASE WHEN c_custkey % 2 = 0 THEN CAST(c_custkey AS STRING) " +
          "ELSE c_name END AS BIGINT)").as("tc"),
        // NULL where the divisor cycles through 0
        r4(expr("try_divide(c_acctbal, CAST(c_custkey % 3 AS DOUBLE))")).as("td"),
        // 1-based element_at: indices 3,4 overrun the 2-element list → NULL
        // (index 0 is rejected EAGERLY even by try_element_at, so the
        // cycle is 1..4, never 0)
        expr("try_element_at(array('a','b'), CAST(c_custkey % 4 + 1 AS INT))").as("te"))
        .orderBy("c_custkey")),
    "fn_array" -> ((s, d) =>
      embeddings(s, d).select(
        col("vec_id"),
        size(col("embedding")).cast(L).as("n_dims"),
        // try_: an empty array yields NULL (DuckDB [] subscripts do too);
        // plain element_at is an ANSI out-of-bounds error
        expr("try_element_at(embedding, 1)").as("first_val"),
        expr("try_element_at(embedding, -1)").as("last_val"),
        // + 0.0 after rounding: IEEE-normalizes -0.0 → 0.0 (repr-identical
        // across engines; Spark and DuckDB disagree on round(-1e-7, 4) sign)
        (r4(array_max(col("embedding"))) + lit(0.0)).as("vmax"),
        (r4(array_min(col("embedding"))) + lit(0.0)).as("vmin"),
        to_json(array_sort(array(col("vec_id"), col("vec_id") % 10, lit(5)))).as("sorted_arr"),
        array_contains(array(col("vec_id") % 10, lit(3)), 3).as("has3"),
        to_json(slice(sequence(lit(1), col("vec_id") % 5 + 2), 1, 2)).as("seq_head"))
        .orderBy("vec_id")),
    "fn_array_hof" -> ((s, d) =>
      embeddings(s, d).select(
        col("vec_id"),
        r4(expr("aggregate(embedding, cast(0 as double), (a, x) -> a + x * x)")).as("norm2"),
        r4(expr("aggregate(zip_with(embedding, embedding, (x, y) -> x * y), cast(0 as double), (a, v) -> a + v)")).as("self_dot"),
        size(expr("filter(embedding, x -> x > 0)")).cast(L).as("n_pos"),
        expr("exists(embedding, x -> x > 0.2)").as("any_big"),
        (r4(expr("try_element_at(transform(embedding, x -> x * 2), 1)")) + lit(0.0)).as("first_x2"))
        .orderBy("vec_id")),
    "fn_bitwise" -> ((s, d) =>
      // bitwise family: & | xor ~ shifts popcount (DuckDB dialect: ^ is
      // POWER there, so the oracle uses xor(); bit_count is TINYINT there,
      // BIGINT-cast on both sides)
      customer(s, d).select(
        col("c_custkey"),
        expr("c_custkey & 255").as("b_and"),
        expr("c_custkey | 4096").as("b_or"),
        expr("c_custkey ^ 1365").as("b_xor"),
        expr("~c_custkey").as("b_not"),
        expr("shiftleft(c_custkey, 3)").as("b_shl"),
        expr("shiftright(c_custkey, 2)").as("b_shr"),
        expr("bit_count(c_custkey)").cast(LongType).as("b_popcnt"))
        .orderBy("c_custkey")),

    "fn_struct" -> ((s, d) =>
      // struct family: named_struct construction, field access, JSON
      // rendering (both engines emit compact {"k":v} with insertion order)
      customer(s, d)
        .select(col("c_custkey"),
          expr("named_struct('key', c_custkey, 'segment', c_mktsegment)").as("st"))
        .select(col("c_custkey"),
          col("st.key").as("st_key"),
          col("st.segment").as("st_segment"),
          // pin null rendering: Spark's default drops null fields while
          // DuckDB's to_json emits "field":null — fixture has no nulls
          // today, but the contract must not depend on that
          to_json(col("st"), Map("ignoreNullFields" -> "false")).as("st_json"))
        .orderBy("c_custkey")),

    "fn_map" -> ((s, d) =>
      // map construction + introspection (map_from_arrays / element_at /
      // map_keys / map explode), emitted as exploded (key, value) rows —
      // DuckDB's MAP dialect differs, but the row form hash-checks exactly
      events(s, d).select(
        col("event_id"),
        map_from_arrays(array(lit("type"), lit("uid")),
          array(col("event_type"), col("user_id").cast(StringType))).as("m"))
        .select(
          col("event_id"),
          element_at(col("m"), "type").as("m_type"),
          size(map_keys(col("m"))).cast(LongType).as("n_keys"),
          explode(col("m")))
        .select("event_id", "key", "value", "m_type", "n_keys")
        .orderBy("event_id", "key")),
    "fn_json" -> ((s, d) =>
      events(s, d).select(
        col("event_id"),
        get_json_object(col("props"), "$.k").as("k_str"),
        from_json(col("props"), StructType(Seq(StructField("k", IntegerType))))
          .getField("k").as("k_int"))
        .orderBy("event_id")),
    "fn_url" -> ((s, d) =>
      // URL component extraction (host / path / one query param) — the
      // scalar web-corpus primitive. The URL is synthesized per customer
      // row from fixture columns so both engines parse the SAME strings;
      // Spark uses the codegen'd parse_url expression, the oracle the
      // equivalent component regexes.
      customer(s, d)
        .withColumn("url",
          concat(lit("https://"),
            coalesce(nullif(lower(col("c_mktsegment")), lit("")), lit("na")),
            lit(".example.com/c/"),
            col("c_custkey"), lit("?id="), col("c_custkey") % 13, lit("&ref=mail")))
        .select(col("c_custkey"), col("url"),
          // try_ variants (round 11, unicode edge variant): ANSI parse_url
          // THROWS on an invalid URI (a space in the authority kills the
          // whole job on one dirty row) — crawl URLs are dirty, so the
          // production posture is NULL-on-invalid, the fn_try discipline.
          // java.net.URI semantics the oracle mirrors: a space anywhere →
          // invalid (all parts NULL); a non-ASCII char in the authority →
          // URI parses registry-based, so HOST is NULL but PATH/QUERY
          // still extract.
          expr("try_parse_url(url, 'HOST')").as("host"),
          expr("try_parse_url(url, 'PATH')").as("path"),
          expr("try_parse_url(url, 'QUERY', 'id')").as("id_param"))
        .orderBy("c_custkey"))
  )

  val oracles: Map[String, String] = Map(
    "fn_string" ->
      // rev: DuckDB's reverse() is grapheme-cluster-aware while Spark's is
      // code-point-based (divergent on combining accents — unicode edge
      // variant, round 11); the split/list_reverse form is the exact
      // code-point mirror (astral chars stay intact: RE2 splits on code
      // points, not UTF-16 units)
      """SELECT p_partkey,
         upper(p_name) AS up, lower(p_brand) AS lo,
         length(p_name) AS len,
         trim('  ' || p_name || '  ') AS trimmed,
         ltrim('xx' || p_name, 'x') AS ltrimmed,
         rtrim(p_name || 'yy', 'y') AS rtrimmed,
         substring(p_name, 1, 4) AS sub4,
         p_brand || '-' || p_type AS cat,
         concat_ws('/', p_brand, p_type, p_name) AS catws,
         replace(p_name, ' ', '_') AS replaced,
         lpad(p_brand, 12, '*') AS lpadded,
         rpad(p_type, 10, '.') AS rpadded,
         strpos(p_name, 'e') AS pos_e,
         array_to_string(list_reverse(regexp_split_to_array(p_name, '')), '') AS rev
         FROM part ORDER BY p_partkey NULLS FIRST""",
    "fn_regex" ->
      """SELECT c_custkey,
         regexp_extract(c_name, '([0-9]+)$', 1) AS cust_num,
         regexp_replace(c_name, '0+', '0', 'g') AS squeezed,
         CAST(regexp_matches(c_name, '00[1-4]') AS BIGINT) AS has_digit_run
         FROM customer ORDER BY c_custkey NULLS FIRST""",
    "fn_date" ->
      """SELECT o_orderkey,
         year(o_orderdate) AS y, month(o_orderdate) AS m,
         dayofmonth(o_orderdate) AS dom,
         dayofweek(o_orderdate) + 1 AS dow1,
         CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
         CAST(o_orderdate AS DATE) + 30 AS plus30,
         datediff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS days_to_2002,
         last_day(CAST(o_orderdate AS DATE)) AS eom,
         make_date(year(o_orderdate), month(o_orderdate), 1) AS made,
         CAST(o_orderdate AS DATE) AS as_date,
         epoch_us(o_orderdate) AS epoch_us
         FROM orders ORDER BY o_orderkey NULLS FIRST""",
    "fn_trig" ->
      """SELECT c_custkey,
         round(sin(c_custkey % 7), 4) AS sin_v,
         round(cos(c_custkey % 7), 4) AS cos_v,
         round(tan(c_custkey % 5), 4) AS tan_v,
         round(atan2(CAST(c_custkey % 3 AS DOUBLE), 2.0), 4) AS atan2_v,
         round(degrees(c_custkey % 4), 4) AS deg_v,
         round(radians(c_custkey % 360), 4) AS rad_v
         FROM customer ORDER BY c_custkey NULLS FIRST""",
    "fn_math" ->
      """SELECT c_custkey,
         abs(c_acctbal) AS abs_bal,
         CAST(CAST(round(CAST(c_acctbal AS DECIMAL(18,4)), 1) AS DECIMAL(18,1)) AS DOUBLE) AS bal_r1,
         CAST(floor(c_acctbal) AS BIGINT) AS fl,
         CAST(ceil(c_acctbal) AS BIGINT) AS ce,
         c_custkey % 7 AS mod7,
         pow(CAST(c_custkey AS DOUBLE), 2.0) AS sq,
         round(sqrt(abs(c_acctbal)), 4) AS sqrt_bal,
         round(exp(c_custkey / 1000.0), 4) AS exp_k,
         round(ln(abs(c_acctbal) + 1.0), 4) AS ln_bal,
         round(log10(abs(c_acctbal) + 1.0), 4) AS log10_bal,
         CAST(sign(c_acctbal) AS DOUBLE) AS sgn,
         greatest(c_acctbal, 0.0) AS pos_part,
         least(c_acctbal, 0.0) AS neg_part
         FROM customer ORDER BY c_custkey NULLS FIRST""",
    "fn_conditional" ->
      """SELECT o_orderkey,
         CASE WHEN o_orderstatus = 'F' THEN 'done'
              WHEN o_orderstatus = 'O' THEN 'open'
              ELSE 'other' END AS status_word,
         coalesce(nullif(o_orderstatus, 'P'), 'pending') AS coal,
         nullif(o_orderpriority, '1-URGENT') AS prio_or_null,
         CASE WHEN o_totalprice > 200000 THEN 'big' ELSE 'small' END AS size_word
         FROM orders ORDER BY o_orderkey NULLS FIRST""",
    "fn_bitwise" ->
      """SELECT c_custkey,
         c_custkey & 255 AS b_and,
         c_custkey | 4096 AS b_or,
         xor(c_custkey, 1365) AS b_xor,
         ~c_custkey AS b_not,
         c_custkey << 3 AS b_shl,
         c_custkey >> 2 AS b_shr,
         CAST(bit_count(c_custkey) AS BIGINT) AS b_popcnt
         FROM customer ORDER BY c_custkey NULLS FIRST""",
    "fn_struct" ->
      """SELECT c_custkey,
         c_custkey AS st_key,
         c_mktsegment AS st_segment,
         CAST(to_json(struct_pack(key := c_custkey, segment := c_mktsegment)) AS VARCHAR) AS st_json
         FROM customer ORDER BY c_custkey NULLS FIRST""",
    "fn_map" ->
      """SELECT event_id, key, value, m_type, n_keys FROM (
           SELECT event_id, 'type' AS key, event_type AS value,
                  event_type AS m_type, CAST(2 AS BIGINT) AS n_keys FROM events
           UNION ALL
           SELECT event_id, 'uid', CAST(user_id AS VARCHAR),
                  event_type, CAST(2 AS BIGINT) FROM events)
         ORDER BY event_id NULLS FIRST, key NULLS FIRST""",
    "fn_try" ->
      """SELECT c_custkey,
         TRY_CAST(CASE WHEN c_custkey % 2 = 0 THEN CAST(c_custkey AS VARCHAR)
                  ELSE c_name END AS BIGINT) AS tc,
         round(CASE WHEN c_custkey % 3 = 0 THEN NULL
               ELSE c_acctbal / CAST(c_custkey % 3 AS DOUBLE) END, 4) AS td,
         list_extract(['a','b'], CAST(c_custkey % 4 + 1 AS INT)) AS te
         FROM customer ORDER BY c_custkey NULLS FIRST""",
    "fn_cast" ->
      """SELECT c_custkey,
         CAST(c_custkey AS VARCHAR) AS key_str,
         CAST(nullif(regexp_extract(c_name, '([0-9]+)$', 1), '') AS BIGINT) AS num_from_str,
         CAST(CAST(c_acctbal AS DECIMAL(12,2)) AS DOUBLE) AS bal_dec,
         CAST(c_nationkey AS DOUBLE) AS nk_dbl,
         CAST(c_acctbal > 0 AS BIGINT) AS is_pos,
         DATE '1996-07-01' AS lit_date,
         TIMESTAMP '1996-07-01 12:30:00' AS lit_ts
         FROM customer ORDER BY c_custkey NULLS FIRST""",
    "fn_array" ->
      """SELECT vec_id,
         len(embedding) AS n_dims,
         CAST(embedding[1] AS DOUBLE) AS first_val,
         CAST(embedding[-1] AS DOUBLE) AS last_val,
         round(CAST(list_max(embedding) AS DOUBLE), 4) + 0.0 AS vmax,
         round(CAST(list_min(embedding) AS DOUBLE), 4) + 0.0 AS vmin,
         to_json(list_sort([vec_id, vec_id % 10, 5])) AS sorted_arr,
         list_contains([vec_id % 10, 3], 3) AS has3,
         to_json((range(1, vec_id % 5 + 3))[1:2]) AS seq_head
         FROM embeddings ORDER BY vec_id NULLS FIRST""",
    "fn_array_hof" ->
      """SELECT vec_id,
         round(coalesce(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
                        CASE WHEN embedding IS NULL THEN NULL ELSE CAST(0.0 AS DOUBLE) END), 4) AS norm2,
         round(coalesce(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
                        CASE WHEN embedding IS NULL THEN NULL ELSE CAST(0.0 AS DOUBLE) END), 4) AS self_dot,
         len(list_filter(embedding, x -> x > 0)) AS n_pos,
         len(list_filter(embedding, x -> CAST(x AS DOUBLE) > 0.2)) > 0 AS any_big,
         round(CAST(embedding[1] AS DOUBLE) * 2, 4) + 0.0 AS first_x2
         FROM embeddings ORDER BY vec_id NULLS FIRST""",
    "fn_json" ->
      """SELECT event_id,
         json_extract_string(nullif(props, ''), '$.k') AS k_str,
         CAST(json_extract(nullif(props, ''), '$.k') AS INTEGER) AS k_int
         FROM events ORDER BY event_id NULLS FIRST""",
    "fn_url" ->
      // mirrors try_parse_url's java.net.URI semantics (round 11, unicode
      // edge variant): a space anywhere → invalid URI → every part NULL;
      // a non-ASCII char in the authority → registry-based parse → HOST
      // NULL while PATH/QUERY still extract
      """SELECT c_custkey, url,
         CASE WHEN url LIKE '% %'
                OR regexp_matches(regexp_extract(url, '^[a-z]+://([^/?#]*)', 1), '[^\x00-\x7f]')
              THEN NULL
              ELSE regexp_extract(url, '^[a-z]+://([^/?#]+)', 1) END AS host,
         CASE WHEN url LIKE '% %' THEN NULL
              ELSE regexp_extract(url, '^[a-z]+://[^/?#]+([^?#]*)', 1) END AS path,
         CASE WHEN url LIKE '% %' THEN NULL
              ELSE regexp_extract(url, '[?&]id=([^&#]*)', 1) END AS id_param
         FROM (SELECT c_custkey,
                 'https://' || coalesce(nullif(lower(c_mktsegment), ''), 'na')
                   || '.example.com/c/' ||
                 CAST(c_custkey AS VARCHAR) || '?id=' ||
                 CAST(c_custkey % 13 AS VARCHAR) || '&ref=mail' AS url
               FROM customer)
         ORDER BY c_custkey NULLS FIRST"""
  )
}
