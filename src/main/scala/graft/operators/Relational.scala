package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables._

/** §2.1 scans/sources/sinks, §2.2 projections/filters, §2.6 sorts/limits,
  * §2.7 set operations. (SURVEY.md — all derived from the reference's SQL
  * surface, README.md:2; reference implements none of it, karna-core stub.)
  *
  * Determinism: every query ends in an explicit total order (SURVEY.md
  * §7.1.3) and the DuckDB oracle orders identically with explicit NULLS
  * FIRST (Spark's asc default) so row streams hash-match.
  */
object Relational {

  /** Writable scratch dir for derived CSV/TSV fixtures + sink round-trips
    * (FIXTURES.md: no CSV fixtures exist; derive once from parquet).
    * PID-namespaced (the Derived.scala discipline): the oracle SQL embeds
    * these absolute paths, and two JVMs on one host (a Verify and a
    * Bench, or two CI jobs at different sf) would otherwise overwrite
    * each other's exports between one process's Spark scan and its
    * DuckDB oracle read of the same file.
    */
  val exportDir: String =
    s"/tmp/graft_export_${java.lang.ProcessHandle.current().pid()}"

  /** Export `nation` once as a single deterministic CSV/TSV file (sorted by
    * pk, driver-side — 25 rows) so Spark and DuckDB scan the *same* file.
    * Always overwritten from the CURRENT sfDir (round-1 ADVICE.md: a bare
    * exists() check silently reused one sf's export at another, and stale
    * /tmp state survived across rounds; the oracle SQL embeds this fixed
    * path, so the file must always reflect the sf of the running Verify).
    */
  private def ensureNationText(s: SparkSession, dir: String, sep: String, ext: String): String = {
    val out = new java.io.File(s"$exportDir/nation.$ext")
    out.getParentFile.mkdirs()
    // NULL renders as an empty field — both engines' CSV readers parse it
    // (and a genuinely empty string) back to NULL, a lossy but IDENTICAL
    // round-trip on the shared file (driver-side getInt would NPE)
    val rows = nation(s, dir)
      .orderBy("n_nationkey")
      .collect()
      .map { r =>
        def cell(i: Int): String = if (r.isNullAt(i)) "" else r.get(i).toString
        s"${cell(0)}$sep${cell(1)}$sep${cell(2)}"
      }
    val body = (s"n_nationkey${sep}n_name${sep}n_regionkey" +: rows).mkString("\n")
    java.nio.file.Files.writeString(out.toPath, body + "\n")
    out.getPath
  }

  /** PERMISSIVE read of the corrupted nation CSV (shared by the
    * scan_csv_malformed key and its quarantine-count spec). Explicit
    * schema + _corrupt_record: clean rows parse, type-corrupt rows keep
    * their raw line in the corrupt column.
    */
  def malformedScan(s: SparkSession): DataFrame =
    s.read
      .schema("n_nationkey INT, n_name STRING, n_regionkey INT, _corrupt_record STRING")
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .csv(s"$exportDir/nation_malformed.csv")

  /** Deterministic JSONL export (same pattern as the nation CSV): both
    * engines scan the *same* file; doubles render via Double.toString whose
    * shortest-repr round-trips identically in both JSON parsers.
    */
  private def ensureSupplierJsonl(s: SparkSession, dir: String): String = {
    val out = new java.io.File(s"$exportDir/supplier.jsonl")
    out.getParentFile.mkdirs()
    val rows = supplier(s, dir)
      .orderBy("s_suppkey")
      .collect()
      .map { r =>
        def jstr(i: Int): String =
          if (r.isNullAt(i)) "null"
          else "\"" + r.getString(i).flatMap {
            case '\\'         => "\\\\"
            case '"'          => "\\\""
            case c if c < ' ' => f"\\u${c.toInt}%04x" // control chars would split/break JSONL lines
            case c            => c.toString
          } + "\""
        def jnum(i: Int): String = if (r.isNullAt(i)) "null" else r.get(i).toString
        s"""{"s_suppkey": ${jnum(0)}, "s_name": ${jstr(1)}, """ +
          s""""s_nationkey": ${jnum(2)}, "s_acctbal": ${jnum(3)}}"""
      }
    java.nio.file.Files.writeString(out.toPath, rows.mkString("\n") + "\n")
    out.getPath
  }

  // DuckDB read_csv infers BIGINT for integer columns; align Spark's
  // inferred IntegerType up to LongType so schemas agree cross-engine.
  private def scanText(s: SparkSession, dir: String, sep: String, ext: String): DataFrame = {
    val p = ensureNationText(s, dir, sep, ext)
    s.read
      .option("header", "true")
      .option("inferSchema", "true")
      .option("sep", sep)
      .csv(p)
      .select(
        col("n_nationkey").cast(LongType).as("n_nationkey"),
        col("n_name"),
        col("n_regionkey").cast(LongType).as("n_regionkey"))
      .orderBy("n_nationkey")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- §2.1 scans / sinks ------------------------------------------------
    "scan_parquet" -> ((s, d) => region(s, d).orderBy("r_regionkey")),
    "scan_csv" -> ((s, d) => scanText(s, d, ",", "csv")),
    "scan_tsv" -> ((s, d) => scanText(s, d, "\t", "tsv")),
    "scan_jsonl" -> ((s, d) => {
      val p = ensureSupplierJsonl(s, d)
      val schema = StructType(Seq(
        StructField("s_suppkey", LongType), StructField("s_name", StringType),
        StructField("s_nationkey", LongType), StructField("s_acctbal", DoubleType)))
      s.read.schema(schema).json(p)
        .select("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
        .orderBy("s_suppkey")
    }),
    "scan_multifile" -> ((s, d) => {
      val out = s"$exportDir/orders_multi"
      orders(s, d).repartition(4).write.mode("overwrite").parquet(out)
      s.read.parquet(out).orderBy("o_orderkey")
    }),
    "scan_csv_malformed" -> ((s, d) => {
      // PERMISSIVE ingestion: dirty rows land in _corrupt_record instead of
      // failing the scan — at 100 TB one malformed line must never kill the
      // job (the scan-level twin of fn_try). The export is the clean
      // deterministic nation CSV plus two type-corrupt lines; the operator
      // keeps the clean rows (so the oracle is simply `nation`) and the
      // spec asserts exactly 2 quarantined rows.
      val clean = java.nio.file.Paths.get(ensureNationText(s, d, ",", "csv"))
      val out = java.nio.file.Paths.get(s"$exportDir/nation_malformed.csv")
      java.nio.file.Files.writeString(out,
        java.nio.file.Files.readString(clean) +
          "notanint,BADLAND,9\n77,GOODNAME,notanint\n")
      // clean-row predicate on the PARSED columns, not _corrupt_record:
      // a type-corrupt line leaves its failed fields NULL (and nation has
      // none), and referencing only the corrupt column after pruning — as
      // a downstream count() would — is rejected by Spark outright
      malformedScan(s)
        .filter(col("n_nationkey").isNotNull && col("n_name").isNotNull &&
          col("n_regionkey").isNotNull)
        .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
        .orderBy("n_nationkey")
    }),
    "scan_schema_evolution" -> ((s, d) => {
      // schema-evolved multi-file read — at 100 TB, datasets accrete
      // columns over years of writers; mergeSchema unions the per-file
      // footers (a metadata operation) and old files surface NULL for
      // columns they predate. Fixture: v1 files lack n_regionkey.
      val out = s"$exportDir/nation_evolving"
      val n = nation(s, d)
      n.filter(col("n_nationkey") < 13).select("n_nationkey", "n_name")
        .write.mode("overwrite").parquet(s"$out/v1")
      n.filter(col("n_nationkey") >= 13).select("n_nationkey", "n_name", "n_regionkey")
        .write.mode("overwrite").parquet(s"$out/v2")
      s.read.option("mergeSchema", "true").parquet(s"$out/v1", s"$out/v2")
        .select("n_nationkey", "n_name", "n_regionkey")
        .orderBy("n_nationkey")
    }),
    "sink_parquet" -> ((s, d) => {
      val out = s"$exportDir/region_sink"
      region(s, d).write.mode("overwrite").parquet(out)
      s.read.parquet(out).orderBy("r_regionkey")
    }),
    "sink_orc" -> ((s, d) => {
      // ORC round-trip: Spark-native columnar writer + reader (the third
      // columnar format next to parquet and csv/jsonl text). DuckDB cannot
      // read ORC, so the oracle checks CONTENT equality against the same
      // rows' parquet source — the write+read path itself is the system
      // under test, exactly like sink_parquet.
      val out = s"$exportDir/supplier_orc"
      supplier(s, d).write.mode("overwrite").orc(out)
      s.read.orc(out).orderBy("s_suppkey")
    }),
    "scan_csv_gzip" -> ((s, d) => {
      // compressed-text round-trip: gzip CSV is the lowest common
      // denominator of data interchange (and how raw crawl dumps usually
      // arrive). Write-side codec is a writer option; read-side
      // decompression is transparent by extension. Caveat baked into the
      // test: gzip is NOT splittable — each .csv.gz is one task's whole
      // input, so at 100 TB the upstream job must bound individual file
      // sizes (this writer: one file per task) or re-encode to a
      // splittable layout on ingest.
      val out = s"$exportDir/supplier_csv_gz"
      // explicit NULL sentinel: Spark's default writes NULL and '' in ways
      // its own reader folds back to NULL — \N keeps the round-trip
      // lossless so the table itself remains the oracle
      supplier(s, d).write.mode("overwrite").option("header", "true")
        .option("nullValue", "\\N")
        .option("compression", "gzip").csv(out)
      require(new java.io.File(out).listFiles().exists(_.getName.endsWith(".csv.gz")),
        "expected gzip-compressed part files")
      val schema = StructType(Seq(
        StructField("s_suppkey", LongType), StructField("s_name", StringType),
        StructField("s_nationkey", IntegerType), StructField("s_acctbal", DoubleType)))
      s.read.option("header", "true").option("nullValue", "\\N")
        .schema(schema).csv(out).orderBy("s_suppkey")
    }),
    "sink_jsonl" -> ((s, d) => {
      // JSONL export round-trip — the interchange sink next to
      // sink_csv/sink_orc (training corpora ship as JSONL more often
      // than anything else). Write is distributed (one file per task);
      // the read-back pins an explicit schema: inference would both
      // double-scan and type-guess — never acceptable at 100 TB.
      val out = s"$exportDir/nation_jsonl"
      nation(s, d).write.mode("overwrite").json(out)
      val schema = StructType(Seq(
        StructField("n_nationkey", IntegerType), StructField("n_name", StringType),
        StructField("n_regionkey", IntegerType)))
      s.read.schema(schema).json(out)
        .select("n_nationkey", "n_name", "n_regionkey")
        .orderBy("n_nationkey")
    }),
    "sink_csv" -> ((s, d) => {
      val out = s"$exportDir/customer_sink"
      customer(s, d).write.mode("overwrite").option("header", "true")
        .option("nullValue", "\\N").csv(out)
      val schema = StructType(Seq(
        StructField("c_custkey", LongType), StructField("c_name", StringType),
        StructField("c_nationkey", IntegerType), StructField("c_acctbal", DoubleType),
        StructField("c_mktsegment", StringType)))
      s.read.option("header", "true").option("nullValue", "\\N")
        .schema(schema).csv(out).orderBy("c_custkey")
    }),

    // ---- §2.2 projections / filters ---------------------------------------
    "project" -> ((s, d) =>
      customer(s, d).select("c_custkey", "c_name", "c_acctbal").orderBy("c_custkey")),
    "project_expr" -> ((s, d) =>
      lineitem(s, d).select(
        col("l_orderkey"), col("l_linenumber"),
        outDec(dec(col("l_extendedprice")) * (lit(1).cast(Money) - dec(col("l_discount")))).as("net"))
        // (l_orderkey, l_linenumber) is NOT unique in the fixture — tie-break
        // on the value column so the emitted row order is total
        .orderBy("l_orderkey", "l_linenumber", "net")),
    "project_alias" -> ((s, d) =>
      part(s, d).select(col("p_partkey").as("id"), col("p_name").as("part_name"))
        .withColumnRenamed("part_name", "pname").orderBy("id")),
    "filter_compare" -> ((s, d) =>
      part(s, d).filter(col("p_size") > 40).select("p_partkey", "p_name", "p_size")
        .orderBy("p_partkey")),
    "filter_between" -> ((s, d) =>
      orders(s, d)
        .filter(col("o_orderdate").between(lit("1996-01-01").cast(TimestampType),
                                           lit("1996-12-31").cast(TimestampType)))
        .select("o_orderkey", "o_orderdate").orderBy("o_orderkey")),
    "filter_in" -> ((s, d) =>
      nation(s, d).filter(col("n_name").isin("NATION_3", "NATION_7", "NATION_19"))
        .orderBy("n_nationkey")),
    "filter_like" -> ((s, d) =>
      part(s, d).filter(col("p_name").like("%dget%")).select("p_partkey", "p_name")
        .orderBy("p_partkey")),
    "filter_null" -> ((s, d) =>
      // fixtures carry no physical NULLs; manufacture them with nullif so
      // three-valued logic is actually exercised (same expr in the oracle)
      orders(s, d)
        .select(col("o_orderkey"), nullif(col("o_orderstatus"), lit("P")).as("st"))
        .filter(col("st").isNotNull).orderBy("o_orderkey")),
    "filter_boolean" -> ((s, d) =>
      part(s, d)
        .filter((col("p_size") > 20 && col("p_brand") === "Brand#11") ||
                !(col("p_retailprice") > lit(1200.0)))
        .select("p_partkey", "p_brand", "p_size").orderBy("p_partkey")),
    "distinct" -> ((s, d) =>
      orders(s, d).select("o_orderstatus", "o_orderpriority").distinct()
        .orderBy("o_orderstatus", "o_orderpriority")),

    // ---- §2.6 sorts / limits / top-k --------------------------------------
    "sort_multi" -> ((s, d) =>
      customer(s, d)
        .select("c_custkey", "c_mktsegment", "c_acctbal")
        .orderBy(col("c_mktsegment").desc_nulls_last, col("c_acctbal").asc_nulls_first,
                 col("c_custkey"))),
    "limit" -> ((s, d) => orders(s, d).orderBy("o_orderkey").limit(20)),
    "topk" -> ((s, d) =>
      orders(s, d).select("o_orderkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc_nulls_last, col("o_orderkey")).limit(10)),
    "offset" -> ((s, d) =>
      customer(s, d).select("c_custkey", "c_name").orderBy("c_custkey").offset(30).limit(10)),

    // ---- §2.7 set operations ----------------------------------------------
    "set_union_all" -> ((s, d) => {
      val o = orders(s, d)
      o.filter(col("o_orderstatus") === "F").select("o_orderkey", "o_orderstatus")
        .unionByName(o.filter(col("o_totalprice") > 200000).select("o_orderkey", "o_orderstatus"))
        .orderBy("o_orderkey", "o_orderstatus")
    }),
    "set_union" -> ((s, d) => {
      val c = customer(s, d)
      c.select("c_nationkey").unionByName(nation(s, d).select(col("n_nationkey").as("c_nationkey")))
        .distinct().orderBy("c_nationkey")
    }),
    "set_intersect" -> ((s, d) =>
      orders(s, d).filter(col("o_orderstatus") === "F").select("o_custkey")
        .intersect(orders(s, d).filter(col("o_orderstatus") === "O").select("o_custkey"))
        .orderBy("o_custkey")),
    "set_except" -> ((s, d) =>
      customer(s, d).select("c_custkey")
        .except(orders(s, d).select(col("o_custkey").as("c_custkey")))
        .orderBy("c_custkey")),
    "set_except_all" -> ((s, d) =>
      // multiset difference: each customer occurrence cancels ONE order
      // occurrence (bag semantics — distinct from set_except)
      orders(s, d).select(col("o_custkey").as("k"))
        .exceptAll(customer(s, d).select(col("c_custkey").as("k")))
        .orderBy("k")),
    "set_intersect_all" -> ((s, d) =>
      // bag intersection: each custkey survives min(multiplicity-in-F,
      // multiplicity-in-O) times (distinct from set_intersect's set form);
      // plans as one keyed shuffle with partial counts on both sides
      orders(s, d).filter(col("o_orderstatus") === "F").select(col("o_custkey").as("k"))
        .intersectAll(
          orders(s, d).filter(col("o_orderstatus") === "O").select(col("o_custkey").as("k")))
        .orderBy("k"))
  )

  val oracles: Map[String, String] = Map(
    "scan_parquet" -> "SELECT * FROM region ORDER BY r_regionkey NULLS FIRST",
    "scan_csv" ->
      s"SELECT * FROM read_csv('$exportDir/nation.csv', header=true) ORDER BY n_nationkey NULLS FIRST",
    "scan_tsv" ->
      s"SELECT * FROM read_csv('$exportDir/nation.tsv', header=true, delim='\t') ORDER BY n_nationkey NULLS FIRST",
    "scan_jsonl" ->
      // explicit columns: auto-detect has nothing to sniff on a 0-row
      // export (binder error) — mirrors the Spark side's explicit schema
      s"""SELECT s_suppkey, s_name, s_nationkey, s_acctbal
         FROM read_json('$exportDir/supplier.jsonl',
           columns = {s_suppkey: 'BIGINT', s_name: 'VARCHAR',
                      s_nationkey: 'BIGINT', s_acctbal: 'DOUBLE'},
           format = 'newline_delimited')
         ORDER BY s_suppkey NULLS FIRST""",
    "scan_multifile" -> "SELECT * FROM orders ORDER BY o_orderkey NULLS FIRST",
    "scan_csv_malformed" ->
      // the CSV round-trip reads '' back as NULL, and the clean-row
      // predicate then drops any row with a NULL field — mirror both
      """SELECT n_nationkey, n_name, n_regionkey
         FROM nation
         WHERE n_nationkey IS NOT NULL AND n_name IS NOT NULL
           AND n_name <> '' AND n_regionkey IS NOT NULL
         ORDER BY n_nationkey NULLS FIRST""",
    "scan_schema_evolution" ->
      """SELECT n_nationkey, n_name, CAST(NULL AS INTEGER) AS n_regionkey
         FROM nation WHERE n_nationkey < 13
         UNION ALL
         SELECT n_nationkey, n_name, n_regionkey
         FROM nation WHERE n_nationkey >= 13
         ORDER BY n_nationkey NULLS FIRST""",
    "sink_parquet" -> "SELECT * FROM region ORDER BY r_regionkey NULLS FIRST",
    "sink_orc" -> "SELECT * FROM supplier ORDER BY s_suppkey NULLS FIRST",
    "sink_csv" -> "SELECT * FROM customer ORDER BY c_custkey NULLS FIRST",
    "sink_jsonl" -> "SELECT * FROM nation ORDER BY n_nationkey NULLS FIRST",
    "scan_csv_gzip" -> "SELECT * FROM supplier ORDER BY s_suppkey NULLS FIRST",
    "project" ->
      "SELECT c_custkey, c_name, c_acctbal FROM customer ORDER BY c_custkey NULLS FIRST",
    "project_expr" ->
      """SELECT l_orderkey, l_linenumber,
         CAST(round(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4))), 4) AS DOUBLE) AS net
         FROM lineitem ORDER BY l_orderkey NULLS FIRST, l_linenumber NULLS FIRST, net NULLS FIRST""",
    "project_alias" ->
      "SELECT p_partkey AS id, p_name AS pname FROM part ORDER BY id NULLS FIRST",
    "filter_compare" ->
      "SELECT p_partkey, p_name, p_size FROM part WHERE p_size > 40 ORDER BY p_partkey NULLS FIRST",
    "filter_between" ->
      """SELECT o_orderkey, o_orderdate FROM orders
         WHERE o_orderdate BETWEEN TIMESTAMP '1996-01-01 00:00:00' AND TIMESTAMP '1996-12-31 00:00:00'
         ORDER BY o_orderkey NULLS FIRST""",
    "filter_in" ->
      "SELECT * FROM nation WHERE n_name IN ('NATION_3','NATION_7','NATION_19') ORDER BY n_nationkey NULLS FIRST",
    "filter_like" ->
      "SELECT p_partkey, p_name FROM part WHERE p_name LIKE '%dget%' ORDER BY p_partkey NULLS FIRST",
    "filter_null" ->
      """SELECT o_orderkey, nullif(o_orderstatus, 'P') AS st FROM orders
         WHERE nullif(o_orderstatus, 'P') IS NOT NULL ORDER BY o_orderkey NULLS FIRST""",
    "filter_boolean" ->
      """SELECT p_partkey, p_brand, p_size FROM part
         WHERE (p_size > 20 AND p_brand = 'Brand#11') OR NOT (p_retailprice > 1200.0)
         ORDER BY p_partkey NULLS FIRST""",
    "distinct" ->
      """SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
         ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""",
    "sort_multi" ->
      """SELECT c_custkey, c_mktsegment, c_acctbal FROM customer
         ORDER BY c_mktsegment DESC NULLS LAST, c_acctbal ASC NULLS FIRST, c_custkey NULLS FIRST""",
    "limit" -> "SELECT * FROM orders ORDER BY o_orderkey NULLS FIRST LIMIT 20",
    "topk" ->
      """SELECT o_orderkey, o_totalprice FROM orders
         ORDER BY o_totalprice DESC NULLS LAST, o_orderkey NULLS FIRST LIMIT 10""",
    "offset" ->
      "SELECT c_custkey, c_name FROM customer ORDER BY c_custkey NULLS FIRST LIMIT 10 OFFSET 30",
    "set_union_all" ->
      """SELECT * FROM (
           SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderstatus = 'F'
           UNION ALL
           SELECT o_orderkey, o_orderstatus FROM orders WHERE o_totalprice > 200000)
         ORDER BY o_orderkey NULLS FIRST, o_orderstatus NULLS FIRST""",
    "set_union" ->
      """SELECT * FROM (
           SELECT c_nationkey FROM customer
           UNION
           SELECT n_nationkey AS c_nationkey FROM nation)
         ORDER BY c_nationkey NULLS FIRST""",
    "set_intersect" ->
      """SELECT * FROM (
           SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
           INTERSECT
           SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
         ORDER BY o_custkey NULLS FIRST""",
    "set_except" ->
      """SELECT * FROM (
           SELECT c_custkey FROM customer
           EXCEPT
           SELECT o_custkey AS c_custkey FROM orders)
         ORDER BY c_custkey NULLS FIRST""",
    "set_except_all" ->
      """SELECT * FROM (
           SELECT o_custkey AS k FROM orders
           EXCEPT ALL
           SELECT c_custkey FROM customer)
         ORDER BY k NULLS FIRST""",
    "set_intersect_all" ->
      """SELECT * FROM (
           SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F'
           INTERSECT ALL
           SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'O')
         ORDER BY k NULLS FIRST"""
  )
}
