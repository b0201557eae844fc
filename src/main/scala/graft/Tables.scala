package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Fixture-table loaders + cross-engine determinism helpers.
  *
  * The reference (elliot14A/karna, see SURVEY.md §0) declares tables as
  * tabular files (CSV/TSV/Parquet — reference README.md:2); here every
  * fixture is parquet under `sfDir` (TESTDATA.md). Two scan-level shims are
  * load-bearing for the DuckDB differential oracle (SURVEY.md §1.4):
  *
  *  1. `events.ts` is parquet TIMESTAMP(NANOS); Spark 4.x refuses it unless
  *     `spark.sql.legacy.parquet.nanosAsLong=true`, after which we rebuild a
  *     µs timestamp with integer division — exactly the truncation DuckDB
  *     applies when it reads the same column.
  *  2. `embeddings.embedding` is list<float>; cast to array<double> once at
  *     scan so similarity math happens in the same precision in both engines.
  */
object Tables {

  def path(dir: String, name: String): String = s"$dir/$name.parquet"

  /** The fixture parquet carries isAdjustedToUTC=false timestamps; Spark 4
    * would infer TIMESTAMP_NTZ (and whether it does can vary with session
    * conf touched by other queries). Pin inference OFF so every scan yields
    * TimestampType in the UTC session — one stable type everywhere, equal
    * to DuckDB's naive-µs reading of the same columns.
    */
  private[graft] def pin(s: SparkSession): SparkSession = {
    s.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    s
  }

  def load(s: SparkSession, dir: String, name: String): DataFrame =
    pin(s).read.parquet(path(dir, name))

  def region(s: SparkSession, d: String)   = load(s, d, "region")
  def nation(s: SparkSession, d: String)   = load(s, d, "nation")
  def customer(s: SparkSession, d: String) = load(s, d, "customer")
  def supplier(s: SparkSession, d: String) = load(s, d, "supplier")
  def part(s: SparkSession, d: String)     = load(s, d, "part")
  def orders(s: SparkSession, d: String)   = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String) = load(s, d, "lineitem")
  def documents(s: SparkSession, d: String) = load(s, d, "documents")

  /** ns→µs canonical shim (SURVEY.md §1.4.1). Every events query MUST come
    * through here. The fixture has shipped `ts` two ways across driver
    * rounds — TIMESTAMP(NANOS) (arrives as LongType ns under the legacy
    * conf) and plain µs TIMESTAMP — so the shim is schema-adaptive: the ns
    * form is rebuilt with integer division (`div 1000`, not `/1000` — a
    * double would lose precision at 1.7e18 ns epochs), the µs form passes
    * through. Both land on the same TimestampType column DuckDB sees.
    */
  def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = pin(s).read.parquet(path(dir, "events"))
    raw.schema("ts").dataType match {
      case LongType => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _        => raw
    }
  }

  /** float→double vector cast at scan (SURVEY.md §1.4.2). */
  def embeddings(s: SparkSession, dir: String): DataFrame =
    pin(s).read
      .parquet(path(dir, "embeddings"))
      .withColumn("embedding", expr("transform(embedding, x -> cast(x as double))"))

  /** Fan a small scan out to the session's full parallelism before
    * CPU-heavy per-row expansion (shingling, n-gram explode, minhash).
    *
    * The fixture tables arrive as ONE parquet file → one input partition, so
    * every generator/projection upstream of the first shuffle would run on
    * a single core (measured: dedup_ngram 9.5s → 3s at sf0.1 from this
    * alone). At real scale the scan already has ≥ parallelism partitions
    * and this is a no-op — the guard keeps the extra shuffle from ever
    * touching a big input.
    */
  def fanout(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    // Metadata-only parallelism probe: every fanout caller passes a file
    // scan, whose split count is ≥ its file count, so `inputFiles.length`
    // (resolved from the FileIndex during analysis) is a sound lower bound.
    // Few-but-huge files (count < target) still split by maxPartitionBytes,
    // so only then refine with byte sizes — stat-ing < target files is
    // cheap. The previous `df.rdd.getNumPartitions` forced full physical
    // planning + RDD lineage per call (round-5 carried-over nit) just to
    // read the same number.
    val files = df.inputFiles
    if (files.length >= target) return df
    val conf = df.sparkSession.sessionState.newHadoopConf()
    val maxSplit = df.sparkSession.sessionState.conf.filesMaxPartitionBytes
    val splits = files.map { f =>
      val p = new org.apache.hadoop.fs.Path(f)
      val len = p.getFileSystem(conf).getFileStatus(p).getLen
      math.max(1L, (len + maxSplit - 1) / maxSplit)
    }.sum
    if (splits < target) df.repartition(target) else df
  }

  // ---- determinism helpers (SURVEY.md §7.1) --------------------------------

  /** Engine-portable 60-bit hash family — the keystone of every oracled
    * hash-dependent operator (minhash/simhash/LSH/splits/shingle joins):
    * low 60 bits of md5(x), byte-identical across engines. Defined ONCE
    * per engine so the two spellings cannot drift; any collision (~1e-7
    * birthday odds at 1M keys) is shared by both engines, so the
    * differential gate is unaffected.
    */
  def h60Spark(x: String): String =
    s"CAST(conv(substr(md5($x), 1, 15), 16, 10) AS BIGINT)"

  def h60Duck(x: String): String =
    s"CAST(concat('0x', substr(md5($x), 1, 15)) AS BIGINT)"

  /** Deterministic 80/10/10 train/valid/test split, defined ONCE and
    * shared by `split_assign` and `pipeline_corpus` (Spark side and both
    * oracles) so the assignment formula cannot drift between them.
    */
  def splitBucketSpark: String =
    h60Spark("concat('split:', CAST(doc_id AS STRING))") + " % 100"

  def splitBucketDuck: String =
    h60Duck("concat('split:', CAST(doc_id AS VARCHAR))") + " % 100"

  def splitCase(bucket: String): String =
    s"CASE WHEN $bucket < 80 THEN 'train' WHEN $bucket < 90 THEN 'valid' ELSE 'test' END"

  /** Money/measure discipline: all arithmetic over double money columns is
    * done in DECIMAL so sums are exact and partition-order-free.
    */
  val Money: DecimalType = DecimalType(18, 4)

  def dec(c: Column): Column = c.cast(Money)

  /** Final-output money/measure: aggregate in DECIMAL (exact,
    * partition-order-free), round(x,4) in decimal, then emit DOUBLE.
    *
    * The round() is load-bearing: DuckDB's decimal→decimal CAST *truncates*
    * excess scale while Spark's rounds HALF_UP (verified divergence on
    * sum_charge); both engines' round() are half-away-from-zero, so rounding
    * first makes the decimal exact in both. The final DOUBLE cast is equally
    * load-bearing for the driver's hash compare (round-1 ADVICE.md): the
    * driver canonicalizes Spark parquet DECIMAL columns and DuckDB
    * DECIMAL/HUGEINT results through different Python renderings
    * (Decimal('1.2000') vs 1.2), so any decimal-typed output column
    * hash-mismatches even when values are identical. Both engines cast the
    * same exact scale-4 decimal to its nearest double → bit-identical.
    *
    * Scale caveat: the bit-identical claim holds while |value|·10⁴ < 2⁵³
    * (≈ 9e11 in value) — Spark rounds the decimal→double conversion once,
    * DuckDB converts the scaled integer then divides (two roundings), and
    * the two can differ by 1 ulp beyond that. Fixture sums sit orders of
    * magnitude below the bound; a TB-scale deployment aggregating past it
    * should emit decimals as strings (or split sums) instead.
    */
  def outDec(c: Column): Column =
    round(c, 4).cast(DecimalType(18, 4)).cast(DoubleType)

  /** ≈-valued outputs (SURVEY.md §7.1.2): double, rounded to 4 places in
    * both engines.
    */
  def r4(c: Column): Column = round(c.cast(DoubleType), 4)

  /** Exact HALF-UP 4-dp average of an exact scale-4 decimal sum — DOUBLE
    * output. round() on a DOUBLE quotient is engine-divergent at exact
    * 4-dp half-points: Spark rounds the SHORTEST-STRING decimal of the
    * double (BigDecimal.valueOf → "53396.11375" → HALF_UP → .1138) while
    * DuckDB rounds the full binary value (53396.1137499999… → .1137) —
    * found by the round-11 unicode edge variant the first time a
    * regrouped fixture produced an exact half (q_pricing_summary,
    * sum 427168.9100 / 8). Scaled-integer arithmetic makes the half-point
    * deterministic and identical in both engines:
    * avg₄ = (2·s₄ + n) div (2·n) in 1e-4 units, s₄ = sum·10⁴ (exact —
    * the sum has scale 4). Domain: non-negative sums (integer div == the
    * HALF_UP direction only for s₄ ≥ 0 — true of every money/quantity
    * column here) and |sum·10⁴| < 2⁶³. The oracle mirrors with `//`;
    * a NULL (all-NULL-group) sum stays NULL in both.
    *
    * @param sumExpr SQL for the exact scale-4 decimal sum aggregate
    * @param nExpr   SQL for the divisor aggregate (count(1), sum(pn), …)
    */
  def avg4(sumExpr: String, nExpr: String): Column =
    expr(s"CAST((2 * CAST(($sumExpr) * 10000 AS BIGINT) + ($nExpr)) div " +
      s"(2 * ($nExpr)) AS DOUBLE) / 10000.0")

  /** The DuckDB mirror of [[avg4]] (`//` floors; same scaled-int path). */
  def avg4Duck(sumExpr: String, nExpr: String): String =
    s"CAST((2 * CAST(($sumExpr) * 10000 AS BIGINT) + ($nExpr)) // " +
      s"(2 * ($nExpr)) AS DOUBLE) / 10000.0"

  /** Exact HALF-UP 4-dp ratio of two non-negative BIGINT expressions —
    * the [[avg4]] discipline for INTEGER numerators (round 12, verdict
    * item 8). `round(CAST(num AS DOUBLE)/den, 4)` on an integer ratio is
    * NOT measure-zero divergent: p/q hits an exact 4-dp half-point
    * whenever the lowest-terms q is 32·5^b, and for b=4 the nearest
    * double sits BELOW the half (probe: 3/20000 → DuckDB .0001, Spark's
    * shortest-string HALF_UP .0002). ratio₄ = (2·num·10⁴ + den) div
    * (2·den) in 1e-4 units decides the half in exact integer arithmetic,
    * identically in both engines. Domain: num ≥ 0, den > 0 (div==floor==
    * the HALF_UP direction there; Spark `div` truncates toward zero and
    * DuckDB `//` floors, so NEGATIVE numerators must go through
    * sign-decomposition — see ts_pct_change), num < 2⁵⁹/10⁴. NULL/zero
    * denominators: pair with try_divide-style guards at the call site.
    */
  def ratio4(numExpr: String, denExpr: String): Column =
    expr(s"CAST((2 * ($numExpr) * 10000 + ($denExpr)) div " +
      s"(2 * ($denExpr)) AS DOUBLE) / 10000.0")

  /** The DuckDB mirror of [[ratio4]]. */
  def ratio4Duck(numExpr: String, denExpr: String): String =
    s"CAST((2 * ($numExpr) * 10000 + ($denExpr)) // " +
      s"(2 * ($denExpr)) AS DOUBLE) / 10000.0"

  /** SIGNED exact HALF-UP 4-dp ratio (round 13, ADVICE): [[ratio4]]
    * assumes num ≥ 0 — on a negative numerator Spark `div` (truncate
    * toward zero) and DuckDB `//` (floor) silently diverge AND both
    * round the wrong direction. This is the ts_pct_change
    * sign-decomposition: run the quotient on |num| (where div == floor
    * == HALF-UP-away-from-zero) and reapply the sign; `+ 0.0` clears
    * the -0.0 a negative sign times a zero quotient would leave. NULL
    * num propagates through the quotient (the sign CASE's else branch
    * is multiplied by a NULL quotient). Domain: den > 0,
    * |num| < 2⁵⁹/10⁴.
    */
  def sratio4(numExpr: String, denExpr: String): Column =
    expr(s"IF(($numExpr) >= 0, 1.0D, -1.0D) * " +
      s"(CAST((2 * abs($numExpr) * 10000 + ($denExpr)) div " +
      s"(2 * ($denExpr)) AS DOUBLE) / 10000.0) + 0.0")

  /** The DuckDB mirror of [[sratio4]]. */
  def sratio4Duck(numExpr: String, denExpr: String): String =
    s"(CASE WHEN ($numExpr) >= 0 THEN 1.0 ELSE -1.0 END) * " +
      s"(CAST((2 * abs($numExpr) * 10000 + ($denExpr)) // " +
      s"(2 * ($denExpr)) AS DOUBLE) / 10000.0) + 0.0"
}
