package graft.functions

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, Row, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables._

/** §2.11 custom-function surfaces (SURVEY.md §4.3): the three extension
  * mechanisms a user of the engine reaches for, each demonstrated against a
  * built-in oracle-checkable twin:
  *
  *  - `udf_scalar`: a Scala UDF (Levenshtein DP) next to the codegen'd
  *    built-in `levenshtein` — same values, so the oracle checks both; the
  *    perf ordering (native Expression > UDF) is the §4.3 guidance.
  *  - `udaf_typed`: numerically-stable Welford variance as an
  *    `Aggregator[IN, BUF, OUT]` registered via `functions.udaf` — the
  *    typed custom-aggregate surface (merge() is the partition-combine
  *    path that makes it distribution-correct).
  *  - `mm_meta` / `mm_decode_stub`: multimodal-column plumbing — text
  *    bytes stand in for image/audio payloads (no codec libs in this
  *    container, SURVEY/driver contract): a `binary` payload column with
  *    typed metadata, and a partition-batched decode via `mapPartitions`
  *    whose fake feature extraction is deterministic so the DuckDB oracle
  *    can still check the plumbing end-to-end.
  */
object Custom {

  /** Classic DP Levenshtein — the Scala-UDF exemplar. */
  def levenshteinScala(a: String, b: String): Int = {
    val (m, n) = (a.length, b.length)
    var prev = Array.tabulate(n + 1)(identity)
    var cur = new Array[Int](n + 1)
    var i = 1
    while (i <= m) {
      cur(0) = i
      var j = 1
      while (j <= n) {
        val cost = if (a.charAt(i - 1) == b.charAt(j - 1)) 0 else 1
        cur(j) = math.min(math.min(cur(j - 1) + 1, prev(j) + 1), prev(j - 1) + cost)
        j += 1
      }
      val t = prev; prev = cur; cur = t
      i += 1
    }
    prev(n)
  }

  /** Welford/Chan parallel variance buffer. */
  case class WelfordBuf(n: Long, mean: Double, m2: Double)

  /** Sample variance via Welford updates + Chan's pairwise merge — the
    * order-insensitive formulation that stays stable across any partition
    * split (unlike naive sum-of-squares).
    */
  object WelfordVar extends Aggregator[java.lang.Double, WelfordBuf, java.lang.Double] {
    def zero: WelfordBuf = WelfordBuf(0L, 0.0, 0.0)
    // boxed input/output on purpose: a primitive Double input decodes a
    // NULL row as 0.0 and silently counts it (caught by the edge-fixture
    // nulls sweep against DuckDB's NULL-skipping var_samp); boxed NULL is
    // skipped here exactly like the built-in, and an undefined variance
    // (n < 2) is NULL, not NaN, matching var_samp in both engines
    def reduce(b: WelfordBuf, x: java.lang.Double): WelfordBuf = {
      if (x == null) return b
      val n = b.n + 1
      val delta = x - b.mean
      val mean = b.mean + delta / n
      WelfordBuf(n, mean, b.m2 + delta * (x - mean))
    }
    def merge(a: WelfordBuf, b: WelfordBuf): WelfordBuf = {
      if (a.n == 0) b
      else if (b.n == 0) a
      else {
        val n = a.n + b.n
        val delta = b.mean - a.mean
        WelfordBuf(n,
          a.mean + delta * b.n / n,
          a.m2 + b.m2 + delta * delta * a.n * b.n / n)
      }
    }
    def finish(r: WelfordBuf): java.lang.Double =
      if (r.n < 2) null else java.lang.Double.valueOf(r.m2 / (r.n - 1))
    def bufferEncoder: Encoder[WelfordBuf] = Encoders.product[WelfordBuf]
    def outputEncoder: Encoder[java.lang.Double] = Encoders.DOUBLE
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "udf_scalar" -> ((s, d) => {
      // null-guarded: String params are reference types, so Spark passes
      // NULL straight in (no primitive short-circuit) — an unguarded UDF
      // would NPE the whole job on one dirty row, where the native
      // levenshtein beside it returns NULL (the fn_try discipline)
      val lev = udf((a: String, b: String) =>
        if (a == null || b == null) null
        else Integer.valueOf(levenshteinScala(a, b)))
      val target = lit("Customer#000000042")
      customer(s, d).select(
          col("c_custkey"),
          levenshtein(col("c_name"), target).cast(LongType).as("lev_native"),
          lev(col("c_name"), target).cast(LongType).as("lev_udf"))
        .orderBy("c_custkey")
    }),

    "udaf_typed" -> ((s, d) => {
      val welford = udaf(WelfordVar)
      lineitem(s, d).groupBy("l_returnflag")
        .agg(
          r4(welford(col("l_quantity"))).as("var_welford"),
          r4(var_samp(col("l_quantity"))).as("var_builtin"))
        .orderBy("l_returnflag")
    }),

    "mm_meta" -> ((s, d) =>
      documents(s, d)
        .withColumn("payload", col("text").cast(BinaryType))
        .select(
          col("doc_id"),
          expr("octet_length(payload)").cast(LongType).as("n_bytes"),
          ascii(col("text")).cast(LongType).as("first_byte"),
          md5(col("payload")).as("content_hash"),
          element_at(array(lit("image"), lit("audio"), lit("video")),
            (col("doc_id") % 3 + 1).cast(IntegerType)).as("kind"))
        .orderBy("doc_id")),

    "mm_decode_stub" -> ((s, d) => {
      // partition-batched "decode": binary in → typed features out via
      // mapPartitions (the Spark-side shape a real image/audio decoder
      // plugs into; the byte math is the deterministic stand-in)
      // decodable rows only: a NULL payload has no bytes to decode (the
      // imperative byte math below would NPE) — oracle mirrors the WHERE
      val src = documents(s, d)
        .select(col("doc_id"), col("text").cast(BinaryType).as("payload"))
        .filter(col("payload").isNotNull)
      implicit val enc: Encoder[(Long, Long, Long, Long)] =
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaLong)
      src.mapPartitions { rows: Iterator[Row] =>
        rows.map { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          val head = bytes.take(8).map(_.toLong & 0xffL).sum
          (id, bytes.length.toLong, if (bytes.isEmpty) -1L else (bytes(0).toLong & 0xffL), head)
        }
      }.toDF("doc_id", "n_bytes", "first_byte", "checksum8")
        .orderBy("doc_id")
    }),

    "mm_resize_stub" -> ((s, d) =>
      // image-resize plumbing (the ViT/CLIP preprocessing shape): source
      // dims come from payload metadata (deterministic stand-in where a
      // header parse would plug in), the long edge is scaled to the 224
      // budget with aspect preserved, and the patch count is what a
      // vision encoder would tokenize into. EXACT integer arithmetic
      // ((short·224) div long; ceil as (x+15) div 16) — the resize KERNEL
      // is the stub; the schema, dim math, and per-row map-only plan are
      // the real Spark-side work. Zero shuffles beyond the sort.
      documents(s, d)
        .select(col("doc_id"),
          expr("octet_length(cast(text as binary))").cast(LongType).as("n_bytes"),
          ascii(col("text")).cast(LongType).as("fb"))
        .select(col("doc_id"),
          (lit(64L) + col("n_bytes") % 960L).as("src_w"),
          (lit(64L) + col("fb") % 540L).as("src_h"))
        .withColumn("dst_w",
          expr("CASE WHEN src_w >= src_h THEN 224L ELSE (src_w * 224) div src_h END"))
        .withColumn("dst_h",
          expr("CASE WHEN src_h >= src_w THEN 224L ELSE (src_h * 224) div src_w END"))
        .withColumn("n_patches",
          expr("((dst_w + 15) div 16) * ((dst_h + 15) div 16)"))
        .orderBy("doc_id")),

    "mm_dedup_phash" -> ((s, d) => {
      // perceptual-hash near-dup detection for the binary modality — the
      // image-dedup shape (aHash/pHash → band → hamming verify): a 32-bit
      // SimHash over 2-byte payload shingles stands in for the DCT hash
      // (same banding/verify plumbing a real pHash feeds), bands of 8
      // bits bucket candidates, and survivors verify on hamming ≤ 3 via
      // a single codegen'd xor+bit_count. Scale discipline mirrors
      // dedup_near/bandPairs: hot band buckets (>20 docs — boilerplate
      // payloads) carry no discrimination and are dropped BEFORE the
      // self-join, so pairs-per-bucket is bounded; the hash table is
      // localCheckpoint'd once for its three consumers (bands + both
      // verify probes). Everything before the band join is map work.
      val hx = fanout(documents(s, d))
        .select(col("doc_id"), hex(col("text").cast(BinaryType)).as("hx"))
        .filter(length(col("hx")) >= 4)
      val feats = hx
        .select(col("doc_id"), col("hx"),
          explode(expr("sequence(1, length(hx) - 3, 2)")).as("i"))
        .select(col("doc_id"), expr(h60Spark("substring(hx, CAST(i AS INT), 4)")).as("th"))
      val ph = feats
        .select(col("doc_id"), col("th"), explode(expr("sequence(0, 31)")).as("bit"))
        .groupBy("doc_id", "bit")
        .agg(sum(expr(
          "CASE WHEN (shiftright(th, CAST(bit AS INT)) & 1) = 1 THEN 1 ELSE -1 END"))
          .as("w"))
        .groupBy("doc_id")
        .agg(sum(expr(
          "CASE WHEN w > 0 THEN shiftleft(CAST(1 AS BIGINT), CAST(bit AS INT)) ELSE CAST(0 AS BIGINT) END"))
          .as("ph"))
        .localCheckpoint(true)
      val bands = ph
        .select(col("doc_id"), explode(expr("sequence(0, 3)")).as("band"), col("ph"))
        .select(col("doc_id"), col("band"),
          expr("shiftright(ph, CAST(band * 8 AS INT)) & 255").as("bv"))
      val kept = bands.join(
        bands.groupBy("band", "bv").agg(count(lit(1)).as("n_df"))
          .filter(col("n_df") <= 20),
        Seq("band", "bv"))
      val cand = kept.as("x").join(kept.as("y"),
          col("x.band") === col("y.band") && col("x.bv") === col("y.bv") &&
            col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("a"), col("y.doc_id").as("b")).distinct()
      cand
        .join(ph.select(col("doc_id").as("a"), col("ph").as("pa")), "a")
        .join(ph.select(col("doc_id").as("b"), col("ph").as("pb")), "b")
        .select(col("a"), col("b"),
          expr("CAST(bit_count(pa ^ pb) AS BIGINT)").as("hamming"))
        .filter(col("hamming") <= 3)
        .orderBy("a", "b")
    }),

    "mm_window_energy" -> ((s, d) =>
      // audio-feature plumbing: OVERLAPPING windows (width 16 bytes, hop 8
      // — the STFT shape) over the opaque payload, per-window "energy" =
      // sum of byte values (the deterministic stand-in where a DSP kernel
      // would plug in). First 5 windows per doc keep the fixture output
      // bounded; generator + codegen'd hex arithmetic, no shuffle until
      // the final sort.
      documents(s, d)
        .select(col("doc_id"),
          hex(col("text").cast(BinaryType)).as("h"),
          expr("octet_length(cast(text as binary))").cast(LongType).as("n_bytes"))
        .select(col("doc_id"), col("h"), col("n_bytes"),
          explode(expr("filter(sequence(0, 4), w -> w * 8 < n_bytes)")).as("w"))
        .select(col("doc_id"),
          col("w").cast(LongType).as("win_idx"),
          (col("w") * 8).cast(LongType).as("win_off"),
          expr("""CAST(coalesce(aggregate(
                    transform(sequence(1, 16), i -> CASE
                      WHEN (w * 8 + i) * 2 <= length(h)
                      THEN CAST(conv(substring(h, CAST((w * 8 + i - 1) * 2 + 1 AS INT), 2), 16, 10) AS BIGINT)
                      ELSE CAST(0 AS BIGINT) END),
                    CAST(0 AS BIGINT), (a, v) -> a + v), 0) AS BIGINT)""").as("energy"))
        .orderBy("doc_id", "win_idx")),

    "mm_frame_sample" -> ((s, d) =>
      // multimodal frame sampling: treat the payload as an opaque "video"
      // byte stream and sample up to 4 fixed-width (16-byte) frames at a
      // payload-proportional stride — the Spark-side plumbing (schema,
      // per-frame fan-out, deterministic offsets, per-frame digest) is
      // real; a codec would replace the hex/md5 digest step. One narrow
      // projection + generator: embarrassingly parallel at 100 TB.
      documents(s, d)
        .select(col("doc_id"),
          hex(col("text").cast(BinaryType)).as("h"),
          expr("octet_length(cast(text as binary))").cast(LongType).as("n_bytes"))
        .withColumn("stride", greatest(lit(16L), expr("n_bytes div 4")))
        .select(col("doc_id"), col("h"), col("stride"),
          explode(expr("filter(sequence(0, 3), f -> f * stride < n_bytes)")).as("f"))
        .select(col("doc_id"),
          col("f").cast(LongType).as("frame_idx"),
          (col("f") * col("stride")).cast(LongType).as("frame_off"),
          md5(expr("substring(h, cast(f * stride * 2 + 1 as int), 32)")).as("frame_md5"))
        .orderBy("doc_id", "frame_idx"))
  )

  val oracles: Map[String, String] = Map(
    "mm_dedup_phash" ->
      s"""WITH hx AS (SELECT doc_id, hex(encode(text)) AS hx FROM documents
                      WHERE length(hex(encode(text))) >= 4),
         f AS (SELECT doc_id, ${h60Duck("substr(hx, CAST(i AS INT), 4)")} AS th
               FROM (SELECT doc_id, hx,
                       unnest(range(1, length(hx) - 2, 2)) AS i FROM hx)),
         w AS (SELECT doc_id, bit,
                 sum(CASE WHEN ((th >> bit) & 1) = 1 THEN 1 ELSE -1 END) AS w
               FROM f CROSS JOIN (SELECT unnest(range(0, 32)) AS bit) bits
               GROUP BY 1, 2),
         p AS (SELECT doc_id,
                 CAST(sum(CASE WHEN w > 0 THEN CAST(1 AS BIGINT) << bit
                               ELSE 0 END) AS BIGINT) AS ph
               FROM w GROUP BY 1),
         bands AS (SELECT doc_id, band,
                     (ph >> CAST(band * 8 AS INT)) & 255 AS bv
                   FROM p CROSS JOIN (SELECT unnest(range(0, 4)) AS band) bs),
         cnt AS (SELECT band, bv, count(*) AS n_df FROM bands GROUP BY 1, 2),
         kept AS (SELECT b.doc_id, b.band, b.bv FROM bands b
                  JOIN cnt USING (band, bv) WHERE n_df <= 20),
         cand AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
                  FROM kept x JOIN kept y
                    ON x.band = y.band AND x.bv = y.bv AND x.doc_id < y.doc_id)
         SELECT a, b, CAST(bit_count(xor(pa.ph, pb.ph)) AS BIGINT) AS hamming
         FROM cand JOIN p pa ON pa.doc_id = a JOIN p pb ON pb.doc_id = b
         WHERE bit_count(xor(pa.ph, pb.ph)) <= 3
         ORDER BY a NULLS FIRST, b NULLS FIRST""",
    "mm_window_energy" ->
      """WITH b AS (
           SELECT doc_id, hex(encode(text)) AS h,
             CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
           FROM documents),
         w AS (
           SELECT doc_id, h, n_bytes,
             unnest(list_filter(range(0, 5), w -> w * 8 < n_bytes)) AS w
           FROM b)
         SELECT doc_id, CAST(w AS BIGINT) AS win_idx,
           CAST(w * 8 AS BIGINT) AS win_off,
           CAST(coalesce(list_sum(list_transform(range(1, 17), i -> CASE
                  WHEN (w * 8 + i) * 2 <= length(h)
                  THEN CAST(concat('0x', substr(h, CAST((w * 8 + i - 1) * 2 + 1 AS INT), 2)) AS INT)
                  ELSE 0 END)), 0) AS BIGINT) AS energy
         FROM w ORDER BY doc_id NULLS FIRST, win_idx NULLS FIRST""",
    "mm_frame_sample" ->
      """WITH b AS (
           SELECT doc_id, hex(encode(text)) AS h,
             CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
             greatest(CAST(16 AS BIGINT),
                      CAST(octet_length(encode(text)) AS BIGINT) // 4) AS stride
           FROM documents),
         f AS (
           SELECT doc_id, h, stride,
             unnest(list_filter(range(0, 4), f -> f * stride < n_bytes)) AS f
           FROM b)
         SELECT doc_id, CAST(f AS BIGINT) AS frame_idx,
           CAST(f * stride AS BIGINT) AS frame_off,
           md5(substr(h, CAST(f * stride * 2 + 1 AS INT), 32)) AS frame_md5
         FROM f ORDER BY doc_id NULLS FIRST, frame_idx NULLS FIRST""",
    "udf_scalar" ->
      """SELECT c_custkey,
         levenshtein(c_name, 'Customer#000000042') AS lev_native,
         levenshtein(c_name, 'Customer#000000042') AS lev_udf
         FROM customer ORDER BY c_custkey NULLS FIRST""",
    "udaf_typed" ->
      """SELECT l_returnflag,
         round(var_samp(l_quantity), 4) AS var_welford,
         round(var_samp(l_quantity), 4) AS var_builtin
         FROM lineitem GROUP BY 1 ORDER BY l_returnflag NULLS FIRST""",
    "mm_meta" ->
      """SELECT doc_id,
         octet_length(encode(text)) AS n_bytes,
         ascii(text) AS first_byte,
         md5(text) AS content_hash,
         (['image', 'audio', 'video'])[CAST(doc_id % 3 + 1 AS INTEGER)] AS kind
         FROM documents ORDER BY doc_id NULLS FIRST""",
    "mm_resize_stub" ->
      // identical integer dim math over the same payload metadata
      """WITH m AS (SELECT doc_id,
             64 + CAST(octet_length(encode(text)) AS BIGINT) % 960 AS src_w,
             64 + CAST(ascii(text) AS BIGINT) % 540 AS src_h
           FROM documents),
         r AS (SELECT doc_id, src_w, src_h,
             CASE WHEN src_w >= src_h THEN 224 ELSE (src_w * 224) // src_h END AS dst_w,
             CASE WHEN src_h >= src_w THEN 224 ELSE (src_h * 224) // src_w END AS dst_h
           FROM m)
         SELECT doc_id, src_w, src_h, dst_w, dst_h,
           ((dst_w + 15) // 16) * ((dst_h + 15) // 16) AS n_patches
         FROM r ORDER BY doc_id NULLS FIRST""",
    "mm_decode_stub" ->
      // byte-based (octet-level over encode(text), matching the Spark side's
      // UTF-8 byte math) — round-1 ADVICE.md: the previous ascii/substr form
      // was character-based and only agreed on ASCII-only fixtures, and
      // list_sum over an empty range yields NULL (→ coalesce 0); integer
      // list_sum returns HUGEINT (→ CAST BIGINT for the driver hash)
      """SELECT doc_id,
         CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
         CAST(CASE WHEN octet_length(encode(text)) = 0 THEN -1
              ELSE CAST(concat('0x', substr(hex(encode(text)), 1, 2)) AS INT)
              END AS BIGINT) AS first_byte,
         CAST(coalesce(list_sum(list_transform(
                range(1, least(8, octet_length(encode(text))) + 1),
                i -> CAST(concat('0x', substr(hex(encode(text)), 2*i-1, 2)) AS INT))),
              0) AS BIGINT) AS checksum8
         FROM documents WHERE text IS NOT NULL
         ORDER BY doc_id NULLS FIRST"""
  )
}
