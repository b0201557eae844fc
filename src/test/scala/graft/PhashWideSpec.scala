package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Custom

/** Drives mm_dedup_phash's wide-width regime (round 12): the wb > 15
  * rungs source SimHash bits ≥ 60 from a second, independently salted
  * h60 word, but no gate fixture can reach them (wb = 16 needs > 2·10⁷
  * docs). Custom.phashWords is the extracted single-definition signature
  * stage; this spec forges the knobs frame to wb = 20 (bands of 20 bits,
  * band 3 = global bits 60–79 — ENTIRELY second-word sourced) and pins
  * the properties a silent second-word failure would break:
  *
  *  - th2 liveness: if the guard mis-evaluated and th2 stayed 0, every
  *    bit ≥ 60 would weight −1 per shingle and band 3 would collapse to
  *    p3 = 0 for ALL docs (one universal bucket — silently dropped by
  *    the census, i.e. exactly the recall-collapse class round 11
  *    flagged). Distinct p3 values across random docs prove the word is
  *    live and discriminating.
  *  - width containment: every word stays under 2^wb — a bit landing in
  *    the wrong word would overflow its band.
  *  - near-dup geometry: a doc sharing most shingles with another has a
  *    small 80-bit hamming; unrelated docs sit near 40 (the random
  *    expectation) — so the wide hash still measures similarity, and
  *    the two regimes are separated by a wide margin.
  *  - wb ≤ 15 equivalence: at wb = 8 the four words re-concatenate to
  *    exactly the packed single-word SimHash the pre-round-12 plan
  *    computed (the gate-neutrality claim, asserted directly).
  */
class PhashWideSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  import spark.implicits._

  /** hex-payload frame from raw strings (the key's own hx derivation). */
  private def hxDf(docs: Seq[(Long, String)]) =
    docs.toDF("doc_id", "text")
      .select(col("doc_id"),
        hex(col("text").cast("binary")).as("hx"))
      .filter(length(col("hx")) >= 4)

  private def knobs(wb: Int) =
    Seq(wb).toDF("wb").select(col("wb"))

  private val rnd = new scala.util.Random(1220L)
  private def randDoc(n: Int): String =
    (0 until n).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString

  test("wb = 20: second-word bits are live, contained, and similarity-bearing") {
    val base = randDoc(400)
    val near = base.substring(0, 390) + randDoc(10) // ~97% shared shingles
    val docs = Seq((0L, base), (1L, near)) ++
      (2L until 20L).map(i => (i, randDoc(400)))
    val words = Custom.phashWords(hxDf(docs), knobs(20))
      .select($"doc_id", $"p0", $"p1", $"p2", $"p3")
      .collect().map(r => r.getLong(0) ->
        Array(r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap

    // width containment: every band word < 2^20
    words.values.foreach(ws => ws.foreach(w =>
      assert(w >= 0 && w < (1L << 20), s"band word out of width: $w")))
    // th2 liveness: band 3 (bits 60-79) must discriminate across docs
    val p3s = words.values.map(_(3)).toSet
    assert(p3s.size > 10,
      s"second-word band collapsed to ${p3s.size} distinct values — th2 dead")
    def hamming(a: Array[Long], b: Array[Long]): Int =
      a.zip(b).map { case (x, y) => java.lang.Long.bitCount(x ^ y) }.sum
    val near01 = hamming(words(0L), words(1L))
    val others = (2L until 20L).map(i => hamming(words(0L), words(i)))
    info(s"near-dup hamming $near01; unrelated min ${others.min}, mean ${others.sum / others.size}")
    assert(near01 <= 8, s"near-dup pair too far at 80 bits: $near01")
    assert(others.min >= 20, s"unrelated doc too close: ${others.min}")
  }

  test("wb = 8: the four band words re-concatenate to the packed 32-bit SimHash") {
    val docs = (0L until 12L).map(i => (i, randDoc(120)))
    val words = Custom.phashWords(hxDf(docs), knobs(8))
      .select($"doc_id", $"p0", $"p1", $"p2", $"p3")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1) | (r.getLong(2) << 8) | (r.getLong(3) << 16) |
          (r.getLong(4) << 24))).toMap
    // independently recompute the pre-round-12 packed form: one 32-bit
    // simhash over the same 2-byte shingle h60 family
    val hx = hxDf(docs)
    val packed = hx
      .select(col("doc_id"), col("hx"),
        explode(expr("sequence(1, length(hx) - 3, 2)")).as("i"))
      .select(col("doc_id"),
        expr(Tables.h60Spark("substring(hx, CAST(i AS INT), 4)")).as("th"))
      .select(col("doc_id"), col("th"), explode(expr("sequence(0, 31)")).as("bit"))
      .groupBy("doc_id", "bit")
      .agg(sum(expr(
        "CASE WHEN (shiftright(th, CAST(bit AS INT)) & 1) = 1 THEN 1 ELSE -1 END")).as("w"))
      .groupBy("doc_id")
      .agg(sum(expr(
        "CASE WHEN w > 0 THEN shiftleft(CAST(1 AS BIGINT), CAST(bit AS INT)) ELSE CAST(0 AS BIGINT) END")).as("ph"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    docs.foreach { case (id, _) =>
      assert(words(id) === packed(id),
        s"doc $id: per-band words diverge from the packed form")
    }
  }
}
