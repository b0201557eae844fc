package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Custom

/** Pins the Spark-side unicode semantics the round-11 `unicode` edge
  * variant exposed (scripts/edgecheck.py). Two kinds of outcome there:
  *
  *  - MIRRORED divergences — the oracle was rewritten to compute what
  *    Spark computes (code-point reverse, ASCII `\b`, try_parse_url's
  *    java.net.URI rules, exact half-up avg4). The edge harness now
  *    gates those cross-engine; this spec adds the direct, readable
  *    statement of each rule so a regression names the rule, not a hash.
  *  - the former KNOWN_DIVERGENT pair (udf_scalar/join_fuzzy) — DuckDB's
  *    levenshtein is byte-based and code-point distance cannot be
  *    mirrored. Round 12 retired the allowlist: the gate now compares a
  *    byte-DP twin (Custom.levenshteinBytes — DuckDB's exact semantics)
  *    on every variant, and the code-point columns are windowed to ASCII
  *    inputs where the two semantics coincide. THIS spec remains the
  *    authority for the code-point semantics the library ships on
  *    multibyte text, and pins the byte twin against its own contract.
  */
class UnicodeSemanticsSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  import spark.implicits._

  private val astral = "𝄞🦀" // 𝄞 U+1D11E, 🦀 U+1F980
  private val combining = "café"            // e + COMBINING ACUTE

  test("levenshtein is code-point-based, and the UDF agrees with the native fn") {
    // (a, b, code-point distance). Byte distances would be (6, 1, 4);
    // UTF-16-char distances (2, 1, 4) for the astral rows.
    val cases = Seq(
      ("数据abc", "abc", 2),      // 2 CJK code points inserted (6 bytes)
      (combining, "cafe", 1),     // combining mark = 1 code point (2 bytes)
      ("a" + astral, "a", 2),     // 2 astral code points = 4 chars, 8 bytes
      (astral, astral, 0))
    cases.foreach { case (a, b, exp) =>
      assert(Custom.levenshteinScala(a, b) === exp, s"UDF distance for ($a, $b)")
    }
    val out = cases.toDF("a", "b", "exp")
      .select(levenshtein($"a", $"b").as("native"), $"exp")
      .as[(Int, Int)].collect()
    out.foreach { case (native, exp) => assert(native === exp) }
  }

  test("levenshteinBytes is UTF-8-byte-based (DuckDB's semantics), = code-point on ASCII") {
    // byte distances for the code-point cases above: the multibyte rows
    // split into (6, 2, 8) bytes where code points count (2, 1, 2)
    assert(Custom.levenshteinBytes("数据abc", "abc") === 6)
    assert(Custom.levenshteinBytes(combining, "cafe") === 2)
    assert(Custom.levenshteinBytes("a" + astral, "a") === 8)
    assert(Custom.levenshteinBytes(astral, astral) === 0)
    // ASCII: byte == code-point == native
    assert(Custom.levenshteinBytes("kitten", "sitting") === 3)
    assert(Custom.levenshteinBytes("kitten", "sitting")
      === Custom.levenshteinScala("kitten", "sitting"))
  }

  test("udf_scalar: byte column everywhere, code-point columns windowed to ASCII") {
    val dir = "target/unicode-cust"
    Seq((1L, "数据Customer#000000001数据"), (2L, "Customer#000000042" + astral),
      (3L, "Ünïcødé Customer#000000007"), (4L, "Customer#0000000" + combining),
      (5L, "Customer#000000099"))
      .toDF("c_custkey", "c_name")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    val out = Custom.queries("udf_scalar")(spark, dir)
      .select($"c_custkey", $"lev_bytes", $"lev_native", $"lev_udf")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Long]),
        Option(r.get(3)).map(_.asInstanceOf[Long]))).toSeq
    assert(out.size === 5)
    out.foreach { case (id, bytes, native, udfCp) =>
      assert(bytes >= 0)
      if (id == 5L) { // ASCII row: all three defined and equal
        assert(native.contains(bytes) && udfCp.contains(bytes),
          s"ASCII row: expected 3-way agreement, got ($bytes, $native, $udfCp)")
      } else { // multibyte rows: code-point columns are NULL by contract
        assert(native.isEmpty && udfCp.isEmpty,
          s"row $id: code-point columns must be NULL outside ASCII")
      }
    }
  }

  test("PII boundary is explicit-ASCII: a CJK neighbor does not suppress a match") {
    // Java's \b is unicode-aware (数customer数 would NOT match \bcustomer\b);
    // the shipped pattern uses ASCII lookarounds, matching RE2's ASCII \b
    val pat = "(?<![A-Za-z0-9_])(customer|value)(?![A-Za-z0-9_])"
    val got = Seq("数据customer数据", "the customer here", "xcustomer", "customer_1")
      .toDF("t").select(regexp_count($"t", lit(pat)).as("n")).as[Int].collect()
    assert(got.toSeq === Seq(1, 1, 0, 0))
  }

  test("try_parse_url: space => invalid URI (all parts NULL); non-ASCII authority => NULL host, path still parses") {
    val rows = Seq(
      "https://src4 café.example.com/doc/4",  // space → invalid
      "https://数据b.example.com/doc/5",   // CJK authority → no server host
      "https://na.example.com/c/1?id=1")
      .toDF("url")
      .select(
        expr("try_parse_url(url, 'HOST')").as("host"),
        expr("try_parse_url(url, 'PATH')").as("path"))
      .collect()
    assert(rows(0).isNullAt(0) && rows(0).isNullAt(1))
    assert(rows(1).isNullAt(0) && rows(1).getString(1) === "/doc/5")
    assert(rows(2).getString(0) === "na.example.com" && rows(2).getString(1) === "/c/1")
  }

  test("reverse is code-point order (combining mark leads), astral pairs stay intact") {
    val out = Seq(combining, "a" + astral).toDF("t")
      .select(reverse($"t")).as[String].collect()
    assert(out(0) === "́efac")
    assert(out(1) === "🦀𝄞" + "a")
  }
}
