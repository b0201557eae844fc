package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.dialects.{GraphQL, NlToSql}
import graft.operators.Dialects

/** Fuzz robustness for the web-facing parsers: the console/HTTP surface
  * hands RAW USER TEXT to GraphQL.parse and NlToSql.translate, so a
  * malformed query must produce a controlled exception — never a hang, a
  * StackOverflowError, or an OutOfMemoryError (a parser crash is a
  * denial-of-service on a shared serving session). Mutations are seeded
  * (deterministic across runs) and derived from the REAL example queries,
  * so they explore the grammar's neighborhood rather than random noise.
  */
class DialectFuzzSpec extends AnyFunSuite {

  private val gqlSeeds = Seq(
    Dialects.gqlQuery, Dialects.gqlNestedQuery, Dialects.gqlPaginateQuery,
    Dialects.gqlOrderDescQuery, Dialects.gqlAggQuery, Dialects.gqlHavingQuery,
    // round-9/10 surfaces: agg-field ordering, countd_ at the agg root,
    // offset+limit through the agg root, countd_ inside a nested _agg
    Dialects.gqlAggOrderQuery, Dialects.gqlAggDistinctQuery,
    Dialects.gqlAggPageQuery, Dialects.gqlNestedDistinctQuery)

  private val nlSeeds = Seq(
    Dialects.nlQuestion, Dialects.nlAvgQuestion, Dialects.nlCountWhereQuestion,
    Dialects.nlTotalWhereQuestion,
    "which supplier had the highest total quantity in 1996",
    "top 5 nations by number of customers",
    // round-9/10 compositions: ranged leaderboards, off-fact routing,
    // per-group ranking with a calendar window
    Dialects.nlTopkRangeQuestion, Dialects.nlNationRangeQuestion,
    Dialects.nlTopkGroupRangeQuestion,
    // round-11 fuzzer-found compositions
    Dialects.nlAvgRangeQuestion, Dialects.nlTopkGroupWhereQuestion)

  /** Seeded mutations: delete a char, duplicate a char, swap two chars,
    * insert a metacharacter, truncate at a random point.
    */
  private def mutations(q: String, n: Int, seed: Long): Seq[String] = {
    val rnd = new scala.util.Random(seed)
    val meta = "{}()[]\",:$@!"
    (0 until n).map { _ =>
      rnd.nextInt(5) match {
        case 0 if q.length > 1 =>
          val i = rnd.nextInt(q.length); q.take(i) + q.drop(i + 1)
        case 1 =>
          val i = rnd.nextInt(q.length + 1)
          q.take(i) + meta(rnd.nextInt(meta.length)) + q.drop(i)
        case 2 if q.length > 2 =>
          val i = rnd.nextInt(q.length - 1)
          q.take(i) + q(i + 1) + q(i) + q.drop(i + 2)
        case 3 => q.take(rnd.nextInt(q.length + 1))
        case _ =>
          val i = rnd.nextInt(q.length); q.take(i) + q(i) + q.drop(i)
      }
    }
  }

  test("GraphQL translation survives 1000 seeded mutations of real queries") {
    // stage 1 (parse) is deliberately lenient about identifiers — the
    // semantic stage (run: table/column/argument resolution, plan
    // building; lazy, so no job executes) is where corrupted names must
    // die. The property under test: every mutation either yields a plan
    // or a controlled Exception — never an Error (StackOverflow/OOM) or
    // a hang, either of which is a denial-of-service on a shared
    // serving session.
    var planned = 0; var rejected = 0
    gqlSeeds.zipWithIndex.foreach { case (q, i) =>
      mutations(q, 100, 42L + i).foreach { m =>
        try { GraphQL.run(TestSpark.spark, TestSpark.sfDir, m); planned += 1 }
        catch { case _: Exception => rejected += 1 }
      }
    }
    val total = gqlSeeds.size * 100
    assert(planned + rejected == total)
    // corruption must be DETECTABLE: a healthy majority of single-char
    // corruptions hit structure/names and get rejected somewhere
    assert(rejected >= total / 2,
      s"only $rejected/$total corrupted queries rejected — validation is weaker than expected")
  }

  test("NlToSql.translate survives 900 seeded mutations and stays gated") {
    nlSeeds.zipWithIndex.foreach { case (q, i) =>
      mutations(q, 100, 99L + i).foreach { m =>
        try {
          val sql = NlToSql.translate(m)
          // anything that DOES translate must still be a SELECT — the
          // NlGate read-only contract can never be fuzzed off
          assert(sql.trim.toUpperCase.startsWith("SELECT"),
            s"non-SELECT translation for: $m")
        } catch { case _: Exception => () }
      }
    }
  }

  test("malformed GraphQL rejections carry actionable messages") {
    val cases = Seq(
      "{ customer { c_name }",          // unclosed root
      "{ unknown_table { x } }",        // unregistered table
      "customer { c_name }",            // missing braces
      "")                               // empty
    cases.foreach { q =>
      val e = intercept[Exception](
        GraphQL.run(TestSpark.spark, TestSpark.sfDir, q))
      assert(e.getMessage != null && e.getMessage.nonEmpty,
        s"empty error message for: '$q'")
    }
  }

  test("Server.handleJson never throws: garbage bodies become {\"error\": ...}") {
    // the HTTP seam catches EVERYTHING and answers JSON — a raised
    // exception here would 500 the console with no diagnostic
    val good = s"""{"dialect":"sql","query":"SELECT 1 AS one",""" +
      s""""dir":"${TestSpark.sfDir}","maxRows":5}"""
    val bodies = Seq("", "{", "null", "[]", "{\"dialect\":42}",
      """{"dialect":"sql"}""", """{"dialect":"voodoo","query":"x","dir":"/"}""",
      good.dropRight(5), "\u0000\u0001binary", "{\"query\": \"" + "x" * 100000 + "\"}") ++
      mutations(good, 60, 7L)
    bodies.foreach { b =>
      val resp = graft.server.Server.handleJson(TestSpark.spark, b)
      assert(resp.startsWith("{"), s"non-JSON response for body: ${b.take(60)}")
    }
  }

  test("unknown NL phrasings fail loudly, never guess") {
    val cases = Seq(
      "delete all orders",
      "what is the meaning of life",
      "top ten suppliers by vibes")
    cases.foreach { q =>
      val e = intercept[Exception](NlToSql.translate(q))
      assert(e.getMessage != null && e.getMessage.nonEmpty)
    }
  }
}
