package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.dialects.{NlGate, NlToSql}

/** The inverse property of DialectFuzzSpec: the fuzz suite proves garbage
  * DIES at the NL surface; this suite proves every grammar-PRODUCIBLE
  * question LIVES through the whole path — translate → NlGate → analyze —
  * and that the gate is a pure validator (the executed plan is EXACTLY the
  * plan of the translated SQL — a gate that silently rewrote a query
  * would pass every per-key oracle that replays `translate` output while
  * serving users something else).
  *
  * The generator below enumerates the SAME production templates the
  * grammar documents (coherent measure×dim pairs — the catalog maps in
  * NlToSql.scala), with free parameters (k, years, thresholds, filter
  * values) drawn from a seeded RNG. Filter VALUES are deliberately
  * unconstrained tokens: a question about a nonexistent status must still
  * translate to valid, gated, analyzable SQL (returning zero groups), not
  * fail — the serving surface cannot know the value domain up front.
  */
class NlRoundTripSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  val d = TestSpark.sfDir

  private val rnd = new scala.util.Random(20260814L)

  // coherent measure×dim pairs (same fact table — the grammar's contract)
  private val measureDims = Seq(
    ("order price", Seq("status", "priority")),
    ("quantity", Seq("return flag")),
    ("account balance", Seq("market segment")),
    ("event value", Seq("event type")))

  // entity productions with their fact-side filter dims
  private val entityCombos = Seq(
    ("customers", "order price", "status"),
    ("suppliers", "quantity", "return flag"),
    ("parts", "quantity", "return flag"))

  // fact → plausible year range for date productions
  private val yearsOf = Map(
    "order price" -> (1995 to 2000), "quantity" -> (1995 to 2000),
    "event value" -> (2024 to 2024))

  private def tok(): String = {
    val pool = Seq("F", "O", "P", "1-URGENT", "5-LOW", "BUILDING", "A", "N",
      "click", "purchase", "nonsuch", "zzz-9")
    pool(rnd.nextInt(pool.size))
  }

  private def md(): (String, String) = {
    val (m, ds) = measureDims(rnd.nextInt(measureDims.size))
    (m, ds(rnd.nextInt(ds.size)))
  }

  // per-group leaderboard combos: the per-dim must sit ON the measure's
  // fact table (the TopNPerDim require), unlike the entity noun which
  // routes through joinPath
  private val perGroupCombos = Seq(
    ("customers", "order price", Seq("status", "priority")),
    ("suppliers", "quantity", Seq("return flag")),
    ("parts", "quantity", Seq("return flag")))

  private def genQuestion(): String = rnd.nextInt(21) match {
    case 16 =>
      // time-boxed leaderboard (round 9's TopNDateRange)
      val (e, m, _) = entityCombos(rnd.nextInt(entityCombos.size))
      yearsOf.get(m) match {
        case Some(yrs) =>
          val y = yrs(rnd.nextInt(yrs.size))
          val m1 = 1 + rnd.nextInt(6); val m2 = m1 + rnd.nextInt(12 - m1)
          f"top ${1 + rnd.nextInt(10)} $e by total $m between $y-$m1%02d-01 and $y-$m2%02d-28"
        case None => s"top ${1 + rnd.nextInt(10)} $e by total $m"
      }
    case 0 => val (m, dim) = md(); s"total $m by $dim"
    case 1 => val (m, dim) = md(); s"average $m by $dim"
    case 2 => val (m, dim) = md(); s"total $m by $dim where $dim is ${tok()}"
    case 3 =>
      val (e, m, _) = entityCombos(rnd.nextInt(entityCombos.size))
      s"top ${1 + rnd.nextInt(50)} $e by total $m"
    case 4 =>
      val (e, m, _) = entityCombos(rnd.nextInt(entityCombos.size))
      s"bottom ${1 + rnd.nextInt(20)} $e by total $m"
    case 5 =>
      val (e, m, w) = entityCombos(rnd.nextInt(entityCombos.size))
      s"top ${1 + rnd.nextInt(10)} $e by total $m where $w is ${tok()}"
    case 6 =>
      val (m, dim) = md()
      val op = if (rnd.nextBoolean()) "above" else "below"
      s"total $m by $dim where $m is $op ${10 + rnd.nextInt(100000)}"
    case 7 =>
      val (m, dim) = md()
      val lo = rnd.nextInt(1000); val hi = lo + 1 + rnd.nextInt(100000)
      s"total $m by $dim where $m is between $lo and $hi"
    case 8 => s"total order price by status and priority"
    case 9 =>
      val (m, dim) = md()
      s"total $m by $dim having total ${if (rnd.nextBoolean()) "above" else "below"} ${rnd.nextInt(1000000)}"
    case 10 =>
      val (m, dim) = md()
      yearsOf.get(m) match { // account balance has no event-time axis
        case Some(yrs) => s"total $m by $dim in ${yrs(rnd.nextInt(yrs.size))}"
        case None => s"total $m by $dim"
      }
    case 11 =>
      val (m, dim) = md()
      s"${if (rnd.nextBoolean()) "minimum" else "maximum"} $m by $dim"
    case 12 =>
      val (m, dim) = md()
      if (m != "account balance")
        s"total $m by $dim in the last ${1 + rnd.nextInt(400)} days"
      else s"total $m by $dim"
    case 15 =>
      // filter + calendar-range COMPOSITION (round 9's TotalByWhereDateRange)
      val (m, dim) = md()
      yearsOf.get(m) match {
        case Some(yrs) =>
          val y = yrs(rnd.nextInt(yrs.size))
          val m1 = 1 + rnd.nextInt(6); val m2 = m1 + rnd.nextInt(12 - m1)
          f"total $m by $dim where $dim is ${tok()} between $y-$m1%02d-01 and $y-$m2%02d-28"
        case None => s"total $m by $dim"
      }
    case 17 =>
      // two-hop star routing (round 10's off-fact TotalBy/AvgBy dim):
      // nation reaches orders through customer
      val agg = if (rnd.nextBoolean()) "total" else "average"
      s"$agg order price by nation"
    case 18 =>
      // off-fact dim COMPOSED with the calendar range (nl_nation_range)
      val y = 1995 + rnd.nextInt(6)
      val m1 = 1 + rnd.nextInt(6); val m2 = m1 + rnd.nextInt(12 - m1)
      f"total order price by nation between $y-$m1%02d-01 and $y-$m2%02d-28"
    case 19 =>
      // per-group leaderboard (nl_topk_per_group's TopNPerDim)
      val (e, m, ds) = perGroupCombos(rnd.nextInt(perGroupCombos.size))
      s"top ${1 + rnd.nextInt(10)} $e by total $m per ${ds(rnd.nextInt(ds.size))}"
    case 20 =>
      // per-group leaderboard COMPOSED with the calendar range
      // (nl_topk_group_range's TopNPerDimDateRange)
      val (e, m, ds) = perGroupCombos(rnd.nextInt(perGroupCombos.size))
      val y = 1995 + rnd.nextInt(6)
      val m1 = 1 + rnd.nextInt(6); val m2 = m1 + rnd.nextInt(12 - m1)
      f"top ${1 + rnd.nextInt(10)} $e by total $m per ${ds(rnd.nextInt(ds.size))} between $y-$m1%02d-01 and $y-$m2%02d-28"
    case 13 =>
      // row counts: the entity noun must BE the dimension's own table
      // (requireEntityOn) — entity counting is the `unique` production
      val combos = Seq(("orders", "status"), ("orders", "priority"),
        ("customers", "market segment"), ("events", "event type"),
        ("documents", "language"))
      val (e, dim) = combos(rnd.nextInt(combos.size))
      s"number of $e by $dim"
    case _ =>
      val combos = Seq(("customers", "status"), ("customers", "priority"),
        ("suppliers", "return flag"), ("parts", "return flag"))
      val (e, dim) = combos(rnd.nextInt(combos.size))
      s"number of unique $e by $dim"
  }

  test("300 grammar-producible questions translate, pass the gate, and analyze") {
    sources.TableRegistry.registerAll(spark, d)
    (1 to 300).foreach { _ =>
      val q = genQuestion()
      val sql = withClue(s"question: $q") { NlToSql.translate(q) }
      withClue(s"question: $q\nsql: $sql") {
        NlGate.validate(spark, sql) // must not throw
        // analyzable against the real catalog: every referenced column
        // resolves (a production emitting a bad column would only die at
        // serving time without this)
        spark.sql(sql).queryExecution.analyzed
      }
    }
  }

  test("translate is referentially transparent (same question, same SQL)") {
    (1 to 50).foreach { _ =>
      val q = genQuestion()
      assert(NlToSql.translate(q) === NlToSql.translate(q), q)
    }
  }

  test("the gate never rewrites: NlToSql.run's plan IS the translated SQL's plan") {
    (1 to 40).foreach { _ =>
      val q = genQuestion()
      val gated = NlToSql.run(spark, d, q)
      val direct = spark.sql(NlToSql.translate(q))
      withClue(s"question: $q") {
        assert(gated.queryExecution.analyzed.canonicalized ===
               direct.queryExecution.analyzed.canonicalized,
          "gated and direct plans must be identical — the gate validates, never rewrites")
      }
    }
  }
}
