package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators._

/** Invariant coverage for the Analytics module (market basket, skew
  * audit, Gini, RFM) — the cross-engine hash gate proves value equality;
  * these prove the MATH means what it claims on any fixture.
  */
class AnalyticsSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  val d = TestSpark.sfDir

  test("market_basket: pairs are ordered, support consistent, lift positive") {
    val rows = Analytics.queries("market_basket")(spark, d).collect()
    rows.foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      assert(a < b, s"pair not canonical: $a,$b")
      val (nAb, nA, nB) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(nAb >= 2 && nAb <= nA && nAb <= nB,
        s"support $nAb inconsistent with item counts $nA/$nB")
      assert(r.getDouble(5) > 0.0)
    }
    // top-20 is sorted by lift descending
    val lifts = rows.map(_.getDouble(5))
    assert(lifts.zip(lifts.drop(1)).forall { case (x, y) => x >= y })
  }

  test("profile_key_skew: shares are percentages of the whole, ratio vs mean") {
    val rows = Analytics.queries("profile_key_skew")(spark, d).collect()
    assert(rows.length <= 10)
    rows.foreach { r =>
      assert(r.getDouble(2) > 0.0 && r.getDouble(2) <= 100.0)
      // a top-10 key is at or above the mean per-key count
      assert(r.getDouble(3) >= 1.0, s"top key below mean: $r")
    }
    val cnts = rows.map(_.getLong(1))
    assert(cnts.zip(cnts.drop(1)).forall { case (x, y) => x >= y })
  }

  test("agg_gini: coefficients in [0,1); equal-spend toy group gives 0") {
    val rows = Analytics.queries("agg_gini")(spark, d).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val g = r.getDouble(2)
      assert(g >= 0.0 && g < 1.0, s"gini out of range: $r")
    }
    // closed form sanity: n equal values => G = 0 exactly
    // (2*sum(i*x)/(n*n*x) - (n+1)/n = (n+1)/n - (n+1)/n)
    val n = 5
    val s1 = (1 to n).map(_.toLong).sum // sum of ranks * x with x=1
    val g0 = 2.0 * s1 / (n.toDouble * n.toDouble) - (n + 1.0) / n
    assert(math.abs(g0) < 1e-12)
  }

  test("rfm_segments: quartiles 1..4, customer total preserved, cells disjoint") {
    val rows = Analytics.queries("rfm_segments")(spark, d).collect()
    rows.foreach { r =>
      Seq(0, 1, 2).foreach { i =>
        assert(r.getInt(i) >= 1 && r.getInt(i) <= 4, s"quartile out of range: $r")
      }
      assert(r.getLong(3) > 0 && r.getDouble(4) >= 1.0)
    }
    val totalCustomers = rows.map(_.getLong(3)).sum
    val expected = graft.Tables.orders(spark, d)
      .select("o_custkey").distinct().count()
    assert(totalCustomers === expected,
      s"segment cells don't partition the customer base: $totalCustomers vs $expected")
    // each (r,f,m) cell appears once
    val cells = rows.map(r => (r.getInt(0), r.getInt(1), r.getInt(2)))
    assert(cells.distinct.length === cells.length)
  }

  test("ts_seasonality: hours in 0..23, event counts partition the stream") {
    val rows = Analytics.queries("ts_seasonality")(spark, d).collect()
    rows.foreach { r =>
      assert(r.getLong(1) >= 0 && r.getLong(1) <= 23, s"bad hour: $r")
      assert(r.getLong(2) > 0)
    }
    val total = rows.map(_.getLong(2)).sum
    assert(total === graft.Tables.events(spark, d).count())
  }

  test("tok_fertility: every word yields at least one token; one row per lang") {
    val rows = TextOps.queries("tok_fertility")(spark, d).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(4) >= 1.0, s"fertility below 1: $r")
      assert(r.getLong(3) >= r.getLong(2), s"fewer tokens than words: $r")
    }
    val langs = rows.map(_.getString(0))
    assert(langs.distinct.length === langs.length)
  }

  test("mix_domain_cap: kept never exceeds the cap and kept+dropped = docs") {
    val rows = TextOps.queries("mix_domain_cap")(spark, d).collect()
    rows.foreach { r =>
      assert(r.getLong(2) <= 20, s"cap exceeded: $r")
      assert(r.getLong(2) + r.getLong(3) === r.getLong(1), s"cap not a partition: $r")
    }
  }

  test("vocab_coverage: monotone in k and bounded by 1") {
    val r = TextOps.queries("vocab_coverage")(spark, d).collect().head
    val (c10, c20, c30) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
    assert(c10 <= c20 && c20 <= c30 && c30 <= 1.0, s"coverage not monotone: $r")
    assert(c10 > 0.0)
  }

  test("graph_components_hist: sizes >= 2 and vertices reconcile with the pair graph") {
    val rows = GraphOps.queries("graph_components_hist")(spark, d).collect()
    rows.foreach { r =>
      assert(r.getLong(0) >= 2, s"component smaller than an edge: $r")
      assert(r.getLong(1) >= 1)
    }
    val nVertices = rows.map(r => r.getLong(0) * r.getLong(1)).sum
    // dedup_cluster emits one row per doc in the same pair graph — the
    // histogram's total mass must equal its row count
    val pairDocs = TextOps.queries("dedup_cluster")(spark, d).count()
    assert(nVertices === pairDocs,
      s"histogram mass $nVertices != docs in pair graph $pairDocs")
  }

  test("ts_pct_change: first month per nation is NULL, growth matches totals") {
    val rows = Analytics.queries("ts_pct_change")(spark, d).collect()
    val byNation = rows.groupBy(_.getString(0))
    byNation.values.foreach { series =>
      assert(series.head.isNullAt(3), "first month must have no growth rate")
      series.sliding(2).foreach {
        case Array(prev, cur) if !cur.isNullAt(3) =>
          val expect = (cur.getDouble(2) - prev.getDouble(2)) / prev.getDouble(2) * 100.0
          assert(math.abs(cur.getDouble(3) - expect) < 0.01,
            s"growth mismatch: ${cur.getDouble(3)} vs $expect")
        case _ =>
      }
    }
  }

  test("agg_hhi: deciles bounded, sole-source parts land in decile 10") {
    val rows = Analytics.queries("agg_hhi")(spark, d).collect()
    rows.foreach { r =>
      val dec = r.getLong(0)
      assert(dec >= 0 && dec <= 10, s"bad decile: $r")
      assert(r.getDouble(2) <= r.getDouble(3))
      // HHI of k equal shares is 1/k, so any HHI is in (0, 1]
      assert(r.getDouble(2) > 0.0 && r.getDouble(3) <= 1.0)
    }
    // part count reconciles with the part universe that appears in lineitem
    val nParts = rows.map(_.getLong(1)).sum
    val expected = graft.Tables.lineitem(spark, d)
      .select("l_partkey").distinct().count()
    assert(nParts === expected)
  }

  test("cohort_ltv: cohorts partition customers, revenue reconciles") {
    val rows = Analytics.queries("cohort_ltv")(spark, d).collect()
    val orders = graft.Tables.orders(spark, d)
    assert(rows.map(_.getLong(1)).sum === orders.select("o_custkey").distinct().count())
    assert(rows.map(_.getLong(2)).sum === orders.count())
    rows.foreach { r =>
      // avg_ltv * n_customers ~ total_revenue
      assert(math.abs(r.getDouble(4) * r.getLong(1) - r.getDouble(3)) < 1.0, r.toString)
    }
  }

  test("repeat_rate: bounded rates, customer total reconciles") {
    val rows = Analytics.queries("repeat_rate")(spark, d).collect()
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1))
      assert(r.getLong(3) >= 0 && r.getLong(3) <= 10000)
      assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0)
    }
    assert(rows.map(_.getLong(1)).sum ===
      graft.Tables.orders(spark, d).select("o_custkey").distinct().count())
  }

  test("order_size_hist: mass reconciles with both fact tables") {
    val rows = Analytics.queries("order_size_hist")(spark, d).collect()
    val li = graft.Tables.lineitem(spark, d)
    assert(rows.map(r => r.getLong(0) * r.getLong(1)).sum === li.count())
    assert(rows.map(_.getLong(1)).sum === li.select("l_orderkey").distinct().count())
  }

  test("aging_buckets: covers exactly the open orders, ranges sane") {
    val rows = Analytics.queries("aging_buckets")(spark, d).collect()
    rows.foreach { r =>
      assert(r.getLong(3) >= 0 && r.getLong(3) <= r.getLong(4), r.toString)
    }
    val open = graft.Tables.orders(spark, d)
      .filter(org.apache.spark.sql.functions.col("o_orderstatus") === "O").count()
    assert(rows.map(_.getLong(1)).sum === open)
  }

  test("vec_norm_stats: min <= mean <= max per label, vectors reconcile") {
    val rows = VectorOps.queries("vec_norm_stats")(spark, d).collect()
    rows.foreach { r =>
      assert(r.getDouble(3) <= r.getDouble(2) && r.getDouble(2) <= r.getDouble(4),
        s"mean outside [min,max]: $r")
    }
    assert(rows.map(_.getLong(1)).sum ===
      graft.Tables.embeddings(spark, d).count())
  }

  test("ts_interarrival: median <= max, gaps reconcile with series lengths") {
    val rows = Analytics.queries("ts_interarrival")(spark, d).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) > 0 && r.getLong(3) > 0, s"non-positive gap: $r")
      assert(r.getLong(3) <= r.getLong(4), s"median above max: $r")
    }
    // n_gaps = n_events - n_series summed over types
    val ev = graft.Tables.events(spark, d)
    val nSeries = ev.select("user_id", "event_type").distinct().count()
    assert(rows.map(_.getLong(1)).sum === ev.count() - nSeries)
  }

  test("text_keyterms: <=3 per doc, scores non-increasing within a doc") {
    val rows = TextOps.queries("text_keyterms")(spark, d).collect()
    val byDoc = rows.groupBy(_.getLong(0))
    byDoc.values.foreach { terms =>
      assert(terms.length <= 3)
      val sorted = terms.sortBy(_.getLong(1))
      val scores = sorted.map(_.getDouble(3))
      assert(scores.zip(scores.drop(1)).forall { case (a, b) => a >= b },
        s"scores increase within doc: ${sorted.mkString(",")}")
      // distinct terms within a doc
      val toks = sorted.map(_.getString(2))
      assert(toks.distinct.length === toks.length)
    }
  }

  test("engagement_dau_wau: wau >= dau, stickiness in (0,1]") {
    val rows = Analytics.queries("engagement_dau_wau")(spark, d).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) <= r.getLong(2), s"dau above wau: $r")
      assert(r.getDouble(3) > 0.0 && r.getDouble(3) <= 1.0)
    }
  }

  test("lead_time_stats: avg within [min,max], line totals reconcile") {
    val rows = Analytics.queries("lead_time_stats")(spark, d).collect()
    rows.foreach { r =>
      // the synthetic fixture draws ship/order dates independently, so
      // negative leads are legal — only the ordering invariants hold
      assert(r.getLong(3) <= r.getLong(4), s"min above max: $r")
      assert(r.getDouble(2) >= r.getLong(3) && r.getDouble(2) <= r.getLong(4),
        s"avg outside [min,max]: $r")
    }
    assert(rows.map(_.getLong(1)).sum === graft.Tables.lineitem(spark, d).count())
  }

  test("ts_rate_spike: z-scores center near zero per type, spikes = |z|>2") {
    val rows = Analytics.queries("ts_rate_spike")(spark, d).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).values.foreach { ofType =>
      val zs = ofType.map(_.getDouble(3))
      assert(math.abs(zs.sum) < 0.05 * zs.length, "z not centered")
      ofType.foreach { r =>
        assert(r.getBoolean(4) === (math.abs(r.getDouble(3)) > 2.0), r.toString)
      }
    }
  }

  test("events_bot_score: descending scores, components reconcile") {
    val rows = Analytics.queries("events_bot_score")(spark, d).collect()
    assert(rows.length <= 10 && rows.nonEmpty)
    val scores = rows.map(_.getLong(5))
    assert(scores.zip(scores.drop(1)).forall { case (a, b) => a >= b })
    rows.foreach { r =>
      assert(r.getLong(5) === r.getLong(3) + r.getLong(4), s"score != sum: $r")
      assert(r.getLong(3) >= 10000 / r.getLong(2), s"dominance below uniform: $r")
    }
  }

  test("agg_median: the median is a data element splitting its group in half") {
    val rows = Aggregates.queries("agg_median")(spark, d).collect()
    val orders = graft.Tables.orders(spark, d)
    rows.foreach { r =>
      val (st, m) = (r.getString(0), r.getDouble(2))
      import org.apache.spark.sql.functions.col
      val below = orders.filter(col("o_orderstatus") === st &&
        col("o_totalprice") < m).count()
      val n = r.getLong(1)
      // lower median: strictly-below count is under half, at-or-below at least half
      assert(below < (n + 1) / 2, s"$st: $below below median of $n")
      val atOrBelow = orders.filter(col("o_orderstatus") === st &&
        col("o_totalprice") <= m).count()
      assert(atOrBelow >= (n + 1) / 2)
    }
  }

  test("fn_surrogate_key: collision-free and stable across runs") {
    val df1 = Aggregates.queries("fn_surrogate_key")(spark, d)
    // one key per DISTINCT natural key — the sf0.001 fixture contains a
    // genuinely duplicated line (all four key columns equal), which the
    // surrogate key must collapse, not distinguish
    val naturalKeys = graft.Tables.lineitem(spark, d)
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
      .distinct().count()
    assert(df1.select("surrogate_key").distinct().count() === naturalKeys)
    val k1 = df1.limit(5).collect().map(_.getString(2)).toSeq
    val k2 = Aggregates.queries("fn_surrogate_key")(spark, d)
      .limit(5).collect().map(_.getString(2)).toSeq
    assert(k1 === k2)
  }

  test("corpus_datacard: kept <= raw, shares sum to ~10000bp, manifest consistent") {
    val rows = TextOps.queries("corpus_datacard")(spark, d).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(3) <= r.getLong(2), s"kept above raw: $r")
      assert(r.getLong(5) >= 0 && r.getLong(5) <= 10000)
    }
    assert(rows.map(_.getLong(2)).sum ===
      graft.Tables.documents(spark, d).count())
    // floor(bp) sums to 10000 minus at most one bp per cell
    val bpSum = rows.map(_.getLong(5)).sum
    assert(bpSum <= 10000 && bpSum > 10000 - rows.length, s"bp sum: $bpSum")
  }

  test("tok_vocab_growth: vocab and tokens monotone in prefix, beta in (0,1]") {
    val r = TextOps.queries("tok_vocab_growth")(spark, d).collect().head
    assert(r.getLong(0) <= r.getLong(1) && r.getLong(1) <= r.getLong(2))
    assert(r.getLong(3) <= r.getLong(4) && r.getLong(4) <= r.getLong(5))
    // beta = 0 is legal when the tiny fixture's vocab saturates before
    // the 50% prefix (V100 = V50 => ln ratio 0)
    val beta = r.getDouble(6)
    assert(beta >= 0.0 && beta <= 1.0, s"implausible Heaps exponent: $beta")
  }

  test("dedup_rate_curve: unique <= docs, dup rate consistent, prefixes nested") {
    val rows = TextOps.queries("dedup_rate_curve")(spark, d).collect()
    assert(rows.length === 3)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1))
      assert(r.getLong(3) === (r.getLong(1) - r.getLong(2)) * 10000 / r.getLong(1))
    }
    val docs = rows.map(_.getLong(1))
    assert(docs(0) <= docs(1) && docs(1) <= docs(2))
  }

  test("vec_pca_power: unit-norm loadings, deterministic across runs") {
    val r1 = VectorOps.queries("vec_pca_power")(spark, d).collect()
    assert(r1.length === 64)
    val norm2 = r1.map(r => r.getDouble(1) * r.getDouble(1)).sum
    // loadings are rounded to 4dp, so the squared norm is ~1 within 64*eps
    assert(math.abs(norm2 - 1.0) < 0.01, s"not unit norm: $norm2")
    // power iteration from a fixed start is deterministic
    val r2 = VectorOps.queries("vec_pca_power")(spark, d).collect()
    assert(r1.map(_.getDouble(1)).toSeq === r2.map(_.getDouble(1)).toSeq)
    // the dominant direction is not degenerate (some spread across dims)
    assert(r1.map(r => math.abs(r.getDouble(1))).max < 0.99)
  }

  test("profile_corr_matrix: bounded correlations, matches direct corr") {
    val rows = Profiling.queries("profile_corr_matrix")(spark, d).collect()
    assert(rows.length === 6)
    rows.foreach { r =>
      assert(math.abs(r.getDouble(2)) <= 1.0, s"corr out of range: $r")
    }
    import org.apache.spark.sql.functions.{corr, round => rnd}
    val direct = graft.Tables.lineitem(spark, d)
      .agg(rnd(corr(org.apache.spark.sql.functions.col("l_quantity"),
        org.apache.spark.sql.functions.col("l_extendedprice")), 4))
      .collect().head.getDouble(0)
    val fromKey = rows.find(r =>
      r.getString(0) == "l_quantity" && r.getString(1) == "l_extendedprice").get.getDouble(2)
    assert(math.abs(fromKey - direct) < 1e-9)
  }

  test("concurrency_peak: bounded by live users, sessions reconcile") {
    val r = Analytics.queries("concurrency_peak")(spark, d).collect().head
    val users = graft.Tables.events(spark, d)
      .select("user_id").distinct().count()
    assert(r.getLong(0) >= 1 && r.getLong(0) <= users,
      s"peak ${r.getLong(0)} outside [1, $users]")
    assert(r.getLong(2) >= users, "every user has at least one session")
    assert(!r.isNullAt(1))
  }
}
