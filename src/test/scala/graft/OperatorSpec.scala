package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators._

/** Unit coverage per §2 operator category (SURVEY.md §5.2.2): handwritten
  * expectations on tiny inputs + edge cases (nulls, empties, duplicate
  * keys) that the fixture-scale oracle runs don't isolate.
  */
class OperatorSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  import spark.implicits._
  val d = TestSpark.sfDir

  test("every declared query key has a DuckDB oracle") {
    // round 2: the formerly-⊘ keys (md5-portable hashing / exploded maps /
    // bounded-error bits) are fully oracled — the set must stay empty
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(noOracle === Set.empty[String])
  }

  test("flagship runs and groups are complete") {
    val rows = SparkEntry.entry(spark).collect()
    assert(rows.length === 6) // {A,N,R} x {F,O}
    assert(rows.map(_.getLong(rows.head.fieldIndex("count_order"))).sum > 0)
  }

  test("filter_null three-valued logic keeps no NULL rows") {
    val out = Relational.queries("filter_null")(spark, d).collect()
    assert(out.forall(!_.isNullAt(1)))
  }

  test("set ops on empty inputs") {
    val a = Seq(1, 2, 3).toDF("x")
    val empty = Seq.empty[Int].toDF("x")
    assert(a.unionByName(empty).count() === 3)
    assert(a.intersect(empty).count() === 0)
    assert(a.except(empty).orderBy("x").as[Int].collect().toSeq === Seq(1, 2, 3))
  }

  test("distinct collapses duplicate rows") {
    val df = Seq(("a", 1), ("a", 1), ("b", 2)).toDF("k", "v")
    assert(df.distinct().count() === 2)
  }

  test("join null-extension: left join keeps unmatched left rows") {
    val l = Seq((1, "x"), (2, "y")).toDF("id", "lv")
    val r = Seq((1, "z")).toDF("id", "rv")
    val out = l.join(r, Seq("id"), "left").orderBy("id").collect()
    assert(out.length === 2 && out(1).isNullAt(2))
  }

  test("asof join matches latest purchase at/before click, null when none") {
    import java.sql.Timestamp
    def ts(m: Int) = new Timestamp(m * 60000L)
    // user 1: purchases at 10, 20; clicks at 15, 25, 5
    val ev = Seq(
      (1L, 1L, ts(10), "purchase", 1.0), (2L, 1L, ts(20), "purchase", 1.0),
      (3L, 1L, ts(15), "click", 0.0), (4L, 1L, ts(25), "click", 0.0),
      (5L, 1L, ts(5), "click", 0.0)
    ).toDF("event_id", "user_id", "ts", "event_type", "value")
    ev.createOrReplaceTempView("asof_ev")
    // reuse the operator's formulation on this tiny table via direct build
    val clicks = ev.filter($"event_type" === "click").select($"event_id", $"user_id", $"ts")
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id".as("p_user"), $"ts".as("p_ts"))
    val j = clicks.join(purchases, $"user_id" === $"p_user" && $"p_ts" <= $"ts", "left")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("event_id").orderBy($"p_ts".desc_nulls_last)
    val out = j.withColumn("rn", row_number().over(w)).filter($"rn" === 1)
      .select($"event_id", $"p_ts").orderBy("event_id").collect()
    assert(out(0).getTimestamp(1) === ts(10)) // click@15 -> purchase@10
    assert(out(1).getTimestamp(1) === ts(20)) // click@25 -> purchase@20
    assert(out(2).isNullAt(1))                // click@5  -> none
  }

  test("rollup emits grand total; cube emits all 4 grouping combos") {
    val roll = Aggregates.queries("agg_rollup")(spark, d).collect()
    assert(roll.count(r => r.isNullAt(0) && r.isNullAt(1)) === 1)
    val cube = Aggregates.queries("agg_cube")(spark, d)
      .select(col("l_returnflag").isNull, col("l_linestatus").isNull).distinct().count()
    assert(cube === 4)
  }

  test("window row_number is a permutation of 1..n per partition") {
    val out = Windows.queries("win_row_number")(spark, d)
      .groupBy("o_custkey").agg(count(lit(1)).as("n"), max("rn").as("mx"), min("rn").as("mn"))
      .filter(col("mx") =!= col("n") || col("mn") =!= 1)
    assert(out.count() === 0)
  }

  test("running sum final value equals group total") {
    val rs = Windows.queries("win_running_sum")(spark, d)
    val finals = rs.groupBy("o_custkey").agg(max("run_total").as("final"))
    val totals = Tables.orders(spark, d).groupBy("o_custkey")
      .agg(Tables.outDec(sum(Tables.dec(col("o_totalprice")))).as("total"))
    assert(finals.join(totals, "o_custkey")
      .filter(col("final") =!= col("total")).count() === 0)
  }

  test("TPC-H-Q3-analog golden: join+agg+topk matches DuckDB-generated expected rows") {
    // golden rows generated ONCE from DuckDB 1.0.0 at sf0.001 (SURVEY §5.2.5)
    val expected = Seq(
      (785L, "574560.7464"), (297L, "560318.5810"), (1259L, "456252.9171"),
      (825L, "447394.8346"), (655L, "412061.1388"), (104L, "398951.0329"),
      (1303L, "394695.8466"), (214L, "386642.6692"), (1045L, "385856.8713"),
      (1368L, "368836.9703"))
    val revenue = Tables.outDec(sum(
      Tables.dec(col("l_extendedprice")) * (lit(1).cast(Tables.Money) - Tables.dec(col("l_discount")))))
    val got = Tables.customer(spark, d).filter(col("c_mktsegment") === "BUILDING")
      .join(Tables.orders(spark, d), col("c_custkey") === col("o_custkey"))
      .filter(col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      .join(Tables.lineitem(spark, d), col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderkey").agg(revenue.as("revenue"))
      .orderBy(col("revenue").desc_nulls_last, col("o_orderkey")).limit(10)
      .collect().map(r => (r.getLong(0), f"${r.getDouble(1)}%.4f")).toSeq
    assert(got === expected)
  }

  test("set_intersect_all keeps min multiplicity per key") {
    val out = Relational.queries("set_intersect_all")(spark, d)
      .groupBy("k").agg(count(lit(1)).as("n"))
    val o = Tables.orders(spark, d)
    val f = o.filter(col("o_orderstatus") === "F").groupBy(col("o_custkey").as("k"))
      .agg(count(lit(1)).as("nf"))
    val open = o.filter(col("o_orderstatus") === "O").groupBy(col("o_custkey").as("k"))
      .agg(count(lit(1)).as("no"))
    val joined = out.join(f, "k").join(open, "k")
      .filter(col("n") =!= least(col("nf"), col("no")))
    assert(joined.count() === 0)
  }

  test("subq_correlated counts 0 (not NULL) for nations with no customers") {
    val out = Joins.queries("subq_correlated")(spark, d).collect()
    assert(out.length === 25)
    assert(out.forall(!_.isNullAt(2))) // COUNT decorrelation edge: empty → 0
    val total = out.map(_.getLong(2)).sum
    assert(total === Tables.customer(spark, d).count())
  }

  test("agg_histogram bins partition the table exactly") {
    val out = Aggregates.queries("agg_histogram")(spark, d).collect()
    assert(out.map(_.getLong(out.head.fieldIndex("n"))).sum ===
      Tables.orders(spark, d).count())
    // bin_lo is consistent with the bin index
    assert(out.forall(r => r.getDouble(1) === r.getLong(0) * 25000.0))
  }

  test("topk is a prefix of the full sort") {
    val full = Relational.queries("sort_multi")(spark, d).collect()
    val k = Tables.customer(spark, d)
      .select("c_custkey", "c_mktsegment", "c_acctbal")
      .orderBy(col("c_mktsegment").desc_nulls_last, col("c_acctbal").asc_nulls_first,
               col("c_custkey")).limit(10).collect()
    assert(full.take(10).toSeq === k.toSeq)
  }

  test("sim_containment dominates jaccard and respects its threshold") {
    val out = TextOps.queries("sim_containment")(spark, d).collect()
    assert(out.nonEmpty)
    // C = i/min(na,nb) ≥ J = i/(na+nb-i) always; filter keeps C ≥ 0.8
    assert(out.forall(r => r.getDouble(2) >= r.getDouble(3) - 1e-9))
    assert(out.forall(_.getDouble(2) >= 0.8))
    assert(out.forall(r => r.getLong(0) < r.getLong(1))) // canonical a < b
  }

  test("corpus_decontam flags only train docs, with real eval overlap") {
    val out = TextOps.queries("corpus_decontam")(spark, d).collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getLong(0) % 100 != 0)) // never an eval doc itself
    assert(out.forall(_.getLong(1) >= 1)) // ≥1 shared shingle
    assert(out.forall(_.getLong(2) >= 1)) // ≥1 eval doc hit
  }

  test("graph_triangles vertex counts sum to a multiple of 3") {
    val out = GraphOps.queries("graph_triangles")(spark, d).collect()
    assert(out.nonEmpty)
    // each triangle contributes exactly one count to each of its 3 vertices
    assert(out.map(_.getLong(1)).sum % 3 === 0)
    assert(out.forall(_.getLong(1) >= 1))
  }

  test("ts_interpolate grid is dense and gap values are bounded by neighbors") {
    val out = Windows.queries("ts_interpolate")(spark, d).collect()
    assert(out.nonEmpty)
    assert(out.forall(!_.isNullAt(2))) // grid spans observed range → no edge NULLs
    val byUser = out.groupBy(_.getLong(0))
    byUser.foreach { case (_, rows) =>
      // dense hourly grid: row count == span hours + 1
      val hours = rows.map(_.getTimestamp(1).getTime).sorted
      assert(hours.length === (hours.last - hours.head) / 3600000L + 1)
      // linear interpolation never escapes the observed value envelope
      val obs = rows.filter(!_.getBoolean(3)).map(_.getDouble(2))
      val (lo, hi) = (obs.min, obs.max)
      assert(rows.forall { r =>
        r.getDouble(2) >= lo - 1e-9 && r.getDouble(2) <= hi + 1e-9
      })
    }
  }

  test("vec_centroid_label emits labels × dims rows with bounded means") {
    val out = VectorOps.queries("vec_centroid_label")(spark, d).collect()
    assert(out.nonEmpty)
    val dims = out.map(_.getLong(1)).max + 1
    val labels = out.map(_.getInt(0)).distinct.length
    assert(out.length === labels * dims) // full (label, dim) grid
    // a mean of unit-scale embedding coords stays in their envelope
    assert(out.forall(r => math.abs(r.getDouble(2)) <= 1.0 + 1e-6))
    assert(out.forall(_.getLong(3) >= 1))
  }

  test("agg_moments matches a direct two-pass computation") {
    val out = Aggregates.queries("agg_moments")(spark, d).collect()
    assert(out.nonEmpty)
    val qs = Tables.lineitem(spark, d)
      .select(col("l_returnflag"), col("l_quantity").cast("double").as("q"))
      .collect().groupBy(_.getString(0))
    out.foreach { r =>
      val xs = qs(r.getString(0)).map(_.getDouble(1))
      val n = xs.length.toDouble
      val mu = xs.sum / n
      val m2 = xs.map(x => math.pow(x - mu, 2)).sum / n
      val m3 = xs.map(x => math.pow(x - mu, 3)).sum / n
      val m4 = xs.map(x => math.pow(x - mu, 4)).sum / n
      assert(math.abs(r.getDouble(1) - m3 / math.pow(m2, 1.5)) < 1e-3)
      assert(math.abs(r.getDouble(2) - (m4 / (m2 * m2) - 3.0)) < 1e-3)
    }
  }

  test("agg_weighted_avg lies within each group's price range") {
    val out = Aggregates.queries("agg_weighted_avg")(spark, d).collect()
    assert(out.nonEmpty)
    val ranges = Tables.lineitem(spark, d).groupBy("l_returnflag")
      .agg(min("l_extendedprice").as("lo"), max("l_extendedprice").as("hi"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    out.foreach { r =>
      val (lo, hi) = ranges(r.getString(0))
      assert(r.getDouble(1) >= lo - 1e-6 && r.getDouble(1) <= hi + 1e-6)
    }
  }

  test("join_interval_overlap emits each pair once with positive bounded overlap") {
    val out = Joins.queries("join_interval_overlap")(spark, d).collect()
    // overlap is positive and can never exceed the shorter (3-day) interval
    assert(out.forall(r => r.getLong(2) > 0 && r.getLong(2) <= 3L * 86400L * 1000000L))
    // canonical-bucket dedup: (a, b, overlap) triples are unique
    val trips = out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(trips.distinct.length === trips.length)
  }

  test("sample_per_group caps every stratum at 25 with dense ranks") {
    val out = TextOps.queries("sample_per_group")(spark, d).collect()
    assert(out.nonEmpty)
    val byLang = out.groupBy(_.getString(1))
    byLang.foreach { case (_, rows) =>
      assert(rows.length <= 25)
      // ranks are exactly 1..k within each stratum
      assert(rows.map(_.getLong(2)).sorted.toSeq === (1L to rows.length).toSeq)
    }
  }

  test("text_bigram_prob probabilities are consistent with their counts") {
    val out = TextOps.queries("text_bigram_prob")(spark, d).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (cBi, cW1, p) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(cBi <= cW1 && cW1 >= 10)
      assert(p > 0.0 && p <= 1.0)
      assert(math.abs(p - (cBi * 1000000L / cW1) / 1e6) < 1e-12)
    }
  }

  test("join_asof_tolerance nulls matches older than 24h; never newer than the click") {
    val out = Joins.queries("join_asof_tolerance")(spark, d).collect()
    assert(out.nonEmpty)
    val matched = out.filter(!_.isNullAt(3))
    assert(matched.nonEmpty)
    matched.foreach { r =>
      val gap = r.getTimestamp(2).getTime - r.getTimestamp(3).getTime
      assert(gap >= 0 && gap <= 24L * 3600 * 1000)
    }
    // the plain asof finds strictly more (or equal) matches
    val plain = Joins.queries("join_asof")(spark, d).collect()
    assert(plain.count(!_.isNullAt(3)) >= matched.length)
  }

  test("profile_topk_values ranks are 1..3 and counts are non-increasing") {
    val out = Profiling.queries("profile_topk_values")(spark, d).collect()
    assert(out.nonEmpty)
    out.groupBy(_.getString(0)).foreach { case (_, rows) =>
      val byRn = rows.sortBy(_.getLong(3))
      assert(byRn.map(_.getLong(3)).toSeq == (1L to byRn.length))
      assert(byRn.sliding(2).forall {
        case Array(a, b) => a.getLong(2) >= b.getLong(2)
        case _ => true
      })
    }
  }

  test("pipeline_incremental covers the whole batch and statuses are consistent") {
    val out = TextOps.queries("pipeline_incremental")(spark, d).collect()
    val batchN = Tables.documents(spark, d).filter(col("doc_id") % 10 === 9).count()
    assert(out.length === batchN) // every new doc classified exactly once
    val statuses = out.map(_.getString(1)).toSet
    assert(statuses.subsetOf(Set("dup_hist", "dup_batch", "unique")))
  }

  test("graph_bfs distances respect bipartite parity and start at the sources") {
    val out = GraphOps.queries("graph_bfs")(spark, d).collect()
    assert(out.nonEmpty)
    // customer nodes are even ids, supplier nodes odd; sources are
    // customers, so every even-hop node must be a customer and every
    // odd-hop node a supplier
    assert(out.forall(r => r.getLong(0) % 2 == r.getLong(1) % 2))
    assert(out.filter(_.getLong(1) == 0L).forall(_.getLong(0) % 200 == 0))
    assert(out.map(_.getLong(1)).max <= 3L)
  }

  test("quality_ccnet_bucket splits the corpus into value-boundary terciles") {
    val out = TextOps.queries("quality_ccnet_bucket")(spark, d).collect()
    val n = out.length
    val byBucket = out.groupBy(_.getString(2)).view.mapValues(_.length).toMap
    assert(byBucket.keySet === Set("head", "middle", "tail"))
    // head must reach ceil(n/3) and cannot overshoot by more than the
    // largest score-value tie group (boundaries are defined on values)
    val maxTie = out.groupBy(_.getLong(1)).values.map(_.length).max
    assert(byBucket("head") >= (n + 2) / 3 && byBucket("head") < (n + 2) / 3 + maxTie)
    // buckets are value-monotone: every head score ≤ every middle ≤ every tail
    def scores(b: String) = out.filter(_.getString(2) == b).map(_.getLong(1))
    assert(scores("head").max <= scores("middle").min)
    assert(scores("middle").max <= scores("tail").min)
  }

  test("eval_ngram_f1 basis points are bounded and F1 is the exact harmonic form") {
    val out = TextOps.queries("eval_ngram_f1")(spark, d).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val Seq(ov, lc, lr, p, rc, f1) = (1 to 6).map(r.getLong)
      assert(ov <= math.min(lc, lr)) // clipped overlap can't exceed either side
      assert(p <= 10000 && rc <= 10000 && f1 <= 10000)
      assert(f1 === 2 * ov * 10000 / (lc + lr))
    }
  }

  test("lang_confusion shares per declared language sum to ~10000 bp") {
    val out = TextOps.queries("lang_confusion")(spark, d).collect()
    val total = out.map(_.getLong(2)).sum
    assert(total === Tables.documents(spark, d).count())
    out.groupBy(_.getString(0)).foreach { case (lang, cells) =>
      val bp = cells.map(_.getLong(3)).sum
      // truncating division: each cell loses < 1 bp
      assert(bp <= 10000 && bp > 10000 - cells.length, s"$lang share sum $bp")
    }
  }

  test("doc_length_hist buckets partition the corpus with power-of-2 bounds") {
    val out = TextOps.queries("doc_length_hist")(spark, d).collect()
    assert(out.map(_.getLong(1)).sum === Tables.documents(spark, d).count())
    out.foreach { r =>
      val (b, mn, mx) = (r.getLong(0), r.getLong(2), r.getLong(3))
      assert(mn >= (1L << b) && mx < (1L << (b + 1)),
        s"bucket $b range [$mn,$mx] outside [2^$b, 2^${b + 1})")
    }
  }

  test("vec_dim_stats covers every dimension with coherent bounds") {
    val out = VectorOps.queries("vec_dim_stats")(spark, d).collect()
    assert(out.map(_.getLong(0)).toSeq === out.indices.map(_.toLong))
    out.foreach { r =>
      val (mean, sd, mn, mx) =
        (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))
      assert(mn <= mean && mean <= mx)
      assert(sd >= 0.0 && mx <= 1.0 && mn >= -1.0) // normalized embeddings
    }
  }

  test("abc_analysis classes are monotone along the revenue order at the 80/95 cuts") {
    val rows = Windows.queries("abc_analysis")(spark, d).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2)))
    assert(rows.map(_._3).toSet === Set("A", "B", "C"))
    // in (revenue desc, custkey) order the class sequence never goes back
    val ordered = rows.sortBy(t => (-t._2, t._1)).map(_._3)
    assert(ordered.sliding(2).forall { case Array(x, y) => x <= y; case _ => true })
    // cumulative-share semantics: A stops at the first row crossing 80%
    val total = rows.map(_._2).sum
    val cumA = rows.filter(_._3 == "A").map(_._2).sum
    val firstB = rows.filter(_._3 == "B").map(_._2).max // largest B revenue
    assert(cumA <= 0.80 * total + 1e-6 && cumA + firstB > 0.80 * total - 1e-6)
  }

  test("funnel_time_to_convert covers exactly the stage-3 converters, coherently") {
    val lat = Windows.queries("funnel_time_to_convert")(spark, d).collect()
    val stage3 = Windows.queries("funnel_conversion")(spark, d).collect()
      .find(_.getString(0) == "3_purchase_after_click").get.getLong(1)
    assert(lat.length.toLong === stage3)
    lat.foreach { r =>
      val (tot, hop) = (r.getLong(1), r.getLong(2))
      assert(tot >= 0 && hop >= 0 && hop <= tot)
    }
  }

  test("mm_dedup_phash emits ordered pairs within the hamming radius") {
    val out = graft.functions.Custom.queries("mm_dedup_phash")(spark, d).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getLong(2) >= 0 && r.getLong(2) <= 3)
    }
  }

  test("event_transitions rows sum to ~10000 bp per from_type") {
    val out = Windows.queries("event_transitions")(spark, d).collect()
    assert(out.nonEmpty && out.length <= 25) // |types|² bound
    out.groupBy(_.getString(0)).foreach { case (from, rows) =>
      val bp = rows.map(_.getLong(3)).sum
      assert(bp <= 10000 && bp > 10000 - rows.length, s"$from sums to $bp")
    }
  }

  test("mix_quality_weighted keeps in proportion to score") {
    val out = TextOps.queries("mix_quality_weighted")(spark, d).collect()
      .map(r => (r.getLong(1), r.getBoolean(2)))
    assert(out.forall { case (s, _) => s > 0 && s <= 10000 })
    val kept = out.filter(_._2).map(_._1)
    val dropped = out.filterNot(_._2).map(_._1)
    assert(kept.nonEmpty && dropped.nonEmpty)
    // acceptance ∝ score ⇒ the kept set's mean score exceeds the dropped's
    assert(kept.sum.toDouble / kept.length > dropped.sum.toDouble / dropped.length)
  }

  test("join_fuzzy resolves each dirty name once within edit distance 2") {
    val out = Joins.queries("join_fuzzy")(spark, d).collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getLong(2) <= 2))
    val dirty = out.map(_.getString(0))
    assert(dirty.distinct.length === dirty.length) // best-match: one row per name
    // sanity: a single-char deletion should usually resolve at distance 1
    assert(out.count(_.getLong(2) === 1L) > out.length / 2)
  }
}
