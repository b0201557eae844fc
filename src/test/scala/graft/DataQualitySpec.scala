package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators._

/** Invariant coverage for the DataQuality module — the cross-engine hash
  * gate proves value equality vs DuckDB; these prove the STATISTICS mean
  * what they claim on any fixture (and would fail loudly on a fixture
  * whose shape breaks an assumption).
  */
class DataQualitySpec extends AnyFunSuite {
  val spark = TestSpark.spark
  val d = TestSpark.sfDir

  test("dq_suite: metrics are fractions, thresholds respected by passed flag") {
    val rows = DataQuality.queries("dq_suite")(spark, d).collect()
    assert(rows.length == 12)
    rows.foreach { r =>
      val (metric, thr, passed) = (r.getDouble(2), r.getDouble(3), r.getBoolean(4))
      assert(metric >= 0.0 && metric <= 1.0, s"metric out of [0,1]: $r")
      assert(passed == (metric >= thr), s"passed flag inconsistent: $r")
    }
    // the synthetic fixture is clean — the whole suite must pass
    assert(rows.forall(_.getBoolean(4)), "clean fixture failed a constraint")
  }

  test("dq_referential: star-schema edges are orphan-free on the fixture") {
    val rows = DataQuality.queries("dq_referential")(spark, d).collect()
    assert(rows.length == 7)
    rows.foreach { r =>
      assert(r.getLong(1) > 0, s"edge with no child rows: $r")
      assert(r.getLong(2) == 0L, s"fixture has orphans: $r")
      assert(r.getLong(3) == 0L, s"fixture has null fks: $r")
      assert(r.getDouble(4) == 0.0)
    }
  }

  test("dq_quarantine: combo counts reconcile with a direct violator count") {
    val rows = DataQuality.queries("dq_quarantine")(spark, d).collect()
    assert(rows.nonEmpty, "no violators — rules no longer fire on the fixture")
    val comboTotal = rows.map(_.getLong(1)).sum
    val direct = Tables.lineitem(spark, d)
      .filter(expr("l_discount > 0.08 OR l_quantity >= 45 OR l_tax >= 0.07" +
        " OR l_extendedprice > 90000"))
      .count()
    assert(comboTotal == direct,
      s"combo rows $comboTotal != direct violator count $direct")
    // reason labels are drawn from the rule names, in rule order
    val names = Seq("discount_gt_008", "qty_ge_45", "tax_ge_007", "price_gt_90k")
    rows.foreach { r =>
      val parts = r.getString(0).split(",").toSeq
      assert(parts.forall(names.contains), s"unknown reason in ${r.getString(0)}")
      assert(parts.map(names.indexOf).sliding(2).forall {
        case Seq(a, b) => a < b
        case _         => true
      }, s"reasons not in rule order: ${r.getString(0)}")
    }
  }

  test("dq_freshness: lags are non-negative and at least one source is current") {
    val rows = DataQuality.queries("dq_freshness")(spark, d).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      assert(r.getDouble(3) >= 0.0, s"negative lag: $r")
      assert(r.getBoolean(4) == (r.getDouble(3) > 30.0))
    }
    assert(rows.exists(_.getDouble(3) == 0.0),
      "no source matches the corpus watermark — corpus max not from events?")
  }

  test("drift_psi: terms are non-negative and buckets within the grid") {
    val rows = DataQuality.queries("drift_psi")(spark, d).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) >= 0 && r.getLong(1) <= 9, s"bucket off-grid: $r")
      assert(r.getDouble(4) >= 0.0, s"negative psi term: $r")
      assert(r.getLong(2) + r.getLong(3) > 0, "empty cell materialized")
    }
  }

  test("drift_ks: statistic is a valid sup-distance and reproduces by hand") {
    val row = DataQuality.queries("drift_ks")(spark, d).collect().head
    val (na, nb, ks, at) =
      (row.getLong(0), row.getLong(1), row.getDouble(2), row.getLong(3))
    assert(na > 0 && nb > 0)
    assert(ks >= 0.0 && ks <= 1.0)
    // recompute the ECDF gap at the reported argmax bucket from raw rows
    val ev = Tables.events(spark, d).filter(col("event_type").isin("click", "purchase"))
    val ca = ev.filter(col("event_type") === "click" && floor(col("value")) <= at).count()
    val cb = ev.filter(col("event_type") === "purchase" && floor(col("value")) <= at).count()
    val expected = math.abs(ca * nb - cb * na).toDouble / (na.toDouble * nb.toDouble)
    assert(math.abs(ks - expected) < 1e-6 + 5e-7,
      s"ks $ks != recomputed $expected at bucket $at")
  }

  test("drift_embedding: cosine in [-1,1], ratio positive, halves partition each label") {
    val rows = DataQuality.queries("drift_embedding")(spark, d).collect()
    assert(rows.nonEmpty)
    val perLabel = Tables.embeddings(spark, d).groupBy("label").count()
      .collect().map(r => r.getAs[Number]("label").longValue -> r.getLong(1)).toMap
    rows.foreach { r =>
      val label = r.getAs[Number]("label").longValue
      val (nRef, nCur) = (r.getLong(1), r.getLong(2))
      assert(nRef + nCur == perLabel(label),
        s"halves must partition label $label: $nRef + $nCur != ${perLabel(label)}")
      assert(r.getDouble(3) >= -1.0 && r.getDouble(3) <= 1.0, s"cos off-range: $r")
      assert(r.getDouble(4) > 0.0, s"norm ratio must be positive: $r")
    }
    // hand-recompute one label's centroid cosine from the raw vectors
    // (unscaled doubles) — the scaled-integer path must agree to ~1e-3
    val label0 = rows.minBy(_.getAs[Number]("label").longValue)
    val l0 = label0.getAs[Number]("label").longValue
    val vecs = Tables.embeddings(spark, d)
      .filter(col("label") === l0)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
    val ref = vecs.filter(_._1 % 2 == 0).map(_._2)
    val cur = vecs.filter(_._1 % 2 != 0).map(_._2)
    def sumVec(vs: Array[Array[Double]]) =
      vs.foldLeft(new Array[Double](64)) { (acc, v) =>
        acc.indices.foreach(i => acc(i) += v(i)); acc
      }
    val (a, b) = (sumVec(ref), sumVec(cur))
    val dot = a.indices.map(i => a(i) * b(i)).sum
    val expected = dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    assert(math.abs(label0.getDouble(3) - expected) < 1e-3,
      s"cos ${label0.getDouble(3)} != recomputed $expected for label $l0")
  }

  test("drift_chi2: per-day statistics are non-negative and cover every day") {
    val rows = DataQuality.queries("drift_chi2")(spark, d).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(2) >= 0.0, s"negative chi2: $r")
      assert(r.getLong(1) > 0)
    }
    // days are unique and sorted
    val days = rows.map(_.getLong(0))
    assert(days.distinct.length == days.length)
    assert(days.zip(days.drop(1)).forall { case (a, b) => a < b })
  }
}
