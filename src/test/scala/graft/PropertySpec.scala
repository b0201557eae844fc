package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Custom

/** Property-based laws (SURVEY.md §5.2.3) — ScalaCheck generators sampled
  * deterministically (fixed seed; no scalatest-plus bridge in the offline
  * dep set, so sampling is driven manually).
  */
class PropertySpec extends AnyFunSuite {
  val spark = TestSpark.spark
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  test("filter commutes with projection (over random int tables)") {
    samples(Gen.listOfN(50, Gen.zip(Gen.chooseNum(-100, 100), Gen.chooseNum(-100, 100))), 5)
      .foreach { rows =>
        val df = rows.toDF("a", "b")
        val fp = df.filter($"a" > 0).select($"a")
        val pf = df.select($"a").filter($"a" > 0)
        assert(fp.collect().sorted(Ordering.by((r: org.apache.spark.sql.Row) => r.getInt(0)))
          .toSeq === pf.collect().sorted(Ordering.by((r: org.apache.spark.sql.Row) => r.getInt(0))).toSeq)
      }
  }

  test("union-all count additivity; set-union bounded by sum") {
    samples(Gen.zip(Gen.listOfN(30, Gen.chooseNum(0, 10)), Gen.listOfN(20, Gen.chooseNum(0, 10))), 5)
      .foreach { case (xs, ys) =>
        val (a, b) = (xs.toDF("x"), ys.toDF("x"))
        assert(a.unionByName(b).count() === xs.size + ys.size)
        val u = a.unionByName(b).distinct().count()
        assert(u <= xs.size + ys.size && u === (xs ++ ys).distinct.size)
      }
  }

  test("levenshtein: identity, symmetry, length bounds") {
    val strGen = Gen.listOfN(8, Gen.alphaLowerChar).map(_.mkString)
    samples(Gen.zip(strGen, strGen), 50).foreach { case (a, b) =>
      val dAB = Custom.levenshteinScala(a, b)
      assert(dAB === Custom.levenshteinScala(b, a))
      assert(Custom.levenshteinScala(a, a) === 0)
      assert(dAB <= math.max(a.length, b.length))
      assert(dAB >= math.abs(a.length - b.length))
    }
  }

  test("Welford variance is partition-split invariant") {
    val welford = udaf(Custom.WelfordVar)
    samples(Gen.listOfN(200, Gen.chooseNum(-1000.0, 1000.0)), 3).foreach { xs =>
      val one = xs.toDF("x").repartition(1).agg(welford($"x")).as[Double].head()
      val many = xs.toDF("x").repartition(7).agg(welford($"x")).as[Double].head()
      assert(math.abs(one - many) <= 1e-6 * math.max(1.0, math.abs(one)))
    }
  }

  test("exact dedup is idempotent on arbitrary duplicated strings") {
    samples(Gen.listOfN(40, Gen.oneOf("aa", "bb", "cc", "dd")), 5).foreach { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val d1 = df.groupBy(md5(lower(trim($"text"))).as("h")).agg(min($"doc_id").as("keep"))
      val d2 = d1.groupBy("h").agg(min($"keep"))
      assert(d1.count() === d2.count())
      assert(d1.count() === texts.distinct.size)
    }
  }

  test("split_assign partitions the corpus deterministically, train largest") {
    val d = TestSpark.sfDir
    val out = graft.operators.TextOps.queries("split_assign")(spark, d)
    val counts = out.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum === graft.Tables.documents(spark, d).count())
    assert(counts("train") > counts.getOrElse("valid", 0L))
    assert(counts("train") > counts.getOrElse("test", 0L))
    // re-run identical (no RNG state)
    val again = graft.operators.TextOps.queries("split_assign")(spark, d).collect()
    assert(out.collect().toSeq === again.toSeq)
  }

  test("merge_upsert: row count = base + inserts; updated keys get new price") {
    val d = TestSpark.sfDir
    val base = graft.Tables.orders(spark, d)
    val merged = graft.operators.Joins.queries("merge_upsert")(spark, d)
    val nBase = base.count()
    val nIns = base.filter($"o_orderkey" % 17 === 0).count()
    assert(merged.count() === nBase + nIns)
    val k = base.filter($"o_orderkey" % 10 === 0).select("o_orderkey", "o_totalprice")
      .as[(Long, Double)].head()
    val got = merged.filter($"o_orderkey" === k._1).select("o_totalprice")
      .as[Double].head()
    assert(math.abs(got - BigDecimal(k._2 * 1.1).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
  }

  test("window row_number over shuffled input is input-order independent") {
    samples(Gen.listOfN(60, Gen.zip(Gen.chooseNum(0, 5), Gen.chooseNum(0, 1000))), 3)
      .foreach { rows =>
        val distinctRows = rows.distinct // (part, key) pairs, tie-free order key
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("p").orderBy("k")
        def rn(seq: Seq[(Int, Int)]) = seq.toDF("p", "k")
          .withColumn("rn", row_number().over(w))
          .orderBy("p", "k").collect().toSeq
        assert(rn(distinctRows) === rn(scala.util.Random.shuffle(distinctRows)))
      }
  }
}
