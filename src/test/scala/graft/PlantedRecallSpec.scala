package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.VectorOps

/** ANN recall calibrated on PLANTED structure (round-10, verdict item 4).
  *
  * The random-embedding fixture neither stresses nor certifies the LSH
  * candidate stage: random 64-dim gaussian pairs top out near cos 0.6, so
  * the "true top-20" the recall floor compares against is itself noise —
  * a bucket/band bug that collapses recall from ~1.0 to 0.3 on real
  * near-dups could pass. This spec synthesizes a corpus with KNOWN
  * near-duplicate pairs at controlled cosines (the standard planted-pair
  * evaluation: v' = c·u + sqrt(1-c²)·r⊥ has exact cos(u,v') = c) and
  * gates recall against that planted ground truth:
  *
  *   - 10 near-identical pairs at cos 0.99995 (a re-embedded document —
  *     the dedup target case), planted on vec_ids 0..9 ↔ 10..19 so they
  *     double as sim_ann_lsh's query set (vec_id < 10);
  *   - 10 graded pairs at cos 0.950..0.995 (borderline near-dups — the
  *     region where banding recall decays), vec_ids 20+j ↔ 30+j;
  *   - 500 gaussian background vectors (ids 40..539; max background
  *     pair-cos ≈ 0.6 « 0.95, so the exact top-20 IS the planted set).
  *
  * Deterministic seed → the measured recall is a constant of the build,
  * not a flaky sample; floors sit just under the expected LSH collision
  * rates (2 bands × 4 bits at n=540: ≥1-band collision ≈ 0.88 at cos
  * 0.95, ≈ 0.999 at cos 0.99995; 8-plane single-band for sim_ann_lsh:
  * ≈ 0.975 at cos 0.99995).
  */
class PlantedRecallSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  import spark.implicits._

  private val dim = 64

  private def unitVec(rnd: scala.util.Random): Array[Double] = {
    val v = Array.fill(dim)(rnd.nextGaussian())
    val n = math.sqrt(v.map(x => x * x).sum)
    v.map(_ / n)
  }

  /** Exact-cosine perturbation: project noise orthogonal to u, mix. */
  private def perturb(u: Array[Double], c: Double,
                      rnd: scala.util.Random): Array[Double] = {
    val r = unitVec(rnd)
    val du = r.zip(u).map { case (a, b) => a * b }.sum
    val o = r.zip(u).map { case (a, b) => a - du * b }
    val on = math.sqrt(o.map(x => x * x).sum)
    u.zip(o).map { case (a, b) => c * a + math.sqrt(1 - c * c) * b / on }
  }

  /** (fixture dir, planted (a, b, cos) triples). Built once per run. */
  private lazy val planted: (String, Seq[(Long, Long, Double)]) = {
    val rnd = new scala.util.Random(421001L)
    val rows = scala.collection.mutable.ArrayBuffer[(Long, Array[Float], Int)]()
    val pairs = scala.collection.mutable.ArrayBuffer[(Long, Long, Double)]()
    def add(id: Long, v: Array[Double]): Unit =
      rows += ((id, v.map(x => (x * 10.0).toFloat), 0))
    (0 until 10).foreach { i =>      // near-identical pairs = the query set
      val u = unitVec(rnd)
      add(i.toLong, u); add(i + 10L, perturb(u, 0.99995, rnd))
      pairs += ((i.toLong, i + 10L, 0.99995))
    }
    (0 until 10).foreach { j =>      // graded borderline near-dups
      val c = 0.950 + 0.005 * j
      val u = unitVec(rnd)
      add(20L + j, u); add(30L + j, perturb(u, c, rnd))
      pairs += ((20L + j, 30L + j, c))
    }
    (40 until 540).foreach(i => add(i.toLong, unitVec(rnd)))
    val dir = "target/planted-emb"
    rows.toSeq.toDF("vec_id", "embedding", "label")
      .repartition(4)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    (dir, pairs.toSeq)
  }

  test("dedup_embed recovers >= 90% of planted near-dup pairs (cos 0.95..0.99995)") {
    val (dir, pairs) = planted
    val out = VectorOps.queries("dedup_embed")(spark, dir)
      .select($"a", $"b", $"cos_sim").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val got = out.map(t => (t._1, t._2)).toSet
    val hits = pairs.count { case (a, b, _) => got((a, b)) }
    val recall = hits / pairs.length.toDouble
    val missed = pairs.filterNot { case (a, b, _) => got((a, b)) }
    info(f"planted recall@20: $recall%.2f (missed: ${missed.map(p => s"(${p._1},${p._2})@${p._3}").mkString(", ")})")
    assert(recall >= 0.9, f"planted-pair recall collapsed: $recall%.2f, missed $missed")
    // any non-planted emitted pair can only be background noise — if one
    // outranks a planted pair it must be because LSH missed the planted
    // pair, never because background cos reached the planted band
    out.filterNot(t => pairs.exists(p => p._1 == t._1 && p._2 == t._2))
      .foreach(t => assert(t._3 < 0.95, s"background pair $t in the planted cos band"))
  }

  test("sim_ann_lsh finds each query's planted near-identical partner at rank 1") {
    val (dir, _) = planted
    val out = VectorOps.queries("sim_ann_lsh")(spark, dir)
      .filter($"rank" === 1).select($"q_id", $"vec_id")
      .as[(Long, Long)].collect().toMap
    // 8-plane single-band signature at cos 0.99995: per-pair collision
    // ≈ 0.975, so ≥ 9 of 10 queries must surface their partner — and when
    // the partner collides at all, nothing else comes close (next-best
    // background cos ≈ 0.6), so it must sit at rank 1 exactly
    val found = (0 until 10).count(i => out.get(i.toLong).contains(i + 10L))
    info(s"planted partners at rank 1: $found/10")
    assert(found >= 9, s"sim_ann_lsh planted-partner recall collapsed: $found/10 ($out)")
  }
}
