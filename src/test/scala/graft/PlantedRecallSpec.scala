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

  /** Round-12 fixture crossing the OLD bucket-width cap: 66 020 valid
    * vectors puts bandBitsCase at wb = 11, one past the pre-round-12
    * `ELSE 10` ceiling — the first width that exercises the guarded
    * extension planes (planeFor j = 10 ⇒ planes 20 / 50). 10 planted
    * near-identical pairs at cos 0.99995 against 66 000 gaussian
    * background vectors (max background pair-cos stays well under the
    * planted band even at 2·10⁹ implicit pairs, and only bucket-colliding
    * pairs are ever scored).
    */
  private lazy val widePlanted: (String, Seq[(Long, Long)]) = {
    val rnd = new scala.util.Random(421203L)
    val rows = scala.collection.mutable.ArrayBuffer[(Long, Array[Float], Int)]()
    val pairs = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    def add(id: Long, v: Array[Double]): Unit =
      rows += ((id, v.map(x => (x * 10.0).toFloat), 0))
    (0 until 10).foreach { i =>
      val u = unitVec(rnd)
      add(i.toLong, u); add(i + 10L, perturb(u, 0.99995, rnd))
      pairs += ((i.toLong, i + 10L))
    }
    (20 until 66020).foreach(i => add(i.toLong, unitVec(rnd)))
    val dir = "target/planted-wide"
    rows.toSeq.toDF("vec_id", "embedding", "label")
      .repartition(8)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    (dir, pairs.toSeq)
  }

  test("dedup_embed keeps planted recall past the old 10-bit bucket cap (nv = 66020, wb = 11)") {
    val (dir, pairs) = widePlanted
    // the width the plan actually picks must cross the old ceiling —
    // guards that the ladder extension is live, not just present
    val wb = spark.sql(
      "SELECT CASE WHEN nv <= 2000 THEN 4 ELSE CAST(ceil(log2(nv / 62.5)) AS INT) END AS wb " +
      "FROM (SELECT 66020 AS nv)").head().getInt(0)
    assert(wb == 11, s"fixture sized wrong for the cap-crossing case: wb=$wb")
    val got = VectorOps.queries("dedup_embed")(spark, dir)
      .select($"a", $"b").as[(Long, Long)].collect().toSet
    val hits = pairs.count(got)
    info(s"planted recall past the old cap: $hits/10")
    // per-pair >= 1-band collision at wb = 11, cos 0.99995: ~0.999 — a
    // 10-bit freeze would ALSO pass recall (buckets merely overfull), so
    // the bucket-count assertion below is the sharp edge
    assert(hits >= 9, s"planted recall collapsed past the old cap: $hits/10")
    val nBuckets = graft.operators.Derived.lshCapped(spark, dir)
      .filter($"band" === 0).select($"bucket").distinct().count()
    // 66 020 vectors over 2^11 buckets ⇒ essentially every bucket value
    // occupied (>1024 distinct proves the width really widened; the old
    // ladder could never exceed 1024)
    assert(nBuckets > 1024, s"bucket space did not widen past 2^10: $nBuckets distinct buckets")
  }

  /** Labeled-cluster fixture for the knn_ann ↔ knn_label agreement gate
    * (round-10 verdict item 7). Each of the 20 queries (vec_id < 20 — the
    * knn split) gets a 6-member planted neighborhood at cos 0.95..0.99,
    * ALL carrying the query's cluster label (i % 5); 500 background
    * vectors carry near-unique decoy labels (10 + id % 97) so background
    * votes can never accumulate. Brute-force 5-NN therefore predicts the
    * cluster label with 5/5 votes; the ANN path agrees unless LSH drops
    * the ENTIRE 6-member neighborhood — per-member ≥1-band collision is
    * ≈ 0.88 at cos 0.95 (2 bands × 4 bits), so a whole-cluster miss is
    * ~1e-5 per query, and the deterministic seed makes the measured
    * agreement a constant of the build.
    */
  private lazy val knnPlanted: String = {
    val rnd = new scala.util.Random(421107L)
    val rows = scala.collection.mutable.ArrayBuffer[(Long, Array[Float], Int)]()
    def add(id: Long, v: Array[Double], label: Int): Unit =
      rows += ((id, v.map(x => (x * 10.0).toFloat), label))
    (0 until 20).foreach { i =>
      val u = unitVec(rnd)
      add(i.toLong, u, i % 5) // query (true_label = its own cluster)
      (0 until 6).foreach { j =>
        add(20L + 6 * i + j, perturb(u, 0.95 + 0.008 * j, rnd), i % 5)
      }
    }
    (140 until 640).foreach(i => add(i.toLong, unitVec(rnd), 10 + i % 97))
    val dir = "target/planted-knn"
    rows.toSeq.toDF("vec_id", "embedding", "label")
      .repartition(4)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("knn_ann agrees with brute-force knn_label on >= 95% of planted queries") {
    val dir = knnPlanted
    def preds(key: String): Map[Long, Int] =
      VectorOps.queries(key)(spark, dir)
        .select($"q_id", $"pred_label").as[(Long, Int)].collect().toMap
    val exact = preds("knn_label")
    val ann = preds("knn_ann")
    // sanity on the fixture itself: brute force must recover every
    // cluster label, or the agreement gate below would be vacuous
    (0 until 20).foreach(i =>
      assert(exact(i.toLong) == i % 5,
        s"fixture defect: brute-force 5-NN missed cluster $i (${exact.get(i.toLong)})"))
    val agree = (0 until 20).count(i => ann.get(i.toLong).contains(exact(i.toLong)))
    info(s"knn_ann/knn_label agreement: $agree/20")
    assert(agree >= 19, s"ANN label agreement collapsed: $agree/20 (ann=$ann)")
  }
}
