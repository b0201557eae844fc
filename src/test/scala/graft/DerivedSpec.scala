package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The materialize-once seam (operators/Derived.scala): build-once
  * semantics, per-(sf dir, name) keying, and result equivalence between
  * the artifact scan and a fresh in-line derivation — the properties the
  * six minhash-family and three shingle-family consumers rely on.
  */
class DerivedSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  val d = TestSpark.sfDir

  test("dataset() builds exactly once per (dir, name); different names build separately") {
    var builds = 0
    def build() = { builds += 1; spark.range(5).toDF("x") }
    val name = s"spec-probe-${System.nanoTime()}"
    val a = Derived.dataset(spark, d, name)(build())
    val b = Derived.dataset(spark, d, name)(build())
    assert(builds === 1, "second call must scan the artifact, not rebuild")
    assert(a.collect().map(_.getLong(0)).sorted === b.collect().map(_.getLong(0)).sorted)
    Derived.dataset(spark, d, name + "-other")(build())
    assert(builds === 2, "a different artifact name is a different build")
  }

  test("the band_pairs artifact equals a fresh in-line derivation exactly") {
    val art = Derived.bandPairs(spark, d)
      .select("a", "b", "band").collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val fresh = TextOps.bandPairs(TextOps.minhashBands(spark, d))
      .select("a", "b", "band").collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(art.sorted.toSeq === fresh.sorted.toSeq,
      "parquet round-trip must be value-exact for the candidate artifact")
    assert(art.nonEmpty)
  }

  test("chained artifact: shingle_pair_stats scans hashed_shingles, values self-consistent") {
    val sps = Derived.shinglePairStats(spark, d).collect()
    assert(sps.nonEmpty)
    // i <= min(na, nb) for every verified pair — the exact-intersection
    // invariant that would break if the chained artifacts ever desynced
    sps.foreach { r =>
      val (i, na, nb) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(i <= math.min(na, nb) && na > 0 && nb > 0, r.toString)
    }
  }
}
