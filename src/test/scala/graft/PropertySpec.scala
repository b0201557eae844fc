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

  test("day-bucketed decompositions equal the plain plans on random event streams") {
    // the auto-switch (round 13) makes the bucketed legs load-bearing at
    // exactly the scales no fixture reaches — so their row-for-row
    // equality with the plain plans is proven on RANDOM streams, not
    // just the crafted midnight/chain/empty-day fixtures. Timestamps
    // cluster within ±5h of midnights (the stitch-heavy regime) plus a
    // uniform tail; NULL users and NULL timestamps are injected.
    import graft.operators.Windows
    val dayUs = 24L * 3600 * 1000000L
    for (seed <- Seq(1L, 7L, 23L)) {
      val rnd = new scala.util.Random(seed)
      val base = 1700000000000000L
      val rows = (0 until 3000).map { i =>
        val user: Option[Long] =
          if (rnd.nextInt(50) == 0) None else Some(rnd.nextInt(20).toLong)
        val ts: Option[java.sql.Timestamp] =
          if (rnd.nextInt(80) == 0) None
          else {
            val day = rnd.nextInt(12).toLong
            val us =
              if (rnd.nextBoolean()) // ±5h around a midnight boundary
                base + day * dayUs + (rnd.nextLong(10L * 3600 * 1000000L)
                  - 5L * 3600 * 1000000L)
              else base + rnd.nextLong(12L * dayUs)
            Some(new java.sql.Timestamp(us / 1000))
          }
        (i.toLong, ts, user,
          Seq("view", "click", "purchase")(rnd.nextInt(3)),
          rnd.nextInt(10000) / 100.0, "{}")
      }
      val dir = s"target/prop-sess-$seed"
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .repartition(5)
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      val ev = Tables.events(spark, dir)
      // 3000 events ≪ cutoff ⇒ queries("sessionize") IS the plain plan
      assert(Windows.queries("sessionize")(spark, dir).collect().toSeq ===
        Windows.sessionizeBucketed(ev).collect().toSeq,
        s"sessionize decomposition diverged at seed $seed")
      assert(Windows.transitionsPlain(ev).collect().toSeq ===
        Windows.transitionsBucketed(ev).collect().toSeq,
        s"transitions decomposition diverged at seed $seed")
    }
  }

  test("globalNtile matches the reference NTILE on random tables (any k)") {
    // the two-phase range-partition + broadcast-offsets plan must equal
    // ANSI NTILE semantics (first n%k buckets one row larger) for every
    // n, k, and value distribution — including heavy ties, where only
    // the unique (value, id) total order keeps it deterministic
    val cases = samples(Gen.zip(
      Gen.chooseNum(1, 7), Gen.listOfN(83, Gen.chooseNum(0, 9))), 4)
    cases.foreach { case (k, vs) =>
      val df = vs.zipWithIndex.map { case (v, i) => (v.toLong, i.toLong) }
        .toDF("v", "id")
      val got = graft.operators.Windows
        .globalNtile(df, k, Seq(col("v"), col("id")), "b")
        .orderBy("v", "id").select("b").as[Int].collect().toSeq
      // reference: rank rows in (v, id) order, bucket by the remainder rule
      val n = vs.length
      val (q, r) = (n / k, n % k)
      val ref = (1 to n).map { rn =>
        if (rn <= r * (q + 1)) (rn - 1) / (q + 1) + 1
        else r + (rn - r * (q + 1) - 1) / q + 1
      }
      assert(got === ref, s"k=$k n=$n")
    }
  }

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

  /** Seeded synthetic corpus with planted near-duplicates, written as a
    * documents.parquet fixture so the production operators run unmodified.
    * Returns (dir, docs) — docs as id → word sequence.
    */
  private def plantedCorpus(): (String, Map[Long, Seq[String]]) = {
    val rng = new scala.util.Random(4242)
    // diverse 7-letter words: char-5-grams are mostly word-local, so gram
    // document frequencies stay inside the [2, 20] blocking band
    val vocab = Vector.fill(500)((1 to 7).map(_ => ('a' + rng.nextInt(26)).toChar).mkString)
    def doc(): Seq[String] = Seq.fill(30 + rng.nextInt(30))(vocab(rng.nextInt(vocab.size)))
    val bases = (0 until 60).map(i => i.toLong -> doc()).toMap
    val dups = (0 until 20).map { i =>
      val mutated = bases(i.toLong).map(w =>
        if (rng.nextDouble() < 0.06) vocab(rng.nextInt(vocab.size)) else w)
      (1000L + i) -> mutated
    }.toMap
    val all = bases ++ dups
    val dir = java.nio.file.Files.createTempDirectory("graft_planted").toString
    all.toSeq.map { case (id, ws) => (id, ws.mkString(" ")) }
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("synthetic"))
      .withColumn("n_chars", length($"text").cast("long"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    (dir, all)
  }

  private def exactPairs(all: Map[Long, Seq[String]], grams: Seq[String] => Set[String],
                         thresh: Double): Map[(Long, Long), Double] = {
    val sets = all.map { case (id, ws) => id -> grams(ws) }
    val ids = all.keys.toSeq.sorted
    (for {
      i <- ids; j <- ids if i < j
      inter = (sets(i) & sets(j)).size
      jac = inter.toDouble / (sets(i).size + sets(j).size - inter)
      if jac >= thresh
    } yield (i, j) -> jac).toMap
  }

  test("dedup_near blocking drops no pair above the 0.5 Jaccard threshold") {
    val (dir, all) = plantedCorpus()
    val expected = exactPairs(all, ws => ws.sliding(3).map(_.mkString(" ")).toSet, 0.5)
    assert(expected.size >= 15, s"corpus should plant many near-dup pairs, got ${expected.size}")
    val got = graft.operators.TextOps.queries("dedup_near")(spark, dir)
      .select("a", "b", "jaccard").as[(Long, Long, Double)].collect()
      .map { case (a, b, j) => (a, b) -> j }.toMap
    val missed = expected.keySet -- got.keySet
    assert(missed.isEmpty, s"blocking dropped true pairs: $missed")
    expected.foreach { case (p, j) =>
      assert(math.abs(got(p) - BigDecimal(j).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9,
        s"pair $p jaccard ${got(p)} != expected $j")
    }
  }

  test("dedup_ngram blocking drops no pair above the 0.7 Jaccard threshold") {
    val (dir, all) = plantedCorpus()
    val expected = exactPairs(all,
      ws => ws.mkString(" ").sliding(5).filter(_.length == 5).toSet, 0.7)
    assert(expected.size >= 10, s"corpus should plant many near-dup pairs, got ${expected.size}")
    val got = graft.operators.TextOps.queries("dedup_ngram")(spark, dir)
      .select("a", "b").as[(Long, Long)].collect().toSet
    val missed = expected.keySet -- got
    assert(missed.isEmpty, s"blocking dropped true pairs: $missed")
  }

  test("minhash band-bucket cap drops no planted near-dup pair (recall gate)") {
    // the bandPairs df∈[2,20] bucket cap must sacrifice recall ONLY in
    // hot (information-free) buckets — every planted pair with 3-word
    // shingle Jaccard ≥ 0.7 must still band-collide. Corpus and md5 hash
    // family are both deterministic, so this is a fixed gate, not a
    // flaky probabilistic one.
    val (dir, all) = plantedCorpus()
    val expected = exactPairs(all, ws => ws.sliding(3).map(_.mkString(" ")).toSet, 0.7)
    assert(expected.size >= 10, s"corpus should plant many near-dup pairs, got ${expected.size}")
    val got = graft.operators.TextOps.queries("dedup_minhash")(spark, dir)
      .select("a", "b").as[(Long, Long)].collect().toSet
    val missed = expected.keySet -- got
    assert(missed.isEmpty, s"bucket cap dropped true near-dup pairs: $missed")
  }

  private def uniformCorpus(n: Int): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_hot").toString
    (0 until n).map(i => (i.toLong, "alpha beta gamma delta epsilon"))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("synthetic"))
      .withColumn("n_chars", length($"text").cast("long"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("bandPairs: hot buckets are dropped entirely; small families fully paired") {
    // 30 identical docs put 30 > cap(20) in every band bucket → the cap
    // must suppress ALL pairs (the bounded-pairs-per-bucket invariant:
    // no bucket ever emits more than cap·(cap-1)/2 pairs); 5 identical
    // docs stay under the cap → all C(5,2) pairs emitted
    val hot = graft.operators.TextOps.queries("dedup_minhash")(spark, uniformCorpus(30))
    assert(hot.count() == 0L,
      "a 30-doc identical family exceeds the bucket cap and must emit no pairs")
    val small = graft.operators.TextOps.queries("dedup_minhash")(spark, uniformCorpus(5))
      .select("a", "b").distinct()
    assert(small.count() == 10L, "a 5-doc identical family must emit all C(5,2) pairs")
  }

  test("dedup_span flags planted duplicate substrings at ANY alignment") {
    // doc pairs share a 14-token run copied to a RANDOM offset in an
    // otherwise-unique doc; singles share nothing. Every planted doc must
    // report n_shared ≥ 3 (a 14-token run contains 3 full 12-token
    // spans); every clean doc must report n_shared = 0.
    val offs = samples(Gen.chooseNum(0, 25), 8)
    val docs = offs.zipWithIndex.flatMap { case (off, i) =>
      val run = (0 until 14).map(j => s"run${i}_$j").mkString(" ")
      val base = (0 until 40).map(j => s"a${i}_$j")
      val host = (base.take(off) ++ run.split(" ") ++ base.drop(off)).mkString(" ")
      Seq((i * 10L, run + " " + (0 until 26).map(j => s"b${i}_$j").mkString(" ")),
        (i * 10L + 1, host))
    } ++ Seq((9000L, (0 until 40).map(j => s"c_$j").mkString(" ")))
    val toks = docs.toDF("doc_id", "text")
      .select($"doc_id", split(lower($"text"), " ").as("t"))
    val out = graft.operators.TextOps.spanDedup(toks).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    offs.zipWithIndex.foreach { case (_, i) =>
      assert(out(i * 10L) >= 3, s"copy source ${i * 10} missed")
      assert(out(i * 10L + 1) >= 3, s"host doc at random offset missed")
    }
    assert(out(9000L) === 0, "clean doc falsely flagged")
  }

  test("connectedComponents matches union-find on random graphs") {
    val edgeGen = Gen.listOfN(40, Gen.zip(Gen.chooseNum(0L, 29L), Gen.chooseNum(0L, 29L)))
      .map(_.filter { case (a, b) => a != b })
    samples(edgeGen, 5).filter(_.nonEmpty).foreach { edges =>
      // reference: classic union-find over the same edge list
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val verts = edges.flatMap(e => Seq(e._1, e._2)).distinct
      // canonical component id = min member id, matching hash-min's label
      val expected = verts.groupBy(find).flatMap { case (_, vs) =>
        val m = vs.min; vs.map(_ -> m)
      }
      val got = graft.operators.TextOps
        .connectedComponents(edges.toDF("src", "dst"))
        .as[(Long, Long)].collect().toMap
      assert(got === expected)
    }
  }

  test("connectedComponents releases per-round checkpoints (storage hygiene)") {
    // a 30-node path needs ~29 propagation rounds; each round checkpoints
    // a label table. Without the per-round release, ~1 pinned RDD per
    // round survives the call and degrades every later key in a shared
    // session (Bench/serve run hundreds per session).
    val path = (0L until 29L).map(i => (i, i + 1))
    val before = spark.sparkContext.getPersistentRDDs.size
    val got = graft.operators.TextOps
      .connectedComponents(path.toDF("src", "dst"))
      .as[(Long, Long)].collect()
    assert(got.forall(_._2 == 0L), "path graph must collapse to one component")
    val after = spark.sparkContext.getPersistentRDDs.size
    // only the final labels checkpoint (+ nothing else) may remain pinned
    assert(after - before <= 2,
      s"checkpoint leak: $before persistent RDDs before, $after after")
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

  // events-shaped frame builder for the drift laws: (day-of-month, type, value)
  private def eventsOf(rows: Seq[(Int, String, Double)]) =
    rows.zipWithIndex.map { case ((day, et, v), i) =>
      (f"2024-01-$day%02d 12:00:00", et, v, i.toLong)
    }.toDF("ts_s", "event_type", "value", "event_id")
      .withColumn("ts", to_timestamp(col("ts_s")))
      .drop("ts_s")

  test("drift_psi law: identical ref/cur distributions give psi == 0 exactly") {
    // any multiset of values, mirrored across the day-15 split, must
    // produce p_ref == p_cur in every bucket — each term (p-p)·ln(1) = 0
    samples(Gen.listOfN(40, Gen.chooseNum(0, 499)), 3).foreach { vs =>
      val rows = vs.flatMap(v =>
        Seq((5, "click", v.toDouble), (20, "click", v.toDouble)))
      val terms = graft.operators.DataQuality.psiOf(eventsOf(rows))
        .select("psi_term").as[Double].collect()
      assert(terms.nonEmpty && terms.forall(_ == 0.0),
        s"mirrored distributions must have zero drift: ${terms.toSeq}")
    }
  }

  test("drift_psi law: total mass displacement drives psi past the 0.25 alarm") {
    // ref concentrated in bucket 0, cur in bucket 9 — the classic
    // "feature moved" case every PSI reference labels significant (>0.25)
    val rows = (1 to 30).map(i => (5, "view", (i % 40).toDouble)) ++
      (1 to 30).map(i => (20, "view", 460.0 + (i % 30)))
    val terms = graft.operators.DataQuality.psiOf(eventsOf(rows))
      .select("psi_term").as[Double].collect()
    assert(terms.forall(_ >= 0.0))
    assert(terms.sum > 0.25, s"displaced mass must alarm: ${terms.sum}")
  }

  test("drift_ks law: identical samples give 0; disjoint ranges give 1") {
    samples(Gen.listOfN(50, Gen.chooseNum(0, 400)), 3).foreach { vs =>
      val same = vs.flatMap(v =>
        Seq((5, "a", v.toDouble), (20, "b", v.toDouble)))
      val r0 = graft.operators.DataQuality.ksOf(eventsOf(same), "a", "b")
        .collect().head
      assert(r0.getDouble(2) == 0.0, s"identical samples must give ks=0: $r0")
      // a strictly below b: the ECDF gap hits 1 at a's maximum
      val apart = vs.map(v => (5, "a", v.toDouble)) ++
        vs.map(v => (20, "b", 450.0 + (v % 50)))
      val r1 = graft.operators.DataQuality.ksOf(eventsOf(apart), "a", "b")
        .collect().head
      assert(r1.getDouble(2) == 1.0, s"disjoint samples must give ks=1: $r1")
      assert(r1.getLong(3) == vs.max.toLong,
        s"sup must sit at a's maximum bucket: $r1")
    }
  }
}
