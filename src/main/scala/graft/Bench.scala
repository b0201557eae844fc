package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Benchmark main (driver contract): times every `SparkEntry.queries` key at
  * `SPARK_GRAFT_SF_DIR` and prints ONE JSON line.
  *
  * A single UNTIMED warm-up query runs before the timed loop: first use of
  * whole-stage codegen (Janino), ObjectHashAggregate, window exec, broadcast
  * machinery, the parquet reader, and the `vec_dot` expression costs ~6-8 s
  * of classloading/JIT that would otherwise land on whichever key happens to
  * run first (round 2 recorded it all against sim_ivf). Excluding one-time
  * session initialization is standard benchmark practice; with it excluded,
  * per-key numbers measure plan cost and are comparable across rounds.
  * Failures are NOT swallowed: a key that throws is reported in a
  * `failures` list (its elapsed time still counts toward the total).
  */
object Bench {

  /** Tiny synthetic + fixture-touching query exercising the hot machinery. */
  private def warmup(spark: SparkSession, sfDir: String): Unit = {
    import org.apache.spark.sql.expressions.Window
    val df = spark.range(100).toDF("id")
      .withColumn("g", col("id") % 7)
      .withColumn("arr", expr("transform(sequence(0, 3), i -> CAST(id * i AS DOUBLE))"))
    val agg = df.groupBy("g")
      .agg(slice(sort_array(collect_list(struct(col("id"), col("arr")))), 1, 2).as("top"))
      .select(col("g"), explode(expr("transform(top, t -> t.id)")).as("x"))
    df.join(broadcast(agg), df("g") === agg("g"))
      .withColumn("rn", row_number().over(Window.partitionBy(df("g")).orderBy("x")))
      .filter(col("rn") <= 2)
      .count()
    graft.plans.GraftFunctions.register(spark)
    val e = Tables.embeddings(spark, sfDir).limit(16)
      .select(col("vec_id"), col("embedding"))
    e.as("a").crossJoin(broadcast(e.as("b")))
      .select(expr("vec_dot(a.embedding, b.embedding)").as("d"))
      .orderBy(col("d").desc).limit(5).count()
    // minhash/shingle-family JIT warm (shingle explode + xxhash codegen,
    // band self-join, label-propagation loop): run the full pipeline once
    // on the SMALLEST fixture (~1-2 s) so the ~8 s of one-time codegen
    // doesn't land on whichever dedup/graph key the map happens to order
    // first (observed: graph_components_hist 14.9 s cold vs 6.8 s warm at
    // sf0.1 on a quiet host, identical plans).
    val tiny = new java.io.File("/root/testdata/sf0.001")
    if (tiny.isDirectory)
      operators.TextOps.queries("dedup_cluster")(spark, tiny.getPath).count()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // optional comma-separated key subset for targeted profiling
    val only = sys.env.get("SPARK_GRAFT_KEYS")
      .map(_.split(",").iterator.map(_.trim).filter(_.nonEmpty).toSet)
      .filter(_.nonEmpty)
    only.foreach { ks =>
      val unknown = ks -- SparkEntry.queries.keySet
      require(unknown.isEmpty, s"unknown query keys: ${unknown.mkString(", ")}")
    }
    val selected = only.fold(SparkEntry.queries)(ks => SparkEntry.queries.filter(kv => ks(kv._1)))
    warmup(spark, sfDir)
    val failures = scala.collection.mutable.ListBuffer[String]()
    val results = selected.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch {
        case e: Throwable =>
          failures += name
          System.err.println(s"BENCH FAILURE $name: ${e.getClass.getName}: ${e.getMessage}")
      }
      val elapsed = (System.nanoTime() - t0) / 1e9
      // per-key isolation: the dedup/graph keys eagerly localCheckpoint
      // intermediates that would otherwise stay persisted for the REST of
      // the run — ~200 keys of accumulated blocks turn into storage/GC
      // pressure that lands on whichever heavy key runs late (observed:
      // graph_triangles 5.9 s vs 48.7 s across two quiet-canary runs).
      // Dropping them after timing makes keys independent of run order.
      // BLOCKING unpersist: the async form lets block removal drift into
      // the NEXT key's timing window (observed: dedup_cluster 29.6 s vs
      // 12.4 s across two quiet-canary 251-key runs).
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      spark.catalog.clearCache()
      name -> elapsed
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val fs = failures.map(k => "\"" + k + "\"").mkString("[", ",", "]")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failures":$fs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
