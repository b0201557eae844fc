package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Focused hot-entity experiment (round 11, verdict item 1's evidence row).
  *
  * The skew rehearsal (25%/50% hot key over ×k fixture replicas) tops out
  * around 5·10⁵ rows on the hot entity — where a single-task per-user
  * window sort is still sub-second, so plain `sessionize` and the
  * day-bucketed pre-split read EQUALLY flat and the escape hatch shows
  * only its overhead. This main synthesizes the regime the rehearsal
  * cannot reach: ONE user owning n events spread uniformly over a year
  * (plus a 10%-of-n background population of normal users), and times
  * sessionize vs sessionize_bucketed head-to-head at growing n. The
  * expected shape: the plain plan's wall grows with n ON ONE TASK
  * (serial sort + serial window scan — the 100 TB cliff), while the
  * bucketed plan's hot task is bounded by one user-DAY (n/365) and its
  * wall stays ~flat until the join/shuffle floor dominates.
  *
  * Usage: graft.HotEntityProbe <outBase> [n1,n2,...]  (default 1e5,1e6,4e6)
  * Emits one JSON line per n: {"n_hot":…,"sessionize_s":…,"bucketed_s":…}.
  */
object HotEntityProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: graft.HotEntityProbe <outBase> [n1,n2,...]")
    val outBase = args(0)
    val ns = if (args.length > 1) args(1).split(",").map(_.toLong).toSeq
             else Seq(100000L, 1000000L, 4000000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    ns.foreach { n =>
      val dir = s"$outBase/hot_$n"
      // hot user 0: n events over 365 days (uniform; every day occupied →
      // sessions merge across every midnight, the worst stitch case).
      // background: n/10 events over 1000 users, same span.
      val yearUs = 365L * 24 * 3600 * 1000000L
      val hot = spark.range(n).select(
        col("id").as("event_id"),
        timestamp_micros(lit(1700000000000000L) + pmod(col("id") * 2654435761L, lit(yearUs))).as("ts"),
        lit(0L).as("user_id"),
        lit("view").as("event_type"),
        (col("id") % 100).cast("double").as("value"),
        lit("{}").as("props"))
      val bg = spark.range(n / 10).select(
        (col("id") + lit(2000000000L)).as("event_id"),
        timestamp_micros(lit(1700000000000000L) + pmod(col("id") * 968665207L, lit(yearUs))).as("ts"),
        (col("id") % 1000 + 1).as("user_id"),
        lit("view").as("event_type"),
        (col("id") % 100).cast("double").as("value"),
        lit("{}").as("props"))
      hot.unionByName(bg).repartition(16)
        .write.mode("overwrite").parquet(s"$dir/events.parquet")

      def time(key: String): (Double, Long) = {
        val t0 = System.nanoTime()
        val rows = SparkEntry.queries(key)(spark, dir).count()
        ((System.nanoTime() - t0) / 1e9, rows)
      }
      // bucketed first, so any one-time scan warmth favors the PLAIN plan
      // (the conservative direction for the claim under test)
      val (tb, rb) = time("sessionize_bucketed")
      val (tp, rp) = time("sessionize")
      require(rb == rp, s"plans disagree at n=$n: $rb vs $rp")
      println(f"""{"n_hot":$n,"rows":$rp,"sessionize_s":$tp%.2f,"bucketed_s":$tb%.2f}""")
    }
    spark.stop()
  }
}
