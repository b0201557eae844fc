package graft

import java.nio.file.Files

import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Proves the engine's object-store path against the emulated S3A contract
  * surface (MockObjectStoreFs), not just scheme routing: ranged GETs +
  * seeks on read, multipart boundaries + visibility-at-close on write,
  * append rejection, copy-based rename. This is the closest an offline
  * container gets to a real `s3a://` read (hadoop-aws jar absent —
  * SURVEY.md §7.4); swapping in the real connector is the same single
  * `fs.<scheme>.impl` config key.
  */
class ObjectStoreContractSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  val d = TestSpark.sfDir

  private def fs(): FileSystem = {
    spark.sparkContext.hadoopConfiguration
      .set("fs.mock3a.impl", classOf[MockObjectStoreFs].getName)
    // bypass the FS cache so each test sees a freshly-configured instance
    new HPath("mock3a:/").getFileSystem(
      spark.sparkContext.hadoopConfiguration)
  }

  test("parquet write is multipart; read issues ranged GETs with footer seeks") {
    fs()
    MockObjectStoreFs.resetCounters()
    val dir = Files.createTempDirectory("graft_s3contract")
    val uri = s"mock3a:${dir.toAbsolutePath}/lineitem"

    // one ~MB-scale object => several 256 KiB parts in one upload
    val src = spark.read.parquet(s"$d/lineitem.parquet")
    src.coalesce(1).write.mode("overwrite").parquet(uri)
    assert(MockObjectStoreFs.multipartUploads.get() >= 1)
    assert(MockObjectStoreFs.partsCompleted.get() >= 2,
      "a >PartSize object must complete multiple parts")

    // projection + filter through the object store must equal the local read
    MockObjectStoreFs.resetCounters()
    val back = spark.read.parquet(uri)
      .filter(col("l_quantity") > 25)
      .agg(count(lit(1)).as("n"), sum("l_extendedprice").as("s"))
      .collect()(0)
    val ref = src
      .filter(col("l_quantity") > 25)
      .agg(count(lit(1)).as("n"), sum("l_extendedprice").as("s"))
      .collect()(0)
    assert(back === ref)
    // parquet reads the footer from the object tail first, then seeks back
    // to column chunks: that access pattern MUST surface as multiple ranged
    // GETs with at least one backward seek
    assert(MockObjectStoreFs.getRequests.get() >= 2, "expected ranged GETs")
    assert(MockObjectStoreFs.backwardSeeks.get() >= 1,
      "footer-then-column-chunk reads must seek backward")

    // listStatus: the completed object is visible, no staging litter remains
    val listed = fs().listStatus(new HPath(uri)).map(_.getPath.getName)
    assert(listed.exists(_.endsWith(".parquet")))
    assert(!listed.exists(_.contains(".mpu-")), s"staging litter: ${listed.toSeq}")
  }

  test("objects are invisible until multipart close; append is rejected") {
    val f = fs()
    val dir = Files.createTempDirectory("graft_s3vis")
    val obj = new HPath(s"mock3a:${dir.toAbsolutePath}/data.bin")

    val out = f.create(obj, true)
    val payload = Array.fill[Byte](MockObjectStoreFs.PartSize + 17)(42)
    out.write(payload)
    assert(!f.exists(obj),
      "object must not be visible before the multipart upload completes")
    out.close()
    assert(f.exists(obj) && f.getFileStatus(obj).getLen === payload.length)

    val e = intercept[UnsupportedOperationException](f.append(obj))
    assert(e.getMessage.contains("append"))

    // copy-based rename: content survives the GET+PUT round-trip
    val dst = new HPath(s"mock3a:${dir.toAbsolutePath}/renamed.bin")
    assert(f.rename(obj, dst))
    assert(!f.exists(obj) && f.getFileStatus(dst).getLen === payload.length)
  }
}
