package graft

import java.net.URI

import org.apache.hadoop.fs.RawLocalFileSystem

/** Test-only Hadoop FileSystem registered under a non-`file` scheme
  * (`mock3a://`), delegating to the local filesystem. Exists to prove the
  * object-store claim (SURVEY.md §1.3: s3a is config-not-code): every
  * engine read/write goes through Hadoop's scheme-routed FileSystem
  * resolution, so pointing the engine at `s3a://` is exactly this wiring
  * with `fs.s3a.impl` + the hadoop-aws jar instead of `fs.mock3a.impl` —
  * no graft code changes. (hadoop-aws is not in this container's jar set,
  * hence the local-FS stand-in.)
  */
class MockObjectStoreFs extends RawLocalFileSystem {
  override def getScheme: String = "mock3a"
  override def getUri: URI = URI.create("mock3a:///")
}
