package org.apache.spark.sql

import org.apache.spark.SparkEnv
import org.apache.spark.sql.execution.streaming.state.StateStoreCoordinatorRef
import org.apache.spark.sql.internal.SQLConf

/** Bridge into Spark's `private[sql]` state-store plumbing.
  *
  * A BATCH `transformWithState` (Spark 4's arbitrary-state operator) plans a
  * `TransformWithStateExec` whose executors look up the driver's
  * `StateStoreCoordinator` RPC endpoint — but that endpoint is only
  * registered by `StreamExecution` when a STREAMING query starts, so a
  * batch-mode run in a fresh session fails with RpcEndpointNotFoundException.
  * `ensureCoordinator()` performs the same idempotent registration
  * `StreamExecution` would (`StateStoreCoordinatorRef.forDriver` creates the
  * endpoint or returns the existing one), which is why it must live in the
  * `org.apache.spark.sql` package.
  */
object GraftStateStoreBootstrap {
  // validated against Spark 4.1.2 (the pinned /opt/spark/jars version):
  // forDriver is idempotent — it returns the existing endpoint when one is
  // registered, so session conf here only affects FIRST registration
  def ensureCoordinator(): Unit = {
    val conf = SparkSession.getActiveSession
      .map(_.sessionState.conf).getOrElse(new SQLConf)
    StateStoreCoordinatorRef.forDriver(SparkEnv.get, conf)
    ()
  }
}
