package org.apache.spark

import org.apache.spark.status.AppStatusStore

/** Temporary dev bridge: expose the app status store for StageProfile. */
object GraftStatusBridge {
  def store(sc: SparkContext): AppStatusStore = sc.statusStore
}
