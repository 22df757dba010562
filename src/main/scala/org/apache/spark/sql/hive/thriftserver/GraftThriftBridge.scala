package org.apache.spark.sql.hive.thriftserver

import org.apache.spark.sql.SQLContext

/** Minimal public bridge over the `private[hive]` HiveThriftServer2
  * class: start a Thrift server for a context and stop a handle. Same
  * necessary-evil pattern as GraftColumnBridge — two lines of package
  * trespass so the engine's own API stays in graft.*. */
object GraftThriftBridge {
  def start(sqlContext: SQLContext): AnyRef =
    HiveThriftServer2.startWithContext(sqlContext)
  def stop(server: AnyRef): Unit =
    server.asInstanceOf[HiveThriftServer2].stop()
}
