package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, Row}

/** Spark's v1 streaming `Source.getBatch` contract requires the
  * returned frame to be tagged `isStreaming = true` (MicroBatchExecution
  * asserts it), and the only way to produce such a frame from an
  * arbitrary batch plan is `internalCreateDataFrame`, which is
  * private[sql] — the same one-hop shim every v1 connector (the file
  * source included) uses internally. See [[ColumnBridge]] for the
  * pattern's rationale.
  */
object StreamingBridge {
  def asStreaming(df: DataFrame): DataFrame = {
    val classic = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[Row]]
    classic.sparkSession.internalCreateDataFrame(
      classic.queryExecution.toRdd, df.schema, isStreaming = true)
  }
}
