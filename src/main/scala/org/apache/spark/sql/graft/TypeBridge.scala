package org.apache.spark.sql.graft

/** Spark 4 marks `AbstractDataType` (the `inputTypes` element type of
  * `ExpectsInputTypes`/`ImplicitCastInputTypes`) private[sql], so an
  * extension library's native Expressions can't name it when declaring
  * the implicit-coercion contract Spark built-ins enjoy. This alias
  * re-exports it through the same one-hop shim as ColumnBridge.
  */
object TypeBridge {
  type AbstractType = org.apache.spark.sql.types.AbstractDataType
}
