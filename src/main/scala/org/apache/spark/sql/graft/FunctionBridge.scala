package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ClassicConversions._

/** Temp-function registration on a live session — the registry is
  * `private[sql]`, same shim rationale as [[ColumnBridge]].
  */
object FunctionBridge {
  def registerTemp(spark: SparkSession, name: String,
                   builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")
}
