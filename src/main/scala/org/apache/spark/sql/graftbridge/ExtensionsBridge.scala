package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry

/** `SparkSessionExtensions.registerFunctions` is `private[sql]`; this shim
  * re-exports it so extension-injected functions can also be installed on
  * an ALREADY-RUNNING session (notebooks, shared test sessions) — the
  * builder route (`--conf spark.sql.extensions=…`) only applies at session
  * construction.
  */
object ExtensionsBridge {
  def registerFunctions(ext: SparkSessionExtensions, registry: FunctionRegistry): Unit =
    ext.registerFunctions(registry)

  def install(ext: SparkSessionExtensions, spark: SparkSession): Unit =
    registerFunctions(ext, spark.sessionState.functionRegistry)
}
