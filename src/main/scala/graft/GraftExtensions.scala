package graft

import graft.functions.DotProduct
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: surfaces graft's custom Catalyst
  * expressions in SQL so `spark.sql("SELECT dot_product(a, b) …")` works
  * next to the DataFrame API — the documented injection route for engine
  * extensions (no session-state hacking).
  *
  * Activate with `--conf spark.sql.extensions=graft.GraftExtensions` or
  * `SparkSession.builder().withExtensions(new GraftExtensions)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "dot_product takes exactly 2 arguments")
        DotProduct(children.head, children(1))
      }))
  }
}

object GraftExtensions {
  /** Install on an already-running session (the builder conf only applies
    * at session construction).
    */
  def install(spark: org.apache.spark.sql.SparkSession): Unit = {
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
    org.apache.spark.sql.graftbridge.ExtensionsBridge.install(ext, spark)
  }
}
