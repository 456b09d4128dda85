package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.expressions.KernelRegistry

/** Spark extension entry point: ship the engine's native expressions
  * into any session via
  * `spark.sql.extensions=graft.GraftExtensions` — the idiomatic way a
  * library injects Catalyst surface without application code calling a
  * register function (graft.Functions.register remains for
  * programmatic use and also wires the Scala-UDF layer). Both paths
  * consume the same KernelRegistry table, so their SQL surfaces stay
  * identical. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage,
      "", "", "", "", "", "", "built-in")

  override def apply(ext: SparkSessionExtensions): Unit =
    KernelRegistry.all.foreach { case (name, usage, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info(name, usage),
        builder))
    }
}
