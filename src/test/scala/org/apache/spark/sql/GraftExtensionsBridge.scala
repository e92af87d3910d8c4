package org.apache.spark.sql

import org.apache.spark.sql.catalyst.analysis.FunctionRegistry

/** Test-only bridge into the private[sql] side of SparkSessionExtensions:
  * applies the extension's function injections to a scratch registry so a
  * spec can assert what a session built with the extension would see. */
object GraftExtensionsBridge {
  def injectedFunctionNames(ext: SparkSessionExtensions => Unit): Seq[String] = {
    val e = new SparkSessionExtensions
    ext(e)
    val reg = FunctionRegistry.builtin.clone()
    val before = reg.listFunction().map(_.unquotedString).toSet
    e.registerFunctions(reg)
    reg.listFunction().map(_.unquotedString).filterNot(before).sorted
  }
}
