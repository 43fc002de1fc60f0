package graft

import org.apache.spark.sql.SparkSessionExtensions

import graft.functions.{TextKernelFunctions, VectorExpressions}

/** Engine extension entry point — registered via
  * `spark.sql.extensions=graft.GraftExtensions` (GraftSession wires it)
  * so the engine's native expressions are first-class SQL functions. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(VectorExpressions.dotProductRegistration)
    ext.injectFunction(VectorExpressions.pqDistArrayRegistration)
    TextKernelFunctions.registrations.foreach(ext.injectFunction)
  }
}
