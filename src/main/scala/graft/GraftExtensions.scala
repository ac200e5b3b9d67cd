package graft

import org.apache.spark.sql.SparkSessionExtensions
import graft.functions.GraftFunctions

/** SparkSessionExtensions entry point: registers the graft native
  * expressions as SQL functions. Activate with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` (all
  * graft mains and tests do) — then `call_function("graft_cosine_sim",
  * a, b)` etc. work from the DataFrame API and plain SQL. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach(e.injectFunction)
}
