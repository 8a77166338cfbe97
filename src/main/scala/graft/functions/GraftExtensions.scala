package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistryBase

/** `SparkSessionExtensions` installer: registers the library's native
  * expressions in the SQL function registry, so `spark.sql` users can
  * call them without touching the Column API:
  *
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions)      // or:
  *   .config("spark.sql.extensions", "graft.functions.GraftExtensions")
  *   ...
  * spark.sql("SELECT cosine_similarity(a.embedding, b.embedding) ...")
  * }}}
  *
  * This is the SURVEY.md §7.1-7 preference-order (c) extension point —
  * the only registry hook the library needs, since every reference
  * operator is expressible with built-ins and the custom expressions
  * are scalar functions (no custom LogicalPlan/Strategy required).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    val (cosInfo, cosBuilder) =
      FunctionRegistryBase.build[CosineSimilarity]("cosine_similarity", since = None)
    ext.injectFunction((FunctionIdentifier("cosine_similarity"), cosInfo, cosBuilder))
    val (dotInfo, dotBuilder) =
      FunctionRegistryBase.build[DotProduct]("dot_product", since = None)
    ext.injectFunction((FunctionIdentifier("dot_product"), dotInfo, dotBuilder))
    val (h60Info, h60Builder) =
      FunctionRegistryBase.build[Hash60]("hash60", since = None)
    ext.injectFunction((FunctionIdentifier("hash60"), h60Info, h60Builder))
    val (jwInfo, jwBuilder) =
      FunctionRegistryBase.build[JaroWinkler]("jaro_winkler", since = None)
    ext.injectFunction((FunctionIdentifier("jaro_winkler"), jwInfo, jwBuilder))
    val (udInfo, udBuilder) =
      FunctionRegistryBase.build[UnreservedDecode]("unreserved_decode", since = None)
    ext.injectFunction((FunctionIdentifier("unreserved_decode"), udInfo, udBuilder))
  }
}
