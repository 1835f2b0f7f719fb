package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Library-grade integration point: `SparkSessionExtensions` injector so
  * a user enables every graft SQL function at session build time —
  *
  *   SparkSession.builder()
  *     .config("spark.sql.extensions", "graft.functions.GraftExtensions")
  *
  * (or `.withExtensions(new GraftExtensions)`) — instead of calling
  * [[graft.functions.registerAll]] per session. Same three native
  * expressions; injection reaches sessions created before our code runs
  * any query (e.g. Thrift server / connect deployments).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def entry(name: String, clazz: Class[_],
      builder: Seq[Expression] => Expression)
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier(name),
      new ExpressionInfo(clazz.getCanonicalName, name), builder)

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(entry("cosine_sim", classOf[CosineSimilarity],
      es => CosineSimilarity(es.head, es(1))))
    ext.injectFunction(entry("dot_product", classOf[DotProduct],
      es => DotProduct(es.head, es(1))))
    ext.injectFunction(entry("simhash64", classOf[SimHash64],
      es => SimHash64(es.head)))
    // Rule tier of the extension ladder: literal-term regex search →
    // codegen'd substring probe (see RegexLiteralRewrite's scaladoc)
    ext.injectOptimizerRule(_ => graft.plans.RegexLiteralRewrite)
  }
}
