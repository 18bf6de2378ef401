package graft.functions

import graft.functions.TextExpressions.{MinHashBandHashes, SimHash64, WordShingles}
import graft.functions.VectorExpressions.{DotProductF, MinHashSig, NormF}
import org.apache.spark.sql.{GraftSqlBridge, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SQL surface for the custom expressions: `spark.sql("SELECT
  * dot_f(a, b) ...")` etc. Two integration points:
  *
  *  - [[GraftExtensions]] — a `SparkSessionExtensions` injector for
  *    `spark.sql.extensions=graft.functions.GraftExtensions` (new
  *    sessions);
  *  - [[GraftFunctions.register]] — registers the same builders on an
  *    already-running session.
  */
object GraftFunctions {

  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  val all: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "dot_f" -> (es => DotProductF(es(0), es(1))),
    "norm_f" -> (es => NormF(es(0))),
    "minhash_sig" -> (es => MinHashSig(es(0), intArg(es(1), "perms"))),
    "minhash_bands" -> (es => MinHashBandHashes(es(0),
      intArg(es(1), "perms"), intArg(es(2), "bands"))),
    "simhash64" -> (es => SimHash64(es(0))),
    "word_shingles" -> (es => WordShingles(es(0), intArg(es(1), "n"))))

  /** Register every graft function on an existing session. */
  def register(spark: SparkSession): Unit =
    all.foreach { case (name, b) => GraftSqlBridge.registerFunction(spark, name, b) }
}

/** `spark.sql.extensions` entry point. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach { case (name, b) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft", name), b))
    }
}
