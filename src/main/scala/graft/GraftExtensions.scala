package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** Library entry point for session-build-time integration:
  *
  * {{{
  *   spark.sql.extensions=graft.GraftExtensions
  * }}}
  *
  * injects the native as-of join planner strategy and the engine's SQL
  * function surface into every session built with the config — the
  * standard way a Spark library ships Catalyst extensions. The runtime
  * registration paths (`GraftEngine.start`, `VectorFunctions.register`,
  * `MinHashSig.register`, per-call strategy injection in
  * `AsOfJoin.asofPlanned`) remain for sessions the library did not
  * construct, e.g. a harness that hands us an already-built session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    GraftExtensions.functions.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name),
        (es: Seq[Expression]) => builder(es)))
    }
  }
}

object GraftExtensions {
  /** The SQL function surface, shared between build-time injection and
    * the runtime `register` helpers. */
  val functions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_cosine" -> (es => graft.functions.CosineSimilarity(es(0), es(1))),
    "graft_dot" -> (es => graft.functions.DotProduct(es(0), es(1))),
    "graft_simhash" -> (es => graft.functions.SimHashRow(es(0))),
    "graft_minhash" -> (es => graft.functions.MinHashSigRow(es(0), intLit(es(1), "graft_minhash numHashes"))),
    "graft_minhash_chars" -> (es => graft.functions.MinHashSigChars(es(0),
      intLit(es(1), "graft_minhash_chars n"), intLit(es(2), "graft_minhash_chars numHashes"))),
    "graft_pack_int8" -> (es => graft.functions.PackInt8(es(0))),
    "graft_int8_dot" -> (es => graft.functions.Int8DotProduct(es(0), es(1))),
    "graft_sig_matches" -> (es => graft.functions.SigMatchCount(es(0), es(1))),
    "graft_byte_histogram" -> (es => graft.functions.ByteHistogram(es(0))),
    "graft_byte_gram_signature" -> (es => graft.functions.ByteGramSignature(
      es(0), intLit(es(1), "graft_byte_gram_signature bins")))
  )

  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  /** Runtime registration of the same table onto an already-built
    * session (the path for sessions the library did not construct). */
  def registerAll(spark: org.apache.spark.sql.SparkSession): Unit =
    functions.foreach { case (name, builder) =>
      org.apache.spark.sql.GraftSqlShim.registerFunction(spark, name, builder)
    }
}
