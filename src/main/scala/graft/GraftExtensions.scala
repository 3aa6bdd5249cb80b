package graft

import org.apache.spark.sql.SparkSessionExtensions

import graft.functions.VectorExpressions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions installer: makes the engine's native functions
  * available in any session via configuration —
  *
  *   spark.sql.extensions=graft.GraftExtensions
  *
  * — so SQL users get cosine_sim / dot_product / simhash64 without any
  * Scala-side registration call.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  private def info(name: String) =
    new ExpressionInfo(classOf[VectorExpressions.type].getName, name)

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((FunctionIdentifier("cosine_sim"), info("cosine_sim"),
      (es: Seq[Expression]) => VectorExpressions.CosineSim(es(0), es(1))))
    e.injectFunction((FunctionIdentifier("dot_product"), info("dot_product"),
      (es: Seq[Expression]) => VectorExpressions.DotProduct(es(0), es(1))))
    e.injectFunction((FunctionIdentifier("simhash64"), info("simhash64"),
      (es: Seq[Expression]) => VectorExpressions.SimHash64(es.head)))
    e.injectFunction((FunctionIdentifier("rolling_hash_min"), info("rolling_hash_min"),
      (es: Seq[Expression]) => VectorExpressions.RollingHashMin(es.head, es.lift(1)
        .map(_.eval(null).asInstanceOf[Number].intValue).getOrElse(16))))
    e.injectFunction((FunctionIdentifier("kgram_hashes"), info("kgram_hashes"),
      (es: Seq[Expression]) => VectorExpressions.KgramHashes(es.head, es.lift(1)
        .map(_.eval(null).asInstanceOf[Number].intValue).getOrElse(8))))
    e.injectFunction((FunctionIdentifier("nfc_normalize"), info("nfc_normalize"),
      (es: Seq[Expression]) => VectorExpressions.NfcNormalize(es.head)))
    e.injectPlannerStrategy(_ => graft.plans.TopKStrategy)
  }
}
