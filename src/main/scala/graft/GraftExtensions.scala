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
    // SplitSum's codegen long half-sums (sum(c >> 24) / sum(c & mask))
    // rely on Spark's ANSI overflow errors to fail LOUDLY when a caller
    // exceeds the documented magnitude contract; with ansi.enabled=false
    // an out-of-contract Σ would wrap silently and reassemble a
    // plausible-but-wrong exact decimal — worse than the decimal
    // accumulator it replaces, which never wraps in either mode. Enforce
    // the dependency at analysis: any plan carrying a SplitSum-shaped
    // aggregate under ANSI-off is rejected (r15 VERDICT "what's wrong"
    // #1; SplitSumSpec pins both directions). Cost: one conf read per
    // query — the plan is only traversed when ANSI is actually off.
    e.injectCheckRule { session => plan =>
      import org.apache.spark.sql.catalyst.expressions.{Literal, ShiftRight}
      import org.apache.spark.sql.catalyst.expressions.aggregate.Sum
      import org.apache.spark.sql.catalyst.plans.logical.Aggregate
      if (!session.conf.get("spark.sql.ansi.enabled", "true").toBoolean &&
          plan.exists {
            case agg: Aggregate => agg.aggregateExpressions.exists(_.exists {
              case s: Sum => s.child match {
                case ShiftRight(_, Literal(v, _)) =>
                  v == graft.operators.SplitSum.Shift
                case _ => false
              }
              case _ => false
            })
            case _ => false
          })
        throw new IllegalStateException(
          "SplitSum aggregates require spark.sql.ansi.enabled=true: the exact " +
            "decimal total is reassembled from plain long half-sums, and only " +
            "ANSI mode turns an out-of-contract overflow into an error instead " +
            "of a silent wraparound. Enable ANSI or use the decimal-sum form.")
    }
  }
}
