package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

/** Optimizer rule: a token-membership filter implies a substring
  * prefilter the scan can push.
  *
  * `array_contains(split(trim(text), ' '), w)` cannot reach a
  * parquet/ORC scan (it is a function of the column), so the scan
  * reads every row group. But membership of `w` in the
  * space-split tokens IMPLIES `text CONTAINS w` — tokens are
  * substrings, trim only removes outer whitespace, and a `w` that
  * could never be a token (contains a space) makes the original
  * predicate false, which any added conjunct preserves. So this rule
  * conjoins the weaker `Contains(text, w)`, which Spark's data
  * sources translate to a pushable StringContains filter →
  * row-group stats/dictionary skipping on the scan, with the exact
  * original predicate still applied on top. Semantics are unchanged
  * for every input; only IO shrinks.
  *
  * This is the (c)-tier extension point of the build brief (a
  * `Rule[LogicalPlan]` registered via SparkSessionExtensions /
  * experimental.extraOptimizations) used where it is genuinely
  * sound, rather than a whole custom operator Spark can already
  * express. Idempotent: already-present implied conjuncts are
  * detected canonically, so the fixed-point optimizer batch
  * converges.
  */
object TokenContainsPrefilter extends Rule[LogicalPlan] {

  private def stripTrim(e: Expression): Expression = e match {
    case StringTrim(src, None) => stripTrim(src)
    case other => other
  }

  private def impliedContains(cond: Expression): Seq[Contains] =
    cond.collect {
      case ArrayContains(StringSplit(src, Literal(sep: UTF8String, StringType),
          _), w @ Literal(s: UTF8String, StringType))
          if sep.toString == " " && s != null =>
        stripTrim(src) match {
          case attr: Attribute => Some(Contains(attr, w))
          case _ => None
        }
      case _ => None
    }.flatten

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val existing = cond.collect {
        case c: Contains => c.canonicalized
      }.toSet
      val implied = impliedContains(cond)
        .filterNot(c => existing.contains(c.canonicalized))
      if (implied.isEmpty) f
      else Filter(implied.foldLeft(cond)((acc, c) => And(acc, c)), child)
  }
}
