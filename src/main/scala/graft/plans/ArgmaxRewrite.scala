package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, MaxBy, MinBy}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types._

/** Optimizer rule: rewrite the top-1-per-group window idiom
  *
  * {{{ Filter(rn = 1, Window(rn <- row_number() OVER (PARTITION BY p ORDER BY o), child)) }}}
  *
  * into an argmin/argmax aggregation
  *
  * {{{ Project(restore columns, Aggregate(p, min_by(struct(child.*), struct(o)), child)) }}}
  *
  * The window form shuffles and SORTS every input row (row_number needs
  * a total per-partition order); the aggregate form partial-aggregates
  * map-side, shuffling one row per (partition-key, map-task) — on a
  * k-times-amplified scored corpus this is the difference between a
  * feasible and an infeasible job at 100 TB (the hand-applied version of
  * this rewrite in `Similarity.assignNearest` cut the IVF assignment
  * shuffle k-fold; this rule applies it to any user query in the
  * session, including plain SQL).
  *
  * Soundness guards — the rewrite fires only when it is provably
  * output-equivalent (up to row_number's own tie nondeterminism):
  *
  *  - exactly one window expression in the node, and it is
  *    `row_number()`; the filter keeps exactly rank 1 (`rn = 1`,
  *    `rn <= 1`, `rn < 2`; conjuncts over child columns are preserved
  *    above the rewrite);
  *  - partition spec non-empty (a global aggregate would turn "0 rows in
  *    → 0 rows out" into "0 rows in → 1 null row out") and all
  *    partition/order expressions deterministic;
  *  - all sort directions equal with DEFAULT null ordering (or
  *    non-nullable keys): min_by/max_by over a struct key uses exactly
  *    Spark's sort ordering (nulls smallest, NaN largest), so
  *    all-ascending ≡ min_by and all-descending ≡ max_by with no key
  *    transformation — exact for every orderable type including float
  *    NaN and NULL edge cases;
  *  - mixed directions: descending keys are flipped with `BitwiseNot`
  *    (an overflow-free total order reversal, unlike numeric negation
  *    which throws on Long.MinValue under ANSI), required integral and
  *    non-nullable; anything else bails to the window form.
  *
  * Registered late (`spark.experimental.extraOptimizations`), after
  * column pruning has already minimized `child.output`, so the payload
  * struct carries only columns the query needs. A
  * `WindowGroupLimit` the built-in `InferWindowGroupLimit` rule may have
  * inserted below the Window is stripped (the aggregate subsumes it).
  * Disable per-session with `SET spark.graft.rewrite.argmax=false`.
  */
object ArgmaxRewrite extends Rule[LogicalPlan] with PredicateHelper {

  val confKey = "spark.graft.rewrite.argmax"

  private def enabled: Boolean =
    SQLConf.get.getConfString(confKey, "true").toBoolean

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled) plan
    else plan.transform {
      case f @ Filter(cond, w: Window) => tryRewrite(cond, w).getOrElse(f)
    }

  /** Register on an already-built session (idempotent). */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(ArgmaxRewrite)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ ArgmaxRewrite
    }

  /** `rn = 1` in any of its spellings, over the given attribute. */
  private def isTop1(e: Expression, rn: ExprId): Boolean = e match {
    case EqualTo(a: AttributeReference, Literal(1, IntegerType)) => a.exprId == rn
    case EqualTo(Literal(1, IntegerType), a: AttributeReference) => a.exprId == rn
    case LessThanOrEqual(a: AttributeReference, Literal(1, IntegerType)) => a.exprId == rn
    case GreaterThanOrEqual(Literal(1, IntegerType), a: AttributeReference) => a.exprId == rn
    case LessThan(a: AttributeReference, Literal(2, IntegerType)) => a.exprId == rn
    case _ => false
  }

  private def defaultNullOrdering(d: SortDirection): NullOrdering =
    d match { case Ascending => NullsFirst; case Descending => NullsLast }

  /** Null/NaN-exact only when the key's null placement matches struct
    * sort order (or can't arise). */
  private def nullSafe(so: SortOrder): Boolean =
    !so.child.nullable || so.nullOrdering == defaultNullOrdering(so.direction)

  /** Build the aggregation key fields; returns (keys, useMaxBy), or None
    * when no provably-exact form exists. */
  private def buildKeys(orderSpec: Seq[SortOrder]): Option[(Seq[Expression], Boolean)] = {
    val dirs = orderSpec.map(_.direction).distinct
    if (!orderSpec.forall(nullSafe)) None
    else if (dirs == Seq(Ascending)) Some((orderSpec.map(_.child), false))
    else if (dirs == Seq(Descending)) Some((orderSpec.map(_.child), true))
    else {
      // mixed: normalize to min_by, flipping descending keys. BitwiseNot
      // reverses integral order totally with no overflow; restricted to
      // non-nullable keys (flipping preserves null, which would move it
      // from NULLS LAST to smallest).
      val flipped = orderSpec.map { so =>
        so.direction match {
          case Ascending => Some(so.child)
          case Descending => so.child.dataType match {
            case ByteType | ShortType | IntegerType | LongType if !so.child.nullable =>
              Some(BitwiseNot(so.child))
            case _ => None
          }
        }
      }
      if (flipped.forall(_.isDefined)) Some((flipped.flatten, false)) else None
    }
  }

  private def tryRewrite(cond: Expression, w: Window): Option[LogicalPlan] =
    w.windowExpressions match {
      case Seq(a @ Alias(WindowExpression(RowNumber(), _), _)) =>
        val inner = w.child match {
          // InferWindowGroupLimit may already have inserted a per-group
          // pre-limit below the window; the aggregate subsumes it.
          case WindowGroupLimit(_, _, _, _, gc) => gc
          case c => c
        }
        val (top1, rest) = splitConjunctivePredicates(cond).partition(isTop1(_, a.exprId))
        val ok = top1.size == 1 &&
          rest.forall(_.references.subsetOf(inner.outputSet)) &&
          w.partitionSpec.nonEmpty && w.orderSpec.nonEmpty &&
          (w.partitionSpec ++ w.orderSpec.map(_.child)).forall(_.deterministic)
        if (!ok) None
        else buildKeys(w.orderSpec).map { case (keys, useMax) =>
          val payload = CreateStruct(inner.output)
          // always struct-wrap the key, even when single: min_by/max_by
          // SKIP null ordering keys (SQL semantics), row_number does not
          // — a struct is never null, and its null FIELDS sort smallest,
          // exactly Spark's sort placement the nullSafe guard admitted
          val key = CreateStruct(keys)
          val fn = if (useMax) MaxBy(payload, key) else MinBy(payload, key)
          val aggOut = Alias(AggregateExpression(fn, Complete, isDistinct = false), "graft_argmax")()
          val agg = Aggregate(w.partitionSpec, Seq(aggOut), inner)
          val restored: Seq[NamedExpression] = inner.output.zipWithIndex.map {
            case (attr, i) =>
              val field = GetStructField(aggOut.toAttribute, i, Some(attr.name))
              // groups are non-empty by construction, so the agg result
              // struct is never null: original nullability is preserved
              val e = if (attr.nullable) field else KnownNotNull(field)
              Alias(e, attr.name)(exprId = attr.exprId, qualifier = attr.qualifier)
          } :+ Alias(Literal(1), a.name)(exprId = a.exprId, qualifier = a.qualifier)
          val proj = Project(restored, agg)
          if (rest.isEmpty) proj else Filter(rest.reduce(And), proj)
        }
      case _ => None
    }
}
