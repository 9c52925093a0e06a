package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

/** Optimizer rule: rewrite a pure inequality (range) join into the
  * bucket-expansion equi-join of [[graft.operators.Joins.rangeJoin]].
  *
  * Spark plans a join whose condition is only
  * `point >= start AND point < end` as a broadcast nested-loop (or
  * cartesian) scan — O(|P|·|I|) compares, the classic range-join scale
  * killer. With `spark.graft.rangeJoin.bucketWidth` set (> 0, in the
  * units of the join columns), this rule rewrites
  *
  * {{{ P JOIN I ON p >= s AND p < e }}}
  *
  * into
  *
  * {{{
  *   Project(original output,
  *     Project(P, bp = p div W) JOIN
  *     Generate(explode(sequence(s div W, (e-1) div W)) AS bi,
  *              Filter(e > s, I))
  *     ON bp = bi AND p >= s AND p < e)
  * }}}
  *
  * — a hash-shuffle equi-join on the bucket id. Correctness: truncating
  * division is monotone, so `s <= p <= e-1` implies
  * `s div W <= p div W <= (e-1) div W`; every true pair meets in the
  * point's (unique) bucket exactly once — no duplicates, no misses —
  * and the retained original predicates filter bucket-mates outside
  * the range. Empty intervals (`e <= s`) match nothing and are
  * filtered before the explode (Sequence would otherwise step
  * BACKWARD for them).
  *
  * Deliberately conservative — the rewrite fires only when:
  *  - the join is INNER and its condition is EXACTLY two conjuncts
  *    forming a half-open interval test (`>=`/`<=` lower bound,
  *    `<`/`>` upper bound, either operand order);
  *  - the point expression (both conjuncts must agree on it
  *    semantically) references one side only, and both bound
  *    expressions reference only the other side;
  *  - all three expressions are LongType (timestamps as unix_micros,
  *    offsets, etc. — no fractional bucket math).
  * An equi-conjunct in the condition means Catalyst already has a
  * hash-join key and the rule stays out of the way. The rewritten
  * join's condition has three conjuncts, so the rule cannot re-match
  * its own output inside the fixed-point batch.
  *
  * Injected by [[graft.GraftExtensions]]; off unless the conf is set.
  */
case class RangeJoinRewrite(spark: SparkSession)
    extends Rule[LogicalPlan] with PredicateHelper {

  val ConfKey = "spark.graft.rangeJoin.bucketWidth"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val raw = spark.sessionState.conf.getConfString(ConfKey, "0")
    // defensive parse: a typo'd conf must fail with the key named, not
    // surface as a bare NumberFormatException from inside the
    // optimizer batch (and must not silently disable the rewrite)
    val width = try raw.trim.toLong catch {
      case _: NumberFormatException => throw new IllegalArgumentException(
        s"$ConfKey must be an integral bucket width, got '$raw'")
    }
    if (width <= 0) return plan
    plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), hint) =>
        matchRange(cond, left, right) match {
          case Some((p, s, e, pointIsLeft)) =>
            val w = Literal(width)
            val bp = Alias(IntegralDivide(p, w), "__graft_bucket_p")()
            val (pointPlan, intervalPlan) = if (pointIsLeft) (left, right) else (right, left)
            val pointProj = Project(pointPlan.output :+ bp, pointPlan)
            val bi = AttributeReference("__graft_bucket_i", LongType, nullable = false)()
            // Sequence is TimeZoneAwareExpression: resolved only once
            // timeZoneId is filled — normally the analyzer's job, but
            // this rule runs post-analysis. The per-interval bucket
            // count is capped like the operator's: a corrupt
            // open-ended interval fails fast with a clear message
            // instead of building a multi-billion-element array
            val firstB = IntegralDivide(s, w)
            val lastB = IntegralDivide(Subtract(e, Literal(1L)), w)
            val seqExpr = Sequence(firstB, lastB, Some(Literal(1L)),
              Some(spark.sessionState.conf.sessionLocalTimeZone))
            val guarded = If(
              LessThan(Subtract(lastB, firstB),
                Literal(graft.operators.Joins.MaxBucketsPerInterval)),
              seqExpr,
              Cast(RaiseError(Literal(
                s"rangeJoin rewrite: an interval covers more than " +
                  s"${graft.operators.Joins.MaxBucketsPerInterval} buckets of width " +
                  s"$width — raise $ConfKey or clean the interval")),
                seqExpr.dataType))
            val gen = Generate(
              Explode(guarded),
              unrequiredChildIndex = Nil, outer = false, qualifier = None,
              generatorOutput = Seq(bi),
              child = Filter(GreaterThan(e, s), intervalPlan))
            val newCond = And(EqualTo(bp.toAttribute, bi), cond)
            val (nl, nr) = if (pointIsLeft) (pointProj, gen) else (gen, pointProj)
            Project(j.output, Join(nl, nr, Inner, Some(newCond), hint))
          case None => j
        }
    }
  }

  /** cond == (p >= s AND p < e) in some operand order, p wholly from
    * one side and s/e wholly from the other, everything LongType →
    * Some((p, s, e, pointIsLeft)). */
  private def matchRange(cond: Expression, left: LogicalPlan,
      right: LogicalPlan): Option[(Expression, Expression, Expression, Boolean)] = {
    val conjuncts = splitConjunctivePredicates(cond)
    if (conjuncts.size != 2) return None
    val lower = conjuncts.collectFirst {
      case GreaterThanOrEqual(p, s) => (p, s)
      case LessThanOrEqual(s, p)    => (p, s)
    }
    val upper = conjuncts.collectFirst {
      case LessThan(p, e)    => (p, e)
      case GreaterThan(e, p) => (p, e)
    }
    (lower, upper) match {
      case (Some((p1, s)), Some((p2, e)))
          if p1.semanticEquals(p2) &&
            p1.dataType == LongType && s.dataType == LongType && e.dataType == LongType &&
            // the rewrite evaluates p/s/e again (bucket projection,
            // emptiness filter, sequence bounds) — only sound for
            // deterministic expressions
            p1.deterministic && s.deterministic && e.deterministic =>
        val p = p1
        def onlyIn(ex: Expression, side: LogicalPlan) =
          ex.references.nonEmpty && ex.references.subsetOf(side.outputSet)
        if (onlyIn(p, left) && onlyIn(s, right) && onlyIn(e, right))
          Some((p, s, e, true))
        else if (onlyIn(p, right) && onlyIn(s, left) && onlyIn(e, left))
          Some((p, s, e, false))
        else None
      case _ => None
    }
  }
}
