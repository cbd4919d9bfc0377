package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, LongType, NumericType}

/** Catalyst optimizer rule: rewrite point-in-interval joins into the
  * bucketed equi-join decomposition, automatically.
  *
  * Spark plans a non-equi inner join `points JOIN intervals ON p >= lo
  * AND p < hi` as BroadcastNestedLoopJoin (or a cartesian product when
  * neither side broadcasts) — O(points × intervals) comparisons, the
  * classic cluster-killer. [[graft.operators.RangeJoin]] offers the
  * standard fix as an API the caller must opt into; this rule applies the
  * SAME decomposition inside the optimizer, so plain declarative SQL or
  * DataFrame joins get the scalable plan without being rewritten by hand
  * — the engine-level equivalent of the range-join optimization shipped
  * by warehouse engines behind a bin-size hint.
  *
  * Mechanics (mirrors `RangeJoin.pointInInterval`): the interval side
  * gains a `Generate(Explode(Sequence(floor(lo/w), floor(hi/w))))` —
  * every fixed-width bucket the interval overlaps; the point side gains
  * `floor(p/w)`; the join becomes an EQUI-join on the bucket id with the
  * original range predicate kept as a residual filter. The planner then
  * picks a shuffled/broadcast hash join, AQE can split skewed buckets,
  * and cost drops to O(points + intervals·span/w + matches).
  *
  * Safety gates:
  *  - opt-in: fires only when `spark.graft.rangeJoin.bucketWidth` is a
  *    positive number (the width should sit near the median interval
  *    span — same tuning contract as the bin-size hint engines ask for);
  *  - inner joins only, and only when the condition has BOTH a lower and
  *    an upper bound on the same single-side numeric expression and NO
  *    cross-side equality conjunct (if an equi-key exists, Spark already
  *    plans a hash join and the rewrite would only add work);
  *  - inverted or NULL-bounded intervals explode to zero buckets via a
  *    guarded Sequence (no rows — exactly the inner join's semantics);
  *  - the rewritten join carries an equality conjunct, so the rule can
  *    never re-fire on its own output (fixed-point safe).
  */
object RangeJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  val WidthConf = "spark.graft.rangeJoin.bucketWidth"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val width = try conf.getConfString(WidthConf, "").trim.toDouble
      catch { case _: NumberFormatException => 0.0 }
    if (width <= 0 || width.isNaN || width.isInfinite) return plan
    plan.transformUp {
      case j @ Join(_, _, Inner, Some(_), _) =>
        rewrite(j, width).getOrElse(j)
    }
  }

  /** (point, bound) readings of a comparison conjunct: `isLower` means
    * the conjunct asserts point ≥/> bound. */
  private def readings(e: Expression): Seq[(Expression, Expression, Boolean)] =
    e match {
      case GreaterThan(a, b) => Seq((a, b, true), (b, a, false))
      case GreaterThanOrEqual(a, b) => Seq((a, b, true), (b, a, false))
      case LessThan(a, b) => Seq((a, b, false), (b, a, true))
      case LessThanOrEqual(a, b) => Seq((a, b, false), (b, a, true))
      case _ => Seq.empty
    }

  private def rewrite(j: Join, width: Double): Option[LogicalPlan] = {
    val left = j.left
    val right = j.right
    val conjuncts = splitConjunctivePredicates(j.condition.get)

    def sideOf(e: Expression): Option[Boolean] = { // Some(true)=left
      val r = e.references
      if (r.isEmpty) None
      else if (r.subsetOf(left.outputSet)) Some(true)
      else if (r.subsetOf(right.outputSet)) Some(false)
      else None
    }

    // an existing cross-side equality already gives the planner hash-join
    // keys — adding bucket replication would only multiply rows
    val hasEquiKey = conjuncts.exists {
      case EqualTo(a, b) =>
        (sideOf(a), sideOf(b)) match {
          case (Some(x), Some(y)) => x != y
          case _ => false
        }
      case EqualNullSafe(a, b) =>
        (sideOf(a), sideOf(b)) match {
          case (Some(x), Some(y)) => x != y
          case _ => false
        }
      case _ => false
    }
    if (hasEquiKey) return None

    def usable(point: Expression, bound: Expression): Boolean =
      point.dataType.isInstanceOf[NumericType] &&
        bound.dataType.isInstanceOf[NumericType] &&
        point.deterministic && bound.deterministic &&
        (for (p <- sideOf(point); b <- sideOf(bound)) yield p != b)
          .getOrElse(false)

    val lowers = conjuncts.flatMap(readings).collect {
      case (p, b, true) if usable(p, b) => (p, b)
    }
    val uppers = conjuncts.flatMap(readings).collect {
      case (p, b, false) if usable(p, b) => (p, b)
    }
    val pair = (for {
      (p1, lo) <- lowers
      (p2, hi) <- uppers
      if p1.semanticEquals(p2) && sideOf(lo) == sideOf(hi)
    } yield (p1, lo, hi)).headOption

    pair.map { case (point, lo, hi) =>
      val pointOnLeft = sideOf(point).get
      val (pointPlan, intervalPlan) =
        if (pointOnLeft) (left, right) else (right, left)

      def bucket(e: Expression): Expression =
        Floor(Divide(Cast(e, DoubleType), Literal(width)))

      val pointAlias = Alias(bucket(point), "__graft_point_bucket")()
      val pointSide = Project(pointPlan.output :+ pointAlias, pointPlan)

      // guard inverted/NULL intervals: Sequence throws on start > stop,
      // the inner join just yields nothing — so feed Explode a NULL array
      val loB = bucket(lo)
      val hiB = bucket(hi)
      // timeZoneId must be set by hand: the analyzer's ResolveTimeZone
      // already ran, and a TimeZoneAwareExpression without it is
      // unresolved even over integral types
      val seq = If(LessThanOrEqual(loB, hiB),
        Sequence(loB, hiB, Some(Literal(1L)),
          Some(conf.sessionLocalTimeZone)),
        Literal.create(null, ArrayType(LongType, containsNull = false)))
      val bucketAttr =
        AttributeReference("__graft_interval_bucket", LongType)()
      val intervalSide = Generate(Explode(seq), unrequiredChildIndex = Nil,
        outer = false, qualifier = None,
        generatorOutput = Seq(bucketAttr), child = intervalPlan)

      val newCond = And(EqualTo(pointAlias.toAttribute, bucketAttr),
        j.condition.get)
      val (nl, nr) =
        if (pointOnLeft) (pointSide, intervalSide)
        else (intervalSide, pointSide)
      Project(j.output, Join(nl, nr, Inner, Some(newCond), j.hint))
    }
  }
}
