package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types._

/** Optimizer rule: a natural interval-containment join with NO equi-key,
  *
  *   points JOIN intervals ON p.ts >= i.lo AND p.ts <= i.hi
  *
  * is planned by Spark as BroadcastNestedLoopJoin — O(|P|·|I|) pair
  * evaluations, the classic 100 TB scale-killer for temporal joins.
  * This rule rewrites it into the bucketed EQUALITY join that
  * q70 hand-writes (ops/Extras.scala): the interval side explodes into
  * the fixed-width time buckets it overlaps, the point side computes
  * its single bucket inside the join key, the join hashes on bucket
  * equality, and the ORIGINAL containment predicate stays on as the
  * join filter. A (point, interval) pair can only collide in the
  * point's bucket, so the rewrite introduces no duplicates and needs
  * no dedup; a degenerate interval (hi < lo) explodes to an empty
  * bucket array and drops out, matching the original join's empty
  * result for that row.
  *
  * Fires only when: inner join; a lower and an upper bound conjunct
  * reference the SAME point-side expression against two interval-side
  * expressions; all three are TimestampType; and NO equi-conjunct
  * already exists (with one, Spark plans a hash join and the
  * bucketization decision belongs to the query author — see q70's
  * skew discussion). Bucket width and an off switch are session confs:
  * `spark.graft.intervalJoin.bucketMicros` (default 30 min),
  * `spark.graft.intervalJoin.enabled`.
  *
  * Buckets use integer `div` on epoch micros (truncation): identical
  * on both join sides, so alignment is consistent; like q70 it assumes
  * post-epoch timestamps (pre-1970 micros would need floorDiv).
  *
  * Sizing contract: the interval side fans out to
  * ceil(interval-length / bucketMicros) + 1 rows per interval, so
  * bucketMicros should sit near the TYPICAL interval length — the
  * standard bounded-interval assumption of temporal joins (Flink's
  * interval join makes the same one). For corpus-length intervals over
  * tiny buckets, raise bucketMicros or disable the rule; the rewrite
  * never changes results either way.
  */
case class IntervalJoinRule() extends Rule[LogicalPlan] with PredicateHelper {

  private def enabled: Boolean =
    SQLConf.get.getConfString("spark.graft.intervalJoin.enabled", "true").toBoolean
  private def bucketMicros: Long =
    SQLConf.get.getConfString("spark.graft.intervalJoin.bucketMicros",
      (30L * 60 * 1000000).toString).toLong

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan.transformUp {
      case j @ Join(_, _, Inner, Some(_), _) =>
        rewrite(j).getOrElse(j)
    }
  }

  /** ts >= lo / lo <= ts normalized to (ts, bound); None otherwise. */
  private def lowerBound(e: Expression): Option[(Expression, Expression)] = e match {
    case GreaterThanOrEqual(ts, lo) => Some((ts, lo))
    case LessThanOrEqual(lo, ts) => Some((ts, lo))
    case _ => None
  }
  private def upperBound(e: Expression): Option[(Expression, Expression)] = e match {
    case LessThanOrEqual(ts, hi) => Some((ts, hi))
    case GreaterThanOrEqual(hi, ts) => Some((ts, hi))
    case _ => None
  }

  private def rewrite(j: Join): Option[LogicalPlan] = {
    val Join(left, right, _, Some(cond), hint) = j
    val conjuncts = splitConjunctivePredicates(cond)

    def from(side: LogicalPlan)(e: Expression): Boolean =
      e.references.nonEmpty && e.references.subsetOf(side.outputSet)

    // an existing equi-conjunct means Spark already plans a hash join
    val hasEqui = conjuncts.exists {
      case EqualTo(a, b) =>
        (from(left)(a) && from(right)(b)) || (from(right)(a) && from(left)(b))
      case _ => false
    }
    if (hasEqui) return None

    // find a (ts, lo, hi) triple with ts on one side, bounds on the other
    def findTriple(pt: LogicalPlan, iv: LogicalPlan): Option[(Expression, Expression, Expression)] = {
      val lowers = conjuncts.flatMap(lowerBound).filter {
        case (ts, lo) => from(pt)(ts) && from(iv)(lo)
      }
      val uppers = conjuncts.flatMap(upperBound).filter {
        case (ts, hi) => from(pt)(ts) && from(iv)(hi)
      }
      (for {
        (ts, lo) <- lowers
        (ts2, hi) <- uppers if ts.semanticEquals(ts2)
      } yield (ts, lo, hi)).headOption
    }

    val oriented: Option[(LogicalPlan, LogicalPlan, Boolean, (Expression, Expression, Expression))] =
      findTriple(left, right).map((left, right, true, _))
        .orElse(findTriple(right, left).map((right, left, false, _)))

    oriented.flatMap { case (pointSide, intervalSide, pointIsLeft, (ts, lo, hi)) =>
      if (Seq(ts, lo, hi).exists(_.dataType != TimestampType)) None
      else {
        val w = Literal(bucketMicros, LongType)
        def bucketOf(e: Expression): Expression = IntegralDivide(UnixMicros(e), w)
        val emptyBuckets =
          Literal.create(Array.empty[Long], ArrayType(LongType, containsNull = false))
        // Sequence is TimeZoneAwareExpression: without an explicit
        // timeZoneId it reports unresolved and plan validation rejects
        // the rewrite (optimizer rules run post-analysis, nothing will
        // re-resolve it)
        val bucketsOfInterval = If(LessThanOrEqual(lo, hi),
          Sequence(bucketOf(lo), bucketOf(hi), Some(Literal(1L, LongType)),
            Some(SQLConf.get.sessionLocalTimeZone)),
          emptyBuckets)
        val bucketAttr = AttributeReference("graft_bucket", LongType, nullable = false)()
        val gen = Generate(Explode(bucketsOfInterval), unrequiredChildIndex = Nil,
          outer = false, qualifier = None, generatorOutput = Seq(bucketAttr),
          child = intervalSide)
        val newCond = And(EqualTo(bucketOf(ts), bucketAttr), cond)
        val joined =
          if (pointIsLeft) Join(pointSide, gen, Inner, Some(newCond), hint)
          else Join(gen, pointSide, Inner, Some(newCond), hint)
        // the rewrite must preserve the join's original output exactly
        Some(Project(j.output, joined))
      }
    }
  }
}
