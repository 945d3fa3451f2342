package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{ArrayType, FloatType, IntegerType}
import graft.functions.DotProductExpr

/** Demonstration optimizer rule (SURVEY §4.3 optional depth / VERDICT r2
  * next-round #9): rewrites a naive quadratic cosine-threshold pair search
  *
  *   a.crossJoin(b).filter(dot(ea, eb) / (na * nb) >= τ)   (τ > 0)
  *
  * — which Spark must execute as a nested-loop/cartesian product — into
  * sign-LSH bucketed candidate generation: both sides explode to 8
  * bucket keys (`TextSim.signBucket`, the same deterministic hyperplanes
  * the hand-written ANN path uses), the cartesian becomes an equi join on
  * the bucket key, the ORIGINAL predicate re-verifies every candidate
  * (precision stays exact), and a first-collision filter keeps each
  * qualifying pair exactly once (its lowest colliding table) — row
  * MULTIPLICITY matches the original plan, including genuinely duplicate
  * input rows, which a group-by-output dedup would have collapsed.
  *
  * The rewrite is approximate in RECALL (a qualifying pair that shares no
  * bucket is lost — for near-identical vectors the miss probability is
  * ~(1-p⁴)⁸ ≈ 10⁻¹³ at cos≈0.999), so it is OPT-IN, default off, gated on
  * `spark.graft.annRewrite.enabled` — the approximate-query-processing
  * contract made explicit. Matching is deliberately conservative:
  *  - only Cross/Inner joins whose condition has NO equi conjunct (an
  *    existing equi key means the join is not the quadratic shape this
  *    targets — and makes the rule idempotent, since the rewritten join
  *    gains one);
  *  - the dot product must be a direct `DotProductExpr` over one
  *    array<float> attribute from EACH side, and it must appear INSIDE a
  *    conjunct lower-bounded by a positive literal — sign-LSH only
  *    concentrates high-cosine pairs, so a bound on some unrelated
  *    column must not make the query eligible.
  */
object AnnRewriteRule extends Rule[LogicalPlan] with PredicateHelper {
  val ConfKey = "spark.graft.annRewrite.enabled"
  private val NTables = 8

  private def enabled: Boolean =
    SQLConf.get.getConfString(ConfKey, "false").toBoolean

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled) plan
    else plan.transformUp {
      // shape 1: predicate already folded into the join condition
      case j @ Join(l, r, Cross | Inner, Some(cond), _)
          if eligible(cond, l, r) =>
        matchDotPair(cond, l, r).map(rewrite(j.output, cond, l, r, _))
          .getOrElse(j)
      // shape 2: Filter still sitting on a condition-less cross join
      case f @ Filter(cond, Join(l, r, Cross | Inner, None, _))
          if eligible(cond, l, r) =>
        matchDotPair(cond, l, r).map(rewrite(f.output, cond, l, r, _))
          .getOrElse(f)
    }

  /** No existing equi conjunct between the sides. */
  private def eligible(cond: Expression, l: LogicalPlan,
      r: LogicalPlan): Boolean =
    !splitConjunctivePredicates(cond).exists {
      case EqualTo(x, y) =>
        (x.references.subsetOf(l.outputSet) &&
          y.references.subsetOf(r.outputSet)) ||
        (x.references.subsetOf(r.outputSet) &&
          y.references.subsetOf(l.outputSet))
      case _ => false
    }

  /** First DotProductExpr whose array<float> attribute children split
    * across the two sides (probe·probe norms don't match) — searched ONLY
    * inside conjuncts of the form `expr >= positive-literal`, so the
    * high-cosine bound is provably on the similarity being bucketed, not
    * on some unrelated column. */
  private def matchDotPair(cond: Expression, l: LogicalPlan,
      r: LogicalPlan): Option[(Attribute, Attribute)] = {
    val boundedSides = splitConjunctivePredicates(cond).collect {
      case GreaterThanOrEqual(lhs, Literal(t: Double, _)) if t > 0 => lhs
      case GreaterThan(lhs, Literal(t: Double, _)) if t > 0 => lhs
    }
    boundedSides.flatMap { lhs =>
      lhs.collectFirst {
        case DotProductExpr(a: AttributeReference, b: AttributeReference)
            if isFloatArray(a) && isFloatArray(b) &&
              l.outputSet.contains(a) && r.outputSet.contains(b) => (a, b)
        case DotProductExpr(a: AttributeReference, b: AttributeReference)
            if isFloatArray(a) && isFloatArray(b) &&
              l.outputSet.contains(b) && r.outputSet.contains(a) => (b, a)
      }
    }.headOption
  }

  private def isFloatArray(a: Attribute): Boolean = a.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  /** Explode the side to its 8 packed bucket keys (table-id ≪ 4 | bucket),
    * one output row per (row, table). Built from raw Catalyst nodes — a
    * rule must emit RESOLVED plans, and the Column DSL (when/sqrt/…)
    * lowers to unresolved functions — over TextSim's exact hyperplanes,
    * so the rewrite buckets identically to the hand-written ANN path. */
  /** Packed bucket key (table-id ≪ 4 | sign bits) of `e` for table `t`. */
  private def bucketKey(t: Int, e: Attribute): Expression = {
    val bits: Seq[Expression] = (0 until 4).map { b =>
      val planeLit = Literal.create(
        graft.ops.TextSim.plane(t, b), ArrayType(FloatType))
      If(GreaterThan(DotProductExpr(e, planeLit), Literal(0.0)),
        Literal(1 << b), Literal(0))
    }
    bits.foldLeft(Literal(t * 16): Expression)(Add(_, _))
  }

  private def bucketed(side: LogicalPlan,
      e: Attribute): (LogicalPlan, Attribute) = {
    val keys: Seq[Expression] = (0 until NTables).map(bucketKey(_, e))
    val out = AttributeReference("__graft_bk", IntegerType, nullable = false)()
    (Generate(Explode(CreateArray(keys)), Nil, outer = false, None,
      Seq(out), side), out)
  }

  private def rewrite(output: Seq[Attribute], cond: Expression,
      l: LogicalPlan, r: LogicalPlan,
      pair: (Attribute, Attribute)): LogicalPlan = {
    val (nl, bkL) = bucketed(l, pair._1)
    val (nr, bkR) = bucketed(r, pair._2)
    val join = Join(nl, nr, Inner, Some(EqualTo(bkL, bkR)), JoinHint.NONE)
    // A pair colliding in several tables matches the bucket join once per
    // table; keep ONLY the lowest colliding table's match — for every
    // t' below this row's table (bkL >= (t'+1)*16 ⟺ t' < t), the two
    // vectors must DISAGREE in table t'. Exact multiplicity: each
    // input-row pair survives exactly once, and genuinely duplicate input
    // rows stay distinct (a group-by-output dedup would collapse them,
    // silently changing counts/sums over the result).
    val firstCollision = (0 until NTables - 1).map { tp =>
      Or(LessThan(bkL, Literal((tp + 1) * 16)),
        Not(EqualTo(bucketKey(tp, pair._1), bucketKey(tp, pair._2))))
    }.foldLeft(Literal(true): Expression)(And(_, _))
    // original predicate re-verifies every candidate; Project drops the
    // bucket keys
    Project(output, Filter(And(cond, firstCollision), join))
  }
}
