package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: conjoin the implied O(1) length-difference guard
  * ahead of thresholded edit-distance predicates.
  *
  * `levenshtein(a, b) <= k` implies `abs(length(a) - length(b)) <= k`
  * (each insert/delete changes the length by one, substitutions don't —
  * the standard length lower bound on edit distance), so the rule
  * rewrites
  * {{{
  *   Filter(levenshtein(a, b) <= k, child)
  *   -->  Filter(abs(length(a) - length(b)) <= k && levenshtein(a, b) <= k, child)
  * }}}
  * and the same for `<`, `=`, the literal on either side, and for JOIN
  * conditions. The bounded three-arg form `levenshtein(a, b, t)` — which
  * returns −1 past the threshold — gets the guard from its own bound
  * when the predicate demands a within-threshold result
  * (`lev3 >= 0`, `lev3 = k` with k ≥ 0, `NOT lev3 = -1`).
  *
  * Why this matters at scale: a Levenshtein evaluation is an O(k·min(n,m))
  * dynamic program per row pair; the guard is two already-computed-cheap
  * `length` calls and a compare. Conjuncts evaluate left-to-right with
  * short-circuit in generated code, so on a candidate join where most
  * pairs differ wildly in length (the common case for fuzzy matching
  * over a corpus), the guard rejects them before the DP runs — the
  * classic length-blocking optimization, applied automatically by the
  * optimizer instead of by every query author remembering it. The
  * rewrite is PURELY IMPLIED (the guard is a logical consequence of the
  * original predicate), so results are bit-identical with the rule on
  * or off — LengthGuardSpec proves both the implication on randomized
  * inputs and the plan rewrite.
  *
  * Fixpoint safety: the guard is only added when no semantically equal
  * conjunct is already present, so the second optimizer pass leaves the
  * plan unchanged and the batch converges.
  *
  * Installed by `graft.functions.GraftExtensions`
  * (`spark.sql.extensions`) via `injectOptimizerRule`.
  */
object LevenshteinLengthGuard extends Rule[LogicalPlan] with PredicateHelper {

  private def guardFor(l: Expression, r: Expression, k: Expression): Expression =
    LessThanOrEqual(Abs(Subtract(Length(l), Length(r))), k)

  private def nonNegIntLit(e: Expression): Boolean = e match {
    case Literal(v: Int, IntegerType) => v >= 0
    case _ => false
  }

  /** The implied guard for one conjunct, when one exists. */
  private def impliedGuard(conjunct: Expression): Option[Expression] =
    conjunct match {
      // two-arg form: the result IS the distance
      case LessThanOrEqual(Levenshtein(l, r, None), k @ Literal(_: Int, IntegerType)) =>
        Some(guardFor(l, r, k))
      case LessThan(Levenshtein(l, r, None), k @ Literal(_: Int, IntegerType)) =>
        Some(guardFor(l, r, k))
      case EqualTo(Levenshtein(l, r, None), k @ Literal(_: Int, IntegerType)) =>
        Some(guardFor(l, r, k))
      case GreaterThanOrEqual(k @ Literal(_: Int, IntegerType), Levenshtein(l, r, None)) =>
        Some(guardFor(l, r, k))
      case GreaterThan(k @ Literal(_: Int, IntegerType), Levenshtein(l, r, None)) =>
        Some(guardFor(l, r, k))
      case EqualTo(k @ Literal(_: Int, IntegerType), Levenshtein(l, r, None)) =>
        Some(guardFor(l, r, k))
      // bounded form: result in {-1} ∪ [0..t]; a predicate that demands a
      // non-negative result demands distance <= t, so t bounds the length gap
      case GreaterThanOrEqual(Levenshtein(l, r, Some(t)), k)
          if nonNegIntLit(k) && t.isInstanceOf[Literal] =>
        Some(guardFor(l, r, t))
      case EqualTo(Levenshtein(l, r, Some(t)), k)
          if nonNegIntLit(k) && t.isInstanceOf[Literal] =>
        Some(guardFor(l, r, t))
      case Not(EqualTo(Levenshtein(l, r, Some(t)), Literal(-1, IntegerType)))
          if t.isInstanceOf[Literal] =>
        Some(guardFor(l, r, t))
      case _ => None
    }

  private def withGuards(cond: Expression): Expression = {
    val conjuncts = splitConjunctivePredicates(cond)
    val guards = conjuncts.flatMap(impliedGuard)
      .filterNot(g => conjuncts.exists(_.semanticEquals(g)))
      .distinct
    if (guards.isEmpty) cond else (guards ++ conjuncts).reduce(And)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val g = withGuards(cond)
      if (g fastEquals cond) f else Filter(g, child)
    case j @ Join(_, _, _, Some(cond), _) =>
      val g = withGuards(cond)
      if (g fastEquals cond) j else j.copy(condition = Some(g))
  }
}

/** Optimizer rule: conjoin the implied length guard ahead of substring
  * predicates between two NON-LITERAL strings.
  *
  * `contains(a, b)` / `startswith(a, b)` / `endswith(a, b)` all imply
  * `length(a) >= length(b)` — a haystack can't contain a longer
  * needle — so a containment join or filter gains an O(1) reject ahead
  * of the O(n·m) substring scan, under the same short-circuit
  * evaluation [[LevenshteinLengthGuard]] relies on. Literal needles
  * are skipped: Spark already turns those into pushable
  * StringContains/StringStartsWith data-source filters, and a
  * constant-foldable guard would be noise.
  *
  * Null semantics are preserved: when either side is NULL both the
  * original predicate and the guard evaluate NULL, and
  * `And(NULL, NULL) = NULL` / `And(NULL, FALSE) = FALSE` filter
  * exactly the rows the original condition filtered. Fixpoint-safe by
  * the same present-conjunct check. Installed beside the Levenshtein
  * guard by `GraftExtensions`.
  */
object SubstringLengthGuard extends Rule[LogicalPlan] with PredicateHelper {

  private def nonLiteral(e: Expression): Boolean = !e.foldable

  private def guardFor(hay: Expression, needle: Expression): Expression =
    GreaterThanOrEqual(Length(hay), Length(needle))

  private def impliedGuard(conjunct: Expression): Option[Expression] =
    conjunct match {
      case Contains(hay, needle) if nonLiteral(needle) && nonLiteral(hay) =>
        Some(guardFor(hay, needle))
      case StartsWith(hay, needle) if nonLiteral(needle) && nonLiteral(hay) =>
        Some(guardFor(hay, needle))
      case EndsWith(hay, needle) if nonLiteral(needle) && nonLiteral(hay) =>
        Some(guardFor(hay, needle))
      case _ => None
    }

  private def withGuards(cond: Expression): Expression = {
    val conjuncts = splitConjunctivePredicates(cond)
    val guards = conjuncts.flatMap(impliedGuard)
      .filterNot(g => conjuncts.exists(_.semanticEquals(g)))
      .distinct
    if (guards.isEmpty) cond else (guards ++ conjuncts).reduce(And)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val g = withGuards(cond)
      if (g fastEquals cond) f else Filter(g, child)
    case j @ Join(_, _, _, Some(cond), _) =>
      val g = withGuards(cond)
      if (g fastEquals cond) j else j.copy(condition = Some(g))
  }
}
