package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, StringType}

/** Shared machinery for the implied-guard rules: split a Filter/Join
  * condition into conjuncts, derive each conjunct's implied cheap guard
  * (if any), and conjoin the guards FIRST — short-circuit evaluation
  * then rejects rows in O(1) before the expensive predicate runs.
  *
  * Fixpoint safety (the optimizer runs rule batches to convergence): a
  * guard is only added when no semantically equal conjunct is already
  * present, so the second pass leaves the plan unchanged. */
private[plans] trait ImpliedGuardRule extends Rule[LogicalPlan] with PredicateHelper {

  /** The implied guard for one conjunct, when one exists. */
  protected def impliedGuard(conjunct: Expression): Option[Expression]

  /** True only for strings under binary (UTF8_BINARY) collation — the
    * regime where length arithmetic can reason about matching. Under
    * ICU collations a "match" need not preserve lengths (e.g. ß ~ ss
    * under UNICODE_CI), so guards must not fire there. */
  protected final def binaryString(e: Expression): Boolean = e.dataType match {
    case s: StringType => s == StringType // the default (collation 0) singleton
    case _ => false
  }

  private def withGuards(cond: Expression): Expression = {
    val conjuncts = splitConjunctivePredicates(cond)
    val guards = conjuncts.flatMap(impliedGuard)
      .filterNot(g => conjuncts.exists(_.semanticEquals(g)))
      .distinct
    if (guards.isEmpty) cond else (guards ++ conjuncts).reduce(And)
  }

  final override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val g = withGuards(cond)
      if (g fastEquals cond) f else Filter(g, child)
    case j @ Join(_, _, _, Some(cond), _) =>
      val g = withGuards(cond)
      if (g fastEquals cond) j else j.copy(condition = Some(g))
  }
}

/** Optimizer rule: conjoin the implied O(1) length-difference guard
  * ahead of thresholded edit-distance predicates.
  *
  * `levenshtein(a, b) <= k` implies `abs(length(a) - length(b)) <= k`
  * (each insert/delete changes the length by one, substitutions don't —
  * the standard length lower bound on edit distance; valid for ANY
  * per-character edit model, so no collation caveat applies), so the
  * rule rewrites
  * {{{
  *   Filter(levenshtein(a, b) <= k, child)
  *   -->  Filter(abs(length(a) - length(b)) <= k && levenshtein(a, b) <= k, child)
  * }}}
  * and the same for `<`, `=`, the literal on either side, and for JOIN
  * conditions. The bounded three-arg form `levenshtein(a, b, t)` — which
  * returns −1 past the threshold — gets the guard from its own bound
  * when the predicate demands a within-threshold result
  * (`lev3 >= 0`, `lev3 = k` with k ≥ 0, `NOT lev3 = -1`); a direct
  * `lev3 <= k` is deliberately NOT guarded (−1 ≤ k admits arbitrarily
  * length-mismatched pairs).
  *
  * Why this matters at scale: a Levenshtein evaluation is an O(k·min(n,m))
  * dynamic program per row pair; the guard is two cheap `length` calls
  * and a compare. Conjuncts evaluate left-to-right with short-circuit in
  * generated code, so on a candidate join where most pairs differ wildly
  * in length (the common case for fuzzy matching over a corpus), the
  * guard rejects them before the DP runs — the classic length-blocking
  * optimization, applied automatically by the optimizer instead of by
  * every query author remembering it. The rewrite is PURELY IMPLIED
  * (the guard is a logical consequence of the original predicate), so
  * results are bit-identical with the rule on or off — LengthGuardSpec
  * proves both the implication and the plan rewrite, and q125's DuckDB
  * oracle runs the un-rewritten predicate.
  *
  * Installed by `graft.functions.GraftExtensions`
  * (`spark.sql.extensions`) via `injectOptimizerRule`.
  */
object LevenshteinLengthGuard extends ImpliedGuardRule {

  private def guardFor(l: Expression, r: Expression, k: Expression): Expression =
    LessThanOrEqual(Abs(Subtract(Length(l), Length(r))), k)

  private def nonNegIntLit(e: Expression): Boolean = e match {
    case Literal(v: Int, IntegerType) => v >= 0
    case _ => false
  }

  override protected def impliedGuard(conjunct: Expression): Option[Expression] =
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
}

/** Optimizer rule: conjoin the implied length guard ahead of substring
  * predicates between two NON-LITERAL binary-collated strings.
  *
  * `contains(a, b)` / `startswith(a, b)` / `endswith(a, b)` under
  * UTF8_BINARY imply `length(a) >= length(b)` — a haystack can't
  * contain a longer needle — so a containment join or filter gains an
  * O(1) reject ahead of the O(n·m) substring scan, under the same
  * short-circuit evaluation [[LevenshteinLengthGuard]] relies on.
  *
  * Two deliberate exclusions:
  *  - Literal needles: Spark already turns those into pushable
  *    StringContains/StringStartsWith data-source filters, and a
  *    constant-foldable guard would be noise.
  *  - Non-binary collations: ICU matching is not length-preserving
  *    (UNICODE_CI matches 'ß' to 'ss'), so the implication fails and
  *    the guard must not fire — [[ImpliedGuardRule.binaryString]]
  *    gates every pattern.
  *
  * Null semantics are preserved: when either side is NULL both the
  * original predicate and the guard evaluate NULL, and
  * `And(NULL, NULL) = NULL` / `And(NULL, FALSE) = FALSE` filter
  * exactly the rows the original condition filtered. Installed beside
  * the Levenshtein guard by `GraftExtensions`.
  */
object SubstringLengthGuard extends ImpliedGuardRule {

  private def eligible(hay: Expression, needle: Expression): Boolean =
    !hay.foldable && !needle.foldable &&
      binaryString(hay) && binaryString(needle)

  private def guardFor(hay: Expression, needle: Expression): Expression =
    GreaterThanOrEqual(Length(hay), Length(needle))

  override protected def impliedGuard(conjunct: Expression): Option[Expression] =
    conjunct match {
      case Contains(hay, needle) if eligible(hay, needle) =>
        Some(guardFor(hay, needle))
      case StartsWith(hay, needle) if eligible(hay, needle) =>
        Some(guardFor(hay, needle))
      case EndsWith(hay, needle) if eligible(hay, needle) =>
        Some(guardFor(hay, needle))
      case _ => None
    }
}
