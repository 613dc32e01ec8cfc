package graft

import org.apache.spark.sql.catalyst.expressions.{Abs, And, EqualTo, GreaterThanOrEqual, Length, LessThanOrEqual, Levenshtein, Literal}
import org.apache.spark.sql.catalyst.plans.logical.Filter
import org.apache.spark.sql.functions._

import graft.plans.{LevenshteinLengthGuard, SubstringLengthGuard}

/** The edit-distance length-guard optimizer rule: implication safety,
  * fixpoint stability, the unsafe pattern left alone, and the guard
  * visible in real executed plans through the installed extensions. */
class LengthGuardSpec extends SparkSpec {

  import LevenshteinLengthGuard.{apply => runRule}

  private def containsGuard(e: org.apache.spark.sql.catalyst.expressions.Expression): Boolean =
    e.exists {
      case LessThanOrEqual(Abs(_, _), _) => true
      case _ => false
    }

  test("two-arg lev <= k gains the guard once; second pass is a fixpoint") {
    import spark.implicits._
    val df = Seq(("ab", "abc"), ("ab", "zzzzzz")).toDF("a", "b")
      .filter(levenshtein(col("a"), col("b")) <= 2)
    val analyzed = df.queryExecution.analyzed
    val once = runRule(analyzed)
    val cond1 = once.collectFirst { case Filter(c, _) => c }.get
    assert(containsGuard(cond1), s"guard not injected: $cond1")
    val twice = runRule(once)
    assert(twice fastEquals once,
      "rule must be a fixpoint after one application (optimizer convergence)")
  }

  test("implication: the guarded filter keeps exactly the original rows") {
    import spark.implicits._
    // adversarial lengths around the threshold in both directions
    val rows = Seq(("a", "a"), ("a", "abc"), ("a", "abcd"), ("abcd", "a"),
      ("kitten", "sitting"), ("flaw", "flaws"), ("xx", "yyyyy"))
    val df = rows.toDF("a", "b")
    val plain = df.filter(levenshtein(col("a"), col("b")) <= 2)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    // hand-guarded formulation (what the rule injects)
    val guarded = df.filter(
        abs(length(col("a")) - length(col("b"))) <= 2 &&
          levenshtein(col("a"), col("b")) <= 2)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(plain == guarded, s"guard changed semantics: $plain vs $guarded")
  }

  test("bounded lev3 <= k stays untouched — the -1 sentinel makes a guard unsafe") {
    // levenshtein(a, b, t) returns -1 past the threshold, and -1 <= k
    // PASSES the filter for arbitrarily length-mismatched pairs — a
    // guard here would change results. The rule must not fire.
    import spark.implicits._
    val df = Seq(("ab", "zzzzzzzz")).toDF("a", "b")
      .filter(levenshtein(col("a"), col("b"), 2) <= 2)
    val once = runRule(df.queryExecution.analyzed)
    val cond = once.collectFirst { case Filter(c, _) => c }.get
    assert(!containsGuard(cond), s"unsafe guard injected: $cond")
    // and the sentinel row indeed survives the original predicate
    assert(df.count() == 1)
  }

  test("bounded lev3 >= 0 (the q92 idiom) gains the guard from its own bound") {
    import spark.implicits._
    val df = Seq(("ab", "abc"), ("ab", "zzzzzzzz")).toDF("a", "b")
      .filter(levenshtein(col("a"), col("b"), 2) >= 0)
    val once = runRule(df.queryExecution.analyzed)
    val cond = once.collectFirst { case Filter(c, _) => c }.get
    assert(containsGuard(cond), s"bounded-form guard not injected: $cond")
    // semantics: only the within-threshold pair passes either way
    assert(df.count() == 1)
  }

  test("the installed extensions put the guard into a real optimized plan") {
    // the shared spec session registers GraftExtensions, so the rule
    // runs inside the real optimizer — no manual rule application.
    // (range-derived strings, not literals: a local Seq folds to a
    // LocalRelation and literal args constant-fold the levenshtein
    // itself — either way no Filter survives to inspect)
    val df = spark.range(4)
      .select(concat(lit("a"), col("id").cast("string")).as("a"),
        lit("a0").as("b"))
      .filter(levenshtein(col("a"), col("b")) <= 2)
    val optimized = df.queryExecution.optimizedPlan
    val cond = optimized.collectFirst { case Filter(c, _) => c }
    assert(cond.exists(containsGuard),
      s"rule inactive in the session optimizer:\n$optimized")
    assert(df.count() == 4)
  }

  private def containsLenGe(e: org.apache.spark.sql.catalyst.expressions.Expression): Boolean =
    e.exists {
      case GreaterThanOrEqual(Length(_), Length(_)) => true
      case _ => false
    }

  test("contains(a, b) between columns gains the haystack-length guard; fixpoint holds") {
    val df = spark.range(4)
      .select(concat(lit("ab"), col("id").cast("string")).as("hay"),
        concat(lit("b"), col("id").cast("string")).as("needle"))
      .filter(col("hay").contains(col("needle")))
    val analyzed = df.queryExecution.analyzed
    val once = SubstringLengthGuard(analyzed)
    val cond = once.collectFirst { case Filter(c, _) => c }.get
    assert(containsLenGe(cond), s"substring guard not injected: $cond")
    assert(SubstringLengthGuard(once) fastEquals once, "fixpoint violated")
    // semantics: "abN" contains "bN" for every N — the guard drops nothing
    assert(df.count() == 4)
  }

  test("literal-needle contains stays untouched (already a pushable source filter)") {
    val df = spark.range(2)
      .select(concat(lit("ab"), col("id").cast("string")).as("hay"))
      .filter(col("hay").contains("b1"))
    val once = SubstringLengthGuard(df.queryExecution.analyzed)
    val cond = once.collectFirst { case Filter(c, _) => c }.get
    assert(!containsLenGe(cond), s"needless guard on a literal needle: $cond")
  }

  test("substring guard preserves null semantics (null rows filtered either way)") {
    val df = spark.range(3)
      .select(when(col("id") === 0, concat(lit("abc"), col("id").cast("string")))
          .as("hay"),
        when(col("id") =!= 2, concat(lit("c"), lit("0"))).as("needle"))
    val plain = df.filter(col("hay").contains(col("needle"))).count()
    val guarded = df.filter(length(col("hay")) >= length(col("needle")) &&
        col("hay").contains(col("needle"))).count()
    assert(plain == 1 && plain == guarded,
      s"null handling diverged: $plain vs $guarded")
  }

  test("non-binary collation disables the substring guard (ICU matches aren't length-preserving)") {
    // under UNICODE_CI a haystack can match a LONGER needle (ß ~ ss),
    // so length(hay) >= length(needle) is NOT implied — the rule must
    // leave collated predicates alone
    val df = spark.range(2)
      .select(collate(concat(lit("a"), col("id").cast("string")), "UNICODE_CI")
          .as("hay"),
        collate(concat(lit("b"), col("id").cast("string")), "UNICODE_CI")
          .as("needle"))
      .filter(col("hay").contains(col("needle")))
    val once = SubstringLengthGuard(df.queryExecution.analyzed)
    val cond = once.collectFirst { case Filter(c, _) => c }.get
    assert(!containsLenGe(cond),
      s"guard wrongly injected under a non-binary collation: $cond")
  }
}
