package graft

import org.apache.spark.sql.catalyst.parser.ParseException

/** q179's safety contract: a parameter marker binds a typed LITERAL at
  * parse time — it can never change the statement's shape, which is
  * the whole point of `spark.sql(text, args)` over string splicing. */
class SqlParamsSpec extends SparkSpec {

  test("a quote-laden value binds as a literal, not as SQL text") {
    import spark.implicits._
    Seq((1L, "alice"), (2L, "bob")).toDF("id", "name")
      .createOrReplaceTempView("sqlp_users")
    val hostile = "' OR '1'='1"
    // named marker: the hostile string is compared as a VALUE — no row
    // has that name, so nothing matches (a splice would return all rows)
    val bound = spark.sql(
      "SELECT id FROM sqlp_users WHERE name = :n", Map("n" -> hostile))
    assert(bound.count() == 0,
      "a bound hostile string must stay a literal and match nothing")
    // the spliced twin demonstrates what the marker prevents: the same
    // bytes concatenated into the text change the statement shape
    val spliced = spark.sql(
      s"SELECT id FROM sqlp_users WHERE name = '$hostile'")
    assert(spliced.count() == 2,
      "the spliced twin tautology must match every row — the shape changed")
    // positional markers carry the same guarantee
    val pos = spark.sql(
      "SELECT id FROM sqlp_users WHERE name = ?", Array(hostile))
    assert(pos.count() == 0)
  }

  test("markers bind values only — a marker cannot inject a new clause") {
    import spark.implicits._
    Seq((1L, "x")).toDF("id", "v").createOrReplaceTempView("sqlp_t")
    // "1; DROP TABLE" as a bound value is just a weird string, and
    // binding it where a value belongs parses fine but matches nothing
    val r = spark.sql("SELECT id FROM sqlp_t WHERE v = :v",
      Map("v" -> "x; DROP TABLE sqlp_t"))
    assert(r.count() == 0)
    assert(spark.catalog.tableExists("sqlp_t"),
      "the bound pseudo-statement must not have executed")
    // and a marker in a non-value position is a parse error, not a
    // splice point — the text's shape is fixed before binding
    intercept[ParseException] {
      spark.sql("SELECT id FROM :tbl", Map("tbl" -> "sqlp_t")).collect()
    }
  }

  test("IDENTIFIER promotes a bound name under identifier rules, never as SQL text") {
    import spark.implicits._
    Seq((1L, "x"), (2L, "y")).toDF("id", "v")
      .createOrReplaceTempView("sqlp_ident")
    // the sanctioned dynamic-name path: IDENTIFIER(:t) resolves the
    // bound string as a (qualified) name
    val ok = spark.sql("SELECT COUNT(*) AS n FROM IDENTIFIER(:t)",
      Map("t" -> "sqlp_ident"))
    assert(ok.head().getLong(0) == 2)
    // a value that is not a bare name is an ERROR, not a splice point —
    // the difference between IDENTIFIER and string concatenation
    val e = intercept[Exception] {
      spark.sql("SELECT COUNT(*) AS n FROM IDENTIFIER(:t)",
        Map("t" -> "sqlp_ident WHERE id = 1")).collect()
    }
    assert(e.getMessage.contains("IDENTIFIER") ||
      e.getMessage.toLowerCase.contains("invalid"),
      s"injection-shaped identifier must fail loudly: ${e.getMessage}")
  }
}
