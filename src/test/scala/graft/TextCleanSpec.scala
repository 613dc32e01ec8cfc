package graft

import org.apache.spark.sql.functions._

import graft.ops.TextClean

/** Golden + property tests for the silver cleanse chain — the 7 literal
  * edge cases of `…bronze_to_silver.py:99-105`, diacritic folding, and the
  * cleanse invariants from SURVEY.md §5. */
class TextCleanSpec extends SparkSpec {
  import spark.implicits._

  private def cleanCol(colName: String, fixes: Seq[(String, String)])(vals: String*): Seq[String] =
    vals.toDF("v")
      .select(TextClean.cleanText(
        TextClean.applyFixes(TextClean.slug(col("v")), fixes)).as("c"))
      .as[String].collect().toSeq

  private def cleanName(vals: String*): Seq[String] =
    vals.toDF("v")
      .select(TextClean.applyFixes(col("v"), TextClean.nameFixes).as("c"))
      .as[String].collect().toSeq

  test("slug: trim + lower + spaces→dashes (the ' United States' case)") {
    assert(cleanCol("country", Nil)(" United States", "United States", "Rio De Janeiro") ==
      Seq("united-states", "united-states", "rio-de-janeiro"))
  }

  test("state mojibake literals fold to ascii") {
    assert(cleanCol("state", TextClean.stateFixes)("k�rnten", "nieder�sterreich") ==
      Seq("karnten", "niederosterreich"))
  }

  test("city mojibake literal") {
    assert(cleanCol("city", TextClean.cityFixes)("klagenfurt am w�rthersee") ==
      Seq("klagenfurt-am-worthersee"))
  }

  test("name fixups: Anheuser / Café Okei / Wimitzbräu / mojibake dash") {
    assert(cleanName(
      "Anheuser-Busch Inc ̢���� Williamsburg",
      "Caf� Okei",
      "Wimitzbr�u",
      "Some â Brewery") == Seq(
      "Anheuser-Busch/Inbev Williamsburg Brewery",
      "Cafe Okei",
      "Wimitzbrau",
      "Some - Brewery"))
  }

  test("diacritic fold: true accents → base letters") {
    assert(cleanCol("city", Nil)("München", "São Paulo", "Kärnten", "Wien") ==
      Seq("munchen", "sao-paulo", "karnten", "wien"))
  }

  test("connector punctuation stripped (\\p{Pc})") {
    assert(cleanCol("city", Nil)("some_city", "a_b_c") == Seq("somecity", "abc"))
  }

  test("fold table is precomputed and sane") {
    val (m, r) = (TextClean.foldMatching, TextClean.foldReplace)
    assert(m.length == r.length)
    assert(m.length > 500) // full-Unicode WITH heuristic yields hundreds of pairs
    val idx = m.indexOf('ä')
    assert(idx >= 0 && r(idx) == 'a')
    val idxO = m.indexOf('ö')
    assert(idxO >= 0 && r(idxO) == 'o')
  }

  test("property: cleanse is idempotent and partition-value safe") {
    val rnd = new scala.util.Random(42)
    val alphabet = "abcXYZ019 _äÉß�ç-".toCharArray
    val samples = Seq.fill(60)(
      Seq.fill(12)(alphabet(rnd.nextInt(alphabet.length))).mkString)
    val once = cleanCol("city", Nil)(samples: _*)
    val twice = cleanCol("city", Nil)(once: _*)
    assert(twice == once)                               // idempotent
    once.foreach { s =>
      assert(!s.exists(_.isUpper))                      // lowercased
      assert(!s.contains(' '))                          // slug-safe
      assert(!s.contains('_'))                          // \p{Pc} stripped
    }
  }
}
