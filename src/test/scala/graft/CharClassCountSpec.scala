package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{CharClassCount, GraftFunctions}
import graft.sources.Tables

/** The single-pass [[CharClassCount]] must agree with the
  * `size(regexp_extract_all(...))` form it replaced — on the real
  * documents corpus and on adversarial literals — in both codegen and
  * interpreted eval. (Declared divergence: non-BMP codepoints, where
  * java.util.regex counts UTF-16 units while this expression and the
  * DuckDB/RE2 oracle count codepoints.) */
class CharClassCountSpec extends AnyFunSuite with SparkSpec {

  private val modes = Seq(
    ("[a-z]+", CharClassCount.AlphaRuns),
    ("[0-9]+", CharClassCount.DigitRuns),
    ("[^a-z0-9 ]", CharClassCount.Symbols))

  test("matches the regex form on the documents corpus, all modes") {
    val docs = Tables.documents(spark, sf0001)
    modes.foreach { case (pat, mode) =>
      val mismatches = docs.select(
        GraftFunctions.char_class_count(col("text"), mode).as("native"),
        size(regexp_extract_all(col("text"), lit(pat), lit(0)))
          .cast("long").as("regex"))
        .filter(col("native") =!= col("regex")).count()
      assert(mismatches == 0, s"mode $mode vs $pat")
    }
  }

  test("matches the regex form on adversarial literals") {
    // runs at both ends, empty string, all-space, digits split by letters,
    // uppercase (symbols!), punctuation runs, BMP unicode (é is one
    // codepoint = one symbol on both engines)
    val rows = Seq("", " ", "   ", "a", "z9", "9z", "abc def9x ",
      "ABC abc 123", "a1b2c3", "!!!", "a!b?c.", " a ", "9 9 9",
      "café résumé", "tab\tnewline\n", "a" * 1000,
      "0" * 17 + "x" + "!" * 5)
    import spark.implicits._
    val df = rows.toDF("text")
    modes.foreach { case (pat, mode) =>
      val bad = df.select(col("text"),
        GraftFunctions.char_class_count(col("text"), mode).as("native"),
        size(regexp_extract_all(col("text"), lit(pat), lit(0)))
          .cast("long").as("regex"))
        .filter(col("native") =!= col("regex")).collect()
      assert(bad.isEmpty, s"mode $mode: ${bad.mkString(",")}")
    }
  }

  test("interpreted eval agrees with codegen") {
    import org.apache.spark.unsafe.types.UTF8String
    val s = UTF8String.fromString("abc 123 café! x9")
    assert(CharClassCount.count(s, CharClassCount.AlphaRuns) == 3)   // abc, caf, x (é breaks the run)
    assert(CharClassCount.count(s, CharClassCount.DigitRuns) == 2)   // 123, 9
    assert(CharClassCount.count(s, CharClassCount.Symbols) == 2)     // é (one codepoint), !
  }

  test("null text yields null counts") {
    import spark.implicits._
    val df = Seq[String](null).toDF("text")
    val r = df.select(
      GraftFunctions.char_class_count(col("text"), 0).as("n")).head
    assert(r.isNullAt(0))
  }
}
