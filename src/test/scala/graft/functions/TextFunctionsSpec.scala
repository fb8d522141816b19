package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column, s: String): T =
    Seq(s).toDF("text").select(c.as("v")).collect()(0).getAs[T](0)

  test("tokenCount: whitespace runs, empty text") {
    assert(one[Int](TextFunctions.tokenCount(col("text")), "a  b\tc") == 3)
    assert(one[Int](TextFunctions.tokenCount(col("text")), "   ") == 0)
    assert(one[Int](TextFunctions.tokenCount(col("text")), "") == 0)
  }

  test("bpeTokenCount splits letter/digit/punct runs") {
    assert(one[Int](TextFunctions.bpeTokenCount(col("text")), "ab12,cd!") == 5)
  }

  test("punctCount counts non-alnum non-space") {
    assert(one[Int](TextFunctions.punctCount(col("text")), "a,b.c!") == 3)
  }

  test("vertical tab \\x0B is punctuation, matching RE2's \\s (DuckDB oracle parity)") {
    // Java-regex \s includes \x0B, RE2's does not: the Spark side must
    // use the RE2 whitespace set or n_punct/n_bpe_tokens diverge
    assert(one[Int](TextFunctions.punctCount(col("text")), "ab") == 1)
    assert(one[Int](TextFunctions.bpeTokenCount(col("text")), "ab") == 3)
    // the real whitespace set still doesn't count
    assert(one[Int](TextFunctions.punctCount(col("text")), "a b\tc\nd\fe\rf") == 0)
  }

  test("stopwordCount counts occurrences (not distinct)") {
    assert(one[Int](TextFunctions.stopwordCount(col("text")), "the cat the dog") == 2)
  }

  test("qualityScoreBp bounded in [0, 10000]") {
    val df = Tables("documents").select(TextFunctions.qualityScoreBp(col("text")).as("s"))
    val mm = df.agg(min("s"), max("s")).collect()(0)
    assert(mm.getLong(0) >= 0 && mm.getLong(1) <= 10000)
  }

  test("langId picks marker-majority language, en on all-ties") {
    assert(one[String](TextFunctions.langId(col("text")), "der hund und die katze ist") == "de")
    assert(one[String](TextFunctions.langId(col("text")), "xyz qqq") == "en")
    assert(one[String](TextFunctions.langId(col("text")), "le chat est une belle la") == "fr")
  }

  private def Tables(n: String) = graft.Tables.load(spark, sf, n)
}
