package graft

import graft.functions.{GraftFunctions, RollingHash}
import graft.operators.TextAnalysis
import graft.sources.Tables
import org.apache.spark.sql.functions._

class TextSpec extends SparkSpec {

  test("custom RollingHash expression equals the composed-builtin HOF twin") {
    val docs = Tables.table(spark, sf, "documents")
    val both = docs.select(
      GraftFunctions.rolling_hash(TextAnalysis.normalized(col("text"))).as("custom"),
      TextAnalysis.fingerprintHof(col("text")).as("hof"))
    assert(both.filter(col("custom") =!= col("hof")).count() == 0)
  }

  test("RollingHash interpreted eval equals codegen path") {
    import spark.implicits._
    val df = Seq("hello world", "", "a", "zz 99").toDF("s")
    // codegen
    val cg = df.select(GraftFunctions.rolling_hash(col("s"))).collect().map(_.getLong(0))
    // interpreted (direct eval)
    val exp = Seq("hello world", "", "a", "zz 99").map { s =>
      s.foldLeft(0L)((h, c) => (h * 31 + c) % 1000000007L)
    }
    assert(cg.toSeq == exp)
  }

  test("SQL registration works") {
    GraftFunctions.register(spark)
    import spark.implicits._
    Seq("abc").toDF("s").createOrReplaceTempView("t_rh")
    val v = spark.sql("SELECT graft_rolling_hash(s) AS h FROM t_rh").head().getLong(0)
    assert(v == "abc".foldLeft(0L)((h, c) => (h * 31 + c) % 1000000007L))
  }

  test("language-ID is deterministic and prefers zh on CJK content") {
    import spark.implicits._
    val df = Seq(
      (1L, "the cat and the dog is in a house"),
      (2L, "der hund und die katze ist ein tier"),
      (3L, "el perro y la casa es un animal"),
      (4L, "le chien et les chats est un animal"),
      (5L, "你好 世界")).toDF("doc_id", "text")
    val got = TextAnalysis.withLangId(df, col("text"))
      .select(col("doc_id"), col("pred_lang")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "en", 2L -> "de", 3L -> "es", 4L -> "fr", 5L -> "zh"))
  }

  test("quality metrics handle edge shapes") {
    import spark.implicits._
    val df = Seq("one", "a b c", "x,y. z!").toDF("text")
    val rows = df.select(TextAnalysis.qualityProjection(col("text")): _*).collect()
    assert(rows(0).getInt(1) == 1)                 // one token
    assert(rows(1).getInt(1) == 3)
    assert(rows(2).getDouble(2) > 0)               // punct ratio
  }
}
