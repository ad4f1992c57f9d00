package graft

import graft.plans.ArgmaxRewrite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The injected optimizer rule: top-1-per-group row_number windows
  * become min_by/max_by aggregations — same rows, no WindowExec, partial
  * aggregation instead of a per-partition sort. */
class ArgmaxRewriteSpec extends SparkSpec {

  ArgmaxRewrite.install(spark)

  // groups of 3 with nulls, NaNs, and negative keys in play
  private def df: DataFrame = {
    import spark.implicits._
    Seq(
      (1L, Some(5.0), 10L, "a"), (1L, Some(1.0), 11L, "b"), (1L, None, 12L, "c"),
      (2L, Some(Double.NaN), 20L, "d"), (2L, Some(7.0), 21L, "e"), (2L, Some(-3.0), 22L, "f"),
      (3L, None, 30L, "g"), (3L, None, 31L, "h"), (3L, Some(0.0), 32L, "i"))
      .toDF("k", "score", "id", "tag")
  }

  private def top1(orderCols: org.apache.spark.sql.Column*): DataFrame =
    df.withColumn("rn", row_number().over(Window.partitionBy("k").orderBy(orderCols: _*)))
      .filter(col("rn") === 1)
      .drop("rn")

  // NOTE: plan inspection happens on the optimized LOGICAL plan — the
  // physical plan is an AdaptiveSparkPlanExec leaf under AQE, opaque to
  // exists(); no logical Window ⇒ no WindowExec either.
  private def hasWindow(q: DataFrame): Boolean =
    q.queryExecution.optimizedPlan.exists {
      case _: org.apache.spark.sql.catalyst.plans.logical.Window => true
      case _: org.apache.spark.sql.catalyst.plans.logical.WindowGroupLimit => true
      case _ => false
    }

  // queryExecution is lazy: DataFrames must be CONSTRUCTED AND INSPECTED
  // inside the conf scope, never carried across it
  private def withRule[A](on: Boolean)(body: => A): A = {
    spark.conf.set(ArgmaxRewrite.confKey, on.toString)
    try body finally spark.conf.unset(ArgmaxRewrite.confKey)
  }

  private def assertRewriteExact(q: => DataFrame): Unit = {
    val (gotWindow, gotAgg, got) = withRule(on = true) {
      val d = q
      (hasWindow(d),
        d.queryExecution.optimizedPlan.toString.contains("min_by") ||
          d.queryExecution.optimizedPlan.toString.contains("max_by"),
        d.collect().map(_.toString).sorted.toSeq)
    }
    val (ctlWindow, want) = withRule(on = false) {
      val d = q
      (hasWindow(d), d.collect().map(_.toString).sorted.toSeq)
    }
    assert(!gotWindow, "rewrite should eliminate the window")
    assert(gotAgg, "rewrite should plan an argmin/argmax aggregate")
    assert(ctlWindow, "control should keep the window")
    assert(got == want)
  }

  test("ascending row_number top-1 rewrites to min_by (nulls first, exact)") {
    assertRewriteExact(top1(col("score"), col("id")))
  }

  test("descending top-1 rewrites to max_by (NaN largest, nulls last, exact)") {
    assertRewriteExact(top1(col("score").desc, col("id").desc))
  }

  test("mixed direction with non-nullable integral desc key flips via BitwiseNot") {
    assertRewriteExact(top1(col("score"), col("id").desc))
  }

  test("residual filter conjuncts survive above the rewrite") {
    val q = df.withColumn("rn",
        row_number().over(Window.partitionBy("k").orderBy(col("id"))))
      .filter(col("rn") === 1 && col("tag") =!= "a")
      .drop("rn")
    withRule(on = true) {
      assert(!hasWindow(q))
      assert(q.collect().map(_.getString(3)).sorted.toSeq == Seq("d", "g"))
    }
  }

  test("bails on nullable descending double with non-default null ordering") {
    // desc NULLS FIRST over a nullable key has no exact min_by/max_by twin
    val q = top1(col("score").desc_nulls_first, col("id"))
    withRule(on = true)(assert(hasWindow(q)))
  }

  test("bails on global window (empty partition spec must keep 0-in-0-out)") {
    val q = df.withColumn("rn", row_number().over(Window.orderBy(col("id"))))
      .filter(col("rn") === 1).drop("rn")
    withRule(on = true)(assert(hasWindow(q)))
  }

  test("bails when rank > 1 rows are kept") {
    val q = df.withColumn("rn",
        row_number().over(Window.partitionBy("k").orderBy(col("id"))))
      .filter(col("rn") <= 2)
    withRule(on = true)(assert(hasWindow(q)))
  }

  test("SQL surface: plain-SQL top-1 subquery is rewritten too") {
    df.createOrReplaceTempView("argmax_t")
    val q = spark.sql(
      """SELECT k, id, tag FROM (
        |  SELECT *, row_number() OVER (PARTITION BY k ORDER BY id) AS rn
        |  FROM argmax_t) WHERE rn = 1""".stripMargin)
    withRule(on = true) {
      assert(!hasWindow(q))
      assert(q.collect().map(_.getLong(1)).sorted.toSeq == Seq(10L, 20L, 30L))
    }
  }
}
