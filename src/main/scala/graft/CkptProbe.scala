package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Debug probe: does Iterate.ckpt preserve the executed plan's output
  * partitioning through Bridge.checkpointedDf? */
object CkptProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-ckpt-probe")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = spark.range(100000)
      .select((col("id") % 1000).as("src"), (col("id") % 7).as("dst"))
      .groupBy("src").agg(count(lit(1)).as("n"))
    df.queryExecution.toRdd.count(): Unit
    println("origin executedPlan class: " + df.queryExecution.executedPlan.getClass.getName)
    println("origin outputPartitioning: " + df.queryExecution.executedPlan.outputPartitioning)
    val (out, _, _) = graft.operators.Iterate.ckpt(
      spark.range(100000)
        .select((col("id") % 1000).as("src"), (col("id") % 7).as("dst"))
        .groupBy("src").agg(count(lit(1)).as("n")))
    val leaf = out.queryExecution.optimizedPlan
    println("ckpt logical: " + leaf.getClass.getName)
    println("ckpt leaf: " + leaf)
    // physical partitioning the planner sees
    val phys = out.queryExecution.executedPlan
    println("ckpt physical partitioning: " + phys.outputPartitioning)
    spark.stop()
  }
}
