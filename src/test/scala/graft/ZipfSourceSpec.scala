package graft

import graft.datagen.DataGen
import graft.plans.{ZipfMath, ZipfSource}
import org.apache.spark.sql.functions._

/** The native custom-operator stack (LogicalPlan → Strategy →
  * LeafExecNode) must agree exactly with the declarative, oracle-
  * verified generator. */
class ZipfSourceSpec extends SparkSpec {

  test("native Zipf source equals the declarative zipfTable row-for-row") {
    ZipfSource.install(spark)
    val native = ZipfSource.zipf(spark, 10000, 100, 0.9, numSlices = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val declarative = DataGen.zipfTable(spark, 10000, 100, 0.9)
      .select("rid", "key")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(native.length == 10000)
    assert(native.sameElements(declarative))
  }

  test("native source plans as the custom leaf with no shuffle") {
    ZipfSource.install(spark)
    val df = ZipfSource.zipf(spark, 1000, 50, 0.5)
    val plan = df.queryExecution.executedPlan.toString()
    // SparkPlan.nodeName strips the Exec suffix in rendered plans
    assert(plan.contains("ZipfSource"), s"strategy not applied:\n$plan")
    assert(!plan.contains("Exchange"))
  }

  test("binary-search key lookup matches cumulative-count semantics") {
    val cum = ZipfMath.cumCounts(1000, 10, 1.0)
    // rid 0 is always the hottest key (k=1)
    assert(ZipfMath.keyFor(cum, 0) == 1)
    // last rid maps to some valid key and every rid is covered
    assert((0 until 1000).forall { rid =>
      val k = ZipfMath.keyFor(cum, rid.toLong)
      k >= 1 && k <= 10 && cum(k.toInt) > rid && (k == 1 || cum(k.toInt - 1) <= rid)
    })
  }

  test("streaming O(1)-memory sweep equals the materialized-array path") {
    val (rows, n, s) = (10000L, 100L, 0.9)
    val cum = ZipfMath.cumCounts(rows, n, s)
    val viaArray = (0L until rows).map(rid => rid -> ZipfMath.keyFor(cum, rid))
    // full range and partition-shaped sub-ranges (incl. empty)
    assert(ZipfMath.emitRange(rows, n, s, 0, rows).toSeq == viaArray)
    for ((a, b) <- Seq((0L, 1L), (3333L, 6666L), (9999L, 10000L), (5000L, 5000L))) {
      assert(ZipfMath.emitRange(rows, n, s, a, b).toSeq ==
        viaArray.slice(a.toInt, b.toInt))
    }
  }

  test("composes with downstream operators (join + aggregate)") {
    ZipfSource.install(spark)
    val z = ZipfSource.zipf(spark, 5000, 100, 0.8)
    val l = DataGen.uniqueShuffled(spark, 100).select(col("key").as("lkey"))
    val joined = z.join(l, z("key") === col("lkey")).groupBy("key").count()
    assert(joined.count() > 0)
    // zipf keys are 1..100, left keys 0..99 → key 100 has no match
    val expected = 5000 - ZipfSource.zipf(spark, 5000, 100, 0.8)
      .filter(col("key") === 100).count()
    assert(joined.agg(sum("count")).head().getLong(0) == expected)
  }
}
