package graft

import graft.operators.Joins
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based join semantics (SURVEY §5 test plan): for arbitrary
  * key multisets, every strategy's cardinality equals
  * Σ_k cntL(k)·cntR(k), and all strategies agree row-for-row.
  * (Raw ScalaCheck generators with fixed seeds — the scalatest bridge
  * artifact is not on the offline classpath.) */
class JoinPropertySpec extends SparkSpec {

  private val keyList = Gen.listOfN(40, Gen.chooseNum(0, 12))
  private def sample(seed: Long): List[Int] =
    keyList.apply(Gen.Parameters.default, Seed(seed)).get

  test("join cardinality = sum of per-key count products, all strategies agree") {
    import spark.implicits._
    for (i <- 0 until 8) {
      val lk = sample(1000 + i)
      val rk = sample(2000 + i)
      val left = lk.zipWithIndex.map { case (k, j) => (k, s"l$j") }.toDF("k", "lv")
      val right = rk.zipWithIndex.map { case (k, j) => (k, s"r$j") }.toDF("k2", "rv")
      val expected = lk.groupBy(identity).map { case (k, ls) =>
        ls.size.toLong * rk.count(_ == k)
      }.sum

      val results = Seq(JoinStrategy.ShuffleHash, JoinStrategy.Broadcast,
        JoinStrategy.SortMerge, JoinStrategy.Auto).map { st =>
        Joins.equiJoin(left, right, col("k"), col("k2"), st)
          .select("k", "lv", "rv").collect().map(_.toSeq).toSet
      }
      assert(results.head.size.toLong == expected, s"iteration $i cardinality")
      assert(results.forall(_ == results.head), s"iteration $i: strategies disagree")
    }
  }

  test("salted join equals plain join on arbitrary data") {
    import spark.implicits._
    for (i <- 0 until 4) {
      val lk = sample(3000 + i)
      val rk = sample(4000 + i)
      val left = lk.zipWithIndex.map { case (k, j) => (k, s"l$j") }.toDF("k", "lv")
      val right = rk.distinct.map(k => (k, s"r$k")).toDF("k2", "rv")
      val plain = left.join(right, col("k") === col("k2"))
        .select("k", "lv", "rv").collect().map(_.toSeq).toSet
      val salted = Joins.saltedEquiJoin(left, right, col("k"), col("k2"), 4)
        .select("k", "lv", "rv").collect().map(_.toSeq).toSet
      assert(plain == salted, s"iteration $i")
    }
  }

  test("binned range join equals the nested-loop reference on arbitrary intervals") {
    import spark.implicits._
    val pointGen = Gen.listOfN(60, Gen.chooseNum(-100, 100))
    val rangeGen = Gen.listOfN(25, for {
      lo <- Gen.chooseNum(-110, 100); w <- Gen.chooseNum(0, 37)
    } yield (lo, lo + w))
    for (i <- 0 until 6; binWidth <- Seq(7L, 40L)) {
      val ps = pointGen.apply(Gen.Parameters.default, Seed(5000 + i)).get
      val rs = rangeGen.apply(Gen.Parameters.default, Seed(6000 + i)).get
      val points = ps.zipWithIndex.map { case (p, j) => (j.toLong, p) }.toDF("pid", "p")
      val ranges = rs.zipWithIndex.map { case ((lo, hi), j) => (j.toLong, lo, hi) }
        .toDF("rid", "lo", "hi")
      val binned = graft.operators.RangeJoin.pointInRange(
          points, ranges, col("p"), col("lo"), col("hi"), binWidth)
        .select("pid", "rid").collect().map(_.toSeq).toSet
      val reference = points.crossJoin(ranges)
        .filter(col("p") >= col("lo") && col("p") <= col("hi"))
        .select("pid", "rid").collect().map(_.toSeq).toSet
      assert(binned == reference, s"iteration $i binWidth=$binWidth")
    }
  }
}
