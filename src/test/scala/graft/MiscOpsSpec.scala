package graft

import graft.operators.{CorpusOps, Intervals, StringSimilarity}
import org.apache.spark.sql.functions._

/** Truth-table and invariance tests for the sweep-line, edit-distance
  * join, and weighted-sample operators. */
class MiscOpsSpec extends SparkSpec {

  test("maxConcurrency matches brute-force on random intervals, any partitioning") {
    import spark.implicits._
    // deterministic pseudo-random intervals with heavy overlap
    val rows = (0 until 400).map { i =>
      val g = s"g${i % 3}"
      val s0 = (i * 2654435761L) % 997
      (g, s0, s0 + 1 + (i * 40503L) % 50)
    }
    val df = rows.toDF("g", "s", "e")
    // brute force: concurrency at start point t = count of intervals
    // [s,e) containing t; peak is attained at some start point
    val expected = rows.groupBy(_._1).map { case (g, rs) =>
      g -> rs.map { case (_, t, _) =>
        rs.count { case (_, s0, e0) => s0 <= t && t < e0 }
      }.max.toLong
    }
    for (parts <- Seq(1, 3, 7)) {
      val got = Intervals.maxConcurrency(df.repartition(parts), col("g"), col("s"), col("e"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == expected, s"at $parts partitions")
    }
  }

  test("maxConcurrency half-open semantics: touching intervals do not stack") {
    import spark.implicits._
    val df = Seq(("a", 0L, 10L), ("a", 10L, 20L), ("a", 20L, 30L)).toDF("g", "s", "e")
    val got = Intervals.maxConcurrency(df, col("g"), col("s"), col("e")).head()
    assert(got.getLong(1) == 1L, "[0,10) and [10,20) must not overlap")
  }

  test("editDistanceSelfJoin equals brute force: substitution, insert, delete, unicode") {
    import spark.implicits._
    val names = Seq(
      "kitten", "sitten", "sittin", // substitution chain
      "kitte", "kittens", // delete / insert from kitten
      "café", "cafe", "cafés", // unicode substitution + insert
      "", "a", // empty-string edge
      "totally-different")
    val df = names.zipWithIndex.map { case (n, i) => (i.toLong, n) }.toDF("id", "s")
    for (tau <- Seq(1, 2)) {
      val got = StringSimilarity.editDistanceSelfJoin(df, col("id"), col("s"), tau)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val brute = (for {
        (a, i) <- names.zipWithIndex; (b, j) <- names.zipWithIndex if i < j
        d = levDist(a, b) if d <= tau
      } yield (i.toLong, j.toLong, d)).toSet
      assert(got == brute, s"tau=$tau")
    }
  }

  test("editDistanceSelfJoin signature volume is linear, never all-pairs") {
    import spark.implicits._
    // 200 ids, pairwise distance ≥ 2 apart except planted neighbors —
    // candidate pairs must stay near the true-pair count, not n²/2
    val df = (0 until 200).map(i => (i.toLong, f"item-$i%05d")).toDF("id", "s")
    val out = StringSimilarity.editDistanceSelfJoin(df, col("id"), col("s"), 1)
    val truePairs = out.count()
    // true pairs: ids differing in one digit position (zero-padded) —
    // brute force the expectation
    val brute = (for {
      i <- 0 until 200; j <- (i + 1) until 200
      if levDist(f"item-$i%05d", f"item-$j%05d") <= 1
    } yield 1).size
    assert(truePairs == brute)
  }

  test("weightedTopKSample is the exact A-ES top-k and partitioning-invariant") {
    import spark.implicits._
    val df = (1 to 300).map(i => (i.toLong, (i % 37) + 1)).toDF("doc_id", "w")
    val ref = CorpusOps.weightedTopKSample(df, col("doc_id"), col("w"), 25)
      .collect().map(_.getLong(0)).toSet
    assert(ref.size == 25)
    val re = CorpusOps.weightedTopKSample(df.repartition(7), col("doc_id"), col("w"), 25)
      .collect().map(_.getLong(0)).toSet
    assert(re == ref, "sample must not depend on partitioning")
    // heavier rows must be overrepresented vs a uniform draw: mean
    // weight of the sample strictly above the population mean
    val all = (1 to 300).map(i => (i % 37) + 1)
    val sampleMean = all.zipWithIndex.collect { case (w, i) if ref(i + 1L) => w }.sum / 25.0
    assert(sampleMean > all.sum.toDouble / all.size)
  }

  test("forwardFillGrid densifies, carries last value, flags gaps") {
    import spark.implicits._
    // key a: days 10..15 with observations at 10,11,14 (double gap 12-13,
    // gap 15 absent because grid ends at the LAST observation);
    // key b: single observation (degenerate 1-day grid)
    val daily = Seq(("a", 10L, 1.0), ("a", 11L, 2.0), ("a", 14L, 5.0), ("b", 99L, 7.0))
      .toDF("k", "day", "v")
    val got = Intervals.forwardFillGrid(daily, "k", "day", "v")
      .select("k", "day", "v_filled", "is_gap")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
      .toSet
    val expected = Set(
      ("a", 10L, 1.0, false), ("a", 11L, 2.0, false),
      ("a", 12L, 2.0, true), ("a", 13L, 2.0, true),
      ("a", 14L, 5.0, false), ("b", 99L, 7.0, false))
    assert(got == expected)
  }

  test("CmsEstimate: probe never undercounts and is reachable from SQL") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    // heavy skew: key 7 dominates — exactly where CMS collisions land
    val items = ((1 to 5000).map(_ => 7L) ++ (1 to 2000).map(i => (i % 400).toLong))
      .toDF("x")
    items.createOrReplaceTempView("cms_items")
    val checked = spark.sql(
      """WITH sk AS (SELECT count_min_sketch(x, 0.01d, 0.95d, 1) AS s FROM cms_items),
        |exact AS (SELECT x, count(*) AS c FROM cms_items GROUP BY x)
        |SELECT exact.x, c, graft_cms_estimate(sk.s, exact.x) AS est
        |FROM exact, sk""".stripMargin)
    val rows = checked.collect()
    assert(rows.length == 400) // keys 0..399; the hot key 7 is one of them
    assert(rows.forall(r => r.getLong(2) >= r.getLong(1)),
      "count-min must never undercount")
    // the hot key has no heavier colliders: its estimate is exact
    val hot = rows.find(_.getLong(0) == 7L).get
    assert(hot.getLong(2) >= 5000L)
  }

  test("sliding window() assignment equals explicit two-shifted-tumbling arithmetic") {
    val e = graft.sources.Tables.table(spark, sf, "events")
      .select(expr("ts div 1000").as("tus"), col("value"))
    // Spark's window(): 10-minute windows sliding every 5
    val viaWindow = e
      .withColumn("t", expr("timestamp_micros(tus)"))
      .groupBy(window(col("t"), "10 minutes", "5 minutes").as("w"))
      .agg(count(lit(1)).as("n"))
      .select(unix_micros(col("w.start")).as("wstart"), col("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the oracle arithmetic: each event in windows floor(t/slide)*slide - k·slide
    val manual = e
      .select(explode(expr(
        "array((tus div 300000000) * 300000000, (tus div 300000000) * 300000000 - 300000000)")).as("wstart"))
      .groupBy("wstart").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaWindow == manual)
    assert(viaWindow.values.sum == 2 * e.count())
  }

  test("rolling z-score matches a driver-side replication of the same formula") {
    import spark.implicits._
    val rows = Seq( // one user, ts strictly increasing, values with a spike
      (1L, 100L, 10.0), (2L, 200L, 12.0), (3L, 300L, 11.0), (4L, 400L, 13.0),
      (5L, 500L, 12.0), (6L, 600L, 95.0), (7L, 700L, 11.5), (8L, 800L, 12.5))
    val df = rows.map { case (id, t, v) => (id, t * 1000, 7L, v) }
      .toDF("event_id", "ts", "user_id", "value")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(expr("ts div 1000"), col("event_id"))
      .rowsBetween(-9, 0)
    val dec = col("value").cast("decimal(18,2)")
    val got = df
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("s", sum(dec).over(w).cast("double"))
      .withColumn("ssq", sum(dec * dec).over(w).cast("double"))
      .select(col("event_id"), col("n"),
        when(col("n") >= 5 &&
            (col("ssq") - col("s") * col("s") / col("n")) / (col("n") - 1) > 0,
          (col("value") - col("s") / col("n")) /
            sqrt((col("ssq") - col("s") * col("s") / col("n")) / (col("n") - 1)))
          .as("z"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    rows.indices.foreach { i =>
      val frame = rows.slice(math.max(0, i - 9), i + 1).map(_._3)
      val n = frame.length
      val s = frame.map(BigDecimal(_)).sum.toDouble
      val ssq = frame.map(v => BigDecimal(v) * BigDecimal(v)).sum.toDouble
      val varv = (ssq - s * s / n) / (n - 1)
      val expect =
        if (n >= 5 && varv > 0) Some((rows(i)._3 - s / n) / math.sqrt(varv)) else None
      assert(got(rows(i)._1) == ((n.toLong, expect)), s"event ${rows(i)._1}")
    }
    // the spike (id 6) must be flagged as a strong positive outlier
    assert(got(6L)._2.get > 2.0)
  }

  test("spatial radius join equals brute force, each pair found once") {
    import graft.operators.Spatial
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    for (trial <- 0 until 3) {
      val pts = (0 until 300).map(i => (i.toLong, rnd.nextDouble(), rnd.nextDouble()))
      val r = Seq(0.03, 0.1, 0.45)(trial) // incl. r near domain scale
      val got = Spatial.radiusSelfJoin(pts.toDF("pid", "x", "y"),
          col("pid"), col("x"), col("y"), r)
        .collect().map(row => (row.getLong(0), row.getLong(1)))
      assert(got.length == got.distinct.length, s"trial $trial: duplicate pairs")
      val expect = (for {
        a <- pts; b <- pts if a._1 < b._1
        d2 = (a._2 - b._2) * (a._2 - b._2) + (a._3 - b._3) * (a._3 - b._3)
        if d2 <= r * r
      } yield (a._1, b._1)).toSet
      assert(got.toSet == expect, s"trial $trial")
      assert(expect.nonEmpty)
    }
  }

  test("dbscan: core/border/noise roles, min-label borders, brute-force equality") {
    import graft.operators.Spatial
    import spark.implicits._
    // blob A (ids 1-4): mutual distances <= 0.1 -> all core at minPts=3;
    // id 5 sits within eps of ONLY id 4 (one core neighbor) -> border;
    // blob B (ids 10-13) a second cluster; id 20 isolated -> noise;
    // id 6 within eps of borders only (id 5) -> still noise (DBSCAN:
    // border points do not propagate density)
    val pts = Seq(
      (1L, 0.10, 0.10), (2L, 0.15, 0.10), (3L, 0.10, 0.15), (4L, 0.15, 0.15),
      (5L, 0.24, 0.15),                    // 0.09 from 4; >0.1 from 1,2,3
      (6L, 0.33, 0.15),                    // 0.09 from 5 only
      (10L, 0.70, 0.70), (11L, 0.75, 0.70), (12L, 0.70, 0.75), (13L, 0.75, 0.75),
      (20L, 0.50, 0.95)
    ).toDF("pid", "x", "y")
    val got = Spatial.dbscan(pts, col("pid"), col("x"), col("y"),
        eps = 0.1, minPts = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), Option(r.get(2)).map(_.asInstanceOf[Long]))).toMap
    assert(got == Map(
      1L -> ("core", Some(1L)), 2L -> ("core", Some(1L)),
      3L -> ("core", Some(1L)), 4L -> ("core", Some(1L)),
      5L -> ("border", Some(1L)), 6L -> ("noise", None),
      10L -> ("core", Some(10L)), 11L -> ("core", Some(10L)),
      12L -> ("core", Some(10L)), 13L -> ("core", Some(10L)),
      20L -> ("noise", None)), s"got $got")
    // random cloud: roles equal a driver-side brute-force DBSCAN
    val rnd = new scala.util.Random(11)
    val cloud = (0 until 200).map(i => (i.toLong, rnd.nextDouble(), rnd.nextDouble()))
    val (eps, minPts) = (0.08, 4)
    val n = cloud.map { case (i, xi, yi) =>
      i -> cloud.count { case (j, xj, yj) =>
        j != i && (xi - xj) * (xi - xj) + (yi - yj) * (yi - yj) <= eps * eps }
    }.toMap
    val coreSet = cloud.map(_._1).filter(n(_) >= minPts).toSet
    val gotCloud = Spatial.dbscan(cloud.toDF("pid", "x", "y"),
        col("pid"), col("x"), col("y"), eps, minPts)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(cloud.forall { case (i, _, _) =>
      (gotCloud(i) == "core") == coreSet.contains(i) })
    assert(Seq("core", "border", "noise").forall(r => gotCloud.values.exists(_ == r)))
  }

  test("trendSlope recovers an exact line, nulls degenerate groups") {
    import graft.operators.Intervals
    import spark.implicits._
    val rows = Seq(
      (1L, 0L, 1.0), (1L, 3600000000L, 3.0), (1L, 7200000000L, 5.0), // y = 2/hr
      (2L, 100L, 4.0), (2L, 100L, 9.0),                              // zero x-variance
      (3L, 42L, 7.0))                                                // single point
    val got = Intervals.trendSlope(rows.toDF("k", "x", "y"),
        col("k"), col("x"), col("y"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    assert(got(1L) == ((3L, Some(2.0))))
    assert(got(2L) == ((2L, None)))
    assert(got(3L) == ((1L, None)))
  }

  test("cooccurrence PMI: always-together pair positive, never-together absent") {
    import graft.operators.CorpusOps
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma"), (2L, "alpha beta delta"),
      (3L, "alpha beta epsilon"), (4L, "gamma delta epsilon"))
    val r = CorpusOps.cooccurrencePmi(docs.toDF("doc_id", "text"),
        col("text"), col("doc_id"), vocab = 10)
      .collect().map(x => (x.getString(0), x.getString(1)) -> (x.getLong(2), x.getDouble(3))).toMap
    // alpha+beta co-occur in all 3 of their docs: pmi = ln(3*4/(3*3)) = ln(4/3)
    assert(r(("alpha", "beta"))._1 == 3L)
    assert(math.abs(r(("alpha", "beta"))._2 - math.log(4.0 / 3)) < 1e-6)
    // alpha and gamma share exactly one doc: ln(1*4/(3*2)) < 0
    assert(r(("alpha", "gamma"))._2 < 0)
    // beta and gamma co-occur once; beta+epsilon once; no phantom pairs
    assert(!r.contains(("beta", "zeta")))
  }

  test("lastTouchAttribution matches brute force incl. same-instant and tie cases") {
    import spark.implicits._
    // deterministic events with timestamp collisions: several clicks
    // can share (user, us), clicks can coincide with purchases
    val evs = (0 until 300).map { i =>
      val user = s"u${i % 7}"
      val us = ((i * 37) % 40).toLong * 10 // heavy collisions
      val typ = if (i % 3 == 0) "purchase" else if (i % 3 == 1) "click" else "view"
      (i.toLong, user, us, typ)
    }
    val df = evs.toDF("event_id", "user_id", "us", "event_type")
    val windowUs = 100L
    val expected = evs.filter(_._4 == "purchase").map { case (pe, u, pus, _) =>
      val cands = evs.filter { case (_, cu, cus, ct) =>
        ct == "click" && cu == u && cus <= pus && cus >= pus - windowUs
      }
      if (cands.isEmpty) (pe, u, pus, None, None, None)
      else {
        val maxUs = cands.map(_._3).max
        val eid = cands.filter(_._3 == maxUs).map(_._1).min
        (pe, u, pus, Some(eid), Some(maxUs), Some(pus - maxUs))
      }
    }.toSet
    for (parts <- Seq(1, 5)) {
      val got = Intervals.lastTouchAttribution(df.repartition(parts),
          col("user_id"), col("us"), col("event_id"), col("event_type"),
          "click", "purchase", windowUs)
        .collect().map { r =>
          (r.getLong(0), r.getString(1), r.getLong(2),
            if (r.isNullAt(3)) None else Some(r.getLong(3)),
            if (r.isNullAt(4)) None else Some(r.getLong(4)),
            if (r.isNullAt(5)) None else Some(r.getLong(5)))
        }.toSet
      assert(got == expected, s"at $parts partitions")
    }
  }

  test("markovTransitions matches brute force; ppm rows sum to ~1e6 per prev") {
    import spark.implicits._
    val evs = (0 until 200).map { i =>
      (i.toLong, s"u${i % 5}", ((i * 13) % 30).toLong, s"t${(i * 7) % 4}")
    }
    val df = evs.toDF("event_id", "user_id", "us", "event_type")
    // brute force: per user sort by (us, event_id), adjacent pairs
    val pairs = evs.groupBy(_._2).values.flatMap { rs =>
      rs.sortBy(r => (r._3, r._1)).sliding(2).collect {
        case Seq(a, b) => (a._4, b._4)
      }
    }.toSeq
    val exp = pairs.groupBy(identity).map { case ((p, n), xs) =>
      (p, n) -> xs.size.toLong
    }
    val expTot = pairs.groupBy(_._1).map { case (p, xs) => p -> xs.size.toLong }
    val got = Intervals.markovTransitions(df.repartition(3),
        col("user_id"), col("us"), col("event_id"), col("event_type"))
      .collect().map(r =>
        (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got.map(r => (r._1, r._2) -> r._3).toMap == exp)
    got.foreach { case (p, _, n, ppm) =>
      assert(ppm == n * 1000000L / expTot(p))
    }
    // row-normalization closes: per prev, ppm sums within |row| of 1e6
    got.groupBy(_._1).foreach { case (p, rows) =>
      val s = rows.map(_._4).sum
      assert(s <= 1000000L && s > 1000000L - rows.size, s"prev=$p sum=$s")
    }
  }

  test("zipfFit recovers the generating exponent from a synthetic corpus") {
    import spark.implicits._
    for (s0 <- Seq(0.7, 1.0)) {
      val docs = (1 to 100).map { r =>
        val f = math.max(1, math.round(20000.0 / math.pow(r, s0)).toInt)
        (r.toLong, Seq.fill(f)(f"tok$r%03d").mkString(" "))
      }.toDF("id", "t")
      val row = CorpusOps.zipfFit(docs, col("t"), topK = 100).head()
      assert(row.getLong(0) == 100L)
      val fitted = row.getDouble(1)
      assert(math.abs(fitted - s0) < 0.02, s"s=$s0 fitted=$fitted")
    }
  }

  test("CmsInnerProduct: parse invariants, never undercounts, rejects seed mismatch") {
    import spark.implicits._
    import graft.functions.CmsInnerProduct
    val a = (0 until 500).map(i => (i % 37).toLong).toDF("k")
    val b = (0 until 300).map(i => (i % 23).toLong).toDF("k")
    def sketch(df: org.apache.spark.sql.DataFrame, seed: Int): Array[Byte] =
      df.agg(expr(s"count_min_sketch(k, 0.05d, 0.9d, $seed)")).head().getAs[Array[Byte]](0)
    val (sa, sb) = (sketch(a, 7), sketch(b, 7))
    // structural invariant of the V1 format: every row sums to totalCount
    for (bytes <- Seq(sa, sb)) {
      val p = CmsInnerProduct.parse(bytes)
      assert(p.table.length == p.depth && p.table.forall(_.length == p.width))
      p.table.foreach(row => assert(row.sum == p.totalCount))
    }
    assert(CmsInnerProduct.parse(sa).totalCount == 500L)
    // estimator: >= exact inner product, <= N_a*N_b (trivial cap)
    val exact = (0L until 37L).map(k => 500L / 37 + (if (k < 500 % 37) 1 else 0))
      .zipWithIndex.map { case (fa, k) =>
        val fb = if (k < 23) 300L / 23 + (if (k < 300 % 23) 1 else 0) else 0L
        fa * fb
      }.sum
    val est = a.agg(expr("count_min_sketch(k, 0.05d, 0.9d, 7)").as("sa"))
      .join(b.agg(expr("count_min_sketch(k, 0.05d, 0.9d, 7)").as("sb")), lit(true))
      .select(CmsInnerProduct.innerProduct(col("sa"), col("sb")).as("e"))
      .head().getLong(0)
    assert(est >= exact && est <= 500L * 300L, s"est=$est exact=$exact")
    // different seeds → different hashA → typed failure, not a silent estimate
    val sc = sketch(b, 8)
    val err = intercept[Exception] {
      CmsInnerProduct(
        org.apache.spark.sql.catalyst.expressions.Literal.create(sa,
          org.apache.spark.sql.types.BinaryType),
        org.apache.spark.sql.catalyst.expressions.Literal.create(sc,
          org.apache.spark.sql.types.BinaryType)).eval(null)
    }
    assert(err.getMessage.contains("different"))
  }

  test("basket_part_pairs matches driver-side brute force at sf0.001") {
    val got = SparkEntry.queries("basket_part_pairs")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // brute force: per order, all distinct-part pairs; exact integer lift
    val items = graft.sources.Tables.table(spark, sf, "lineitem")
      .select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).distinct
    val nOrders = items.map(_._1).distinct.length.toLong
    val partFreq = items.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val pairCounts = items.groupBy(_._1).values.flatMap { basket =>
      val ps = basket.map(_._2).sorted
      for (i <- ps.indices; j <- i + 1 until ps.length) yield (ps(i), ps(j))
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val expect = pairCounts.toSeq.map { case ((a, b), n) =>
      (a, b, n, n * nOrders * 1000000L / (partFreq(a) * partFreq(b)))
    }.sortBy { case (a, b, n, _) => (-n, a, b) }.take(100)
    assert(got.toSeq == expect)
  }

  test("events_ohlc equals a driver-side brute-force bar build at smoke scale") {
    val got = Graft.query("events_ohlc")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getLong(6))).toMap
    val ev = graft.sources.Tables.table(spark, sf, "events")
      .select(col("event_type"), expr("ts div 1000").as("tus"), col("event_id"), col("value"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val expect = ev.groupBy { case (et, tus, _, _) => (et, tus / 86400000000L * 86400000000L) }
      .map { case (k, rs) =>
        val ordered = rs.sortBy { case (_, tus, id, _) => (tus, id) }
        k -> (ordered.head._4, rs.map(_._4).max, rs.map(_._4).min,
          ordered.last._4, rs.size.toLong)
      }
    assert(got == expect && got.nonEmpty)
  }

  private def levDist(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("join_asof_nearest equals the brute-force per-order argmin over both directions") {
    val got = Graft.query("join_asof_nearest")(spark, sf)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val ev = graft.sources.Tables.table(spark, sf, "events")
      .select(col("event_id"), col("user_id"), expr("ts div 1000").as("eus"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val ords = graft.sources.Tables.table(spark, sf, "orders")
      .select(col("o_orderkey"), col("o_custkey"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("ous"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byUser = ev.groupBy(_._2)
    val expect = ords.flatMap { case (ok, ck, ous) =>
      byUser.get(ck).map { es =>
        val best = es.minBy { case (eid, _, eus) =>
          (math.abs(eus - ous), if (eus <= ous) 0 else 1, eid)
        }
        ok -> (best._1, best._3 - ous)
      }
    }.toMap
    assert(got == expect)
    // testdata events all postdate their orders (forward-only picks),
    // so the direction and tie semantics get planted coverage below
    assert(got.nonEmpty && got.values.exists(_._2 > 0))
  }

  test("asofNearest direction and tie semantics on planted streams") {
    import spark.implicits._
    val probe = Seq(
      (1L, 10L, 100L), // backward 90 (dt -10) vs forward 115 (dt +15) → backward
      (2L, 10L, 112L), // backward 90 (-22) vs forward 115 (+3) → forward
      (3L, 10L, 105L), // equidistant 90/120? use planted: prev -15, next +10 → forward
      (4L, 20L, 50L),  // same-instant event → dt 0 backward
      (5L, 20L, 40L),  // only forward exists for this probe time
      (6L, 30L, 10L),  // key with no events → dropped
      (7L, 40L, 100L)  // |Δt| tie: 95 (-5) vs 105 (+5) → backward preferred
    ).toDF("pid", "uid", "t")
    val events = Seq(
      (901L, 10L, 90L), (902L, 10L, 115L), (903L, 10L, 120L),
      (911L, 20L, 50L), (912L, 20L, 55L),
      (921L, 40L, 95L), (922L, 40L, 105L),
      // event_id tie at the same instant: smallest id must win
      (931L, 40L, 95L)
    ).toDF("eid", "uid", "t")
    val got = graft.operators.Joins.asofNearest(
        probe, col("pid"), col("uid"), col("t"),
        events, col("eid"), col("uid"), col("t"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == Map(
      1L -> (901L, -10L),
      2L -> (902L, 3L),
      3L -> (902L, 10L),
      4L -> (911L, 0L),
      5L -> (911L, 10L),
      7L -> (921L, -5L)))
  }

  test("tfidfCosinePairs: exact cosine semantics on a planted corpus incl. hot-term drop") {
    import spark.implicits._
    // terms: docs 1 and 2 are identical bags; doc 3 shares only the hot
    // term 'h' (df 4/4 > 50% → dropped everywhere); doc 4 is disjoint
    val terms = Seq(
      (1L, "a"), (1L, "a"), (1L, "b"), (1L, "h"),
      (2L, "a"), (2L, "a"), (2L, "b"), (2L, "h"),
      (3L, "c"), (3L, "h"),
      (4L, "d"), (4L, "h")).toDF("doc_id", "t")
    val got = graft.operators.Similarity.tfidfCosinePairs(terms, threshold = 0.0)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    // only (1,2) share any surviving term; identical unit vectors → 1.0
    assert(got.keySet == Set((1L, 2L)), s"hot term must not create pairs: $got")
    assert(math.abs(got((1L, 2L)) - 1.0) < 2e-6)
    // with the cap lifted, 'h' survives with idf = log10(1) = 0: it
    // contributes ZERO score but its postings now materialize every
    // pair at cos 0.0 — exactly the df² candidate blowup the cap
    // exists to prevent (the scale rationale, pinned)
    val loose = graft.operators.Similarity
      .tfidfCosinePairs(terms, threshold = 0.0, maxDfPpm = 1000000L)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(loose.keySet == Set((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L)))
    assert(loose.count(_._2 == 0.0) == 5 && math.abs(loose((1L, 2L)) - 1.0) < 2e-6)
    // any positive threshold removes the zero-score pairs again
    val pos = graft.operators.Similarity
      .tfidfCosinePairs(terms, threshold = 0.1, maxDfPpm = 1000000L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pos == Set((1L, 2L)))
  }

  test("temperatureMix: exponent-smoothed weights, low-discrepancy prefix ratios") {
    import spark.implicits._
    // srcA 100 docs, srcB 400 docs; T=2 → p = √n → w_A = 500, w_B = 1000
    val df = ((1 to 100).map(i => (i.toLong, "A")) ++
      (101 to 500).map(i => (i.toLong, "B"))).toDF("id", "src")
    val mixed = CorpusOps.temperatureMix(df, col("src"), col("id"), temperature = 2.0)
      .select(col("id"), col("src"), col("pos"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(mixed.length == 500)
    // pos formula: (2rn−1)·10⁶ div (2w) with w_A=500, w_B=1000
    val wOf = Map("A" -> 500L, "B" -> 1000L)
    val rn = scala.collection.mutable.Map.empty[String, Long]
    mixed.sortBy(m => (m._2, m._1)).foreach { case (_, s, pos) =>
      val r = rn.getOrElse(s, 0L) + 1; rn(s) = r
      assert(pos == (2 * r - 1) * 1000000L / (2 * wOf(s)), s"$s rn=$r")
    }
    // low-discrepancy schedule: any prefix of the pos order carries
    // each source within 1 of its target density share
    val byPos = mixed.sortBy(m => (m._3, m._2))
    for (prefix <- Seq(50, 150, 300)) {
      val p = byPos.take(prefix)
      val maxPos = p.last._3
      for ((s, w) <- wOf) {
        val got = p.count(_._2 == s)
        val want = (maxPos * w / 1000000.0) + 0.5 // density w per 10⁶/w positions
        assert(math.abs(got - want) <= 1.5, s"prefix $prefix source $s: $got vs $want")
      }
    }
    // T→∞ approaches uniform: weights converge (here: equal at T=1000)
    val flat = CorpusOps.temperatureMix(df, col("src"), col("id"), temperature = 1000.0)
      .select(col("src"), col("pos")).collect().map(r => (r.getString(0), r.getLong(1)))
    val aMax = flat.filter(_._1 == "A").map(_._2).max
    val bMaxAt100 = flat.filter(_._1 == "B").map(_._2).sorted.apply(99)
    // first 100 of B span ~ the same pos range as all 100 of A
    assert(math.abs(aMax - bMaxAt100) < 20000, s"$aMax vs $bMaxAt100")
  }

  test("ksDrift equals the brute-force two-sample KS statistic in exact ppm") {
    val docs = graft.sources.Tables.table(spark, sf, "documents")
    val got = graft.operators.Curation.ksDrift(docs, col("source"), col("n_chars"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val rows = docs.select(col("source"), col("n_chars")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val n = rows.length
    val expect = rows.groupBy(_._1).map { case (g, inG) =>
      val s = inG.length; val r = n - s
      val inSet = inG.map(_._2).sorted
      val rest = rows.filter(_._1 != g).map(_._2).sorted
      val grid = rows.map(_._2).distinct.sorted
      val diff = grid.map { x =>
        val cg = BigInt(inSet.count(_ <= x)); val cr = BigInt(rest.count(_ <= x))
        (cg * r - cr * s).abs
      }.max
      g -> (s.toLong, (diff * 1000000 / (BigInt(s) * r)).toLong)
    }
    assert(got == expect)
    assert(got.values.exists(_._2 > 0), "fixture must show some drift")
  }

  test("entity_clusters equals a union-find over brute-force edit-distance pairs") {
    val cust = graft.sources.Tables.table(spark, sf, "customer")
    val got = Graft.query("entity_clusters")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val names = cust.select(col("c_custkey"), col("c_name"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    // brute-force pairs + union-find with min-id representatives
    val parent = scala.collection.mutable.Map(names.map(n => n._1 -> n._1): _*)
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      r
    }
    for (((ia, sa), i) <- names.zipWithIndex; (ib, sb) <- names.drop(i + 1)
         if levDist(sa, sb) <= 1) {
      val (ra, rb) = (find(ia), find(ib))
      if (ra != rb) { val lo = math.min(ra, rb); parent(math.max(ra, rb)) = lo }
    }
    val expect = names.map { case (id, _) => id -> find(id) }.toMap
    assert(got == expect)
    assert(expect.exists { case (id, rep) => id != rep },
      "fixture must contain at least one non-singleton entity")
  }

  test("saltedDistinctCount is exact for any bucket count incl. 1, with no Expand in the plan") {
    val li = graft.sources.Tables.table(spark, sf, "lineitem")
    val direct = li.groupBy(col("l_returnflag").as("k"))
      .agg(count_distinct(col("l_orderkey")).as("n_distinct"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for (b <- Seq(1, 7, 32)) {
      val got = graft.operators.Aggregates
        .saltedDistinctCount(li, col("l_returnflag"), col("l_orderkey"), b)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == direct, s"buckets=$b")
    }
    // the two-phase form must not fall back to Spark's Expand-based
    // distinct rewrite — partials are plain hash aggregates
    val plan = graft.operators.Aggregates
      .saltedDistinctCount(li, col("l_returnflag"), col("l_orderkey"), 8)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), plan.take(500))
  }

  test("withNanosTs canonicalizes both ts encodings to identical epoch-nanos longs") {
    import org.apache.spark.sql.functions._
    val tmp = java.nio.file.Files.createTempDirectory("graft_ts").toString
    // micros-NTZ encoding (the round-4 driver testdata shape)
    spark.range(3).select(col("id").as("event_id"),
        timestamp_micros(lit(1700000000000000L) + col("id") * 1500000L)
          .cast("timestamp_ntz").as("ts"))
      .write.mode("overwrite").parquet(s"$tmp/ntz")
    // epoch-nanos long encoding (the pre-round-4 nanosAsLong view)
    spark.range(3).select(col("id").as("event_id"),
        ((lit(1700000000000000L) + col("id") * 1500000L) * 1000L).as("ts"))
      .write.mode("overwrite").parquet(s"$tmp/longs")
    def canon(sub: String): Seq[(Long, Long)] =
      graft.sources.Tables.withNanosTs(spark.read.parquet(s"$tmp/$sub"))
        .select(col("event_id"), col("ts"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sortBy(_._1)
    val a = canon("ntz")
    val b = canon("longs")
    assert(a == b, s"$a vs $b")
    assert(a.head._2 == 1700000000000000L * 1000L)
    // a table with no ts column passes through untouched
    val plain = spark.range(2).toDF("x")
    assert(graft.sources.Tables.withNanosTs(plain).schema == plain.schema)
  }

  test("KmvAgg keeps the k smallest distinct values, any partitioning") {
    import spark.implicits._
    import graft.functions.KmvAgg.kmv
    // duplicated, shuffled values: distinct count 40, well above k=8
    val vals = (0 until 200).map(i => ((i * 7919L) % 40) * 13L + 5L)
    for (parts <- Seq(1, 7)) {
      val got = vals.toDF("x").repartition(parts)
        .agg(kmv(col("x"), 8).as("m")).head().getSeq[Long](0)
      val want = vals.distinct.sorted.take(8)
      assert(got == want, s"parts=$parts")
    }
    // fewer than k distinct → the sketch IS the exact distinct set
    val small = Seq(9L, 3L, 9L, 3L, 12L).toDF("x")
      .agg(kmv(col("x"), 8).as("m")).head().getSeq[Long](0)
    assert(small == Seq(3L, 9L, 12L))
  }

  test("KMV estimate is within 15% of exact on md5-hashed ids") {
    import spark.implicits._
    import graft.functions.KmvAgg.kmv
    val n = 5000
    val h = conv(substring(md5(col("id").cast("string")), 1, 12), 16, 10).cast("long")
    val mins = spark.range(n).select(h.as("h"))
      .agg(kmv(col("h"), 64).as("m")).head().getSeq[Long](0)
    assert(mins.size == 64)
    val est = 63L * 281474976710656L / mins.last
    assert(math.abs(est - n).toDouble / n < 0.15, s"est=$est exact=$n")
  }

  test("decontaminateSemantic flags exactly the above-threshold corpus docs") {
    import spark.implicits._
    import graft.operators.Similarity
    // eval = axis vectors e1, e2; corpus: near-e1 (contaminated),
    // orthogonal e3 (clean), diagonal at cos ~0.707 to both
    val eval = Seq((100L, Seq(1.0, 0.0, 0.0)), (101L, Seq(0.0, 1.0, 0.0)))
      .toDF("id", "v")
    val corpus = Seq(
      (1L, Seq(0.9, 0.1, 0.0)),  // cos to e1 ≈ 0.994 → dropped
      (2L, Seq(0.0, 0.0, 5.0)),  // orthogonal → kept
      (3L, Seq(1.0, 1.0, 0.0))   // cos ≈ 0.707 to both → dropped at 0.7
    ).toDF("id", "v")
    val got = Similarity.decontaminateSemantic(corpus, eval, col("v"), col("id"), 0.7)
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getInt(2)))).toMap
    assert(got(1L)._2 == 0 && got(3L)._2 == 0 && got(2L)._2 == 1)
    assert(got(2L)._1 == 0.0)
    assert(math.abs(got(3L)._1 - math.sqrt(0.5)) < 1e-6)
    // max is over ALL eval members, not the first
    assert(got(1L)._1 > 0.99)
  }

  test("sortedNeighborhoodJoin equals the brute-force window definition") {
    import spark.implicits._
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val names = Seq("anna", "anne", "annex", "bob", "bobby", "carol", "carl",
      "dave", "davy", "ed", "edd", "eddy", "zed")
    val rows = names.zipWithIndex.map { case (n, i) => (i.toLong + 1, n) }
    val df = rows.toDF("id", "name")
    val w = 3
    val tau = 2
    // brute force straight off the definition: global (name, id) order,
    // all pairs within w positions, exact distance filter
    val order = rows.sortBy { case (id, n) => (n, id) }
    val expect = (for {
      i <- order.indices
      j <- (i + 1) until math.min(i + w, order.size)
      d = lev(order(i)._2, order(j)._2)
      if d <= tau
    } yield (order(i)._1, order(j)._1, d)).toSet
    assert(expect.nonEmpty)
    val got = StringSimilarity.sortedNeighborhoodJoin(df, col("id"), col("name"), w, tau)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    // no duplicate candidates: the two-block replication meets each
    // qualifying pair exactly once
    assert(got.length == got.toSet.size)
    assert(got.toSet == expect)
    // rank is a property of the total order alone — partitioning must
    // not change the result
    for (parts <- Seq(1, 2, 7)) {
      val g2 = StringSimilarity.sortedNeighborhoodJoin(
        df.repartition(parts), col("id"), col("name"), w, tau)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(g2 == expect, s"parts=$parts")
    }
  }

  test("KMV sketch store: append-merge is lossless (≡ one-shot), empty delta is identity") {
    import spark.implicits._
    import graft.operators.SketchStore
    val ev = graft.sources.Tables.table(spark, sf, "events")
    val h = SketchStore.md5Hash48(col("user_id"))
    def sketchMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    val full = sketchMap(
      SketchStore.kmvSketches(ev, col("event_type"), h, 64).select("g", "mins"))
    val path = graft.sources.Tables.scratchDir("graft_kmv_spec")
    SketchStore.writeKmvSketches(
      ev.filter(col("event_id") % 3 === 0), col("event_type"), h, 64, path)
    SketchStore.appendToKmvSketches(path,
      ev.filter(col("event_id") % 3 =!= 0), col("event_type"), h)
    val merged = sketchMap(spark.read.parquet(path).select("g", "mins"))
    assert(merged == full) // the arrays, not just the estimates
    // empty delta: the store is unchanged
    SketchStore.appendToKmvSketches(path,
      ev.filter(lit(false)), col("event_type"), h)
    assert(sketchMap(spark.read.parquet(path).select("g", "mins")) == full)
    // a delta introducing a NEW group materializes it in the store
    val extra = Seq(("brand_new_type", 42L)).toDF("event_type", "user_id")
    SketchStore.appendToKmvSketches(path, extra, col("event_type"),
      SketchStore.md5Hash48(col("user_id")))
    val grown = sketchMap(spark.read.parquet(path).select("g", "mins"))
    assert(grown.keySet == full.keySet + "brand_new_type")
    assert(grown("brand_new_type").length == 1)
  }
}
