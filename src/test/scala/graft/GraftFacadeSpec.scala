package graft

class GraftFacadeSpec extends SparkSpec {

  test("registerViews exposes the SQL surface with oracle-compatible names") {
    Graft.configure(spark)
    Graft.registerViews(spark, sf)
    val r = spark.sql(
      """SELECT l_returnflag, count(*) AS n FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY l_returnflag""".stripMargin).collect()
    assert(r.length == 3 && r.map(_.getLong(1)).sum == 6000)
  }

  test("graft SQL functions are callable after configure") {
    Graft.configure(spark)
    val h = spark.sql("SELECT graft_rolling_hash('abc') AS h").head().getLong(0)
    assert(h == "abc".foldLeft(0L)((a, c) => (a * 31 + c) % 1000000007L))
    val d = spark.sql(
      "SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d").head().getDouble(0)
    assert(d == 11.0)
    // NFC normalization: decomposed e + U+0301 composes to U+00E9
    val nfc = spark.sql("SELECT graft_nfc('cafe\u0301') AS s").head().getString(0)
    assert(nfc == "caf\u00e9")
    // aggregates: simhash of a single token {h=3, w=1} sets exactly the
    // bits of 3; misra_gries over a skewed stream returns the hot key
    val sh = spark.sql(
      "SELECT graft_simhash(h, w) AS s FROM VALUES (3L, 1L) t(h, w)").head().getLong(0)
    assert(sh == 3L)
    val mg = spark.sql(
      """SELECT graft_misra_gries(x, 2) AS c
        |FROM VALUES (7L), (7L), (7L), (1L), (2L), (3L) t(x)""".stripMargin)
      .head().getSeq[Long](0)
    assert(mg.contains(7L))
    // wordpiece: default vocab greedy match; explicit vocab literal
    val wp = spark.sql("SELECT graft_wordpiece('tables') AS p").head().getSeq[String](0)
    assert(wp == Seq("table", "s"))
    val wp2 = spark.sql(
      "SELECT graft_wordpiece('abcab', array('ab', 'c')) AS p").head().getSeq[String](0)
    assert(wp2 == Seq("ab", "c", "ab"))
    // non-foldable vocab -> typed analysis error, not a runtime NPE
    val err = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_wordpiece('a', array(rand()::string)) AS p").collect()
    }
    assert(err.getCondition == "NON_FOLDABLE_ARGUMENT")
    // kmv: bottom-2 distinct values, ascending; duplicate 5 collapses
    val kv = spark.sql(
      """SELECT graft_kmv(x, 2) AS m
        |FROM VALUES (9L), (5L), (5L), (12L), (7L) t(x)""".stripMargin)
      .head().getSeq[Long](0)
    assert(kv == Seq(5L, 7L))
    val kerr = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_kmv(x, 0) AS m FROM VALUES (1L) t(x)").collect()
    }
    assert(kerr.getCondition == "INVALID_NUMERIC_LITERAL_RANGE")
  }

  test("graft_misra_gries k typing: INT and BIGINT literals work, bad k raises typed errors") {
    Graft.configure(spark)
    val src = "FROM VALUES (7L), (7L), (7L), (1L), (2L), (3L) t(x)"
    // BIGINT literal (and constant arithmetic) — the round-4 ADVICE nit:
    // this once hit an opaque cast error instead of resolving
    val big = spark.sql(s"SELECT graft_misra_gries(x, CAST(2 AS BIGINT)) AS c $src")
      .head().getSeq[Long](0)
    assert(big.contains(7L))
    val arith = spark.sql(s"SELECT graft_misra_gries(x, 1 + 1) AS c $src")
      .head().getSeq[Long](0)
    assert(arith.contains(7L))
    // non-foldable k -> typed analysis error, not a ClassCastException
    val nf = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql(s"SELECT graft_misra_gries(x, CAST(rand() * 4 AS INT)) AS c $src").collect()
    }
    assert(nf.getCondition == "NON_FOLDABLE_ARGUMENT", nf.getMessage)
    // out-of-range k -> typed range error
    val oor = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql(s"SELECT graft_misra_gries(x, 0) AS c $src").collect()
    }
    assert(oor.getCondition == "INVALID_NUMERIC_LITERAL_RANGE", oor.getMessage)
  }

  test("query lookup returns runnable operators") {
    assert(Graft.query("join_shuffle")(spark, sf).count() > 0)
  }
}
