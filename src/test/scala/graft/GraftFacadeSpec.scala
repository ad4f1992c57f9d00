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
  }

  test("query lookup returns runnable operators") {
    assert(Graft.query("join_shuffle")(spark, sf).count() > 0)
  }
}
