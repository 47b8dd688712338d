package graft

/** Tables cache hygiene: the memoized registration must notice when a
  * caller drops a temp view (the memo alone would skip re-registration
  * forever), and the load cache returns the identical plan object per
  * (session, dir, table).
  */
class TablesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("registerAll re-registers views a caller dropped") {
    graft.sources.Tables.registerAll(spark, dir)
    assert(spark.catalog.tableExists("nation"))
    spark.catalog.dropTempView("nation")
    assert(!spark.catalog.tableExists("nation"))
    // same (session, sfDir): a pure memo would skip; the existence check
    // must trigger re-registration
    graft.sources.Tables.registerAll(spark, dir)
    assert(spark.catalog.tableExists("nation"))
    assert(spark.table("nation").count() == 25)
  }

  test("load memoizes the lazy plan per (session, dir, table)") {
    val a = graft.sources.Tables.load(spark, dir, "region")
    val b = graft.sources.Tables.load(spark, dir, "region")
    assert(a eq b, "repeat load must return the cached DataFrame")
  }
}
