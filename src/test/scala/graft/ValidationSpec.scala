package graft

import graft.operators.Validation
import graft.operators.Validation._
import org.apache.spark.sql.types.{DoubleType, StringType}

/** Semantics of the expectation suite — mirrors the reference's
  * DataValidator contract (reference scripts/glue_transform/transform.py:51-118):
  * inclusive between bounds, nulls PASS between but FAIL not_null, strict
  * row-count, and the exact report structure.
  */
class ValidationSpec extends SparkSpec {

  import spark.implicits._

  private def df = Seq(
    ("a", Some(10.0)), ("b", Some(100.0)), ("c", None), (null, Some(50.0))
  ).toDF("name", "temp")

  test("not_null counts nulls; between passes nulls (3-valued logic)") {
    val r = Validation.validate(df, "t", Seq(NotNull("name"), NotNull("temp"),
      Between("temp", 0, 60), RowCountGreaterThan(0)))
    assert(r.dataset == "t")
    assert(r.expectationsEvaluated == 4)
    val byType = r.results.groupBy(_.expectationType)
    val nn = byType("expect_column_values_to_not_be_null")
    assert(nn.map(_.details("null_count")) == Seq(1L, 1L))
    assert(nn.forall(!_.success))
    // 100.0 is out of [0,60]; the NULL temp row is NOT counted out-of-range
    val bt = byType("expect_column_values_to_be_between").head
    assert(bt.details("out_of_range_count") == 1L)
    assert(!bt.success)
    assert(byType("expect_table_row_count_to_be_greater_than").head.success)
    assert(r.expectationsPassed == 1 && r.expectationsFailed == 3 && !r.success)
  }

  test("between bounds are inclusive") {
    val d = Seq(0.0, 60.0, 60.000001).toDF("temp")
    val r = Validation.validate(d, "t", Seq(Between("temp", 0, 60)))
    assert(r.results.head.details("out_of_range_count") == 1L)
  }

  test("row count strict greater-than and empty-relation behavior") {
    val d = Seq.empty[Double].toDF("temp")
    val r = Validation.validate(d, "t",
      Seq(RowCountGreaterThan(0), Between("temp", 0, 1), NotNull("temp")))
    assert(!r.results.head.success)             // 0 > 0 is false
    assert(r.results(1).success)                // no rows out of range
    assert(r.results(2).success)                // no null rows
  }

  test("unique: duplicates counted on non-null values; in_set: nulls pass") {
    val d = Seq(
      (Some("a"), "view"), (Some("a"), "click"), (Some("b"), "bogus"),
      (None, "view"), (None, null.asInstanceOf[String]))
      .toDF("k", "ev")
    val r = Validation.validate(d, "t",
      Seq(Unique("k"), InSet("ev", Seq("view", "click"))))
    val uq = r.results.find(_.expectationType == "expect_column_values_to_be_unique").get
    // non-null k values: a, a, b -> 2 distinct of 3 -> 1 duplicate
    assert(!uq.success)
    assert(uq.details("distinct_count") == 2L && uq.details("non_null_count") == 3L
      && uq.details("duplicate_count") == 1L)
    val is = r.results.find(_.expectationType == "expect_column_values_to_be_in_set").get
    // 'bogus' is unexpected; the NULL ev passes (3-valued, like between)
    assert(!is.success && is.details("unexpected_count") == 1L)
    // a clean column passes both
    val ok = Validation.validate(d.filter($"ev" === "view" || $"ev" === "click")
      .withColumn("k2",
        org.apache.spark.sql.functions.monotonically_increasing_id()), "t2",
      Seq(Unique("k2"), InSet("ev", Seq("view", "click"))))
    assert(ok.success)
  }

  test("of_type is a schema-only check (declared but unimplemented in reference)") {
    val r = Validation.validate(df, "t",
      Seq(OfType("temp", DoubleType), OfType("name", DoubleType), OfType("missing", StringType)))
    assert(r.results.map(_.success) == Seq(true, false, false))
  }

  test("reference suites have the documented shapes") {
    assert(Validation.weatherSuite.size == 6) // 3 not_null + 2 between + row_count
    assert(Validation.iotSuite.size == 9)     // 4 not_null + 4 between + row_count
  }

  test("referential integrity: orphans counted, null child keys pass") {
    import spark.implicits._
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val child = Seq(Some(1L), Some(1L), Some(2L), Some(9L), Some(9L), Some(8L), None)
      .toDF("fk")
    val r = Validation.referentialIntegrity(child, "fk", parent, "pk").collect().head
    assert(r.getAs[Long]("total_rows") == 7L)
    assert(r.getAs[Long]("null_keys") == 1L)   // 3-valued logic: null passes
    assert(r.getAs[Long]("orphan_rows") == 3L) // 9, 9, 8
    assert(r.getAs[Long]("orphan_keys") == 2L) // {9, 8}
    assert(!r.getAs[Boolean]("success"))
    val ok = Validation.referentialIntegrity(
      child.filter($"fk".isNull || $"fk" < 4), "fk", parent, "pk").collect().head
    assert(ok.getAs[Boolean]("success") && ok.getAs[Long]("orphan_rows") == 0L)
  }
}
