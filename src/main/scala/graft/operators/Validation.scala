package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType

/** Great-Expectations-style data-quality suite, mirroring the reference's
  * `DataValidator` (reference scripts/glue_transform/transform.py:51-118)
  * and its `ExpectationResult` record (transform.py:36-48).
  *
  * Semantics preserved exactly:
  *  - `between` bounds are inclusive and NULLs pass (3-valued logic,
  *    transform.py:80-82); `not_null` catches nulls (transform.py:65-74).
  *  - Failure is observational: callers log and proceed
  *    (transform.py:165-167,227-228).
  *  - `expect_column_values_to_be_of_type` is declared but unimplemented in
  *    the reference (transform.py:57); here it is a schema-only check.
  *
  * Performance rewrite (SURVEY.md §2.6): the reference issues two Spark
  * actions per expectation (~18 full re-scans of uncached JSON per dataset,
  * transform.py:66-67,79-83,98). We compute the whole suite in ONE
  * `df.agg(...)` pass of conditional sums — a single scan regardless of how
  * many expectations are attached, which is what survives at 100 TB.
  */
object Validation {

  sealed trait Expectation {
    def expectationType: String
    /** Aggregate columns this expectation needs from the single pass. */
    private[operators] def aggs(idx: Int): Seq[Column]
    /** Build the result from the single agg row. */
    private[operators] def result(row: Row, offset: Int, total: Long): ExpectationResult
    private[operators] def arity: Int = 1
  }

  /** transform.py:65-74 */
  final case class NotNull(column: String) extends Expectation {
    val expectationType = "expect_column_values_to_not_be_null"
    private[operators] def aggs(idx: Int): Seq[Column] =
      Seq(sum(when(col(column).isNull, 1L).otherwise(0L)).as(s"e$idx"))
    private[operators] def result(row: Row, offset: Int, total: Long): ExpectationResult = {
      val nulls = if (row.isNullAt(offset)) 0L else row.getLong(offset)
      ExpectationResult(expectationType, nulls == 0L,
        Map("column" -> column, "null_count" -> nulls, "total_count" -> total))
    }
  }

  /** transform.py:76-95 — inclusive bounds; nulls pass. */
  final case class Between(column: String, min: Double, max: Double) extends Expectation {
    val expectationType = "expect_column_values_to_be_between"
    private[operators] def aggs(idx: Int): Seq[Column] =
      Seq(sum(when(col(column) < lit(min) || col(column) > lit(max), 1L)
        .otherwise(0L)).as(s"e$idx"))
    private[operators] def result(row: Row, offset: Int, total: Long): ExpectationResult = {
      val oor = if (row.isNullAt(offset)) 0L else row.getLong(offset)
      ExpectationResult(expectationType, oor == 0L,
        Map("column" -> column, "min" -> min, "max" -> max,
          "out_of_range_count" -> oor, "total_count" -> total))
    }
  }

  /** transform.py:97-105 — strict greater-than. */
  final case class RowCountGreaterThan(minCount: Long) extends Expectation {
    val expectationType = "expect_table_row_count_to_be_greater_than"
    private[operators] def aggs(idx: Int): Seq[Column] = Seq.empty
    override private[operators] val arity = 0
    private[operators] def result(row: Row, offset: Int, total: Long): ExpectationResult =
      ExpectationResult(expectationType, total > minCount,
        Map("row_count" -> total, "min_count" -> minCount))
  }

  /** Beyond the reference's four: the next-most-common GE expectation —
    * column uniqueness. Exact distinct count rides the SAME single agg
    * pass (Spark plans count(DISTINCT) as a two-phase expand-aggregate
    * alongside the conditional sums; still one scan). Nulls are excluded
    * from both counts (SQL DISTINCT drops them), so an all-null column
    * is trivially unique — pair with NotNull when that matters.
    */
  final case class Unique(column: String) extends Expectation {
    val expectationType = "expect_column_values_to_be_unique"
    private[operators] def aggs(idx: Int): Seq[Column] = Seq(
      countDistinct(col(column)).as(s"e${idx}_distinct"),
      sum(when(col(column).isNotNull, 1L).otherwise(0L)).as(s"e${idx}_nonnull"))
    override private[operators] val arity = 2
    private[operators] def result(row: Row, offset: Int, total: Long): ExpectationResult = {
      val distinct = if (row.isNullAt(offset)) 0L else row.getLong(offset)
      val nonNull = if (row.isNullAt(offset + 1)) 0L else row.getLong(offset + 1)
      ExpectationResult(expectationType, distinct == nonNull,
        Map("column" -> column, "distinct_count" -> distinct,
          "non_null_count" -> nonNull, "duplicate_count" -> (nonNull - distinct)))
    }
  }

  /** Membership in an allowed value set (GE's in_set); nulls pass like
    * `between` (3-valued logic — add NotNull to catch them).
    */
  final case class InSet(column: String, allowed: Seq[String]) extends Expectation {
    val expectationType = "expect_column_values_to_be_in_set"
    private[operators] def aggs(idx: Int): Seq[Column] = Seq(
      sum(when(col(column).isNotNull &&
        !col(column).isin(allowed.map(a => a: Any): _*), 1L).otherwise(0L)).as(s"e$idx"))
    private[operators] def result(row: Row, offset: Int, total: Long): ExpectationResult = {
      val bad = if (row.isNullAt(offset)) 0L else row.getLong(offset)
      ExpectationResult(expectationType, bad == 0L,
        Map("column" -> column, "allowed" -> allowed,
          "unexpected_count" -> bad, "total_count" -> total))
    }
  }

  /** Declared-but-unimplemented in the reference (transform.py:57); here a
    * schema-only check — no scan needed.
    */
  final case class OfType(column: String, expected: DataType) extends Expectation {
    val expectationType = "expect_column_values_to_be_of_type"
    private[operators] def aggs(idx: Int): Seq[Column] = Seq.empty
    override private[operators] val arity = 0
    private[operators] def result(row: Row, offset: Int, total: Long): ExpectationResult =
      ExpectationResult(expectationType, success = false, Map.empty) // replaced in validate()
  }

  /** Mirror of transform.py:36-48. */
  final case class ExpectationResult(
      expectationType: String, success: Boolean, details: Map[String, Any])

  /** Mirror of the dict returned at transform.py:107-118. */
  final case class ValidationReport(
      dataset: String,
      expectationsEvaluated: Int,
      expectationsPassed: Int,
      expectationsFailed: Int,
      success: Boolean,
      results: Seq[ExpectationResult])

  /** Run the whole suite in one aggregate pass (plus zero extra actions). */
  def validate(df: DataFrame, dataset: String, expectations: Seq[Expectation]): ValidationReport = {
    val scanned = expectations.filter(_.arity > 0)
    val aggCols: Seq[Column] =
      count(lit(1)).as("total") +: scanned.zipWithIndex.flatMap { case (e, i) => e.aggs(i) }
    val row = df.agg(aggCols.head, aggCols.tail: _*).head()
    val total = row.getLong(0)

    var offset = 1
    val results = expectations.map {
      case t: OfType =>
        val actual = df.schema.fields.find(_.name == t.column).map(_.dataType)
        ExpectationResult(t.expectationType, actual.contains(t.expected),
          Map("column" -> t.column, "expected_type" -> t.expected.simpleString,
            "actual_type" -> actual.map(_.simpleString).getOrElse("<missing>")))
      case e =>
        val r = e.result(row, offset, total)
        offset += e.arity
        r
    }
    val passed = results.count(_.success)
    ValidationReport(dataset, results.size, passed, results.size - passed,
      passed == results.size, results)
  }

  /** The weather suite as applied at transform.py:153-160. */
  def weatherSuite: Seq[Expectation] = Seq(
    NotNull("city"), NotNull("timestamp"), NotNull("temperature_c"),
    Between("temperature_c", -90, 60), Between("humidity_pct", 0, 100),
    RowCountGreaterThan(0))

  /** The IoT suite as applied at transform.py:213-222. */
  def iotSuite: Seq[Expectation] = Seq(
    NotNull("sensor_id"), NotNull("city"), NotNull("timestamp"), NotNull("temperature_c"),
    Between("temperature_c", -50, 60), Between("humidity_pct", 0, 100),
    Between("aqi", 0, 500), Between("battery_level", 0, 100),
    RowCountGreaterThan(0))

  /** Referential-integrity expectation (GE's
    * expect_column_values_to_be_in_other_table): child keys must exist in
    * the parent relation. This is the one suite member that inherently
    * needs a SECOND relation, so it cannot ride the single-agg pass —
    * it is one anti-join (Catalyst broadcasts a small parent; a 100 TB
    * parent key set shuffles both sides once on the key) plus one
    * aggregate over the child. Null child keys pass, matching the
    * suite's 3-valued-logic convention (`between`, `in_set`).
    *
    * One row out: total_rows, null_keys, orphan_rows,
    * orphan_keys (distinct), success.
    */
  def referentialIntegrity(child: DataFrame, childKey: String,
      parent: DataFrame, parentKey: String): DataFrame = {
    val keyed = child.select(col(childKey).as("k"))
    val orphans = keyed.filter(col("k").isNotNull)
      .join(parent.select(col(parentKey).as("k")).distinct(), Seq("k"), "left_anti")
      .agg(count(lit(1)).as("orphan_rows"),
        countDistinct(col("k")).as("orphan_keys"))
    keyed
      .agg(count(lit(1)).as("total_rows"),
        sum(when(col("k").isNull, 1L).otherwise(0L)).as("null_keys"))
      .crossJoin(orphans)
      .withColumn("success", col("orphan_rows") === 0L)
  }

  /** The validator's per-column tallies as a DataFrame — the SQL-checkable
    * face of V1/V2/V3 used by `SparkEntry.queries` ("a1_validation_fused").
    */
  def validationSummary(df: DataFrame, expectations: Seq[Expectation]): DataFrame = {
    val scanned = expectations.filter(_.arity > 0)
    val aggCols = count(lit(1)).as("total_count") +: scanned.zipWithIndex.flatMap {
      case (NotNull(c), _) =>
        Seq(sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"null_count_$c"))
      case (Between(c, mn, mx), _) =>
        Seq(sum(when(col(c) < lit(mn) || col(c) > lit(mx), 1L).otherwise(0L)).as(s"oor_count_$c"))
      case (Unique(c), _) => Seq(
        countDistinct(col(c)).as(s"distinct_count_$c"),
        sum(when(col(c).isNotNull, 1L).otherwise(0L)).as(s"non_null_count_$c"))
      case (InSet(c, allowed), _) =>
        Seq(sum(when(col(c).isNotNull && !col(c).isin(allowed.map(a => a: Any): _*), 1L)
          .otherwise(0L)).as(s"unexpected_count_$c"))
      case (e, i) => Seq(lit(null).as(s"e$i"))
    }
    df.agg(aggCols.head, aggCols.tail: _*)
  }
}
