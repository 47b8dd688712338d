package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro-Winkler string similarity as a native Catalyst expression.
  *
  * Complements `levenshtein` (f7) in the record-linkage toolkit: edit
  * distance punishes transpositions heavily, while Jaro-Winkler is the
  * name-matching standard (census linkage) — prefix-weighted, in [0,1].
  * Built-in Spark has no Jaro-Winkler; a Scala UDF would fall out of
  * whole-stage codegen on the hot path of a blocked fuzzy join, so this is
  * an `Expression` whose generated code calls the static scorer below,
  * keeping the join stage fused end to end.
  *
  * Semantics pin the textbook Winkler formulation (and DuckDB's
  * `jaro_winkler_similarity`, which this engine's oracle checks against):
  *  - match window `max(|a|,|b|)/2 - 1` (floor, min 0);
  *  - transpositions = half the count of order-mismatched matched chars;
  *  - either string empty → 0.0 (both-empty included);
  *  - prefix boost `+ 0.1·L·(1−jaro)` with L = common prefix ≤ 4, applied
  *    only when jaro > 0.7;
  *  - comparison is by Unicode code point. NOTE: DuckDB's RapidFuzz-based
  *    implementation compares UTF-8 *bytes*, so the DuckDB parity pin
  *    holds exactly only for ASCII inputs (one byte == one code point);
  *    on multi-byte text the byte view shifts lengths, match windows and
  *    prefix counts. The code-point view is the textbook-correct one —
  *    treat the oracle check as ASCII-scoped (er2's nation names are).
  */
case class JaroWinklerSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"jaro_winkler expects (string, string), got ${left.dataType.sql} / ${right.dataType.sql}")

  override def nullSafeEval(l: Any, r: Any): Any =
    JaroWinklerSim.similarity(l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.JaroWinklerSim.similarity($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object JaroWinklerSim {

  /** Static scorer shared by interpreted eval and generated code. */
  def similarity(a: UTF8String, b: UTF8String): Double = {
    val s = a.toString.codePoints().toArray
    val t = b.toString.codePoints().toArray
    val (n, m) = (s.length, t.length)
    if (n == 0 || m == 0) return 0.0
    val window = math.max(0, math.max(n, m) / 2 - 1)
    val sMatched = new Array[Boolean](n)
    val tMatched = new Array[Boolean](m)
    var matches = 0
    var i = 0
    while (i < n) {
      val lo = math.max(0, i - window)
      val hi = math.min(m - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!tMatched(j) && s(i) == t(j)) {
          sMatched(i) = true; tMatched(j) = true; matches += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    // Transpositions: walk both matched subsequences in order.
    var transpositions = 0
    var k = 0
    i = 0
    while (i < n) {
      if (sMatched(i)) {
        while (!tMatched(k)) k += 1
        if (s(i) != t(k)) transpositions += 1
        k += 1
      }
      i += 1
    }
    val mm = matches.toDouble
    val jaro = (mm / n + mm / m + (mm - transpositions / 2) / mm) / 3.0
    if (jaro <= 0.7) return jaro
    var prefix = 0
    while (prefix < math.min(4, math.min(n, m)) && s(prefix) == t(prefix)) prefix += 1
    jaro + prefix * 0.1 * (1.0 - jaro)
  }

  def jaro_winkler(a: Column, b: Column): Column =
    GraftSqlBridge.column(JaroWinklerSim(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
}
