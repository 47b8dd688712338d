package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Apply learned BPE merges (TextAnalysis.bpeTrain's output) to a token
  * array → subword symbol array. The merge table rides INSIDE the
  * expression (closure-serialized once per task, like CentroidArgmax's
  * centroid matrix), so encoding is a MAP-ONLY pass at scan speed — the
  * inference half of tokenizer training, applied to 100 TB without a
  * join.
  *
  * Per token: start from characters, repeatedly merge the present pair
  * with the LOWEST rank until none applies — the standard greedy BPE
  * encode, which by construction reproduces the trainer's end-state
  * segmentation on the training corpus (spec-pinned closure property).
  */
case class BpeEncode(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression with SketchCodegen {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"bpe_encode expects array<string>, got ${t.sql}")
  }

  @transient private lazy val rank: java.util.HashMap[(String, String), Int] = {
    val m = new java.util.HashMap[(String, String), Int]()
    merges.zipWithIndex.foreach { case (p, i) => m.putIfAbsent(p, i) }
    m
  }

  override def nullSafeEval(input: Any): Any = kernel(input)

  override def kernel(input: Any): AnyRef = {
    val arr = input.asInstanceOf[ArrayData]
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var t = 0
    val n = arr.numElements()
    while (t < n) {
      if (!arr.isNullAt(t)) {
        var syms = arr.getUTF8String(t).toString.toCharArray.map(_.toString)
        var done = false
        while (!done && syms.length > 1) {
          // lowest-rank pair present in this word
          var bestRank = Int.MaxValue
          var i = 0
          while (i < syms.length - 1) {
            val r = rank.getOrDefault((syms(i), syms(i + 1)), Int.MaxValue)
            if (r < bestRank) bestRank = r
            i += 1
          }
          if (bestRank == Int.MaxValue) done = true
          else {
            val (l, r) = merges(bestRank)
            val fused = l + r
            val next = scala.collection.mutable.ArrayBuffer.empty[String]
            i = 0
            while (i < syms.length) {
              if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
                next += fused; i += 2
              } else { next += syms(i); i += 1 }
            }
            syms = next.toArray
          }
        }
        syms.foreach(s => out += UTF8String.fromString(s))
      }
      t += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "bpe_encode"
}

object BpeEncode {
  def encode(tokens: Column, merges: Seq[(String, String)]): Column =
    GraftSqlBridge.column(BpeEncode(GraftSqlBridge.expression(tokens), merges))
}
