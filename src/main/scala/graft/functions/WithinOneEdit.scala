package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd "edit distance ≤ 1" predicate — the verification
  * kernel for deletion-neighborhood typo blocking
  * ([[graft.llmops.Dedup.editDistancePairs]]).
  *
  * Even the threshold-banded `levenshtein(l, r, 1)` builds DP state per
  * call; at one edit the answer needs only a single synchronized scan —
  * equal lengths: at most one mismatching position; lengths off by one:
  * at most one skipped char in the longer string. O(len) with zero
  * allocations beyond the char decode, inside whole-stage codegen via a
  * static kernel call. Semantics are EXACTLY `levenshtein(a, b) <= 1`
  * over characters (spec-gated against the builtin on random strings),
  * so the DuckDB oracle stays plain `levenshtein`. */
object WithinOneEdit {

  /** Static kernel the generated code calls. Compares Unicode CODE
    * POINTS, not UTF-16 chars: Spark's `levenshtein` (UTF8String) and
    * DuckDB both count code points, so a supplementary character (one
    * emoji vs one ASCII char) must read as distance 1, which a
    * `charAt` walk would call 2. */
  def within1(a: UTF8String, b: UTF8String): Boolean = {
    val s = a.toString.codePoints().toArray
    val t = b.toString.codePoints().toArray
    val n = s.length
    val m = t.length
    if (math.abs(n - m) > 1) return false
    if (n == m) {
      var i = 0
      var diff = 0
      while (i < n) {
        if (s(i) != t(i)) { diff += 1; if (diff > 1) return false }
        i += 1
      }
      true
    } else {
      val (lo, hi) = if (n < m) (s, t) else (t, s)
      var i = 0
      var j = 0
      var skipped = false
      while (i < lo.length) {
        if (j >= hi.length) return false // can't happen with |Δlen|=1; defensive
        if (lo(i) == hi(j)) { i += 1; j += 1 }
        else {
          if (skipped) return false
          skipped = true
          j += 1
        }
      }
      true // at most the longer string's final code point remains unmatched
    }
  }
}

case class WithinOneEdit(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = BooleanType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"within_one_edit needs string children, got " +
          s"${left.dataType.sql}, ${right.dataType.sql}")

  override protected def nullSafeEval(l: Any, r: Any): Any =
    WithinOneEdit.within1(l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) =>
      s"${ev.value} = graft.functions.WithinOneEdit.within1($l, $r);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
