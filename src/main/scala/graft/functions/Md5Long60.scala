package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd 60-bit md5 hash — the engine's shared hash kernel
  * (`conv(substring(md5(s), 1, 15), 16, 10)` and its hi-bits companion)
  * as ONE expression straight from the digest bytes.
  *
  * The composed built-in form pays for the hash twice: `md5()` renders
  * the 16-byte digest into a 32-char lowercase-hex UTF8String, then
  * `substring` + `conv` parse 15 of those chars back into a Long. This
  * expression digests the UTF-8 bytes and assembles the Long from the
  * raw digest — no hex string, no base-conversion parse, one fewer
  * allocation per row — inside whole-stage codegen via a static kernel
  * call ([[Md5Long60.eval60]]). Every dedup / sketch / sampling
  * operator funnels through this hash, so the saving applies to the
  * widest hot path in the engine. Values are bit-identical to the
  * composed form (asserted by spec and by every oracle hash gate), so
  * the DuckDB SQL twins are unchanged.
  */
object Md5Long60 {
  private val tl = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Static kernel the generated code calls: first (hi=false) or second
    * (hi=true) 60 bits of md5(utf8 bytes of `s`). */
  def eval60(s: UTF8String, hi: Boolean): Long = {
    val d = tl.get().digest(s.getBytes)
    if (!hi) {
      // hex chars 1-15: bytes 0..6 + high nibble of byte 7
      var acc = 0L
      var i = 0
      while (i < 7) { acc = (acc << 8) | (d(i) & 0xffL); i += 1 }
      (acc << 4) | ((d(7) & 0xf0L) >>> 4)
    } else {
      // hex chars 16-30: low nibble of byte 7 + bytes 8..14
      var acc = d(7) & 0x0fL
      var i = 8
      while (i < 15) { acc = (acc << 8) | (d(i) & 0xffL); i += 1 }
      acc
    }
  }
}

case class Md5Long60(child: Expression, hi: Boolean)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def checkInputDataTypes()
  : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"md5_long60 needs a string child, got ${child.dataType.sql}")

  override protected def nullSafeEval(input: Any): Any =
    Md5Long60.eval60(input.asInstanceOf[UTF8String], hi)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Md5Long60.eval60($c, $hi);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
