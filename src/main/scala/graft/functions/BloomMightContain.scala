package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, Predicate}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd Bloom-filter membership probe: true iff every one of
  * the `k` double-hashed bit positions of `child`'s md5 is set in the
  * broadcast `bits` array.
  *
  * A custom Catalyst `Expression` (not a Scala UDF) keeps the probe
  * inside whole-stage codegen: the generated code is a single static
  * call into [[graft.operators.BloomJoin.contains]] with the bit array
  * attached as a codegen reference object — no boxing, no UDF
  * serialization, no codegen fence. The hash family is the same
  * md5-double-hashing scheme ([[graft.llmops.Hashing.md5Long]] /
  * [[Hashing.md5LongHi]], positions `(h1 + j·h2) floorMod m`) that the
  * DISTRIBUTED build side computes in plain Spark SQL, so build and
  * probe agree bit for bit.
  */
case class BloomMightContain(child: Expression, bits: Array[Long],
                             mBits: Int, k: Int)
    extends UnaryExpression with Predicate {

  override def nullable: Boolean = child.nullable

  override protected def nullSafeEval(input: Any): Any =
    graft.operators.BloomJoin.contains(
      bits, mBits, k, input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val bitsRef = ctx.addReferenceObj("bloomBits", bits, "long[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.operators.BloomJoin.contains(" +
        s"$bitsRef, $mBits, $k, $c.toString());")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
