package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** JVM kernel for the 64-bit SimHash: whitespace-tokenize, de-duplicate
  * tokens, md5 each, vote bit b by bit (b mod 4) of hex digit ⌊b/4⌋,
  * emit the sign vector — bit-identical to the exploded
  * `DedupOps.simHash64` aggregate and to the DuckDB oracle's digit
  * arithmetic, but computed in ONE row-local pass. */
object SimHashKernel {
  def simhash64(text: UTF8String): Long = {
    val votes = new Array[Int](64)
    val seen = new java.util.HashSet[String]()
    val md = java.security.MessageDigest.getInstance("MD5")
    val it = text.toString.split(' ')
    var t = 0
    while (t < it.length) {
      val w = it(t)
      if (w.nonEmpty && seen.add(w)) {
        md.reset()
        val d = md.digest(w.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        var b = 0
        while (b < 64) {
          // hex digit b/4 = high nibble of byte (b/4)/2 when (b/4) even
          val digitIdx = b >> 2
          val byte0 = d(digitIdx >> 1) & 0xFF
          val digit = if ((digitIdx & 1) == 0) byte0 >> 4 else byte0 & 0xF
          votes(b) += (if (((digit >> (b & 3)) & 1) == 1) 1 else -1)
          b += 1
        }
      }
      t += 1
    }
    var h = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) h |= (1L << b)
      b += 1
    }
    h
  }
}

/** Native expression form: `text → simhash64(long)` with no explode and
  * no 64-column aggregate — the whole vote loop runs inside the row
  * (preference order (b) of the build brief). The exploded composition
  * costs a Generate + a 64-buffer hash aggregate + one shuffle per call
  * site; this is a projection. */
case class SimHash64Expr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash64 requires a string column, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(input: Any): Any =
    SimHashKernel.simhash64(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.SimHashKernel.simhash64($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64Expr =
    copy(child = newChild)
}

object SimHashExpr {
  /** Column API: row-local 64-bit SimHash of whitespace-tokenized text. */
  def simhash64(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(SimHash64Expr(
      org.apache.spark.sql.graftbridge.ColumnBridge.expression(text)))
}
