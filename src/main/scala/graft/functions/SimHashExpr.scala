package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** JVM kernel for SimHash over the distinct whitespace-token set, in ONE
  * row-local pass — bit-identical to the exploded aggregates and to the
  * DuckDB oracles' hex-digit arithmetic.
  *  - 64-bit: bit b votes by bit (b mod 4) of hex digit ⌊b/4⌋ of
  *    md5(token) (DedupOps.simHash64's layout);
  *  - 16-bit: bit b votes by the TOP bit of hex digit b (the oracle's
  *    `substr(h, b+1, 1) >= '8'` test, DedupOps.simHash16's layout). */
object SimHashKernel {
  def simhash(text: UTF8String, bits: Int): Long = {
    val votes = new Array[Int](bits)
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
        while (b < bits) {
          val digitIdx = if (bits == 64) b >> 2 else b
          // hex digit d = high nibble of byte d/2 when d even, else low
          val byte0 = d(digitIdx >> 1) & 0xFF
          val digit = if ((digitIdx & 1) == 0) byte0 >> 4 else byte0 & 0xF
          val bit = if (bits == 64) (digit >> (b & 3)) & 1 else digit >> 3
          votes(b) += (if (bit == 1) 1 else -1)
          b += 1
        }
      }
      t += 1
    }
    var h = 0L
    var b = 0
    while (b < bits) {
      if (votes(b) > 0) h |= (1L << b)
      b += 1
    }
    h
  }

  def simhash64(text: UTF8String): Long = simhash(text, 64)
}

/** JVM kernel for word-shingle feature hashing: whitespace-tokenize,
  * join each n-token window with '_', md5, take the first 10 hex digits
  * as a 40-bit long — bit-identical to
  * `shingleHash40(md5(concat_ws("_", …)))` over the exploded bag, but
  * one row-local pass with no Generate and no interpreted lambdas. */
object WordShingleKernel {
  def hashes(text: UTF8String, n: Int): Array[Long] = {
    val raw = text.toString.split(' ')
    var m = 0
    var t = 0
    while (t < raw.length) { if (raw(t).nonEmpty) { raw(m) = raw(t); m += 1 }; t += 1 }
    val cnt = m - n + 1
    if (cnt <= 0) return Array.emptyLongArray
    val md = java.security.MessageDigest.getInstance("MD5")
    val out = new Array[Long](cnt)
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i < cnt) {
      sb.setLength(0)
      var k = 0
      while (k < n) {
        if (k > 0) sb.append('_')
        sb.append(raw(i + k))
        k += 1
      }
      md.reset()
      val d = md.digest(sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      // first 10 hex digits = first 5 bytes, big-endian
      var h = 0L
      var b = 0
      while (b < 5) { h = (h << 8) | (d(b) & 0xFFL); b += 1 }
      out(i) = h
      i += 1
    }
    out
  }
}

/** Native expression: `text → array<long>` of 40-bit word-n-gram shingle
  * hashes (see WordShingleKernel) — the word-feature counterpart of
  * CharNGramHashes, feeding the same row-local LSH pipeline. */
case class WordShingleHashes(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "shingle width must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_shingle_hashes requires a string column, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "word_shingle_hashes"

  override protected def nullSafeEval(input: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      WordShingleKernel.hashes(input.asInstanceOf[UTF8String], n))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.WordShingleKernel.hashes($c, $n));""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): WordShingleHashes =
    copy(child = newChild)
}

/** Native expression form: `text → simhash64(long)` with no explode and
  * no 64-column aggregate — the whole vote loop runs inside the row
  * (preference order (b) of the build brief). The exploded composition
  * costs a Generate + a 64-buffer hash aggregate + one shuffle per call
  * site; this is a projection. */
case class SimHash64Expr(child: Expression, bits: Int = 64) extends UnaryExpression {
  require(bits == 16 || bits == 64, "supported widths: 16, 64")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash requires a string column, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = s"simhash$bits"

  override protected def nullSafeEval(input: Any): Any =
    SimHashKernel.simhash(input.asInstanceOf[UTF8String], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.SimHashKernel.simhash($c, $bits)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64Expr =
    copy(child = newChild)
}

object SimHashExpr {
  /** Column API: row-local SimHash of whitespace-tokenized text. */
  def simhash64(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(SimHash64Expr(
      org.apache.spark.sql.graftbridge.ColumnBridge.expression(text), 64))

  def simhash16(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(SimHash64Expr(
      org.apache.spark.sql.graftbridge.ColumnBridge.expression(text), 16))
}
