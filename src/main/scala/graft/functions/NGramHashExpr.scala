package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: all character-n-gram window hashes of a
  * text column in ONE pass — `text → array<long>` where element i is the
  * polynomial hash ((…(cp₍ᵢ₎·b + cp₍ᵢ₊₁₎) mod p)·b + …) mod p over the
  * n code points starting at i.
  *
  * Why a custom `Expression` (preference order (b) of the build brief)
  * instead of `transform(charShingles(t,n), g → md5-based hash)`: the HOF
  * lambda evaluates INTERPRETED per element, and a cryptographic digest
  * per window costs ~10 µs each — measured 4.1 s just to hash the sf0.1
  * corpus's 1.5 M windows, the dominant stage of the n-gram-Jaccard
  * pipeline. This kernel is a primitive long loop over the code-point
  * array: O(total chars) multiply-adds, no per-window string or digest
  * allocation, ~100× cheaper, emitted inside whole-stage codegen.
  *
  * Engine-portable by construction: the fold is plain modular arithmetic
  * over Unicode CODE POINTS, reproduced in the DuckDB oracle as a
  * lead()-window fold over ascii(c) (DuckDB's ascii() returns the code
  * point). All intermediates stay < 2⁶³: acc < p ≤ 2³⁰, b ≤ 2²⁰, code
  * point < 2²¹ ⇒ acc·b + cp < 2⁵¹.
  *
  * Docs with fewer than n code points yield an empty array (the window
  * count is max(0, cps − n + 1)), matching the `charShingles` contract.
  */
case class CharNGramHashes(child: Expression, n: Int, b: Long, p: Long)
    extends UnaryExpression {
  require(n >= 1, "n-gram width must be >= 1")
  require(b > 0 && p > 0 && p <= (1L << 30) && b <= (1L << 20),
    "need 0 < b <= 2^20 and 0 < p <= 2^30 so the fold never overflows")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"char_ngram_hashes requires a string column, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "char_ngram_hashes"

  override protected def nullSafeEval(input: Any): Any = {
    val cps = input.asInstanceOf[UTF8String].toString.codePoints().toArray
    val m = cps.length - (n - 1)
    val out = new Array[Long](if (m > 0) m else 0)
    var i = 0
    while (i < out.length) {
      var h = 0L
      var k = 0
      while (k < n) { h = (h * b + cps(i + k)) % p; k += 1 }
      out(i) = h
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val cps = ctx.freshName("cps")
      val m = ctx.freshName("m")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val k = ctx.freshName("k")
      val h = ctx.freshName("h")
      s"""
         |int[] $cps = $c.toString().codePoints().toArray();
         |int $m = $cps.length - ${n - 1};
         |long[] $out = new long[$m > 0 ? $m : 0];
         |for (int $i = 0; $i < $out.length; $i++) {
         |  long $h = 0L;
         |  for (int $k = 0; $k < $n; $k++) {
         |    $h = ($h * ${b}L + $cps[$i + $k]) % ${p}L;
         |  }
         |  $out[$i] = $h;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): CharNGramHashes =
    copy(child = newChild)
}

/** CDC cut positions in one codegen'd pass: `text → array<int>` of the
  * 1-based char positions where a width-`n` window hash ≡ 0 (mod m) ENDS
  * (i.e. i + n − 1 for matching window start i). Same fold as
  * CharNGramHashes — this fuses the hash pass with the cut filter so the
  * chunking operator never materializes the full window-hash array nor
  * runs an interpreted per-window lambda (measured 2.0 s → sub-second on
  * the sf0.1 chunking gates). */
case class CdcCutPositions(child: Expression, n: Int, b: Long, p: Long, m: Long)
    extends UnaryExpression {
  require(n >= 1 && m >= 1, "window width and modulus must be positive")
  require(b > 0 && p > 0 && p <= (1L << 30) && b <= (1L << 20),
    "need 0 < b <= 2^20 and 0 < p <= 2^30 so the fold never overflows")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"cdc_cut_positions requires a string column, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "cdc_cut_positions"

  override protected def nullSafeEval(input: Any): Any = {
    val cps = input.asInstanceOf[UTF8String].toString.codePoints().toArray
    val cuts = scala.collection.mutable.ArrayBuffer[Int]()
    val last = cps.length - n
    var i = 0
    while (i <= last) {
      var h = 0L
      var k = 0
      while (k < n) { h = (h * b + cps(i + k)) % p; k += 1 }
      if (h % m == 0) cuts += (i + n) // 1-based end position of the window
      i += 1
    }
    new GenericArrayData(cuts.toArray)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val cps = ctx.freshName("cps")
      val cuts = ctx.freshName("cuts")
      val nCuts = ctx.freshName("nCuts")
      val last = ctx.freshName("last")
      val i = ctx.freshName("i")
      val k = ctx.freshName("k")
      val h = ctx.freshName("h")
      val out = ctx.freshName("out")
      s"""
         |int[] $cps = $c.toString().codePoints().toArray();
         |int $last = $cps.length - $n;
         |int[] $cuts = new int[$last >= 0 ? $last + 1 : 0];
         |int $nCuts = 0;
         |for (int $i = 0; $i <= $last; $i++) {
         |  long $h = 0L;
         |  for (int $k = 0; $k < $n; $k++) {
         |    $h = ($h * ${b}L + $cps[$i + $k]) % ${p}L;
         |  }
         |  if ($h % ${m}L == 0L) { $cuts[$nCuts++] = $i + $n; }
         |}
         |int[] $out = java.util.Arrays.copyOf($cuts, $nCuts);
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): CdcCutPositions =
    copy(child = newChild)
}

/** LSH band keys in one codegen'd pass: `array<long> feature hashes →
  * array<long> of `bands` band keys`. Computes all `as.length` MinHash
  * permutation minima min((a_i·h + b_i) mod p) in a single loop over the
  * feature array, then folds each band's `rowsPerBand` minima with
  * ((k·foldB + min) mod foldP) into a numeric band key.
  *
  * Why: the HOF composition (16 × array_min(transform(hs, …)) followed
  * by md5-of-concat band hashes) evaluates its lambdas INTERPRETED —
  * ~23 M lambda evals on the sf0.1 corpus, the dominant stage of the
  * array-local LSH pipeline — and shuffles 32-char digest strings as
  * join keys. This kernel is O(|hs|·perms) primitive ops inside codegen
  * and the join key is 8 bytes. Band-key equality replaces digest
  * equality — a different (but engine-portable, arithmetic) hash with
  * the same collision-negligible contract, reproduced verbatim in the
  * oracle SQL's fold over the sig columns.
  *
  * All intermediates < 2⁶³: a_i < 2²⁰, h < 2⁴⁰ ⇒ a·h + b < 2⁶¹; minima
  * < p ≤ 2³⁰, foldB ≤ 2²⁰ ⇒ k·foldB + min < 2⁵¹. */
case class MinHashBandKeys(child: Expression, as: Seq[Long], bs: Seq[Long],
                           p: Long, bands: Int, foldB: Long, foldP: Long)
    extends UnaryExpression {
  require(as.nonEmpty && as.length == bs.length, "permutation a/b lists must align")
  require(as.length % bands == 0, "bands must divide the permutation count")
  require(foldB <= (1L << 20) && foldP <= (1L << 30) && p <= (1L << 30),
    "fold/permutation moduli out of the overflow-safe range")
  // The overflow argument above (a·h + b < 2⁶¹) needs EVERY multiplier in
  // (0, 2²⁰] and offset in [0, p) — not just the moduli. Callers must also
  // feed hashes < 2⁴⁰ (the CharNGramHashes/WordShingleHashes contract,
  // whose outputs are < p ≤ 2³⁰); a raw 63-bit hash would silently
  // overflow the product, so the domain is part of this expression's API.
  require(as.forall(a => a > 0 && a <= (1L << 20)),
    "every permutation multiplier a_i must be in (0, 2^20]")
  require(bs.forall(b => b >= 0 && b < p),
    "every permutation offset b_i must be in [0, p)")

  private def rowsPerBand: Int = as.length / bands

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, false) => TypeCheckResult.TypeCheckSuccess
    case ArrayType(LongType, true) => TypeCheckResult.TypeCheckFailure(
      "minhash_band_keys requires array<long> with containsNull=false " +
        "(toLongArray cannot represent null elements)")
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_band_keys requires array<long>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_band_keys"

  override protected def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toLongArray()
    val k = as.length
    val mins = Array.fill(k)(Long.MaxValue)
    var j = 0
    while (j < hs.length) {
      val h = hs(j)
      var i = 0
      while (i < k) {
        val v = (as(i) * h + bs(i)) % p
        if (v < mins(i)) mins(i) = v
        i += 1
      }
      j += 1
    }
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var key = 0L
      var r = 0
      while (r < rowsPerBand) {
        key = (key * foldB + mins(b * rowsPerBand + r)) % foldP
        r += 1
      }
      out(b) = key
      b += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val k = as.length
      val aLit = as.mkString("new long[]{", "L,", "L}")
      val bLit = bs.mkString("new long[]{", "L,", "L}")
      val hs = ctx.freshName("hs")
      val aArr = ctx.freshName("aArr")
      val bArr = ctx.freshName("bArr")
      val mins = ctx.freshName("mins")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val b = ctx.freshName("b")
      val r = ctx.freshName("r")
      val h = ctx.freshName("h")
      val v = ctx.freshName("v")
      val key = ctx.freshName("key")
      s"""
         |long[] $hs = $c.toLongArray();
         |long[] $aArr = $aLit;
         |long[] $bArr = $bLit;
         |long[] $mins = new long[$k];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |for (int $j = 0; $j < $hs.length; $j++) {
         |  long $h = $hs[$j];
         |  for (int $i = 0; $i < $k; $i++) {
         |    long $v = ($aArr[$i] * $h + $bArr[$i]) % ${p}L;
         |    if ($v < $mins[$i]) $mins[$i] = $v;
         |  }
         |}
         |long[] $out = new long[$bands];
         |for (int $b = 0; $b < $bands; $b++) {
         |  long $key = 0L;
         |  for (int $r = 0; $r < $rowsPerBand; $r++) {
         |    $key = ($key * ${foldB}L + $mins[$b * $rowsPerBand + $r]) % ${foldP}L;
         |  }
         |  $out[$b] = $key;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashBandKeys =
    copy(child = newChild)
}
