package graft

import org.apache.spark.sql.functions._
import graft.functions.BitOps
import graft.operators.SkewOps

class BitOpsSpec extends SparkSpec {
  import spark.implicits._

  test("hamming64 matches Long.bitCount(xor) under codegen") {
    val df = Seq(
      (0L, 0L), (0L, 1L), (0L, -1L),
      (0x0f0f0f0f0f0f0f0fL, 0xf0f0f0f0f0f0f0f0L),
      (123456789L, 987654321L)).toDF("a", "b")
    val got = df.select(BitOps.hamming64($"a", $"b")).as[Int].collect().toSeq
    val want = Seq((0L, 0L), (0L, 1L), (0L, -1L),
      (0x0f0f0f0f0f0f0f0fL, 0xf0f0f0f0f0f0f0f0L),
      (123456789L, 987654321L))
      .map { case (a, b) => java.lang.Long.bitCount(a ^ b) }
    assert(got == want)
  }

  test("hamming64 is null-safe") {
    val df = Seq((Some(1L), None: Option[Long]), (None, Some(2L)), (Some(3L), Some(3L)))
      .toDF("a", "b")
    val got = df.select(BitOps.hamming64($"a", $"b").as("h")).collect().map(r =>
      if (r.isNullAt(0)) None else Some(r.getInt(0)))
    assert(got.toSeq == Seq(None, None, Some(0)))
  }

  test("hamming64 rejects non-long inputs at analysis") {
    val df = Seq(("x", 1L)).toDF("a", "b")
    intercept[Exception] { df.select(BitOps.hamming64($"a", $"b")).collect() }
  }

  test("zorder2 interleaves bits x-even/y-odd under codegen") {
    def ref(x: Long, y: Long): Long =
      (0 until 16).foldLeft(0L) { (z, i) =>
        z | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
      }
    val cases = Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 0L), (0L, 65535L),
      (65535L, 65535L), (0xABCDL, 0x1234L), (70000L, 3L)) // >16 bits masked off
    val got = cases.toDF("x", "y")
      .select(BitOps.zorder2($"x", $"y")).as[Long].collect().toSeq
    assert(got == cases.map { case (x, y) => ref(x, y) })
    assert(ref(1L, 0L) == 1L && ref(0L, 1L) == 2L && ref(65535L, 65535L) == 0xFFFFFFFFL)
  }

  test("zorder2 is null-safe and rejects non-long inputs") {
    val df = Seq((Some(1L), None: Option[Long]), (Some(2L), Some(2L))).toDF("x", "y")
    val got = df.select(BitOps.zorder2($"x", $"y").as("z")).collect().map(r =>
      if (r.isNullAt(0)) None else Some(r.getLong(0)))
    assert(got.toSeq == Seq(None, Some(12L))) // interleave(2,2) = 0b1100
    intercept[Exception] {
      Seq(("s", 1L)).toDF("x", "y").select(BitOps.zorder2($"x", $"y")).collect()
    }
  }

  test("charNGramHashes matches the per-window fold, incl. edges") {
    import graft.functions.TextFunctions.{charNGramHashes, NGramHashB, NGramHashP}
    def ref(s: String, n: Int): Seq[Long] = {
      val cps = s.codePoints().toArray
      (0 to cps.length - n).map { i =>
        cps.slice(i, i + n).foldLeft(0L)((h, c) => (h * NGramHashB + c) % NGramHashP)
      }
    }
    val texts = Seq("hello world", "abcd", "abcde", "aaaaa", "", "ab",
      "naïve café ∑∆") // multibyte: code points, not bytes
    val df = texts.toDF("t")
    val got = df.select(charNGramHashes($"t", 5).as("hs"))
      .as[Seq[Long]].collect().toSeq
    assert(got == texts.map(ref(_, 5)))
    // interpreted eval (no codegen) agrees: force via filter on literal
    val interp = texts.map { t =>
      graft.functions.CharNGramHashes(
        org.apache.spark.sql.catalyst.expressions.Literal(
          org.apache.spark.unsafe.types.UTF8String.fromString(t)),
        5, NGramHashB, NGramHashP)
        .eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toLongArray().toSeq
    }
    assert(interp == texts.map(ref(_, 5)))
    // null text → null array
    val nulls = Seq[Option[String]](None, Some("abcdef")).toDF("t")
      .select(charNGramHashes($"t", 5).as("hs")).collect()
    assert(nulls(0).isNullAt(0) && !nulls(1).isNullAt(0))
  }

  test("simhash64 expression matches an independent fold, order/dup-invariant") {
    // independent reference: BigInteger digit arithmetic over the hex md5
    def ref(text: String): Long = {
      val votes = new Array[Int](64)
      text.split(" ").filter(_.nonEmpty).distinct.foreach { w =>
        val hex = java.security.MessageDigest.getInstance("MD5")
          .digest(w.getBytes("UTF-8")).map("%02x".format(_)).mkString
        for (b <- 0 until 64) {
          val digit = Integer.parseInt(hex(b / 4).toString, 16)
          votes(b) += (if (((digit >> (b % 4)) & 1) == 1) 1 else -1)
        }
      }
      (0 until 64).foldLeft(0L)((h, b) => if (votes(b) > 0) h | (1L << b) else h)
    }
    val texts = Seq("alpha beta gamma", "gamma  beta alpha alpha", "", "solo",
      "many words here to fill more than a couple of digest votes")
    val got = texts.toDF("t")
      .select(graft.functions.SimHashExpr.simhash64($"t")).as[Long].collect().toSeq
    assert(got == texts.map(ref))
    // permutation + duplication invariance (set semantics)
    assert(ref("alpha beta gamma") == ref("gamma  beta alpha alpha"))
  }

  test("cdcCutPositions codegen handles a doc of exactly n code points") {
    import graft.functions.TextFunctions.{cdcCutPositions, NGramHashB, NGramHashP}
    // m=1 makes EVERY window a cut, so a text of exactly n code points
    // (one window, last == 0) must yield [n]. The codegen path used to
    // allocate a zero-length cuts buffer for last == 0 and throw
    // ArrayIndexOutOfBoundsException where the interpreted path succeeded.
    val n = 8
    val texts = Seq("abcdefgh", "abcdefg", "abcdefghi", "")
    val got = texts.toDF("t")
      .select(cdcCutPositions($"t", n, 1L).as("cuts"))
      .as[Seq[Int]].collect().toSeq
    assert(got == Seq(Seq(8), Seq(), Seq(8, 9), Seq()))
    // interpreted eval agrees with codegen on the boundary case
    val interp = texts.map { t =>
      graft.functions.CdcCutPositions(
        org.apache.spark.sql.catalyst.expressions.Literal(
          org.apache.spark.unsafe.types.UTF8String.fromString(t)),
        n, NGramHashB, NGramHashP, 1L)
        .eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toIntArray().toSeq
    }
    assert(got == interp)
  }

  test("minhash_band_keys rejects out-of-range permutation params and nullable arrays") {
    import graft.functions.TextFunctions.{NGramHashB, NGramHashP}
    val p = 1000000007L
    // multiplier above 2^20 breaks the overflow-safety argument → reject
    intercept[IllegalArgumentException] {
      graft.functions.MinHashBandKeys(
        org.apache.spark.sql.catalyst.expressions.Literal.create(
          Array(1L, 2L), org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.LongType, containsNull = false)),
        Seq((1L << 20) + 1), Seq(0L), p, 1, NGramHashB, NGramHashP)
    }
    // offset outside [0, p) → reject
    intercept[IllegalArgumentException] {
      graft.functions.MinHashBandKeys(
        org.apache.spark.sql.catalyst.expressions.Literal.create(
          Array(1L, 2L), org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.LongType, containsNull = false)),
        Seq(3L), Seq(p), p, 1, NGramHashB, NGramHashP)
    }
    // array<long> with containsNull=true fails analysis (toLongArray
    // cannot represent null elements)
    val nullable = Seq(Seq[java.lang.Long](1L, null)).toDF("hs")
    val expr = org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.functions.MinHashBandKeys(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression($"hs"),
        Seq(3L), Seq(5L), p, 1, NGramHashB, NGramHashP))
    intercept[Exception] { nullable.select(expr).collect() }
  }

  test("salted aggregation is bit-identical to the plain aggregate") {
    val ev = graft.sources.Tables.events(spark, sf001)
    val salted = SkewOps.saltedCountSum(ev, $"event_type", $"value", $"event_id", 16)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val plain = ev.groupBy($"event_type")
      .agg(count(lit(1)).as("n"), sum($"value").as("s"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(salted.keySet == plain.keySet)
    salted.foreach { case (k, (n, s)) =>
      assert(n == plain(k)._1)
      assert(math.abs(s - plain(k)._2) < 1e-6) // summation order may differ
    }
  }
}
