package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorExprs
import graft.operators.VectorOps

class VectorExprsSpec extends SparkSpec {
  import spark.implicits._

  test("dot matches the zip_with/aggregate composition bit-for-bit") {
    val df = Seq(
      (Seq(1.0f, 2.0f, 3.0f), Seq(4.0f, 5.0f, 6.0f)),
      (Seq(0.1f, -0.2f), Seq(0.3f, 0.4f)),
      (Seq.empty[Float], Seq.empty[Float])).toDF("a", "b")
    val native = df.select(VectorExprs.dot($"a", $"b")).as[Double].collect().toSeq
    val hof = df.select(
      aggregate(zip_with($"a", $"b", (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, v) => acc + v)).as[Double].collect().toSeq
    assert(native == hof) // same index-order double summation
  }

  test("dot works on double arrays and mixed float/double") {
    val df = Seq((Seq(1.0, 2.0), Seq(3.0f, 4.0f))).toDF("a", "b")
    assert(df.select(VectorExprs.dot($"a", $"b")).as[Double].head() == 11.0)
  }

  test("dot is null-safe: null input, null element, length mismatch") {
    val df = Seq(
      (None: Option[Seq[Option[Double]]], Some(Seq(Option(1.0)))),
      (Some(Seq(Option(1.0), None)), Some(Seq(Option(1.0), Option(2.0)))),
      (Some(Seq(Option(1.0))), Some(Seq(Option(1.0), Option(2.0))))).toDF("a", "b")
    val got = df.select(VectorExprs.dot($"a", $"b").as("d")).collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(got.toSeq == Seq(None, None, None))
  }

  test("dot rejects non-numeric-array inputs at analysis") {
    val df = Seq((Seq("x"), Seq(1.0))).toDF("a", "b")
    intercept[Exception] { df.select(VectorExprs.dot($"a", $"b")).collect() }
  }

  test("bruteForceKnn with precomputed norms keeps exact ranking") {
    val vecs = Seq(
      (0L, Seq(1.0f, 0.0f)), (1L, Seq(0.9f, 0.1f)),
      (2L, Seq(0.0f, 1.0f)), (3L, Seq(-1.0f, 0.0f))).toDF("id", "vec")
    val got = VectorOps.bruteForceKnn(vecs.filter($"id" === 0), vecs, 2)
      .orderBy($"rank").collect().map(r => (r.getLong(1), r.getLong(3)))
    assert(got.toSeq == Seq((1L, 1L), (2L, 2L))) // cos: 1≈.994, 2=0, 3=-1
  }
}
