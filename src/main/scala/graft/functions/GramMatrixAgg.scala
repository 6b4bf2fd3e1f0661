package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** One-pass second-moment statistics of a vector column — the input PCA
  * (and any covariance-based whitening/decorrelation step) needs:
  *
  *   buffer = [ Σ round((vᵢ·vⱼ)·10⁶)  for (i,j) ∈ d×d   | d² longs
  *            | Σ round(vᵢ·10⁶)        for i ∈ d          | d  longs
  *            | row count                                 | 1  long  ]
  *
  * Why a custom `TypedImperativeAggregate` (preference order (b) of the
  * build brief): the declarative alternatives either self-join the
  * exploded corpus on row id (shuffles corpus×d twice) or fan every row
  * out to d² (i,j) rows through a hash aggregate — 4096× row
  * amplification before the map-side combine collapses it. This
  * aggregate's update is a primitive d² multiply-add loop per row with
  * ZERO row amplification and a fixed d²+d+1 long buffer; partials merge
  * elementwise, so the shuffle is tasks × (d²+d+1) longs regardless of
  * corpus size — the kmeans-style bound (SCALING.md), here for second
  * moments.
  *
  * Exactness contract: each term is rounded to integer 10⁻⁶ units BEFORE
  * summation and accumulated in Long — summation is order-free (the
  * engine's TPC-H-Q9/kmeans fixed-point convention), so the result is
  * bit-identical across partitionings, thread schedules, AND engines: the
  * DuckDB oracle's `SUM(CAST(round((a.v*b.v)*1000000) AS BIGINT))`
  * reproduces the buffer exactly. Rounding replicates Spark's own
  * `round()` (BigDecimal-HALF_UP via `Double.toString`, away from zero on
  * ties) with a fast integer path off the tie boundary.
  *
  * Rows that are null or not exactly `dim` elements are skipped (and not
  * counted) — callers validate the corpus shape upstream.
  */
case class GramMatrixAgg(
    child: Expression,
    dim: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  // def, not val: child is unresolved at construction time
  private def elemType: DataType = child.dataType match {
    case ArrayType(et, _) => et
    case _ => NullType
  }

  override def checkInputDataTypes(): TypeCheckResult = elemType match {
    case FloatType | DoubleType => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"gram_matrix requires array<float|double>, got ${child.dataType.simpleString}")
  }

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](dim * dim + dim + 1)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val raw = child.eval(input)
    if (raw != null) {
      val a = raw.asInstanceOf[ArrayData]
      if (a.numElements() == dim) {
        val isFloat = elemType == FloatType
        val v = new Array[Double](dim)
        var i = 0
        while (i < dim) {
          v(i) = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
          i += 1
        }
        i = 0
        while (i < dim) {
          val vi = v(i)
          var j = 0
          while (j < dim) {
            buf(i * dim + j) += GramMatrixAgg.roundFix6(vi * v(j))
            j += 1
          }
          buf(dim * dim + i) += GramMatrixAgg.roundFix6(vi)
          i += 1
        }
        buf(dim * dim + dim) += 1L
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(o: Int): GramMatrixAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): GramMatrixAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression): GramMatrixAgg =
    copy(child = newChild)

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "gram_matrix"
}

object GramMatrixAgg {
  /** round(y·10⁶) with Spark `round()` semantics (HALF_UP over the
    * `Double.toString` decimal form — away from zero on ties). Fast path
    * for values off the tie boundary; BigDecimal only within 1e-9 of a
    * .5 boundary (where `floor(x+0.5)`'s double-rounding bug could bite). */
  def roundFix6(y: Double): Long = {
    val scaled = y * 1e6
    val a = math.abs(scaled)
    val f = math.floor(a + 0.5)
    if (math.abs(a + 0.5 - f) > 1e-9 && a < 4.0e15)
      if (scaled < 0) -f.toLong else f.toLong
    else
      java.math.BigDecimal.valueOf(scaled)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()
  }
}
