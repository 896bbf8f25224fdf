package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Element-wise INTEGER vector statistics aggregate: one pass over an
  * `array<bigint>` column producing per-dimension count/sum/sum-of-
  * squares/min/max — the data-quality scan every embedding store runs
  * before trusting an index (dead dimensions, clipped ranges, scale
  * drift), WITHOUT the d× row amplification a posexplode + groupBy(dim)
  * plan pays (at 100 TB and d = 64 that amplification IS the job).
  *
  * The aggregate is partial-aggregatable: each map task folds its rows
  * into one (d·4 + 1)-long buffer and the shuffle carries ONE buffer per
  * task, not N·d rows. All arithmetic is integer (callers quantize
  * floats deterministically first — see q163), so the result is
  * order-independent and bit-exact cross-engine, sidestepping the
  * unordered-float-sum parity hazard entirely.
  *
  * Overflow headroom: |q| ≤ Q ⇒ per-dim sumsq ≤ N·Q². At Q = 10⁶
  * (unit-scale embeddings at 1e-6 quantization) Long.MaxValue/Q² bounds
  * the WORST case at ~9.2·10⁶ rows; the typical case is ~d× roomier
  * (unit-NORM vectors put E[q²] ≈ Q²/d, so ~6·10⁸ rows at d = 64). A
  * corpus beyond that needs the 128-bit-accumulator variant of this
  * buffer — and because that boundary is real at the 100 TB target, the
  * accumulation is exact-guarded (Math.addExact/multiplyExact): crossing
  * it FAILS LOUDLY with ArithmeticException, matching the fail-loud
  * convention of the ragged-dims require, instead of silently wrapping
  * into wrong means/stds.
  */
object VecStatsAgg {
  def vec_int_stats(vec: Column): Column =
    GraftColumnBridge.column(
      VecIntStats(GraftColumnBridge.expression(vec)).toAggregateExpression())
}

/** Mutable accumulation state: `dim = -1` marks "no rows seen yet" (the
  * dimension is discovered from the first vector; ragged inputs fail
  * loudly rather than mis-sum). */
final class VecStatsBuffer(var n: Long, var dim: Int,
                           var sums: Array[Long], var sumsqs: Array[Long],
                           var mins: Array[Long], var maxs: Array[Long])

case class VecIntStats(vec: Expression,
                       mutableAggBufferOffset: Int = 0,
                       inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[VecStatsBuffer] {

  override def children: Seq[Expression] = Seq(vec)
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("sums", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("sumsqs", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("mins", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("maxs", ArrayType(LongType, containsNull = false), nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = vec.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"vec_int_stats expects ARRAY<BIGINT>, got ${other.sql}")
  }

  override def createAggregationBuffer(): VecStatsBuffer =
    new VecStatsBuffer(0L, -1, null, null, null, null)

  private def init(b: VecStatsBuffer, d: Int): Unit = {
    b.dim = d
    b.sums = new Array[Long](d)
    b.sumsqs = new Array[Long](d)
    b.mins = Array.fill(d)(Long.MaxValue)
    b.maxs = Array.fill(d)(Long.MinValue)
  }

  override def update(b: VecStatsBuffer, input: InternalRow): VecStatsBuffer = {
    val v = vec.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val d = arr.numElements()
      if (b.dim < 0) init(b, d)
      require(b.dim == d, s"ragged vectors: saw dim $d after ${b.dim}")
      var i = 0
      while (i < d) {
        val x = arr.getLong(i)
        // exact-guarded: overflow throws instead of silently wrapping
        b.sums(i) = Math.addExact(b.sums(i), x)
        b.sumsqs(i) = Math.addExact(b.sumsqs(i), Math.multiplyExact(x, x))
        if (x < b.mins(i)) b.mins(i) = x
        if (x > b.maxs(i)) b.maxs(i) = x
        i += 1
      }
      b.n += 1
    }
    b
  }

  override def merge(b: VecStatsBuffer, o: VecStatsBuffer): VecStatsBuffer = {
    if (o.dim >= 0) {
      if (b.dim < 0) init(b, o.dim)
      require(b.dim == o.dim, s"ragged vectors: merging dim ${o.dim} into ${b.dim}")
      var i = 0
      while (i < b.dim) {
        b.sums(i) = Math.addExact(b.sums(i), o.sums(i))
        b.sumsqs(i) = Math.addExact(b.sumsqs(i), o.sumsqs(i))
        if (o.mins(i) < b.mins(i)) b.mins(i) = o.mins(i)
        if (o.maxs(i) > b.maxs(i)) b.maxs(i) = o.maxs(i)
        i += 1
      }
      b.n += o.n
    }
    b
  }

  override def eval(b: VecStatsBuffer): Any = {
    val d = math.max(b.dim, 0)
    def ga(a: Array[Long]): GenericArrayData =
      new GenericArrayData(if (a == null) new Array[Long](0) else a)
    InternalRow(b.n, ga(b.sums), ga(b.sumsqs),
                ga(if (d == 0) null else b.mins), ga(if (d == 0) null else b.maxs))
  }

  override def serialize(b: VecStatsBuffer): Array[Byte] = {
    val d = math.max(b.dim, 0)
    val bos = new java.io.ByteArrayOutputStream(16 + d * 32)
    val out = new java.io.DataOutputStream(bos)
    out.writeLong(b.n); out.writeInt(b.dim)
    var i = 0
    while (i < d) {
      out.writeLong(b.sums(i)); out.writeLong(b.sumsqs(i))
      out.writeLong(b.mins(i)); out.writeLong(b.maxs(i))
      i += 1
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): VecStatsBuffer = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readLong(); val dim = in.readInt()
    val b = createAggregationBuffer()
    if (dim >= 0) {
      init(b, dim); b.n = n
      var i = 0
      while (i < dim) {
        b.sums(i) = in.readLong(); b.sumsqs(i) = in.readLong()
        b.mins(i) = in.readLong(); b.maxs(i) = in.readLong()
        i += 1
      }
    }
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VecIntStats =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VecIntStats =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(vec = newChildren(0))
}
