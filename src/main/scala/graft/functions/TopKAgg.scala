package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded-heap top-k-per-group AGGREGATE — top-k as a first-class
  * aggregate function rather than a window idiom.
  *
  * Honest comparison with `row_number().over(...)` + `filter(rnk <= k)`:
  * since 3.5 Spark's `InferWindowGroupLimit` already inserts a partial
  * `WindowGroupLimit` that heap-prunes each map partition to k rows per
  * key before the shuffle (our q5 plan shows it), so raw shuffle volume
  * is comparable. What the aggregate form still buys:
  *  - composability: it sits INSIDE `groupBy().agg(...)` next to other
  *    aggregates (count, sum, …) in one pass — a window can't;
  *  - no post-shuffle Sort + Window pass over the survivors: the final
  *    merge is heap-merge in the aggregate, output already rank-ordered;
  *  - streaming-capable (aggregates work in update-mode streaming;
  *    windows don't).
  * It is also the repo's TypedImperativeAggregate reference (serialize /
  * merge / partial-agg contract).
  *
  * Ranking order: score descending, id ascending on ties (a total order,
  * so results are deterministic and oracle-checkable). Returns
  * `array<struct<score double, id long>>` in rank order — posexplode to
  * get (rank-1, row).
  */
object TopKAgg {
  def top_k_by_score(score: Column, id: Column, k: Int): Column =
    GraftColumnBridge.column(
      TopKByScore(GraftColumnBridge.expression(score),
                  GraftColumnBridge.expression(id), k)
        .toAggregateExpression())

  /** [[top_k_by_score]] with a STRING payload carried alongside each
    * element (same (score desc, id asc) total order — the tag never
    * participates in ranking). Exists so an argmax that must RETRIEVE an
    * attribute (q290's winning source) stays on the ObjectHashAggregate
    * path: the `max_by(struct(...), struct(...))` alternative is a
    * DeclarativeAggregate with a var-width buffer, which HashAggregate's
    * mutable-buffer contract rejects — Spark plans a per-partition
    * SortAggregate (a corpus-wide local sort) for it, measured on q290's
    * first draft. */
  def top_k_by_score_tagged(score: Column, id: Column, tag: Column,
                            k: Int): Column =
    GraftColumnBridge.column(
      TopKByScoreTagged(GraftColumnBridge.expression(score),
                        GraftColumnBridge.expression(id),
                        GraftColumnBridge.expression(tag), k)
        .toAggregateExpression())
}

case class TopKByScore(score: Expression, id: Expression, k: Int,
                       mutableAggBufferOffset: Int = 0,
                       inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.PriorityQueue[(Double, Long)]] {

  require(k > 0, s"k must be positive, got $k")

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("score", DoubleType, nullable = false),
                   StructField("id", LongType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (score.dataType == DoubleType && id.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"top_k_by_score expects (DOUBLE, BIGINT), got " +
        s"(${score.dataType.sql}, ${id.dataType.sql})")

  // Heap keeps the WORST kept element at the head (smallest score; ties →
  // largest id), so admission is a single head comparison.
  private def worstFirst = new java.util.Comparator[(Double, Long)] {
    override def compare(a: (Double, Long), b: (Double, Long)): Int = {
      val c = java.lang.Double.compare(a._1, b._1)
      if (c != 0) c else java.lang.Long.compare(b._2, a._2)
    }
  }

  override def createAggregationBuffer(): java.util.PriorityQueue[(Double, Long)] =
    new java.util.PriorityQueue[(Double, Long)](k + 1, worstFirst)

  private def offer(h: java.util.PriorityQueue[(Double, Long)], s: Double, i: Long): Unit = {
    if (h.size < k) h.add((s, i))
    else {
      val w = h.peek()
      val better = s > w._1 || (s == w._1 && i < w._2)
      if (better) { h.poll(); h.add((s, i)) }
    }
  }

  override def update(h: java.util.PriorityQueue[(Double, Long)],
                      input: InternalRow): java.util.PriorityQueue[(Double, Long)] = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      offer(h, s.asInstanceOf[Double], i.asInstanceOf[Long])
    h
  }

  override def merge(h: java.util.PriorityQueue[(Double, Long)],
                     other: java.util.PriorityQueue[(Double, Long)]): java.util.PriorityQueue[(Double, Long)] = {
    val it = other.iterator()
    while (it.hasNext) { val (s, i) = it.next(); offer(h, s, i) }
    h
  }

  override def eval(h: java.util.PriorityQueue[(Double, Long)]): Any = {
    // poll() drains worst-first; writing back-to-front leaves the array
    // best-first, i.e. rank order
    val arr = new Array[Any](h.size)
    var i = arr.length - 1
    while (i >= 0) {
      val (s, id0) = h.poll()
      arr(i) = InternalRow(s, id0)
      i -= 1
    }
    new GenericArrayData(arr)
  }

  override def serialize(h: java.util.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream(8 + h.size * 16)
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(h.size)
    val it = h.iterator()
    while (it.hasNext) { val (s, i) = it.next(); out.writeDouble(s); out.writeLong(i) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.PriorityQueue[(Double, Long)] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val h = createAggregationBuffer()
    var i = 0
    while (i < n) { h.add((in.readDouble(), in.readLong())); i += 1 }
    h
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(score = newChildren(0), id = newChildren(1))
}

/** [[TopKByScore]] carrying a string tag per element. Ranking contract
  * identical — score descending, id ascending on ties; the tag is
  * payload only. Heap entries are (score, id, tag); the tag is held as a
  * JVM String in the buffer (copied out of the UnsafeRow-backed
  * UTF8String at update, which would otherwise be overwritten by the
  * next input row). */
case class TopKByScoreTagged(score: Expression, id: Expression,
                             tag: Expression, k: Int,
                             mutableAggBufferOffset: Int = 0,
                             inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.PriorityQueue[(Double, Long, String)]] {

  require(k > 0, s"k must be positive, got $k")

  override def children: Seq[Expression] = Seq(score, id, tag)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("score", DoubleType, nullable = false),
                   StructField("id", LongType, nullable = false),
                   StructField("tag", StringType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (score.dataType == DoubleType && id.dataType == LongType &&
        tag.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"top_k_by_score_tagged expects (DOUBLE, BIGINT, STRING), got " +
        s"(${score.dataType.sql}, ${id.dataType.sql}, ${tag.dataType.sql})")

  private def worstFirst = new java.util.Comparator[(Double, Long, String)] {
    override def compare(a: (Double, Long, String),
                         b: (Double, Long, String)): Int = {
      val c = java.lang.Double.compare(a._1, b._1)
      if (c != 0) c else java.lang.Long.compare(b._2, a._2)
    }
  }

  override def createAggregationBuffer(): java.util.PriorityQueue[(Double, Long, String)] =
    new java.util.PriorityQueue[(Double, Long, String)](k + 1, worstFirst)

  private def offer(h: java.util.PriorityQueue[(Double, Long, String)],
                    s: Double, i: Long, t: String): Unit = {
    if (h.size < k) h.add((s, i, t))
    else {
      val w = h.peek()
      val better = s > w._1 || (s == w._1 && i < w._2)
      if (better) { h.poll(); h.add((s, i, t)) }
    }
  }

  override def update(h: java.util.PriorityQueue[(Double, Long, String)],
                      input: InternalRow): java.util.PriorityQueue[(Double, Long, String)] = {
    val s = score.eval(input)
    val i = id.eval(input)
    val t = tag.eval(input)
    if (s != null && i != null && t != null)
      offer(h, s.asInstanceOf[Double], i.asInstanceOf[Long], t.toString)
    h
  }

  override def merge(h: java.util.PriorityQueue[(Double, Long, String)],
                     other: java.util.PriorityQueue[(Double, Long, String)]): java.util.PriorityQueue[(Double, Long, String)] = {
    val it = other.iterator()
    while (it.hasNext) { val (s, i, t) = it.next(); offer(h, s, i, t) }
    h
  }

  override def eval(h: java.util.PriorityQueue[(Double, Long, String)]): Any = {
    val arr = new Array[Any](h.size)
    var i = arr.length - 1
    while (i >= 0) {
      val (s, id0, t) = h.poll()
      arr(i) = InternalRow(s, id0,
        org.apache.spark.unsafe.types.UTF8String.fromString(t))
      i -= 1
    }
    new GenericArrayData(arr)
  }

  // tags serialize as int-length-prefixed raw UTF-8, not writeUTF: the
  // modified-UTF-8 form throws past 64 KB, which would be a latent
  // runtime failure for a caller passing long payloads through this
  // general-purpose aggregate (q290's source tags are short; the format
  // must not assume every caller's are)
  override def serialize(h: java.util.PriorityQueue[(Double, Long, String)]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream(8 + h.size * 24)
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(h.size)
    val it = h.iterator()
    while (it.hasNext) {
      val (s, i, t) = it.next()
      val tb = t.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeDouble(s); out.writeLong(i); out.writeInt(tb.length)
      out.write(tb)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.PriorityQueue[(Double, Long, String)] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val h = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val s = in.readDouble(); val id0 = in.readLong()
      val tb = new Array[Byte](in.readInt())
      in.readFully(tb)
      h.add((s, id0, new String(tb, java.nio.charset.StandardCharsets.UTF_8)))
      i += 1
    }
    h
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScoreTagged =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScoreTagged =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(score = newChildren(0), id = newChildren(1), tag = newChildren(2))
}
