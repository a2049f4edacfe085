package graft.functions

import org.apache.datasketches.hll.{HllSketch, TgtHllType, Union}
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Compact HLL_4 distinct-count sketches for the graph/ANF family.
  *
  * Spark's built-in `hll_sketch_agg` family targets HLL_8 (one byte
  * per register) and ships the UPDATABLE serialization — a saturated
  * lgK=12 sketch is ~4.1 KB on every wire crossing. The ANF queries
  * (q346/q356) ship one sketch per EDGE per round, so sketch bytes
  * are the dominant shuffle volume in the dense regime: the r12
  * graph-zipf probe measured 51.9 GB of sketch shuffle at the 100×
  * tier, disk-bound (VERDICT r12 #5).
  *
  * These aggregates run the SAME DataSketches HLL estimator (same
  * lgK, same coupon hashing, identical estimates — HLL_4 stores each
  * register as a 4-bit offset from a running minimum with a lossless
  * exception map; Heule et al.'s HLL++ register packing, as shipped
  * by Apache DataSketches) but
  *   (a) target HLL_4 — half the dense register bytes, and
  *   (b) serialize COMPACT everywhere a sketch crosses the wire:
  *       the aggregation buffer between partial and merge, and the
  *       eval output the join ships. Compact serialization also
  *       keeps low-cardinality nodes in DataSketches' LIST/SET
  *       coupon form (~8 B per distinct below ~512 items at lgK=12)
  *       — the "sparse below threshold" encoding — so a power-law
  *       graph's long tail of small neighborhoods ships tens of
  *       bytes, not a fixed-size register array.
  *
  * Estimates are Math.round(getEstimate), matching the built-in
  * `hll_sketch_estimate` contract, so the ±5% in-plan audit gates in
  * q346/q356 are unchanged.
  */
object SketchUtil {
  /** lgK = 12 matches Spark's hll_sketch_agg default: 4096 registers,
    * ~1.6% standard error — the precision the ANF ±5% gates assume. */
  val DefaultLgK = 12

  def emptySketch(lgK: Int): HllSketch = new HllSketch(lgK, TgtHllType.HLL_4)

  def updateWith(sk: HllSketch, dt: DataType, v: Any): Unit = dt match {
    case LongType => sk.update(v.asInstanceOf[Long])
    case IntegerType => sk.update(v.asInstanceOf[Int].toLong)
    case StringType => sk.update(v.asInstanceOf[UTF8String].getBytes)
    case BinaryType => sk.update(v.asInstanceOf[Array[Byte]])
    case other => throw new IllegalStateException(
      s"graft_hll4_agg: unsupported input type ${other.simpleString}")
  }

  val sketchInputTypes: Seq[DataType] =
    Seq(LongType, IntegerType, StringType, BinaryType)
}

/** `graft_hll4_agg(col[, lgK])` → compact HLL_4 sketch bytes. */
case class Hll4SketchAgg(
    child: Expression,
    lgK: Int = SketchUtil.DefaultLgK,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[HllSketch] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = GraftFunctions.HLL4_AGG

  override def checkInputDataTypes(): TypeCheckResult =
    if (SketchUtil.sketchInputTypes.contains(child.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs bigint/int/string/binary, got " +
        child.dataType.simpleString)

  override def createAggregationBuffer(): HllSketch =
    SketchUtil.emptySketch(lgK)

  override def update(buffer: HllSketch, input: InternalRow): HllSketch = {
    val v = child.eval(input)
    if (v != null) SketchUtil.updateWith(buffer, child.dataType, v)
    buffer
  }

  override def merge(buffer: HllSketch, input: HllSketch): HllSketch = {
    val u = new Union(lgK)
    u.update(buffer)
    u.update(input)
    u.getResult(TgtHllType.HLL_4)
  }

  override def eval(buffer: HllSketch): Any = buffer.toCompactByteArray

  // compact on the partial→merge wire too: that exchange carries one
  // buffer per (group, map-side partition), the same volume class as
  // the eval output at high group counts
  override def serialize(buffer: HllSketch): Array[Byte] =
    buffer.toCompactByteArray
  override def deserialize(bytes: Array[Byte]): HllSketch =
    HllSketch.heapify(bytes)

  override def withNewMutableAggBufferOffset(o: Int): Hll4SketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): Hll4SketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Hll4SketchAgg =
    copy(child = newChildren(0))
}

/** `graft_hll4_union_agg(sketchCol)` → compact HLL_4 union bytes.
  * The buffer is a DataSketches Union (HLL_8 gadget internally — the
  * in-memory merge-optimal form); every SERIALIZED crossing is the
  * compact HLL_4 result, so wire bytes stay halved while in-heap
  * merging keeps the fast path. */
case class Hll4UnionAgg(
    child: Expression,
    lgK: Int = SketchUtil.DefaultLgK,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Union] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = GraftFunctions.HLL4_UNION_AGG

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs binary sketch input, got " +
        child.dataType.simpleString)

  override def createAggregationBuffer(): Union = new Union(lgK)

  override def update(buffer: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    // wrap, not heapify: this is the per-EDGE-row hot path of every
    // ANF round, and heapify copies the image into a fresh heap
    // sketch before the union reads it once — a read-only wrap over
    // the row's byte[] feeds the same registers with zero copy
    if (v != null)
      buffer.update(HllSketch.wrap(Memory.wrap(v.asInstanceOf[Array[Byte]])))
    buffer
  }

  override def merge(buffer: Union, input: Union): Union = {
    buffer.update(input.getResult(TgtHllType.HLL_4))
    buffer
  }

  override def eval(buffer: Union): Any =
    buffer.getResult(TgtHllType.HLL_4).toCompactByteArray

  override def serialize(buffer: Union): Array[Byte] =
    buffer.getResult(TgtHllType.HLL_4).toCompactByteArray
  override def deserialize(bytes: Array[Byte]): Union = {
    val u = new Union(lgK)
    u.update(HllSketch.heapify(bytes))
    u
  }

  override def withNewMutableAggBufferOffset(o: Int): Hll4UnionAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): Hll4UnionAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Hll4UnionAgg =
    copy(child = newChildren(0))
}

/** `graft_hll4_union(a, b)` — pairwise sketch union, compact HLL_4
  * out. Runs O(nodes) times in a final projection (not O(pairs)), so
  * CodegenFallback costs nothing measurable next to the heapify. */
case class Hll4Union(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = BinaryType
  override def prettyName: String = GraftFunctions.HLL4_UNION

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs two binary sketches, got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")

  override def nullSafeEval(a: Any, b: Any): Any = {
    // read-only wrap (see Hll4UnionAgg.update) — both inputs are
    // consumed exactly once by the union
    val sa = HllSketch.wrap(Memory.wrap(a.asInstanceOf[Array[Byte]]))
    val sb = HllSketch.wrap(Memory.wrap(b.asInstanceOf[Array[Byte]]))
    // lgK comes from the inputs (max of the two), not a hardcoded
    // default: sketches built at a non-default lgK would otherwise
    // be silently downsampled here while the agg paths keep full
    // precision (ADVICE r13). A Union at the max input lgK never
    // discards resolution itself; mixed-lgK inputs still meet at
    // the coarser one, which is information-theoretically forced.
    val u = new Union(math.max(sa.getLgConfigK, sb.getLgConfigK))
    u.update(sa)
    u.update(sb)
    u.getResult(TgtHllType.HLL_4).toCompactByteArray
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Hll4Union = copy(left = newLeft, right = newRight)
}

/** `graft_hll4_estimate(sketch)` → rounded long, the built-in
  * `hll_sketch_estimate` contract. */
case class Hll4Estimate(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def prettyName: String = GraftFunctions.HLL4_ESTIMATE

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a binary sketch, got " +
        child.dataType.simpleString)

  override def nullSafeEval(a: Any): Any =
    Math.round(HllSketch.wrap(
      Memory.wrap(a.asInstanceOf[Array[Byte]])).getEstimate)

  override protected def withNewChildInternal(
      newChild: Expression): Hll4Estimate = copy(child = newChild)
}

/** Column-API entry points (register via GraftFunctions/Extensions). */
object SketchFunctions {
  def hll4Agg(c: Column): Column =
    call_function(GraftFunctions.HLL4_AGG, c)
  def hll4UnionAgg(c: Column): Column =
    call_function(GraftFunctions.HLL4_UNION_AGG, c)
  def hll4Union(a: Column, b: Column): Column =
    call_function(GraftFunctions.HLL4_UNION, a, b)
  def hll4Estimate(c: Column): Column =
    call_function(GraftFunctions.HLL4_ESTIMATE, c)
}
