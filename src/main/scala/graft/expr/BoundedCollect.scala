package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable.ArrayBuffer

/** Aggregation buffer: collected values, or a latched overflow mark. Once a
  * group exceeds `max` elements the contents are DISCARDED and the group is
  * permanently marked -- per-group memory stays O(max) no matter how hot the
  * key is, on the map side and after every merge. */
final class BoundedBuffer(var items: ArrayBuffer[Any], var overflowed: Boolean)

/** `bounded_collect(child, max)`: collect_list that returns NULL for any
  * group with more than `max` values, using bounded memory per group.
  *
  * This is the scale-safe primitive behind every "hot key cap" in the dedup
  * and ANN operators (LSH band buckets, shingle document frequency): the
  * built-in alternatives either materialize the unbounded group
  * (collect_list then size-filter -- OOM on a 10M-row bucket), sort-exchange
  * the whole table (count-over-window), or recompute the input subtree for
  * a count-side join (the expensive explode/minhash runs 3x). One
  * ObjectHashAggregate pass with map-side partial merge replaces all three;
  * candidate pairs are then generated from the capped arrays directly.
  */
case class BoundedCollect(
    child: Expression,
    max: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[BoundedBuffer]
    with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType | StringType => TypeCheckResult.TypeCheckSuccess
    case s: StructType if s.fields.nonEmpty && s.fields.forall(_.dataType == LongType) =>
      TypeCheckResult.TypeCheckSuccess // all-long structs (e.g. (id, size) pairs)
    case t =>
      TypeCheckResult.TypeCheckFailure(
        s"bounded_collect supports long/int/string/all-long-struct elements, got ${t.simpleString}"
      )
  }

  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "bounded_collect"

  override def createAggregationBuffer(): BoundedBuffer =
    new BoundedBuffer(ArrayBuffer.empty[Any], overflowed = false)

  private def markOverflow(buf: BoundedBuffer): Unit = {
    buf.overflowed = true
    buf.items = ArrayBuffer.empty[Any] // free the memory immediately
  }

  override def update(buf: BoundedBuffer, input: InternalRow): BoundedBuffer = {
    if (!buf.overflowed) {
      val v = child.eval(input)
      if (v != null) {
        if (buf.items.length >= max) markOverflow(buf)
        else
          buf.items += (v match {
            case s: UTF8String  => s.clone() // unsafe rows are reused buffers
            case r: InternalRow => r.copy() // ditto for struct-backed rows
            case other          => other
          })
      }
    }
    buf
  }

  override def merge(buf: BoundedBuffer, other: BoundedBuffer): BoundedBuffer = {
    if (buf.overflowed || other.overflowed) markOverflow(buf)
    else if (buf.items.length + other.items.length > max) markOverflow(buf)
    else buf.items ++= other.items
    buf
  }

  override def eval(buf: BoundedBuffer): Any =
    if (buf.overflowed) null else new GenericArrayData(buf.items.toArray)

  override def serialize(buf: BoundedBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeBoolean(buf.overflowed)
    out.writeInt(buf.items.length)
    child.dataType match {
      case LongType    => buf.items.foreach(v => out.writeLong(v.asInstanceOf[Long]))
      case IntegerType => buf.items.foreach(v => out.writeInt(v.asInstanceOf[Int]))
      case StringType =>
        buf.items.foreach { v =>
          val b = v.asInstanceOf[UTF8String].getBytes
          out.writeInt(b.length)
          out.write(b)
        }
      case s: StructType =>
        val w = s.fields.length
        buf.items.foreach { v =>
          val r = v.asInstanceOf[InternalRow]
          var i = 0
          while (i < w) { out.writeLong(r.getLong(i)); i += 1 }
        }
      case t => throw new IllegalStateException(s"unsupported element type $t")
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): BoundedBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val overflowed = in.readBoolean()
    val n = in.readInt()
    val items = new ArrayBuffer[Any](n)
    child.dataType match {
      case LongType    => (0 until n).foreach(_ => items += in.readLong())
      case IntegerType => (0 until n).foreach(_ => items += in.readInt())
      case StringType =>
        (0 until n).foreach { _ =>
          val len = in.readInt()
          val b = new Array[Byte](len)
          in.readFully(b)
          items += UTF8String.fromBytes(b)
        }
      case s: StructType =>
        val w = s.fields.length
        (0 until n).foreach { _ =>
          val vals = new Array[Any](w)
          var i = 0
          while (i < w) { vals(i) = in.readLong(); i += 1 }
          items += new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(vals)
        }
      case t => throw new IllegalStateException(s"unsupported element type $t")
    }
    new BoundedBuffer(items, overflowed)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedCollect =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedCollect =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BoundedCollect =
    copy(child = newChild)
}

object BoundedCollect {
  /** Column API: collect up to `max` values per group, NULL beyond. */
  def bounded_collect(c: Column, max: Int): Column =
    org.apache.spark.sql.GraftBridge.column(
      BoundedCollect(org.apache.spark.sql.GraftBridge.expression(c), max).toAggregateExpression()
    )
}
