package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

/** Element-wise sum of float vectors as a typed aggregate: the building
  * block of distributed centroid computation (mean = vec_sum / count).
  * The buffer is one double array of the vector dimension, partial
  * aggregation applies, and the shuffle carries O(dim) bytes per group —
  * vs. the posexplode alternative that shuffles dim× rows per input
  * vector. Null vectors are ignored; a group with no non-null input sums
  * to null. Mixed dimensions within a group are a caller error and fail
  * fast.
  */
case class VecSum(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]] {

  override def children: Seq[Expression] = Seq(child)

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"vec_sum expects array<float> or array<double>, got ${other.sql}")
  }

  private val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  override def createAggregationBuffer(): Array[Double] = null

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v == null) return buf
    val xs = v.asInstanceOf[ArrayData]
    val n  = xs.numElements()
    val acc =
      if (buf == null) new Array[Double](n)
      else {
        require(buf.length == n,
          s"vec_sum: mixed vector dimensions in one group (${buf.length} vs $n)")
        buf
      }
    var i = 0
    while (i < n) {
      if (!xs.isNullAt(i)) acc(i) += (if (isFloat) xs.getFloat(i).toDouble else xs.getDouble(i))
      i += 1
    }
    acc
  }

  override def merge(b1: Array[Double], b2: Array[Double]): Array[Double] = {
    if (b2 == null) return b1
    if (b1 == null) return b2
    require(b1.length == b2.length,
      s"vec_sum: mixed vector dimensions across partials (${b1.length} vs ${b2.length})")
    var i = 0
    while (i < b1.length) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Double]): Any =
    if (buf == null) null else new GenericArrayData(buf)

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    if (buf == null) out.writeInt(-1)
    else {
      out.writeInt(buf.length)
      buf.foreach(out.writeDouble)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n  = in.readInt()
    if (n < 0) null
    else {
      val buf = new Array[Double](n)
      var i = 0
      while (i < n) { buf(i) = in.readDouble(); i += 1 }
      buf
    }
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VecSum =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): VecSum =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): VecSum =
    copy(child = newChildren(0))

  override def prettyName: String = "vec_sum"
}
