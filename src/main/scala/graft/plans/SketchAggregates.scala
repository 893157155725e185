package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.{ImperativeAggregate, TypedImperativeAggregate}
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `graft_misra_gries(term, k)` — a mergeable Misra–Gries heavy-hitter
  * sketch as a native Catalyst aggregate (public algorithm: Misra &
  * Gries '82; the mergeable-summary combine rule is Agarwal et al.,
  * "Mergeable Summaries", PODS '12).
  *
  * Guarantee: with `k` counters, every value whose true frequency
  * exceeds `n / (k + 1)` of the `n` aggregated rows is present in the
  * output, REGARDLESS of how rows are partitioned or in what order
  * partial states merge (each partial is a valid MG summary of its
  * inputs; the combine rule preserves the bound). Residual counts and
  * sub-threshold entries ARE partition-dependent, so callers that need
  * a deterministic answer must treat the output as a candidate
  * SUPERSET and re-count candidates exactly — the standard two-pass
  * frequent-items pattern ([[graft.text.HeavyHitters]] does exactly
  * that, which makes the final answer exact and order-free).
  *
  * Scale shape: the aggregation state is at most `k` (term, count)
  * entries no matter how many rows stream through — map-side partials
  * are `k`-bounded, the final state is `k`-bounded, and the reduce is
  * a single-row tree. At 100 TB with k=1000 the driver sees ~kB.
  *
  * Cost: a miss on a full map pays an O(k) decrement sweep, but each
  * sweep destroys k units of stored count and each update adds one, so
  * total sweep work is bounded by total updates — amortized O(1).
  */
case class MisraGriesAgg(
    child: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[String, Long]]
  with BinaryLike[Expression] {

  private lazy val k: Int = kExpr.eval().asInstanceOf[Number].intValue

  override def left: Expression = child
  override def right: Expression = kExpr

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_misra_gries needs a string column, got ${child.dataType.simpleString}")
    else if (!kExpr.foldable ||
        !Seq[DataType](IntegerType, LongType, ShortType, ByteType).contains(kExpr.dataType))
      TypeCheckResult.TypeCheckFailure("graft_misra_gries k must be an integer literal")
    else if (kExpr.eval() == null || k <= 0)
      TypeCheckResult.TypeCheckFailure("graft_misra_gries k must be positive")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("term", StringType, nullable = false),
      StructField("cnt", LongType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = false

  override def createAggregationBuffer(): java.util.HashMap[String, Long] =
    new java.util.HashMap[String, Long]()

  override def update(buf: java.util.HashMap[String, Long],
      input: InternalRow): java.util.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    val term = v.asInstanceOf[UTF8String].toString
    val cur = buf.get(term)
    if (cur != 0L || buf.containsKey(term)) buf.put(term, cur + 1L)
    else if (buf.size < k) buf.put(term, 1L)
    else { // decrement-all: the arriving term and every counter lose 1
      val it = buf.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue <= 1L) it.remove() else e.setValue(e.getValue - 1L)
      }
    }
    buf
  }

  override def merge(a: java.util.HashMap[String, Long],
      b: java.util.HashMap[String, Long]): java.util.HashMap[String, Long] = {
    b.forEach { (term, c) =>
      val cur = a.get(term)
      a.put(term, cur + c)
    }
    if (a.size > k) {
      // subtract the (k+1)-th largest count from all (Agarwal '12):
      // still a valid MG summary, back down to ≤ k entries
      val counts = new Array[Long](a.size)
      var i = 0
      a.forEach { (_, c) => counts(i) = c; i += 1 }
      java.util.Arrays.sort(counts)
      val d = counts(a.size - k - 1)
      val it = a.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue <= d) it.remove() else e.setValue(e.getValue - d)
      }
    }
    a
  }

  override def eval(buf: java.util.HashMap[String, Long]): Any = {
    val entries = new Array[(String, Long)](buf.size)
    var i = 0
    buf.forEach { (t, c) => entries(i) = (t, c); i += 1 }
    // (cnt desc, term) order: stable presentation for specs/debugging
    val sorted = entries.sortBy { case (t, c) => (-c, t) }
    new GenericArrayData(sorted.map { case (t, c) =>
      InternalRow(UTF8String.fromString(t), c)
    }.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: java.util.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.forEach { (t, c) =>
      val bytes = t.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(bytes.length)
      out.write(bytes)
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val m = new java.util.HashMap[String, Long](n * 2)
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      m.put(new String(b, java.nio.charset.StandardCharsets.UTF_8), in.readLong())
      i += 1
    }
    m
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MisraGriesAgg =
    copy(child = newLeft, kExpr = newRight)

  override def prettyName: String = "graft_misra_gries"
}
