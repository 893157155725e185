package graft.schema

import org.apache.spark.sql.types._

/** Recursive, widening union of [[StructType]]s — the engine's one true
  * aggregate (SURVEY §2.4 A2).
  *
  * The reference folds per-record inferred schemas into a single table
  * schema (`inferSchema`, reference `pkg/usecase/bigquery.go:47-62`,
  * delegating to the `bqs` library's `Infer`/`Merge`). We reproduce the
  * semantics over Spark [[StructType]]s:
  *
  *   - field union by name (order of first appearance is kept, so the
  *     merge is deterministic for a given input order; equality of the
  *     *set* of fields is order-insensitive),
  *   - numeric widening (byte < short < int < long < float < double;
  *     any int/float mix widens to double — JSON numbers are doubles in
  *     the reference, see SURVEY §1.2),
  *   - NullType is the identity element (a field seen only as `null`
  *     carries no type — reference strips nils pre-inference,
  *     `pkg/usecase/utils.go:14-154`),
  *   - struct/struct and array/array merge element-wise recursively,
  *   - irreconcilable pairs (struct vs atomic, array vs atomic, …)
  *     either raise [[SchemaMergeConflict]] (strict — matches `bqs.Merge`
  *     returning an error, reference `pkg/usecase/bigquery.go:27-29`) or
  *     widen to StringType (lenient — data is re-serialized as JSON).
  *
  * Laws (tested in SchemaMergeSpec): commutative up to field order,
  * associative, idempotent; NullType is the unit.
  */
object SchemaMerge {

  final class SchemaMergeConflict(path: String, a: DataType, b: DataType)
      extends RuntimeException(
        s"irreconcilable types at '$path': ${a.simpleString} vs ${b.simpleString}")

  /** Merge two struct schemas. */
  def merge(a: StructType, b: StructType, lenient: Boolean = true): StructType =
    mergeStruct(a, b, "", lenient)

  /** Fold many schemas (e.g. per-batch inferred schemas). */
  def mergeAll(ss: Seq[StructType], lenient: Boolean = true): StructType =
    ss.foldLeft(StructType(Nil))((acc, s) => merge(acc, s, lenient))

  private def mergeStruct(a: StructType, b: StructType, path: String,
      lenient: Boolean): StructType = {
    val byName = b.fields.map(f => f.name -> f).toMap
    val merged = a.fields.map { fa =>
      byName.get(fa.name) match {
        case Some(fb) =>
          val p = if (path.isEmpty) fa.name else s"$path.${fa.name}"
          StructField(fa.name, mergeType(fa.dataType, fb.dataType, p, lenient),
            fa.nullable || fb.nullable)
        case None => fa.copy(nullable = true)
      }
    }
    val aNames = a.fieldNames.toSet
    val extra = b.fields.filterNot(f => aNames(f.name)).map(_.copy(nullable = true))
    StructType(merged ++ extra)
  }

  private[schema] def mergeType(a: DataType, b: DataType, path: String,
      lenient: Boolean): DataType = (a, b) match {
    case (x, y) if x == y => x
    case (NullType, y) => y
    case (x, NullType) => x
    case (x: StructType, y: StructType) => mergeStruct(x, y, path, lenient)
    case (ArrayType(x, nx), ArrayType(y, ny)) =>
      ArrayType(mergeType(x, y, s"$path[]", lenient), nx || ny)
    case (x: NumericType, y: NumericType) => widenNumeric(x, y)
    // date/timestamp widening: a value seen as both is a timestamp
    case (DateType, TimestampType) | (TimestampType, DateType) => TimestampType
    case (x, y) =>
      if (lenient) StringType
      else throw new SchemaMergeConflict(path, x, y)
  }

  private def intRank(t: DataType): Option[Int] = t match {
    case ByteType => Some(1)
    case ShortType => Some(2)
    case IntegerType => Some(3)
    case LongType => Some(4)
    case _ => None
  }

  private def isFractional(t: DataType): Boolean = t match {
    case FloatType | DoubleType => true
    case _ => false
  }

  /** byte < short < int < long; float < double; int ∪ float → double
    * (mirrors JSON-number-is-double, SURVEY §1.2). Decimal joins as the
    * smallest decimal containing both; decimal ∪ float → double.
    */
  private def widenNumeric(a: NumericType, b: NumericType): DataType = (a, b) match {
    case (x: DecimalType, y: DecimalType) =>
      val scale = math.max(x.scale, y.scale)
      val intDigits = math.max(x.precision - x.scale, y.precision - y.scale)
      DecimalType(math.min(intDigits + scale, DecimalType.MAX_PRECISION), scale)
    case (x: DecimalType, y) if intRank(y).isDefined =>
      widenNumeric(x, DecimalType(20, 0))
    case (x, y: DecimalType) if intRank(x).isDefined =>
      widenNumeric(DecimalType(20, 0), y)
    case (_: DecimalType, _) | (_, _: DecimalType) => DoubleType
    case (x, y) if intRank(x).isDefined && intRank(y).isDefined =>
      if (intRank(x).get >= intRank(y).get) x else y
    case (FloatType, FloatType) => FloatType
    case _ => DoubleType // any int/float or float/double mix
  }

  /** Drop fields whose type is NullType (and empty structs / arrays-of-
    * nothing left behind) — schema-level equivalent of the reference's
    * `cloneWithoutNil` deep data-clean (`pkg/usecase/utils.go:14-154`):
    * a field observed only as null/empty must not reach the table schema.
    */
  def pruneNullTypes(s: StructType): StructType =
    StructType(s.fields.flatMap(f => pruneType(f.dataType).map(t => f.copy(dataType = t))))

  private def pruneType(t: DataType): Option[DataType] = t match {
    case NullType => None
    case s: StructType =>
      val p = pruneNullTypes(s)
      if (p.fields.isEmpty) None else Some(p)
    case ArrayType(e, n) => pruneType(e).map(ArrayType(_, n))
    case other => Some(other)
  }

  /** True iff data written with schema `have` can be read as `want`
    * without loss, i.e. merge(have, want) == want up to field order. */
  def subsumes(want: StructType, have: StructType): Boolean =
    normalize(merge(want, have)) == normalize(want)

  /** Sort fields recursively by name — canonical form for comparisons. */
  def normalize(s: StructType): StructType =
    StructType(s.fields.map(f => f.copy(dataType = normalizeType(f.dataType)))
      .sortBy(_.name))

  private def normalizeType(t: DataType): DataType = t match {
    case s: StructType => normalize(s)
    case ArrayType(e, n) => ArrayType(normalizeType(e), n)
    case other => other
  }
}
