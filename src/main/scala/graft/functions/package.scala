package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Engine-side scalar helpers (SURVEY §2.6).
  *
  * The reference's scalar surface is tiny — deterministic row IDs
  * (md5 of canonically-serialized record, `pkg/domain/types/types.go:27-34`),
  * float-seconds→timestamp (`pkg/usecase/load.go:233-236`), base64/hex
  * digests (`pkg/domain/model/message.go:82-91`) — everything else rules
  * get from Rego and we get from `org.apache.spark.sql.functions`.
  */
package object functions {

  /** Rebuild a struct column with fields recursively sorted by name —
    * canonical form so `to_json` emits deterministic key order (Go's
    * `json.Marshal` sorts map keys; reference relies on that for
    * md5-stable IDs, `pkg/domain/types/types_test.go:90`).
    */
  def sortedStruct(col: Column, schema: StructType): Column = {
    val fields = schema.fields.sortBy(_.name).map { f =>
      canonicalize(col.getField(f.name), f.dataType).as(f.name)
    }
    when(col.isNull, lit(null).cast(canonicalType(schema)))
      .otherwise(struct(fields.toIndexedSeq: _*))
  }

  private def canonicalize(c: Column, t: DataType): Column = t match {
    case s: StructType => sortedStruct(c, s)
    case ArrayType(e: StructType, _) => transform(c, x => sortedStruct(x, e))
    case ArrayType(e @ ArrayType(_, _), _) => transform(c, x => canonicalize(x, e))
    case _ => c
  }

  private def canonicalType(t: DataType): DataType = t match {
    case s: StructType =>
      StructType(s.fields.sortBy(_.name).map(f =>
        f.copy(dataType = canonicalType(f.dataType))))
    case ArrayType(e, n) => ArrayType(canonicalType(e), n)
    case other => other
  }

  /** Canonical JSON of a struct column: recursively key-sorted. */
  def canonicalJson(col: Column, schema: StructType): Column =
    to_json(sortedStruct(col, schema))

  /** Deterministic row ID = hex(md5(canonical_json(data))) — the dedup
    * key when a rule supplies no `id` (ref `types.go:27-34`). */
  def logId(data: Column, schema: StructType): Column =
    md5(canonicalJson(data, schema))

  /** Float Unix seconds (fractional kept to micros) → timestamp
    * (ref `load.go:233-236`; policy emits float64 seconds). */
  def floatSecondsToTimestamp(c: Column): Column =
    timestamp_micros((c.cast(DoubleType) * 1000000L).cast(LongType))

  /** base64-encoded md5 (GCS style) → lowercase hex digest
    * (ref `message.go:82-91`). */
  def b64Md5ToHex(c: Column): Column = lower(hex(unbase64(c)))

  /** Parse + validate a `gs://bucket/object` URL into a
    * `struct(bucket, name, path)` row, NULL when invalid — the
    * column-level twin of the reference's `CSUrl.Parse`
    * (`types.go:81-104`: must have the gs:// prefix, a non-empty
    * bucket, and an object part; the object may contain further
    * slashes). Being an expression, a million-URL work-list validates
    * inside the scan, not on the driver. */
  def parseGsUrl(url: Column): Column = {
    val bucket = regexp_extract(url, "^gs://([^/]+)/(.*)$", 1)
    val name = regexp_extract(url, "^gs://([^/]+)/(.*)$", 2)
    when(url.startsWith("gs://") && bucket =!= "",
      struct(bucket.as("bucket"), name.as("name"), url.as("path")))
      .otherwise(lit(null).cast(
        "struct<bucket:string,name:string,path:string>"))
  }

  /** Project a struct column onto a target struct schema: fields present
    * in both are recursively aligned/cast, fields only in the target
    * become NULLs, fields only in the source are dropped. This is how a
    * batch with schema A is written into an evolved table with schema
    * merge(A, B) — and how null-only fields are pruned.
    */
  def alignStruct(col: Column, source: StructType, target: StructType): Column = {
    val srcByName = source.fields.map(f => f.name -> f).toMap
    val fields = target.fields.map { tf =>
      (srcByName.get(tf.name) match {
        case Some(sf) => alignType(col.getField(tf.name), sf.dataType, tf.dataType)
        case None => lit(null).cast(tf.dataType)
      }).as(tf.name)
    }
    when(col.isNull, lit(null).cast(target)).otherwise(struct(fields.toIndexedSeq: _*))
  }

  private def alignType(c: Column, src: DataType, tgt: DataType): Column =
    (src, tgt) match {
      case (s, t) if s == t => c
      case (s: StructType, t: StructType) => alignStruct(c, s, t)
      case (ArrayType(s: StructType, _), ArrayType(t: StructType, _)) =>
        transform(c, x => alignStruct(x, s, t))
      case (ArrayType(s, _), ArrayType(t, _)) =>
        transform(c, x => alignType(x, s, t))
      case (_, t) => c.cast(t)
    }
}
