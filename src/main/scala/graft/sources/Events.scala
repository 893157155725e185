package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Decoders for the notification envelopes the reference consumes
  * (SURVEY §2.1 S6-S8): the Pub/Sub push envelope (base64 `message.data`
  * — ref `pkg/domain/model/message.go:32-42`), the Cloud-Storage object
  * event (`message.go:44-104`: string size → long, RFC3339 → timestamp,
  * base64 md5 → hex), and the batch work-list message
  * (`message.go:106-109`: objects[] fan-out).
  *
  * All are fixed-schema `from_json` + column conversions — fully
  * codegen'd projections over the notification stream (which is
  * metadata-sized: one row per object event, never per record).
  */
object Events {

  val pubSubSchema: StructType = StructType(Seq(
    StructField("message", StructType(Seq(
      StructField("messageId", StringType),
      StructField("data", StringType))), nullable = true),
    StructField("subscription", StringType)))

  val storageEventSchema: StructType = StructType(Seq(
    StructField("kind", StringType),
    StructField("name", StringType),
    StructField("bucket", StringType),
    StructField("size", StringType),
    StructField("timeCreated", StringType),
    StructField("md5Hash", StringType)))

  /** Pub/Sub envelope: JSON string column → (message_id, payload) with
    * the base64 data decoded to the inner JSON string. */
  def decodePubSub(json: Column): Column = {
    val env = from_json(json, pubSubSchema)
    struct(
      env.getField("message").getField("messageId").as("message_id"),
      unbase64(env.getField("message").getField("data")).cast(StringType).as("payload"))
  }

  /** Cloud-Storage object event JSON → object metadata row matching
    * [[ObjectSource.list]] columns (+ md5 hex digest): the coercions the
    * reference does in `CloudStorageEvent.ToObject`.
    *
    * Single-expression form: Catalyst's extract-value simplification will
    * duplicate the `from_json` into each of the six extracted fields, so
    * the JSON parse runs 6× per row. Fine for tests and one-off columns;
    * hot paths must use [[decodeStorageEvents]], which stages the parsed
    * struct once behind a projection boundary (measured 3.4× at sf0.1). */
  def decodeStorageEvent(json: Column): Column = {
    val ev = from_json(json, storageEventSchema)
    storageEventFields(ev)
  }

  /** DataFrame-shaped decoder for the hot path: parses `jsonCol` ONCE
    * into a staged struct column, then projects the converted fields from
    * it. The staged alias is referenced six times by the next projection,
    * so `CollapseProject` keeps the boundary and the parse is not
    * re-inlined per field. Output column `as` matches
    * [[decodeStorageEvent]]'s struct exactly. */
  def decodeStorageEvents(df: DataFrame, jsonCol: Column, as: String): DataFrame =
    df.withColumn("__graft_ev", from_json(jsonCol, storageEventSchema))
      .withColumn(as, storageEventFields(col("__graft_ev")))
      .drop("__graft_ev")

  private def storageEventFields(ev: Column): Column =
    struct(
      ev.getField("bucket").as("bucket"),
      ev.getField("name").as("name"),
      concat(lit("gs://"), ev.getField("bucket"), lit("/"), ev.getField("name")).as("path"),
      ev.getField("size").cast(LongType).as("size"),
      to_timestamp(ev.getField("timeCreated")).as("created_at"),
      lower(hex(unbase64(ev.getField("md5Hash")))).as("md5"))

  /** Batch work-list message: `{"objects":[{bucket,name,size},...]}` →
    * one row per object (`explode`, ref S8 fan-out). An explicit `path`
    * in the message (Enqueue writes one) wins over the reconstructed
    * `gs://bucket/name` — local/non-GCS work-lists stay readable. */
  val swarmMessageSchema: StructType = StructType(Seq(
    StructField("objects", ArrayType(StructType(Seq(
      StructField("bucket", StringType),
      StructField("name", StringType),
      StructField("path", StringType),
      StructField("size", LongType)))))))

  def explodeWorkList(df: DataFrame, jsonCol: String): DataFrame =
    df.select(explode(from_json(col(jsonCol), swarmMessageSchema)
        .getField("objects")).as("o"))
      .select(col("o.bucket").as("bucket"), col("o.name").as("name"),
        coalesce(col("o.path"),
          concat(lit("gs://"), col("o.bucket"), lit("/"), col("o.name"))).as("path"),
        col("o.size").as("size"))
}
