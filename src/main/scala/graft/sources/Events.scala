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
    * reference does in `CloudStorageEvent.ToObject`. */
  def decodeStorageEvent(json: Column): Column = {
    val ev = from_json(json, storageEventSchema)
    struct(
      ev.getField("bucket").as("bucket"),
      ev.getField("name").as("name"),
      concat(lit("gs://"), ev.getField("bucket"), lit("/"), ev.getField("name")).as("path"),
      ev.getField("size").cast(LongType).as("size"),
      to_timestamp(ev.getField("timeCreated")).as("created_at"),
      lower(hex(unbase64(ev.getField("md5Hash")))).as("md5"))
  }

  /** Batch work-list message: `{"objects":[{bucket,name,size},...]}` →
    * one row per object (`explode`, ref S8 fan-out). */
  val swarmMessageSchema: StructType = StructType(Seq(
    StructField("objects", ArrayType(StructType(Seq(
      StructField("bucket", StringType),
      StructField("name", StringType),
      StructField("size", LongType)))))))

  def explodeWorkList(df: DataFrame, jsonCol: String): DataFrame =
    df.select(explode(from_json(col(jsonCol), swarmMessageSchema)
        .getField("objects")).as("o"))
      .select(col("o.bucket").as("bucket"), col("o.name").as("name"),
        concat(lit("gs://"), col("o.bucket"), lit("/"), col("o.name")).as("path"),
        col("o.size").as("size"))
}
