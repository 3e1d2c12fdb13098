package graft.cdc

import java.sql.Timestamp

/** The change-event envelope of the NoSQL CDC path.
  *
  * Models the DynamoDB stream record consumed at
  * `/root/reference/source/write_dynamodb_stream_to_s3_lambda/handler.py:22-37`:
  * `{eventName ∈ INSERT|MODIFY|REMOVE, dynamodb.NewImage}` with the stream
  * configured NEW_IMAGE-only (`/root/reference/cdk_infrastructure/__init__.py:290`).
  *
  * @param eventName INSERT | MODIFY | REMOVE (anything else is an error —
  *                  the reference raises, `handler.py:33-37`)
  * @param key       partition-key value (the reference's `id`,
  *                  `__init__.py:287-289`)
  * @param newImage  the post-change row image as a JSON document (either
  *                  plain JSON or DynamoDB AttributeValue wire form —
  *                  see [[graft.functions.DynamoAttributeDecode]])
  * @param ts        change timestamp (stream order within a key)
  */
case class ChangeEvent(
    eventName: String,
    key: String,
    newImage: String,
    ts: Timestamp)

object ChangeEvent {
  val Insert = "INSERT"
  val Modify = "MODIFY"
  val Remove = "REMOVE"
  val Known: Seq[String] = Seq(Insert, Modify, Remove)
  /** The subset the reference forwards to the warehouse
    * (`handler.py:27-31`; REMOVE dropped — documented divergence
    * `/root/reference/README.md:30`). */
  val Upserts: Seq[String] = Seq(Insert, Modify)
}
