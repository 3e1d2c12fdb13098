package graft.functions

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, JsonNodeFactory, ObjectNode}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Catalyst expression decoding the DynamoDB AttributeValue wire format
  * into plain JSON — the Spark-native form of the reference's
  * `TypeDeserializer().deserialize({"M": NewImage})`
  * (`/root/reference/source/write_dynamodb_stream_to_s3_lambda/handler.py:29`,
  * operator A8 in SURVEY §2.A).
  *
  * Wire form: every value is a single-key object tagging its type —
  * `{"S": "text"}`, `{"N": "1.5"}` (numbers are strings on the wire),
  * `{"BOOL": true}`, `{"NULL": true}`, `{"M": {…}}`, `{"L": […]}`,
  * `{"SS"|"NS": […]}`. Output: the same document with tags unwrapped —
  * numbers become JSON numbers, sets become arrays.
  *
  * Implemented as a native `UnaryExpression` rather than a Scala UDF so
  * it composes with Catalyst (null propagation, constant folding through
  * foldable children) and costs no ScalaUDF closure dispatch. The eval
  * recursion itself is interpreted (`CodegenFallback`) — the JSON walk
  * dominates, codegen would only inline the call.
  *
  * Determinism: field order of the input document is preserved
  * (Jackson keeps insertion order), so output strings are stable.
  */
case class DynamoAttributeDecode(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "dynamo_attr_decode"

  @transient private lazy val mapper = new ObjectMapper()

  override def nullSafeEval(input: Any): Any = {
    val wire = mapper.readTree(input.asInstanceOf[UTF8String].toString)
    UTF8String.fromString(mapper.writeValueAsString(decodeMap(wire)))
  }

  /** Top level: an AttributeValue map body ({attr -> wireValue}). */
  private def decodeMap(node: JsonNode): ObjectNode = {
    val out = JsonNodeFactory.instance.objectNode()
    node.properties().forEach { e =>
      out.set[JsonNode](e.getKey, decodeValue(e.getValue))
    }
    out
  }

  private def decodeValue(av: JsonNode): JsonNode = {
    require(av.isObject && av.size() == 1,
      s"not an AttributeValue: $av")
    val tag = av.fieldNames().next()
    val v = av.get(tag)
    tag match {
      case "S"    => v
      case "N"    => numberNode(v.asText)
      case "BOOL" => v
      case "NULL" => JsonNodeFactory.instance.nullNode()
      case "B"    => v // base64 payload stays a string
      case "M"    => decodeMap(v)
      case "L" =>
        val arr = JsonNodeFactory.instance.arrayNode()
        v.forEach(el => arr.add(decodeValue(el)))
        arr
      case "SS" | "BS" => v
      case "NS" =>
        val arr = JsonNodeFactory.instance.arrayNode()
        v.forEach(el => arr.add(numberNode(el.asText)))
        arr
      case other =>
        throw new IllegalArgumentException(s"unknown AttributeValue tag: $other")
    }
  }

  /** DynamoDB numbers arrive as strings; emit integral vs decimal JSON
    * numbers losslessly (BigDecimal, mirroring the reference's
    * `parse_float=Decimal` at
    * `/root/reference/source/load_data_to_dynamodb_lambda/handler.py:13`). */
  private def numberNode(text: String): JsonNode = {
    val bd = new java.math.BigDecimal(text)
    if (bd.scale() <= 0) JsonNodeFactory.instance.numberNode(bd.toBigIntegerExact)
    else JsonNodeFactory.instance.numberNode(bd)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object DynamoAttributeDecode {
  import org.apache.spark.sql.graft.ColumnBridge

  /** Column API: decode a wire-format NewImage JSON column. */
  def dynamoAttrDecode(c: Column): Column =
    ColumnBridge.column(DynamoAttributeDecode(ColumnBridge.expression(c)))
}
