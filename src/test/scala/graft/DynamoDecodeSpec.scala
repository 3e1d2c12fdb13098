package graft

import org.apache.spark.SparkException
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.DynamoAttributeDecode.dynamoAttrDecode

/** AttributeValue wire-format decode (operator A8) — mirrors the
  * reference's TypeDeserializer behavior on the trades.json shapes. */
class DynamoDecodeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def decode(wire: String): String =
    Seq(wire).toDF("w").select(dynamoAttrDecode(col("w")).as("d"))
      .collect().head.getString(0)

  test("scalar tags: S, N integral, N decimal, BOOL, NULL") {
    assert(decode("""{"a":{"S":"x"},"b":{"N":"42"},"c":{"N":"1.50"},"d":{"BOOL":true},"e":{"NULL":true}}""")
      === """{"a":"x","b":42,"c":1.50,"d":true,"e":null}""")
  }

  test("nested M and L (the trades.json details shape)") {
    val wire =
      """{"id":{"S":"t1"},"details":{"M":{"asks":{"L":[{"N":"1.1"},{"N":"2.2"}]},"lag":{"N":"7"},"system":{"S":"A"}}},"time":{"M":{"date":{"S":"2012-03-02T22:00:00.000Z"}}}}"""
    assert(decode(wire)
      === """{"id":"t1","details":{"asks":[1.1,2.2],"lag":7,"system":"A"},"time":{"date":"2012-03-02T22:00:00.000Z"}}""")
  }

  test("number sets become number arrays") {
    assert(decode("""{"s":{"NS":["1","2.5"]}}""") === """{"s":[1,2.5]}""")
  }

  test("null input propagates null") {
    val r = Seq[String](null).toDF("w")
      .select(dynamoAttrDecode(col("w")).as("d")).collect().head
    assert(r.isNullAt(0))
  }

  test("unknown tag raises (reference raises on unexpected shapes)") {
    val e = intercept[Throwable](decode("""{"a":{"XX":"1"}}"""))
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("unknown AttributeValue tag")))
  }
}
