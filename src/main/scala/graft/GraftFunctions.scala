package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.graft.FunctionRegistryBridge
import graft.functions.{DynamoAttributeDecode, FloatArrayDot, RollingFingerprint}

/** SQL-surface registration of this engine's custom Catalyst expressions,
  * so `spark.sql` users get them alongside the built-ins:
  *
  * {{{
  *   GraftFunctions.register(spark)
  *   spark.sql("SELECT vector_dot(a.embedding, b.embedding) FROM ...")
  *   spark.sql("SELECT rolling_fingerprint(text, 32) FROM docs")
  *   spark.sql("SELECT dynamo_attr_decode(newImage) FROM envelopes")
  * }}}
  */
object GraftFunctions {

  /** The one builder table both registration surfaces share
    * (programmatic [[register]] and config-injected
    * [[graft.GraftExtensions]]). */
  private[graft] val builders: Seq[
      (String, Seq[org.apache.spark.sql.catalyst.expressions.Expression] =>
        org.apache.spark.sql.catalyst.expressions.Expression)] = Seq(
    "vector_dot" -> { exprs =>
      require(exprs.length == 2, "vector_dot(a, b) takes 2 arguments")
      FloatArrayDot(exprs(0), exprs(1))
    },
    "rolling_fingerprint" -> { exprs =>
      require(exprs.length == 2, "rolling_fingerprint(text, window) takes 2 arguments")
      val w = exprs(1) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
        case other => other.eval(null).asInstanceOf[Int]
      }
      RollingFingerprint(exprs(0), w)
    },
    "dynamo_attr_decode" -> { exprs =>
      require(exprs.length == 1, "dynamo_attr_decode(json) takes 1 argument")
      DynamoAttributeDecode(exprs.head)
    },
    "zorder64" -> { exprs =>
      require(exprs.length == 2, "zorder64(a, b) takes 2 arguments")
      graft.functions.ZOrder64(exprs(0), exprs(1))
    },
    "hilbert32" -> { exprs =>
      require(exprs.length == 2, "hilbert32(a, b) takes 2 arguments")
      graft.functions.Hilbert32(exprs(0), exprs(1))
    })

  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, builder) =>
      FunctionRegistryBridge.register(spark, name, builder)
    }
}
