package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes
import org.apache.spark.sql.types.{AbstractDataType, LongType}

/** `ImplicitCastInputTypes` declared over `(bigint, bigint)`.
  *
  * `AbstractDataType` (the type `inputTypes` must return) is
  * `private[sql]`, so an expression outside the Spark namespace cannot
  * override it — hence this one-trait shim in the bridge package (same
  * pattern as [[ColumnBridge]]). Mixing it in gives a binary long
  * expression normal built-in ergonomics: `f(1, 2)` in SQL coerces
  * int→bigint instead of failing its type check.
  */
trait LongLongInputTypes extends ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(LongType, LongType)
}

/** [[LongLongInputTypes]] at arbitrary arity — for variadic long
  * expressions ([[graft.functions.InterleaveN]]): one `bigint` slot per
  * child, same implicit int→bigint coercion. */
trait LongNInputTypes extends ImplicitCastInputTypes {
  self: org.apache.spark.sql.catalyst.expressions.Expression =>
  override def inputTypes: Seq[AbstractDataType] =
    Seq.fill(children.size)(LongType)
}
