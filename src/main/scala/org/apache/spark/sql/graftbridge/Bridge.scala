package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 moved the Column ↔ Catalyst-Expression bridge behind
  * `private[sql]` (org.apache.spark.sql.classic.ExpressionUtils,
  * columnNodeSupport.scala in the Apache Spark source). Custom native
  * expressions still need it, so this one-file shim re-exports the two
  * conversions from inside the sql package namespace — the standard
  * pattern for Spark extension libraries. */
object Bridge {
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
  def column(e: Expression): Column = ExpressionUtils.column(e)

  /** Bucket id encoded in a bucketed-table file name (the `_00003`
    * name suffix) — parsed by Spark's own rule so the copy-on-write
    * snapshot commit can never disagree with the reader about which
    * bucket a file belongs to. BucketingUtils is private[sql]. */
  def bucketId(fileName: String): Option[Int] =
    org.apache.spark.sql.execution.datasources.BucketingUtils
      .getBucketId(fileName)
}
