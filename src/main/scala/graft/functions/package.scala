package graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.graftbridge.Bridge

/** Column-level API over the custom Catalyst expressions, plus SQL
  * registration so `spark.sql("... cosine_sim(a,b) ...")` works too.
  * (Spark 4 moved Column↔Expression bridging to sql.classic.) */
package object functions {

  private def expr(c: Column): Expression = Bridge.expression(c)
  private def toCol(e: Expression): Column = Bridge.column(e)

  def cosine_sim(a: Column, b: Column): Column =
    toCol(CosineSimilarity(expr(a), expr(b)))

  def dot_product(a: Column, b: Column): Column =
    toCol(DotProduct(expr(a), expr(b)))

  def hyperplane_signature(v: Column, nPlanes: Int, seed: Long): Column =
    toCol(HyperplaneSignature(expr(v), nPlanes, seed))

  def simhash64(tokens: Column, seed: Long = 42L): Column =
    toCol(SimHash64(expr(tokens), seed))

  /** Single-pass byte-lane checksum array — see [[LaneSums]]. */
  def lane_sums(s: Column, nLanes: Int, group: Int = 1): Column =
    toCol(LaneSums(expr(s), nLanes, group))

  /** Bounded top-k aggregate: array of the k best (score, id) structs
    * per group — see [[TopKPairs]] for the shuffle-size argument vs the
    * window form. */
  def top_k(score: Column, id: Column, k: Int): Column =
    toCol(TopKPairs(expr(score), expr(id), k).toAggregateExpression())

  /** Misra–Gries heavy-hitters sketch aggregate: the ≤ k surviving
    * items per group — see [[MisraGriesItems]] for the deterministic
    * completeness guarantee and what must NOT be read from it. */
  def heavy_hitters_sketch(item: Column, k: Int): Column =
    toCol(MisraGriesItems(expr(item), k).toAggregateExpression())

  /** Bloom-filter aggregate over xxhash64(key) — Catalyst's
    * `BloomFilterAggregate`, the building block of Spark's own runtime
    * row-level filtering (InjectRuntimeFilter), exposed as a column
    * aggregate so a plan can build the filter EXPLICITLY where the
    * optimizer's trigger conditions don't fire. Returns the serialized
    * filter (binary); pair with [[bloom_might_contain]]. */
  def bloom_filter_agg(key: Column, expectedItems: Long): Column =
    toCol(new org.apache.spark.sql.catalyst.expressions.aggregate
      .BloomFilterAggregate(
        new org.apache.spark.sql.catalyst.expressions.XxHash64(
          Seq(expr(key))), expectedItems).toAggregateExpression())

  /** Membership probe against a serialized bloom filter (must be a
    * literal/foldable — collect the filter as a model scalar first).
    * NO false negatives: filtering a join's probe side with this
    * never changes the join result, only its shuffle size. */
  def bloom_might_contain(filter: Column, key: Column): Column =
    toCol(org.apache.spark.sql.catalyst.expressions
      .BloomFilterMightContain(expr(filter),
        new org.apache.spark.sql.catalyst.expressions.XxHash64(
          Seq(expr(key)))))

  def registerAll(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("cosine_sim",
      es => CosineSimilarity(es.head, es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("dot_product",
      es => DotProduct(es.head, es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("simhash64",
      es => SimHash64(es.head), "scala_udf")
  }
}
