package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain

/** `graft_bloom_might_contain(serialized_bloom, xxhash64_value)` —
  * exposes Spark's own codegen'd runtime-filter membership predicate
  * (the one InjectRuntimeFilter plants under shuffle joins) as a
  * callable function, so a driver-built corpus sketch can gate a scan
  * inside whole-stage codegen instead of through a deserializing UDF.
  */
object BloomFunctions {
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bloom_might_contain",
      exprs => BloomFilterMightContain(exprs(0), exprs(1)), "scala_udf")
}
