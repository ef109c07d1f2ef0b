package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bucketed range join: pairs (l, r) with the same key and
  * `r.time ∈ [l.time, l.time + window]` — the interval/temporal join
  * Spark would otherwise plan as a per-key cross product with a
  * post-filter.
  *
  * Scale design: both sides are bucketed by `floor(time / window)`;
  * a left row can only match right rows in its own or the next bucket,
  * so each left row is replicated exactly twice and the join is a pure
  * equi-join on (key, bucket) — shuffle-sized by data, never by the
  * O(n·m) candidate space. The residual interval predicate is applied
  * after the equi-join (cheap, codegen'd).
  */
object RangeJoin {

  def joinWithin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, windowUs: Long): DataFrame = {
    require(windowUs > 0)
    // integer division (never float): bucket assignment must be exact
    // and identical on both sides or boundary rows drop silently
    val lb = left
      .withColumn("_bucket", explode(array(
        expr(s"$leftTime div ${windowUs}L"),
        expr(s"$leftTime div ${windowUs}L") + 1)))
    val rb = right.withColumn("_bucket", expr(s"$rightTime div ${windowUs}L"))
    lb.join(rb, keys :+ "_bucket")
      .filter(col(rightTime) >= col(leftTime) &&
        col(rightTime) <= col(leftTime) + windowUs)
      .drop("_bucket")
  }
}
