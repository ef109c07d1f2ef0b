package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization: events of a key belong to one session
  * while consecutive gaps stay under `gapUs`; a larger gap opens a new
  * session. The standard event-pipeline operator (and the batch
  * equivalent of Structured Streaming's session windows).
  *
  * One shuffle on the key, two linear window passes (lag + running
  * sum). Session ids are deterministic (key + ordinal), never random.
  */
object Sessionize {

  /** Append `session_seq` (0-based per key) to each event. `timeCol`
    * must be a monotone numeric (e.g. epoch micros); ties broken by
    * `tieCol` for a total order. */
  def assign(df: DataFrame, keys: Seq[String], timeCol: String, tieCol: String,
      gapUs: Long): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(timeCol).asc, col(tieCol).asc)
    df.withColumn("_prev", lag(col(timeCol), 1).over(w))
      .withColumn("_new_session",
        when(col("_prev").isNull || col(timeCol) - col("_prev") > gapUs, 1L).otherwise(0L))
      .withColumn("session_seq",
        sum(col("_new_session")).over(w.rowsBetween(Window.unboundedPreceding, 0)) - 1)
      .drop("_prev", "_new_session")
  }

  /** Per-session rollup: bounds, event count, duration. */
  def summarize(df: DataFrame, keys: Seq[String], timeCol: String, tieCol: String,
      gapUs: Long): DataFrame = {
    assign(df, keys, timeCol, tieCol, gapUs)
      .groupBy((keys :+ "session_seq").map(col): _*)
      .agg(
        count(lit(1)).as("n_events"),
        min(col(timeCol)).as("session_start"),
        max(col(timeCol)).as("session_end"),
        (max(col(timeCol)) - min(col(timeCol))).as("duration_us"))
  }
}
