package graft.pkg

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed destination tables: the shuffle-elimination strategy for
  * recurring merges (SURVEY §4 "Shuffle" + the 100 TB design brief:
  * "pre-bucketing the table by the dedup/merge key makes this
  * shuffle-free").
  *
  * A merge destination written bucketed by its merge key lets every
  * subsequent upsert/dedup join co-locate: Spark plans a sort-merge
  * join with NO Exchange on the bucketed side(s), so the recurring
  * cost of a 100 TB merge is one scan + write, never a reshuffle of
  * the base table. Bucket count is fixed at table creation — size it
  * for the target scale (e.g. 4096 buckets ≈ 25 GB/bucket at 100 TB).
  */
object Bucketing {

  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int,
      mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write
      .mode(mode)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Upsert `stage` into bucketed `table` on `key`, rewriting the table
    * bucketed again so the NEXT merge is also co-located. The join
    * itself is shuffle-free on the base side. */
  def mergeIntoBucketed(spark: SparkSession, table: String, stage: DataFrame,
      key: String, buckets: Int): Unit = {
    val base = spark.table(table)
    val merged = graft.operators.MergeOps.upsert(base, stage, Seq(key))
    // rewrite through a staging table: saveAsTable cannot overwrite the
    // table being read (replace-by-swap at the catalog level)
    val tmp = s"${table}__swap"
    writeBucketed(merged, tmp, key, buckets)
    spark.sql(s"DROP TABLE IF EXISTS $table")
    spark.sql(s"ALTER TABLE $tmp RENAME TO $table")
  }
}
