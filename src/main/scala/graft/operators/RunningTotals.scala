package graft.operators

import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.apache.spark.sql.{Column, DataFrame, Row}

/** Distributed per-group running totals — the prefix-sum shape behind
  * rank statistics (Gini, Mann-Whitney midranks, Lorenz curves,
  * empirical CDFs).
  *
  * `sum(x) OVER (PARTITION BY g ORDER BY v)` runs ONE task per group:
  * at 100 TB a handful of groups means a handful of executors sorting
  * everything. This operator keeps the running total distributed the
  * same way [[GlobalRank]] distributes row_number:
  *
  *  1. `repartitionByRange(groupCols ++ order)` + sortWithinPartitions
  *     — Spark's sampled range exchange; a group spans a RUN of
  *     consecutive partitions, so per-group running state only needs a
  *     per-(partition, group) boundary summary;
  *  2. one counting job collecting per-(partition, group) subtotals —
  *     partitions × distinct-groups-per-partition-boundary rows to the
  *     driver (each partition contributes at most its few edge groups;
  *     bounded, never row data);
  *  3. prefix-sum those subtotals per group into per-partition starting
  *     offsets, broadcast, and stamp `offset + local running sum` in
  *     one order-preserving mapPartitions pass.
  *
  * Values are accumulated as LONGS (callers pre-scale decimals — the
  * exact-arithmetic discipline every oracle-gated statistic here
  * already follows), so totals are exact and partition-count
  * invariant. Requires `order` to be a total order within each group
  * for a deterministic stamping (ties are fine for SUMS — any tie
  * order yields the same running total at equal keys only if the
  * caller aggregates per distinct key first; pass tie-breakers when
  * per-row totals must be unique).
  */
object RunningTotals {

  /** Append `outCol` = running sum of `valueCol` (LongType) within
    * `groupCols`, ordered by `order`, and `rankOut` = running 1-based
    * row number within the group. Output is persisted by the caller's
    * next action lifecycle (unpersist responsibility is the caller's,
    * mirroring GlobalRank). */
  def perGroup(df: DataFrame, groupCols: Seq[String], order: Seq[Column],
      valueCol: String, outCol: String = "run_sum",
      rankOut: String = "run_rn", numPartitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val parts = if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions
    val gIdx = groupCols.map(c => df.schema.fieldIndex(c))
    val vIdx = df.schema.fieldIndex(valueCol)
    require(df.schema(vIdx).dataType == LongType,
      s"$valueCol must be LongType (pre-scale decimals to exact longs)")
    val keyCols = groupCols.map(org.apache.spark.sql.functions.col) ++ order
    val sorted = df.repartitionByRange(parts, keyCols: _*)
      .sortWithinPartitions(keyCols: _*)
      .persist()
    // one pass collecting boundary subtotals; the same RDD instance is
    // reused for stamping so range boundaries cannot shift between the
    // two jobs (GlobalRank's law). Only a partition's FIRST and LAST
    // group can span a partition edge — interior groups start at offset
    // zero by construction — so the driver sees at most 2 rows per
    // partition, O(partitions), never O(groups): the difference between
    // a metadata-sized collect and a driver bottleneck when the group
    // key is high-cardinality (e.g. the Mann-Whitney value histogram).
    val sortedRdd = sorted.rdd
    val subtotals = sortedRdd.mapPartitionsWithIndex { case (pid, it) =>
      val m = scala.collection.mutable.LinkedHashMap.empty[Seq[Any], (Long, Long)]
      it.foreach { r =>
        val k = gIdx.map(r.get)
        val v = if (r.isNullAt(vIdx)) 0L else r.getLong(vIdx)
        val (s, c) = m.getOrElse(k, (0L, 0L))
        m(k) = (s + v, c + 1L)
      }
      if (m.isEmpty) Iterator.empty
      else {
        val ks = m.keysIterator.toVector
        val edge = Set(ks.head, ks.last)
        edge.iterator.map { k => val (s, c) = m(k); (pid, k, s, c) }
      }
    }.collect()
    // per-group prefix over ascending pid → starting (sum, count)
    // offsets for each (pid, group)
    val offsets: Map[(Int, Seq[Any]), (Long, Long)] = {
      val byGroup = subtotals.groupBy(_._2)
      byGroup.iterator.flatMap { case (k, arr) =>
        val sortedArr = arr.sortBy(_._1)
        var runS = 0L; var runC = 0L
        sortedArr.map { case (pid, _, s, c) =>
          val off = ((pid, k), (runS, runC))
          runS += s; runC += c
          off
        }
      }.toMap
    }
    val bc = spark.sparkContext.broadcast(offsets)
    val schema = StructType(sorted.schema.fields ++ Seq(
      StructField(outCol, LongType, nullable = false),
      StructField(rankOut, LongType, nullable = false)))
    val stamped = sortedRdd.mapPartitionsWithIndex { case (pid, it) =>
      val offs = bc.value
      var curKey: Seq[Any] = null
      var runS = 0L; var runC = 0L
      it.map { r =>
        val k = gIdx.map(r.get)
        if (k != curKey) {
          curKey = k
          val (s0, c0) = offs.getOrElse((pid, k), (0L, 0L))
          runS = s0; runC = c0
        }
        val v = if (r.isNullAt(vIdx)) 0L else r.getLong(vIdx)
        runS += v; runC += 1L
        Row.fromSeq(r.toSeq ++ Seq(runS, runC))
      }
    }
    spark.createDataFrame(stamped, schema)
  }
}
