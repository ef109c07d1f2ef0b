package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Training-sequence packing: assign documents to fixed-token-budget
  * sequences (the pretraining dataloader's packing step, run ahead of
  * time as a pipeline op so shards ship ready-to-train).
  *
  * Distribution shape: a deterministic shard per document
  * (xxhash64 % shards — never `rand()`), one shuffle to co-locate a
  * shard, then greedy first-fit packing runs SEQUENTIALLY per shard
  * inside `mapPartitions` in doc-id order. Sequences never interleave
  * shards, so the result is a pure function of (corpus, budget,
  * shards) — invariant to source partitioning, like every operator
  * here. An oversized document gets its own sequence (budget is a
  * target, document atomicity is law — the settlement-packing rule
  * again; truncation is a separate, explicit transform).
  *
  * At 100 TB: one shuffle of (doc_id, token_count) pairs — packing
  * needs no text. The emitted (doc → shard/seq/offset) assignment
  * joins back to content at materialization time.
  */
object SeqPacking {

  final case class Packed(doc_id: Long, shard: Int, seq: Long, offset: Long, toks: Long)

  /** `shardExpr` overrides the shard assignment (default
    * xxhash64(doc_id) % shards — best balance for structured id
    * spaces). Any deterministic expression keeps the partitioning-
    * invariance law; `pmod(doc_id, shards)` is the portable choice
    * when the packing must reproduce in another engine (the DuckDB
    * oracle recomputes it). */
  def pack(docs: DataFrame, idCol: String, tokCol: String,
      budget: Long, shards: Int,
      shardExpr: Option[org.apache.spark.sql.Column] = None): Dataset[Packed] = {
    require(budget > 0 && shards > 0)
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long").as("doc_id"),
        col(tokCol).cast("long").as("toks"))
      .withColumn("shard", shardExpr
        .getOrElse(pmod(xxhash64(col("doc_id")), lit(shards))).cast("int"))
      .repartition(shards, col("shard"))
      .sortWithinPartitions("shard", "doc_id")
      .as[(Long, Long, Int)]
      .mapPartitions { it =>
        // a hash partition may hold several shard values; counters
        // reset on every shard change (rows arrive sorted)
        var curShard = Int.MinValue
        var seq = 0L
        var fill = 0L
        it.map { case (docId, toks, shard) =>
          if (shard != curShard) { curShard = shard; seq = 0L; fill = 0L }
          if (fill > 0 && fill + toks > budget) { seq += 1; fill = 0L }
          val off = fill
          fill += toks
          Packed(docId, shard, seq, off, toks)
        }
      }
  }

  /** Per-sequence fill summary (the shard manifest a trainer reads). */
  def sequenceFill(packed: Dataset[Packed]): DataFrame =
    packed.groupBy("shard", "seq")
      .agg(count(lit(1)).as("n_docs"), sum("toks").as("toks"),
        min("doc_id").as("first_doc"))
}
