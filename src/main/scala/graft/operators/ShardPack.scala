package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Training-shard assignment: pack documents into shards of roughly
  * `budget` tokens each.
  *
  * Documents get an offset = running token sum (exclusive prefix) within
  * their partition key in id order, and land in shard floor(offset/budget)
  * — the deterministic "offset binning" packing. The window partitions by
  * the pack key (language, source, date bucket, ...) so there is NO global
  * ordering anywhere: each key's packing is an independent per-partition
  * window after one hash shuffle, which is what survives a 100 TB corpus.
  * Token counts are integers, so the assignment is engine-exact.
  *
  * PICK A COMPOSITE PACK KEY whose cardinality grows with the corpus
  * (lang × source × date-bucket, not lang alone): unlike the samplers —
  * whose md5 ordering admits the Sampling.keyedPrefixSum sub-bucket
  * decomposition — packing is ordered by the caller's id, whose range
  * cannot be pre-bucketed deterministically, so one key IS one sorted
  * task here and the key choice is the parallelism dial. */
object ShardPack {

  /** Adds `offset` (tokens before this doc within its key) and `shard`
    * (ordinal within the key) columns. */
  def assignShards(docs: DataFrame, partitionCol: String, idCol: String,
                   tokenCol: String, budget: Long): DataFrame = {
    require(budget > 0, "shard budget must be positive")
    val w = Window.partitionBy(partitionCol).orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .withColumn("offset", coalesce(sum(col(tokenCol)).over(w), lit(0L)))
      .withColumn("shard", floor(col("offset") / budget))
  }

  /** Shard manifest: one row per (key, shard) with doc/token totals —
    * the thing a training loader actually consumes. */
  def shardManifest(assigned: DataFrame, partitionCol: String,
                    tokenCol: String): DataFrame =
    assigned.groupBy(col(partitionCol), col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col(tokenCol)).as("n_tokens"))

  /** GPT-style sequence packing: documents concatenate in id order (per
    * pack key) into FIXED-length sequences of `seqLen` tokens, and a
    * document spanning a boundary is SPLIT across the adjacent
    * sequences — unlike [[assignShards]] (which keeps docs whole and
    * lets shards run ragged), this is the layout a fixed-context
    * training loader consumes directly.
    *
    * Output: one row per (document, sequence) fragment — (key, id,
    * offset, seq, frag_start, frag_len): `offset` = corpus token
    * offset of the doc within its key, `frag_start` = first token of
    * the fragment within the doc, `frag_len` its length. A doc covering
    * sequences s0..s1 emits one row per sequence via a bounded explode
    * (s1-s0+1 rows, each ≥1 token — never corpus-quadratic). All math
    * is integral (`DIV`), so two engines agree bit-for-bit. Zero-token
    * docs are dropped (they occupy no sequence positions); the running
    * offsets are unaffected since they contribute nothing to the sums.
    * One hash shuffle (the per-key window) — no global order. */
  def packSequences(docs: DataFrame, partitionCol: String, idCol: String,
                    tokenCol: String, seqLen: Long): DataFrame = {
    require(seqLen > 0, "sequence length must be positive")
    val w = Window.partitionBy(partitionCol).orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .withColumn("offset", coalesce(sum(col(tokenCol)).over(w), lit(0L)))
      .where(col(tokenCol) > 0)
      .withColumn("seq", explode(sequence(
        expr(s"offset DIV $seqLen"),
        expr(s"(offset + `$tokenCol` - 1) DIV $seqLen"))))
      .withColumn("frag_start",
        greatest(col("seq") * seqLen - col("offset"), lit(0L)))
      .withColumn("frag_len",
        least((col("seq") + 1) * seqLen, col("offset") + col(tokenCol)) -
          greatest(col("seq") * seqLen, col("offset")))
      .select(col(partitionCol), col(idCol), col("offset"), col("seq"),
        col("frag_start"), col("frag_len"))
  }
}
