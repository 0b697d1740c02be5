package graft.text.chunk

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.text.Tok

/** Content-defined chunking (CDC) at token granularity — the
  * insertion-robust segmentation used for block-level dedup (the
  * rolling-hash cut idea behind LBFS/rsync-style chunkers and
  * FastCDC, public knowledge; same family as the winnowing
  * fingerprints in [[graft.textan.TextAnalysis]]).
  *
  * A cut lands AFTER token `p` when the md5 of the 3-token gram
  * ending at `p` satisfies `hash % modulus == 0` — a decision that
  * depends only on LOCAL content, never on absolute position. That is
  * the property fixed-size chunking lacks: insert a token early in a
  * document and every fixed window after it shifts, but every CDC
  * block outside the edit's ±1-gram neighborhood re-emerges with an
  * identical hash (CdcSpec pins exactly this). Expected block length
  * is `modulus` tokens; no min/max clamp is applied — the clamped
  * variant is a sequential scan (covered in spirit by
  * [[RecursiveChunker]]'s budgeted walk), while the pure form stays
  * one windowed pass and keeps the math oracle-replayable.
  *
  * Scale shape: tokenize + gram-hash + cut flags are scan-stage; the
  * only exchange is the per-doc window (partitioned by `doc_id` —
  * never a global window) plus the block aggregate on the same key,
  * which AQE plans as one shuffle class. Block rows are bounded by
  * token count / modulus.
  */
object CdcChunker {

  val GramN = 3
  val Modulus = 8

  /** Cut-after flag for the gram ending at this position: first 8 md5
    * hex chars of the space-joined gram, as an integer, mod
    * [[Modulus]] — the same md5-prefix recipe as every other
    * deterministic hash in the engine ([[graft.rel.Sketches]]). */
  def cutAfter(gram: Column): Column =
    (conv(substring(md5(gram), 1, 8), 16, 10).cast("long")
      % Modulus === 0).cast("int")

  /** CDC blocks of each document: one row per block with its index,
    * first-token position, token count and content md5. Input needs
    * (doc_id, text); token stream is [[Tok.tokens]] of the lowercased
    * text (the engine-wide vocabulary convention). */
  def blocks(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"),
      posexplode(Tok.tokens(lower(col("text")))).as(Seq("pos", "tok")))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    // a block boundary sits BEFORE position p exactly when the gram
    // of the three PRECEDING tokens (ending at p-1) cut — three lags
    // in one window pass
    val flagged = toks
      .withColumn("g3", lag(col("tok"), 3).over(w))
      .withColumn("g2", lag(col("tok"), 2).over(w))
      .withColumn("g1", lag(col("tok"), 1).over(w))
      .withColumn("cut_before",
        when(col("g3").isNull, lit(0))
          .otherwise(cutAfter(concat_ws(" ",
            col("g3"), col("g2"), col("g1")))))
    val ids = flagged.withColumn("block_index",
      sum(col("cut_before")).over(w).cast("int"))
    ids.groupBy(col("doc_id"), col("block_index"))
      .agg(min(col("pos")).as("token_start"),
        count(lit(1)).cast("int").as("n_tokens"),
        concat_ws(" ", transform(
          array_sort(collect_list(struct(col("pos"), col("tok")))),
          x => x.getField("tok"))).as("block_text"))
      .withColumn("block_md5", md5(col("block_text")))
  }

  /** Saved CDC block table — [[graft.io.SavedIndex]]'s build-once /
    * serve-many contract applied to the chunk store (r20): the
    * per-char gear-hash + per-token window kernel of [[blocks]] runs
    * once per corpus version, and every downstream consumer
    * (q_cdc_shared's pair join, q_cdc_dedup's first-wins removal)
    * reads the persisted blocks with column pruning — exactly how a
    * storage-dedup system keeps its block catalog. Strings, ints and
    * md5 hex round-trip parquet losslessly, so served rows are
    * bit-identical to an inline [[blocks]] pass (the chunker row
    * q_chunk_cdc keeps pricing the kernel itself). */
  private val savedBlocks = new graft.io.SavedIndex("graft-cdc-blocks")

  def ensureSavedBlocks(docs: DataFrame, cacheKey: String,
      epoch: Option[String] = None): String =
    savedBlocks.ensure(cacheKey, docs, epoch) { p =>
      blocks(docs).write.mode("overwrite").parquet(p)
    }
}
