package graft.stats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Chunk analytics (SURVEY §2.4 A1–A3/A9, §2.5 W2/W4, §2.3 J4/J5) —
  * the reference's `chunk_visualizer.py` / `kamredt_chunking.py`
  * statistics, re-expressed as distributed aggregations and window
  * functions. Everything partitions by `doc_id`, so a 100 TB chunk
  * table computes each statistic with exactly one key-local shuffle.
  */
object ChunkStats {

  /** A1/A2 — per-strategy chunk statistics
    * (`/root/reference/Chunking_Strats/chunk_visualizer.py:396-410`;
    * `kamredt_chunking.py:71-81`): count, avg/min/max of char and
    * token lengths. One partial+final hash aggregate. */
  def summary(chunks: DataFrame): DataFrame =
    chunks.groupBy(col("strategy")).agg(
      count(lit(1)).as("chunk_count"),
      round(avg(col("char_length")), 4).as("avg_chars"),
      min(col("char_length")).as("min_chars"),
      max(col("char_length")).as("max_chars"),
      round(avg(col("token_length")), 4).as("avg_tokens"),
      min(col("token_length")).as("min_tokens"),
      max(col("token_length")).as("max_tokens"))

  /** W2/J5-adjacent — overlap between consecutive chunks via `lead`
    * (`kamredt_chunking.py:84-105` probes adjacent chunk pairs). With
    * birth offsets the overlap is exact interval arithmetic: no
    * string matching, no join — one window over (doc_id, chunk_index).
    */
  def adjacentOverlap(chunks: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("doc_id")).orderBy(col("chunk_index"))
    chunks.select(col("doc_id"), col("chunk_index"), col("start"), col("end"))
      .withColumn("next_start", lead(col("start"), 1).over(w))
      .withColumn("next_end", lead(col("end"), 1).over(w))
      .filter(col("next_start").isNotNull)
      .withColumn("overlap_len",
        greatest(col("end") - col("next_start"), lit(0)))
  }

  /** J4 — interval self-join: count chunk pairs (i<j) that overlap
    * (`chunk_visualizer.py:259-261`). Non-equi range join on
    * (doc_id equi, end_i > start_j) — the doc_id equi key keeps it a
    * hash join with a per-doc nested loop residual, not a full cross.
    */
  def overlapPairs(chunks: DataFrame): DataFrame = {
    val a = chunks.select(col("doc_id"), col("chunk_index").as("i"),
      col("start").as("start_i"), col("end").as("end_i"))
    val b = chunks.select(col("doc_id"), col("chunk_index").as("j"),
      col("start").as("start_j"), col("end").as("end_j"))
    a.join(b, Seq("doc_id"))
      .filter(col("i") < col("j") && col("end_i") > col("start_j") &&
        col("end_j") > col("start_i"))
  }

  /** A9 — overlap-count and mean overlap length over J4/J5 output
    * (`chunk_visualizer.py:455-456`). */
  def overlapStats(chunks: DataFrame): DataFrame =
    overlapPairs(chunks)
      .withColumn("overlap_len",
        least(col("end_i"), col("end_j")) - greatest(col("start_i"), col("start_j")))
      .agg(count(lit(1)).as("overlapping_pairs"),
        round(avg(col("overlap_len")), 4).as("avg_overlap"))

  /** W4 — boundary sweep: the reference sorts start/end events and
    * walks them maintaining the active-chunk set, emitting segments
    * flagged as overlap where ≥2 chunks are active
    * (`chunk_visualizer.py:291-331`). Distributed form: explode each
    * chunk into (+1 at start, −1 at end) events, running-sum within
    * doc ordered by (pos, kind) — ends sort before starts at equal
    * pos, matching the reference's close-then-open walk — segment =
    * [pos, next pos). One window, no join. */
  def boundarySweep(chunks: DataFrame): DataFrame = {
    // No pre-aggregation by (doc, pos): running the window straight
    // over the raw ±1 events saves one shuffle (the groupBy would
    // hash on (doc,pos) while the window repartitions on doc alone).
    // Same-pos ties produce zero-width segments which the
    // seg_end > pos filter drops, and the surviving (last) tie row
    // carries the full cumulative sum — output is identical.
    val events = chunks.select(col("doc_id"),
      explode(array(
        struct(col("start").as("pos"), lit(1).as("delta")),
        struct(col("end").as("pos"), lit(-1).as("delta")))).as("e"))
      .select(col("doc_id"), col("e.pos").as("pos"), col("e.delta").as("delta"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"), col("delta"))
    events
      .withColumn("active",
        sum(col("delta")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("seg_end", lead(col("pos"), 1).over(w))
      .filter(col("seg_end").isNotNull && col("seg_end") > col("pos") &&
        col("active") > 0)
      .select(col("doc_id"), col("pos").as("seg_start"), col("seg_end"),
        col("active").cast("int").as("active"),
        (col("active") >= 2).as("is_overlap"))
  }

  /** Minimal JSON string escape for the canonical chunk-JSON build:
    * backslash, quote, newline, carriage return, tab — the escapes
    * both engines can replay byte-for-byte. (Other control chars
    * would need \u00XX rendering; the corpus fixtures contain none,
    * and a text that did would fail loudly in the oracle compare
    * rather than silently corrupt.) Backslash FIRST so later escapes'
    * own backslashes aren't double-escaped. */
  private[graft] def jsonEscape(c: Column): Column = {
    val esc = Seq("\\" -> "\\\\", "\"" -> "\\\"", "\n" -> "\\n",
      "\r" -> "\\r", "\t" -> "\\t")
    esc.foldLeft(c) { case (acc, (from, to)) =>
      call_function("replace", acc, lit(from), lit(to))
    }
  }

  /** S10 — chunk-JSON sink shape (`chunk_visualizer.py:29-49`):
    * `{strategy, chunk_count, chunks: [{doc_id, id, text,
    * char_length, token_length}]}` — one row per strategy. The JSON
    * text is built as a CANONICAL string (explicit field order,
    * integer rendering, fixed escapes) instead of `to_json`, so an
    * independent engine reproduces it byte-for-byte — that flips the
    * catalog row from rows-only to a full hash check while keeping
    * the same sink contract. Chunks are ordered by (doc_id, id)
    * inside the array. */
  def chunkJson(chunks: DataFrame): DataFrame = {
    val piece = concat(
      lit("{\"doc_id\":"), col("doc_id"),
      lit(",\"id\":"), col("chunk_index"),
      lit(",\"text\":\""), jsonEscape(col("text")),
      lit("\",\"char_length\":"), col("char_length"),
      lit(",\"token_length\":"), col("token_length"), lit("}"))
    chunks
      .select(col("strategy"), col("doc_id"), col("chunk_index"),
        piece.as("piece"))
      .groupBy(col("strategy")).agg(
        count(lit(1)).as("chunk_count"),
        concat(lit("["),
          array_join(transform(
            sort_array(collect_list(struct(
              col("doc_id"), col("chunk_index"), col("piece")))),
            x => x.getField("piece")), ","),
          lit("]")).as("chunks"))
  }
}
