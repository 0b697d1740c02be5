package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BPE-lite subword tokenizer — the "BPE-ish" token counter of the
  * training-data suite (BASELINE.json north star). Clean-room,
  * deterministic re-statement of byte-pair encoding (Sennrich et al.,
  * ACL 2016): greedily merge the most frequent adjacent symbol pair,
  * ties broken lexicographically.
  *
  * Scale shape: merges are TRAINED on a driver-side word-frequency
  * sample (bounded — top-N words via one distributed aggregate),
  * then BROADCAST; encoding is a narrow per-row map. The corpus is
  * never collected.
  */
object BpeLite {

  type Merge = (String, String)

  /** Learn `numMerges` merge rules from word frequencies. Pure and
    * deterministic: highest pair count wins, ties by (left, right). */
  def train(wordCounts: Map[String, Long], numMerges: Int): Vector[Merge] = {
    var words: Map[Vector[String], Long] = wordCounts.map {
      case (w, c) => w.map(_.toString).toVector -> c
    }.groupMapReduce(_._1)(_._2)(_ + _)
    val merges = Vector.newBuilder[Merge]
    var i = 0
    while (i < numMerges) {
      val pairCounts = scala.collection.mutable.Map[Merge, Long]()
      words.foreach { case (syms, c) =>
        syms.sliding(2).foreach {
          case Vector(a, b) =>
            val k = (a, b); pairCounts(k) = pairCounts.getOrElse(k, 0L) + c
          case _ =>
        }
      }
      if (pairCounts.isEmpty) i = numMerges
      else {
        val best = pairCounts.toSeq
          .minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += best
        words = words.map { case (syms, c) => applyMerge(syms, best) -> c }
          .groupMapReduce(_._1)(_._2)(_ + _)
        i += 1
      }
    }
    merges.result()
  }

  private def applyMerge(syms: Vector[String], m: Merge): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == m._1 && syms(i + 1) == m._2) {
        out += (m._1 + m._2); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  private val encodeMemo =
    new java.util.concurrent.ConcurrentHashMap[(String, Seq[Merge]), Vector[String]]()
  private val MaxMemo = 1 << 20

  /** Encode one word with the learned merges, in training order.
    * Word-level memo: natural corpora repeat words heavily, so each
    * distinct (word, merge-table) encodes once per executor; bounded
    * so a huge vocabulary can't exhaust memory. (The map lookup hashes
    * the small merge vector — still ~100× cheaper than re-running the
    * merge passes.) */
  def encodeWord(word: String, merges: Seq[Merge]): Vector[String] = {
    val key = (word, merges)
    val hit = encodeMemo.get(key)
    if (hit != null) hit
    else {
      val v = merges.foldLeft(word.map(_.toString).toVector)(applyMerge)
      if (encodeMemo.size < MaxMemo) encodeMemo.putIfAbsent(key, v)
      v
    }
  }

  /** Encode whitespace-split text. Subwords concat back to the word. */
  def encode(text: String, merges: Seq[Merge]): Vector[String] =
    if (text == null) Vector.empty
    else text.split("\\s+").filter(_.nonEmpty).toVector
      .flatMap(encodeWord(_, merges))

  /** Distributed training sample: top-N words by frequency (one
    * aggregate; deterministic order (−count, word)). */
  def wordCounts(docs: DataFrame, textCol: String = "text",
      topN: Int = 10000): Map[String, Long] =
    docs.select(explode(split(col(textCol), "\\s+")).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .orderBy(desc("c"), col("w")).limit(topN)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  /** Column: BPE token count of `textCol` under broadcast merges. */
  def tokenCountCol(merges: Seq[Merge]): Column = {
    val m = merges.toVector
    udf((s: String) => encode(s, m).length).apply(col("text"))
  }
}
