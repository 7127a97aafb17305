package graft.textops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Byte-pair-encoding subword tokenizer: a REAL merge loop over an embedded,
  * deterministic merge table (no network, no external vocab files) — the round-3
  * replacement for the `bpeTokenEstimate` heuristic, which stays available as the
  * cheap pure-column estimate.
  *
  * Algorithm (the standard BPE encode): a word starts as its character symbols; the
  * applicable merge with the highest priority (lowest table index) is applied to all
  * its occurrences, repeatedly, until no table merge applies. Implemented as a typed
  * per-partition map with a per-partition word cache (words repeat heavily in natural
  * text, so the cache turns the merge loop into a dictionary hit for the bulk of the
  * stream) — the same batch shape as the multimodal decode stage.
  */
object Bpe {

  /** Embedded English-oriented merge table. Order IS priority; later merges build on
    * earlier ones (e.g. "a"+"n" before "an"+"d"). Small by design — the operator's
    * plumbing and cost model are what the engine ships; swapping in a 50k-merge GPT
    * table is a data change, not a code change.
    */
  val DefaultMerges: Seq[(String, String)] = Seq(
    ("t", "h"), ("th", "e"), ("i", "n"), ("a", "n"), ("e", "r"), ("o", "n"),
    ("r", "e"), ("a", "t"), ("e", "n"), ("o", "r"), ("e", "s"), ("o", "u"),
    ("i", "s"), ("i", "t"), ("a", "l"), ("a", "r"), ("s", "t"), ("t", "o"),
    ("n", "g"), ("in", "g"), ("e", "d"), ("o", "f"), ("an", "d"), ("c", "o"),
    ("d", "e"), ("r", "a"), ("l", "e"), ("u", "r"), ("l", "i"), ("m", "e"),
    ("s", "e"), ("th", "at"), ("w", "it"), ("wit", "h"), ("f", "or"), ("w", "as"),
    ("h", "e"), ("b", "e"), ("n", "o"), ("m", "a")
  )

  /** Encode one word with the merge table; returns its subword symbols. */
  def encodeWord(word: String, merges: Seq[(String, String)]): Seq[String] = {
    if (word.isEmpty) return Seq.empty
    val rank = merges.zipWithIndex.toMap
    var symbols: Vector[String] = word.map(_.toString).toVector
    var done = false
    while (!done && symbols.length > 1) {
      // the best-ranked adjacent pair present in the word
      var bestRank = Int.MaxValue
      var i = 0
      while (i < symbols.length - 1) {
        rank.get((symbols(i), symbols(i + 1))).foreach(r => if (r < bestRank) bestRank = r)
        i += 1
      }
      if (bestRank == Int.MaxValue) done = true
      else {
        val (a, b) = merges(bestRank)
        val out = Vector.newBuilder[String]
        var j = 0
        while (j < symbols.length) {
          if (j < symbols.length - 1 && symbols(j) == a && symbols(j + 1) == b) {
            out += (a + b); j += 2
          } else { out += symbols(j); j += 1 }
        }
        symbols = out.result()
      }
    }
    symbols
  }

  /** Per-document BPE token count over `documents(doc_id, text)`: lowercased
    * whitespace words, each encoded with the merge loop. (doc_id, bpe_tokens).
    */
  def bpeTokens(docs: DataFrame, merges: Seq[(String, String)] = DefaultMerges): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val cache = scala.collection.mutable.HashMap.empty[String, Int]
        it.map { case (id, text) =>
          val words = text.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
          var count = 0L
          words.foreach { w =>
            count += cache.getOrElseUpdate(w, encodeWord(w, merges).length).toLong
          }
          (id, count)
        }
      }
      .toDF("doc_id", "bpe_tokens")
  }
}
