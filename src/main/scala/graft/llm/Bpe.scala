package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer: distributed training + application —
  * the tokenization step of an LLM training-data pipeline (SURVEY.md
  * §2.4; the `subwordCount` heuristic in [[TextStats]] estimates what
  * this computes exactly).
  *
  * Scale posture (100 TB): the only corpus-scale passes are the initial
  * word-frequency count (one partial-agg shuffle — identical shape to
  * q28 word counts) and the final tokenize pass (narrow compiled map).
  * The training loop iterates over the WORD-FREQUENCY table — vocabulary
  * scale, which grows ~logarithmically with corpus size — and per merge
  * runs one pair-count aggregation on it plus a single-row argmax to the
  * driver. Nothing corpus-scale is ever collected or iterated.
  *
  * Semantics (deterministic by construction):
  *  - symbols start as Unicode code points of each whitespace token
  *    (lowercased, mirroring [[TextStats.tokens]]);
  *  - a merge candidate's count is its number of ADJACENT occurrences
  *    (overlapping counted: "aaa" contributes 2 to (a,a)), weighted by
  *    word frequency;
  *  - ties break lexicographically on (left, right) symbol;
  *  - applying a merge rewrites each word left-to-right greedily and
  *    non-overlapping ("aaa" + (a,a) → ["aa","a"]);
  *  - training stops early when no pair reaches `minPairCount`.
  */
object Bpe {

  /** Cap on the word-frequency table collected for training (most
    * frequent first). Vocabulary grows ~logarithmically with corpus
    * size (Heaps' law), so even a 100 TB corpus stays within a few
    * million distinct frequent words; rarer words contribute almost
    * nothing to pair counts. Words beyond the cap are dropped from
    * TRAINING only — tokenization applies to every word regardless.
    */
  val MaxTrainVocab: Int = 1 << 20

  /** Code points of a word, as one-symbol strings (surrogate-safe). */
  private[graft] def charsOf(w: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      out += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    out.result()
  }

  /** One greedy left-to-right, non-overlapping merge pass. */
  private[graft] def mergeOnce(syms: Seq[String], a: String, b: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var i = 0
    val n = syms.length
    while (i < n) {
      if (i + 1 < n && syms(i) == a && syms(i + 1) == b) { out += (a + b); i += 2 }
      else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** Apply a trained merge list to one word (merges in training order,
    * one greedy pass each).
    */
  private[graft] def applyToWord(word: String, merges: Seq[(String, String)]): Seq[String] = {
    var syms = charsOf(word)
    merges.foreach { case (a, b) => if (syms.length > 1) syms = mergeOnce(syms, a, b) }
    syms
  }

  /** Train `nMerges` BPE merges on a text column. Returns the merge list
    * in training order.
    *
    * One corpus-scale pass (the word-frequency aggregation, a
    * partial-agg shuffle identical in shape to q28 word counts); the
    * merge loop then runs driver-side over the COLLECTED word-frequency
    * table, bounded by [[MaxTrainVocab]] most-frequent words. This is
    * the standard architecture of corpus-scale BPE trainers: the
    * distributed part is the count, the iterative part is vocab-scale.
    * (Earlier revision iterated the loop as ~2 Spark jobs per merge over
    * the same vocab-scale table — identical results, ~10x the latency.)
    */
  def trainMerges(df: DataFrame, textCol: String, nMerges: Int,
                  minPairCount: Long = 2L): Seq[(String, String)] = {
    require(nMerges >= 0, "nMerges must be >= 0")
    // Corpus-scale pass #1 (the only one): word frequencies; collect the
    // (bounded) most-frequent tail for local training.
    val wordFreq = df
      .select(explode(TextStats.tokens(col(textCol))).as("_w"))
      .where(length(col("_w")) > 0)
      .groupBy(col("_w")).agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("_w").asc)
      .limit(MaxTrainVocab)
      .collect()
    val syms = wordFreq.map(r => charsOf(r.getString(0)).toArray)
    val freq = wordFreq.map(_.getLong(1))
    val merges = Seq.newBuilder[(String, String)]
    var done = false
    var round = 0
    while (!done && round < nMerges) {
      // Adjacent-pair counts over the vocab, weighted by word freq
      // (overlapping adjacencies counted, matching the documented
      // semantics); deterministic argmax (count desc, then (a, b) asc).
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      var wi = 0
      while (wi < syms.length) {
        val w = syms(wi); val f = freq(wi)
        var i = 0
        while (i + 1 < w.length) {
          val k = (w(i), w(i + 1))
          counts.update(k, counts.getOrElse(k, 0L) + f)
          i += 1
        }
        wi += 1
      }
      if (counts.isEmpty) done = true
      else {
        // Tie-break in UTF-8 BYTE order — the order Spark's orderBy on
        // strings uses (UTF8String binary compare) and the vocab-cap
        // orderBy above still uses; JVM String.compareTo is UTF-16
        // code-unit order, which diverges on supplementary-plane chars.
        def utf8Lt(p: String, q: String): Boolean =
          java.util.Arrays.compareUnsigned(
            p.getBytes(java.nio.charset.StandardCharsets.UTF_8),
            q.getBytes(java.nio.charset.StandardCharsets.UTF_8)) < 0
        val ((a, b), cnt) = counts.reduceLeft { (best, cur) =>
          val ((bx, by), bc) = best
          val ((cx, cy), cc) = cur
          val curWins = cc > bc || (cc == bc && (utf8Lt(cx, bx) ||
            (cx == bx && utf8Lt(cy, by))))
          if (curWins) cur else best
        }
        if (cnt < minPairCount) done = true
        else {
          merges += ((a, b))
          wi = 0
          while (wi < syms.length) {
            if (syms(wi).length > 1) syms(wi) = mergeOnce(syms(wi), a, b).toArray
            wi += 1
          }
          round += 1
        }
      }
    }
    merges.result()
  }

  /** Tokenize a text column with a trained merge list: one compiled
    * narrow pass (merges ride the closure — broadcast once per task),
    * emitting per-document BPE stats and the roundtrip proof.
    *
    * Columns: n_words, n_symbols (pre-merge code points over all
    * words), n_bpe_tokens (post-merge), roundtrip_ok (re-concatenating
    * every word's pieces reproduces the word — BPE merges only ever
    * concatenate, so this must hold for every document).
    */
  def tokenizeStats(df: DataFrame, idCol: String, textCol: String,
                    merges: Seq[(String, String)]): DataFrame = {
    val statsUdf = udf { (ws: Seq[String]) =>
      var nw = 0; var nSym = 0L; var nTok = 0L; var ok = true
      ws.foreach { w =>
        if (w.nonEmpty) {
          nw += 1
          val pieces = applyToWord(w, merges)
          nSym += charsOf(w).length
          nTok += pieces.length
          if (pieces.mkString != w) ok = false
        }
      }
      (nw, nSym, nTok, ok)
    }
    df.select(col(idCol), statsUdf(TextStats.tokens(col(textCol))).as("_s"))
      .select(col(idCol),
        col("_s._1").as("n_words"),
        col("_s._2").as("n_symbols"),
        col("_s._3").as("n_bpe_tokens"),
        col("_s._4").as("roundtrip_ok"))
  }
}
