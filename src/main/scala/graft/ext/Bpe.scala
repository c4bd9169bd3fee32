package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{BpeCore, BpeExpr}

/** Native byte-pair-encoding tokenizer, train/apply split — the
  * bring-your-own-tokenizer seams ([[TextOps.packSequences]]'
  * `tokenCount`, [[TextOps.chunkDocuments]]' token windows) fed by a
  * tokenizer trained INSIDE the engine instead of an imported vocab
  * (no model downloads in this environment, and none needed).
  *
  * Train once, persist the merge list as parquet (rank, left, right),
  * segment forever — the [[TextOps.lmTrain]]/[[QualityModel]] shape.
  * Training is the classic BPE fit: start from code-point symbols per
  * whitespace word, repeatedly merge the most frequent adjacent symbol
  * pair. The corpus-sized part (word frequencies) is ONE distributed
  * map-side-combinable count; the sequential merge loop — inherently
  * iterative, each merge conditions the next — runs driver-side over
  * the BOUNDED top-`maxWords` word-frequency table (the IVF-centroid
  * pattern: driver state is O(model input), never O(corpus); this is
  * also how production BPE trainers work — frequencies in, in-memory
  * loop). Fully deterministic: integer counts, ties broken by
  * lexicographic pair order, word cap by (count desc, word asc).
  *
  * Application ([[tokens]]) is a per-document Catalyst expression
  * ([[graft.functions.BpeEncode]]) sharing the exact merge procedure
  * with training, so segmenting the training corpus reproduces the
  * fit's own final word segmentations.
  */
object Bpe {

  /** Train the merge list: (rank, left, right), rank 0 first. Stops
    * early when no adjacent pair occurs at least twice (merging a
    * singleton pair is noise). `maxWords` caps the driver-side word
    * table; `numMerges` the model size.
    */
  def bpeTrain(corpus: DataFrame, textCol: String = "text",
               numMerges: Int = 200, maxWords: Int = 50000): DataFrame = {
    require(numMerges >= 0, s"numMerges must be >= 0, got $numMerges")
    require(maxWords > 0, s"maxWords must be positive, got $maxWords")
    val spark = corpus.sparkSession
    import spark.implicits._
    // distributed word counts, deterministically capped: one shuffle,
    // then <= maxWords (word, count) rows cross to the driver
    val wordFreq: Array[(String, Long)] = corpus
      .select(explode(split(col(textCol), " ")).as("__w"))
      .where(length(col("__w")) > 0)
      .groupBy("__w").agg(count(lit(1)).as("__c"))
      .orderBy(col("__c").desc, col("__w").asc)
      .limit(maxWords)
      .as[(String, Long)].collect()
    var words: Array[(Array[String], Long)] =
      wordFreq.map { case (w, c) => (BpeCore.codepointStrings(w), c) }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var continue = true
    while (continue && merges.length < numMerges) {
      val pairCounts = new java.util.HashMap[String, Long]()
      for ((syms, c) <- words; i <- 0 until syms.length - 1)
        pairCounts.merge(syms(i) + " " + syms(i + 1), c, _ + _)
      // deterministic argmax: count desc, then pair asc
      var bestKey: String = null
      var bestCount = 1L // a pair must occur at least twice to matter
      pairCounts.forEach { (k, v) =>
        if (v > bestCount || (v == bestCount && bestKey != null && k < bestKey))
          { bestKey = k; bestCount = v }
      }
      if (bestKey == null) continue = false
      else {
        val sp = bestKey.indexOf(' ')
        val (l, r) = (bestKey.substring(0, sp), bestKey.substring(sp + 1))
        merges += ((l, r))
        words = words.map { case (syms, c) => (BpeCore.mergePair(syms, l, r), c) }
      }
    }
    // n_merges rides the model as an integrity anchor: a partially
    // written/truncated frame (lost file, bad copy) would otherwise
    // load as a silently smaller — differently segmenting — model
    merges.zipWithIndex
      .map { case ((l, r), rank) => (rank, l, r) }.toSeq
      .toDF("rank", "left", "right")
      .withColumn("n_merges", lit(merges.length))
  }

  /** The ordered merge list out of a persisted model — driver-side
    * O(model) (the merge table IS the model; it parameterizes the
    * expression, it is not data). Integrity-checked: ranks must be
    * contiguous 0..n-1 and, when the frame carries [[bpeTrain]]'s
    * `n_merges` column, match its declared size — a truncated model
    * fails here instead of silently segmenting differently. (Frames
    * from before the column tolerate its absence.)
    */
  def loadMerges(model: DataFrame): Seq[(String, String)] = {
    import model.sparkSession.implicits._
    val rows = model.orderBy("rank").select("rank", "left", "right")
      .as[(Int, String, String)].collect()
    require(rows.map(_._1).toSeq == rows.indices,
      s"BPE model ranks must be contiguous 0..${rows.length - 1} — the frame is truncated or corrupt")
    // a 0-merge model is legal ([[bpeTrain]] allows numMerges = 0 and
    // can find no repeating pair): its frame has no rows, so the
    // n_merges column carries no values to check against
    if (rows.nonEmpty && model.columns.contains("n_merges")) {
      val declared = model.select("n_merges").distinct().as[Int].collect()
      require(declared.length == 1 && declared.head == rows.length,
        s"BPE model declares n_merges ${declared.sorted.mkString(", ")} but holds " +
          s"${rows.length} merges — the frame is truncated or corrupt")
    }
    rows.map(t => (t._2, t._3)).toSeq
  }

  /** BPE piece array of `text` under a trained merge list — plugs into
    * every `tokensCol`/`tokenCount` seam (e.g.
    * `packSequences(..., tokenCount = Some(size(Bpe.tokens(col, m))))`).
    */
  def tokens(text: Column, merges: Seq[(String, String)]): Column =
    BpeExpr.bpeEncode(text, merges)
}
