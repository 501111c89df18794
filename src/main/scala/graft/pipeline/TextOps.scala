package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text analysis operators for training-data curation: token counting,
  * quality scoring, language ID, document fingerprinting. All pure
  * column expressions (codegen'd, no UDFs) — each is one narrow pass
  * over the text column and aggregates map-side.
  */
object TextOps {

  def tokens(text: Column): Column = split(text, "\\s+")

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword unit count: word chunks + standalone punctuation
    * (the usual pre-tokenizer regex).
    */
  def subwordCount(text: Column): Column =
    regexp_count(text, lit("[A-Za-z0-9]+|[^A-Za-z0-9\\s]"))

  /** Heuristic quality score in [0, 1]:
    * length band + punctuation density + stopword presence — the
    * standard cheap filters applied before expensive model scoring.
    */
  val Stopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is")

  def stopwordRatio(text: Column): Column = {
    val ts = tokens(text)
    size(filter(ts, t => t.isin(Stopwords: _*))).cast("double") /
      greatest(size(ts), lit(1)).cast("double")
  }

  def punctRatio(text: Column): Column =
    regexp_count(text, lit("[^A-Za-z0-9\\s]")).cast("double") /
      greatest(length(text), lit(1)).cast("double")

  def digitRatio(text: Column): Column =
    regexp_count(text, lit("[0-9]")).cast("double") /
      greatest(length(text), lit(1)).cast("double")

  def qualityScore(text: Column): Column = {
    val lenScore = when(length(text) >= 100 && length(text) <= 10000, 0.4)
      .when(length(text) >= 20, 0.2).otherwise(0.0)
    val punctScore = when(punctRatio(text) <= 0.1, 0.3).otherwise(0.0)
    val digitScore = when(digitRatio(text) <= 0.2, 0.1).otherwise(0.0)
    val swScore = when(stopwordRatio(text) >= 0.05, 0.2).otherwise(0.0)
    round(lenScore + punctScore + digitScore + swScore, 2)
  }

  /** Stopword-profile language ID: score per language = fraction of
    * tokens in that language's marker list; argmax with deterministic
    * tie order. (An n-gram-profile model plugs into the same shape.)
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "fr" -> Seq("le", "la", "et", "est", "une"),
    "es" -> Seq("el", "la", "y", "es", "una"),
    "zh" -> Seq("de5", "shi4", "le5", "he2", "zai4"))

  def langScores(text: Column): Seq[(String, Column)] = {
    val ts = tokens(text)
    LangMarkers.map { case (lang, markers) =>
      lang -> (size(filter(ts, t => t.isin(markers: _*))).cast("double") /
        greatest(size(ts), lit(1)).cast("double"))
    }
  }

  def langId(text: Column): Column = {
    // argmax via array_max over (score, -index) structs: each score
    // expression appears exactly once (a when/greatest fold would
    // replicate every earlier score per step — quadratic codegen);
    // ties resolve to the smallest index (en first)
    val scores = langScores(text)
    val entries = array(scores.zipWithIndex.map { case ((_, score), i) =>
      struct(score.as("s"), lit(-i).as("ni"))
    }: _*)
    val names = array(scores.map { case (lang, _) => lit(lang) }: _*)
    val best = array_max(entries)
    element_at(names, (-best.getField("ni") + 1).cast("int"))
  }

  /** Content-defined fingerprint: digest of the sorted distinct word
    * set — clusters documents with identical vocabulary regardless of
    * order (the cheap canonical form for bag-level dedup).
    */
  def vocabFingerprint(text: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(split(lower(text), "\\s+")))))

  /** Word n-grams of a document: (idCol..., gram) rows. Linear per doc
    * (slices over one materialized token array; re-splitting per index
    * would be quadratic).
    */
  def wordNgrams(df: DataFrame, n: Int, textCol: String, keep: String*): DataFrame = {
    val ws = split(lower(col(textCol)), "\\s+")
    df.select(keep.map(col) :+ ws.as("__ws"): _*)
      .where(size(col("__ws")) >= n)
      .select(keep.map(col) :+ explode(transform(
        sequence(lit(1), size(col("__ws")) - (n - 1)),
        i => array_join(slice(col("__ws"), i, lit(n)), " "))).as("gram"): _*)
  }

  /** Top-k TF-IDF terms per document: (id, rank, term, tfidf), ranked on
    * the rounded score (deterministic across engines) with a term
    * tiebreak. Two shuffles (term-freq, doc-freq) + a broadcast corpus
    * size — no per-document state, so it scales with the corpus.
    */
  def tfidfTopK(df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val toks = df
      .select(col(idCol), explode(split(lower(col(textCol)), "\\s+")).as("term"))
      .where(length(col("term")) > 0)
    val tf = toks.groupBy(idCol, "term").agg(count(lit(1)).as("n_t"))
    val dfreq = toks.distinct().groupBy("term").agg(count(lit(1)).as("df_t"))
    val nd = toks.select(countDistinct(idCol).as("n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(idCol).orderBy(col("tfidf").desc, col("term"))
    tf.join(dfreq, "term").crossJoin(broadcast(nd))
      .withColumn("tfidf",
        round(col("n_t") * log(col("n").cast("double") / col("df_t")), 6))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col(idCol), col("rank"), col("term"), col("tfidf"))
  }

  /** BM25 top-k retrieval (Robertson–Spärck Jones with Lucene's
    * +1-smoothed idf: ln((N - df + 0.5)/(df + 0.5) + 1)) — the sparse
    * lexical retrieval primitive for corpus mining and RAG-style
    * training-data selection. Scale shape: the query set (≪ corpus)
    * broadcasts, and the posting build is pruned by the query
    * VOCABULARY before any shuffle — only (doc, query-term) rows ever
    * leave the scan, so corpus cost is proportional to matching
    * postings, not corpus size; document length stats are one narrow
    * map-side-combinable aggregate. Ranking uses the ROUNDED score
    * with a doc-id tiebreak so cross-engine libm ulps in ln() can't
    * flip order (tfidfTopK's discipline).
    */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, qidCol: String, qtextCol: String,
      k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val toks = docs
      .select(col(idCol), explode(split(lower(col(textCol)), "\\s+")).as("term"))
      .where(length(col("term")) > 0)
    // doc length + corpus stats come from ALL tokens (one narrow agg);
    // everything term-shaped is restricted to the query vocabulary first
    val dl = toks.groupBy(idCol).agg(count(lit(1)).as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"),
      avg(col("dl").cast("double")).as("avgdl"))
    val qterms = queries
      .select(col(qidCol), explode(split(lower(col(qtextCol)), "\\s+")).as("term"))
      .where(length(col("term")) > 0)
      .distinct()
    val qvocab = qterms.select("term").distinct()
    val toksQ = toks.join(broadcast(qvocab), Seq("term"))
    // tf is the matching-postings table (docs x query terms — tiny
    // next to the corpus): materialize it once so its two consumers
    // (the score join and df_t) don't each re-tokenize the corpus,
    // and derive df_t FROM it (tf rows are distinct (doc, term) by
    // construction, so count-per-term IS the document frequency) —
    // the separate distinct() pass was a third full corpus scan.
    val tf = toksQ.groupBy(idCol, "term").agg(count(lit(1)).as("n_t"))
      .localCheckpoint(true)
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df_t"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(qidCol).orderBy(col("score").desc, col(idCol))
    tf.join(broadcast(qterms), Seq("term"))
      .join(dl, idCol)
      .join(broadcast(dfreq), Seq("term"))
      .crossJoin(broadcast(stats))
      .withColumn("idf", log(
        (col("n_docs").cast("double") - col("df_t") + 0.5) /
          (col("df_t") + 0.5) + 1.0))
      .withColumn("contrib",
        col("idf") * col("n_t") * (k1 + 1.0) /
          (col("n_t") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))
      .groupBy(qidCol, idCol)
      .agg(round(sum("contrib"), 6).as("score"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col(qidCol), col("rank"), col(idCol), col("score"))
  }

  /** Zipf-rank rarity scoring: rank the corpus vocabulary by frequency
    * (1 = most frequent, ties by word), then score each document by
    * its words' ranks — mean rank (higher = rarer diction), hapax
    * count, rarest rank. The float-free twin of the unigram-LM
    * perplexity proxy (-ln p(w) is monotone in the rank on a Zipfian
    * corpus): integer ranks keep every aggregate EXACT across engines
    * where log-prob sums would drift by libm ulps. The rank window
    * sorts only the VOCABULARY (≪ corpus — the only global sort);
    * per-doc stats re-join exploded words against the broadcast-able
    * rank table and combine map-side.
    */
  def zipfRarity(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val words = df
      .select(col(idCol), explode(split(lower(col(textCol)), "\\s+")).as("w"))
      .where(length(col("w")) > 0)
    val lm = words.groupBy("w").agg(count(lit(1)).as("wc"))
    // Global rank WITHOUT a single-partition window: range-partition
    // the vocabulary on the rank order, then rank = preceding-partition
    // offset + local row_number. The rank is boundary-independent (any
    // range split of a total order yields the same global positions),
    // but both consumers must see the SAME materialized partitioning —
    // checkpoint before branching (range sampling reseeds per plan
    // evaluation).
    val sorted = lm.repartitionByRange(col("wc").desc, col("w"))
      .sortWithinPartitions(col("wc").desc, col("w"))
      .withColumn("pid", spark_partition_id())
      .localCheckpoint(true)
    val offsets = sorted.groupBy("pid").agg(count(lit(1)).as("pn"))
      .withColumn("off", coalesce(sum("pn").over(Window.orderBy("pid")
        .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("pid", "off")
    val rk = sorted.withColumn("rn", row_number().over(
        Window.partitionBy("pid").orderBy(col("wc").desc, col("w"))))
      .join(broadcast(offsets), "pid")
      .select(col("w"), col("wc"), (col("off") + col("rn")).cast("long").as("r"))
    // no broadcast hint: Catalyst broadcasts the rank table while it
    // fits and falls back to a shuffled hash join at web-scale vocab
    words.join(rk, "w")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_words"),
        round(sum("r").cast("double") / count(lit(1)), 6).as("mean_rank"),
        sum(when(col("wc") === 1, 1L).otherwise(0L)).as("n_hapax"),
        max("r").as("max_rank"))
  }

  /** Benchmark decontamination: rows of `train` sharing any word
    * n-gram with `eval` (both (id, text) shaped). The eval gram set is
    * assumed benchmark-sized -> broadcast; the corpus side streams.
    */
  def contaminated(train: DataFrame, eval: DataFrame, n: Int,
      idCol: String, textCol: String): DataFrame = {
    val tg = wordNgrams(train, n, textCol, idCol)
    val eg = wordNgrams(eval, n, textCol, idCol).select("gram").distinct()
    tg.join(broadcast(eg), Seq("gram"), "left_semi")
      .select(idCol).distinct()
  }
}
