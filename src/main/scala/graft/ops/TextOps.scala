package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a large-scale training-data pipeline, over a
  * (doc_id, text, ...) documents table. Everything here is a narrow
  * projection — no shuffle, fully pipelined inside whole-stage codegen
  * (plain `functions._` columns wherever possible; Scala UDFs only where a
  * loop is genuinely needed).
  */
object TextOps {

  // ---- token counting ------------------------------------------------------

  /** Whitespace token count, expressible identically in ANSI SQL:
    * (len(text) − len(replace(text, ' ', ''))) + 1 for non-empty text.
    */
  def tokenCountCol(text: Column): Column =
    when(length(text) === 0, 0)
      .otherwise(length(text) - length(translate(text, " ", "")) + 1)

  /** BPE-ish subword count: word chars split into runs of ≤4 chars plus
    * punctuation singletons — a deterministic stand-in for a real BPE
    * vocabulary (the plumbing is what matters at pipeline scale).
    */
  def bpeCount(s: String): Int = {
    if (s == null) return 0
    var n = 0
    var runLen = 0
    s.foreach { c =>
      if (Character.isLetterOrDigit(c)) {
        runLen += 1
        if (runLen == 4) { n += 1; runLen = 0 }
      } else {
        if (runLen > 0) { n += 1; runLen = 0 }
        if (!Character.isWhitespace(c)) n += 1
      }
    }
    if (runLen > 0) n += 1
    n
  }
  private val bpeU = udf(bpeCount _)
  def bpeTokenCountCol(text: Column): Column = bpeU(text)

  // ---- quality scoring -----------------------------------------------------

  /** Quality heuristics (length / punctuation / stopword / repetition
    * ratios) — the standard pre-training corpus filters, each a codegen'd
    * column expression.
    */
  def qualityColumns(text: Column): Seq[(String, Column)] = {
    val len = length(text)
    val tokens = tokenCountCol(text)
    val stopHits = Seq(" the ", " a ", " and ", " of ", " to ")
      .map(w => (length(text) - length(regexp_replace(text, lit(w), lit("")))) / w.length)
      .reduce(_ + _)
    Seq(
      "n_chars_calc" -> len,
      "n_tokens" -> tokens,
      "mean_token_len" -> when(tokens > 0, (len - (tokens - 1)).cast("double") / tokens).otherwise(0.0),
      "stopword_ratio" -> when(tokens > 0, stopHits.cast("double") / tokens).otherwise(0.0))
  }

  /** Composite quality score in [0,1]: favors mid-length docs with sane
    * token lengths and some stopwords (boilerplate/garbage filters).
    */
  def qualityScoreCol(text: Column): Column = {
    val len = length(text).cast("double")
    val tokens = tokenCountCol(text).cast("double")
    val meanTok = when(tokens > 0, (len - (tokens - 1)) / tokens).otherwise(lit(0.0))
    val lenScore = least(len / 200.0, lit(1.0))
    val tokScore = when(meanTok.between(2.0, 12.0), 1.0).otherwise(0.5)
    round(least(lenScore * 0.6 + tokScore * 0.4, lit(1.0)), 6)
  }

  // ---- language identification ----------------------------------------------

  /** n-gram/charset language-ID heuristic: script detection first (Hangul →
    * ko, CJK → zh, Cyrillic → ru), then stopword-profile voting for latin
    * languages. Deterministic; registered as a UDF (per-row loop over a
    * dozen profiles).
    */
  private val profiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq(" the ", " and ", " of ", " to ", " is "),
    "de" -> Seq(" der ", " und ", " die ", " das ", " ist "),
    "fr" -> Seq(" le ", " la ", " et ", " les ", " est "),
    "es" -> Seq(" el ", " la ", " y ", " los ", " es "))

  def langIdScala(text: String): String = {
    if (text == null || text.isEmpty) return "und"
    if (text.exists(c => c >= '가' && c <= '힣')) return "ko"
    if (text.exists(c => c >= 0x4e00 && c <= 0x9fff)) return "zh"
    if (text.exists(c => c >= 0x0400 && c <= 0x04ff)) return "ru"
    val padded = " " + text.toLowerCase + " "
    val scores = profiles.map { case (lang, words) =>
      lang -> words.map(w => graft.analysis.Relevance.countOccurrences(padded, w)).sum
    }
    val best = scores.maxBy(_._2)
    if (best._2 == 0) "und" else best._1
  }
  private val langU = udf(langIdScala _)
  def langIdCol(text: Column): Column = langU(text)

  // ---- fingerprinting --------------------------------------------------------

  /** Stable document fingerprint: md5 of the whitespace-normalized,
    * lowercased text — identical in any engine with md5 (exact-dedup key).
    */
  def fingerprintCol(text: Column): Column =
    md5(lower(regexp_replace(text, "\\s+", " ")))

  /** Rolling Rabin–Karp 64-bit hash (base 257, natural overflow) — the
    * streaming-friendly fingerprint variant; pure Scala, deterministic.
    */
  def rollingHash(text: String): Long = {
    if (text == null) return 0L
    var h = 0L
    text.foreach(c => h = h * 257L + c.toLong)
    h
  }
  private val rollU = udf(rollingHash _)
  def rollingHashCol(text: Column): Column = rollU(text)

  /** Full per-document text profile in one projection. */
  def profile(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val base = Par.widen(docs)
      .withColumn("n_tokens", tokenCountCol(t))
      .withColumn("bpe_tokens", bpeTokenCountCol(t))
      .withColumn("quality", qualityScoreCol(t))
      .withColumn("lang_id", langIdCol(t))
      .withColumn("fingerprint", fingerprintCol(t))
      .withColumn("rolling_hash", rollingHashCol(t))
    qualityColumns(t).foldLeft(base) { case (d, (name, c)) => d.withColumn(name, c) }
  }
}
