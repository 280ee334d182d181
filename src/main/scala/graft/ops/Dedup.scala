package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for a training-data pipeline over a
  * (doc_id, text) documents table — exact, MinHash+LSH, SimHash, n-gram
  * Jaccard, and embedding-cosine near-dup.
  *
  * Scale notes (the whole point of these ops at 100 TB):
  *   - exact dedup is one hash aggregation on the fingerprint — shuffle on
  *     md5, map-side partial agg for free;
  *   - MinHash signatures are a single explode + two-level hash agg (no
  *     per-pair work); LSH banding turns the O(n²) pair space into
  *     per-bucket candidate sets (shuffle keyed by (band, bucket-hash));
  *   - candidate verification (exact Jaccard / cosine) touches only pairs
  *     that share a bucket — the canonical shuffle-bounded near-dup plan;
  *   - everything is expressed on DataFrames so AQE can coalesce the
  *     (usually tiny) bucket-join output.
  */
object Dedup {

  // ---- exact -----------------------------------------------------------------

  /** Exact dedup: canonical representative = min(doc_id) per normalized
    * fingerprint. Returns (fingerprint, keep_id, n_dups).
    */
  def exactGroups(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.groupBy(TextOps.fingerprintCol(col(textCol)).as("fingerprint"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n"))

  /** Docs surviving exact dedup (first-wins by doc_id). */
  def exactDedup(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val keep = exactGroups(docs, textCol).select(col("keep_id").as("doc_id"))
    docs.join(keep, Seq("doc_id"), "left_semi")
  }

  // ---- MinHash + LSH -----------------------------------------------------------

  /** Word w-shingles of a text (the unit hashed by MinHash), as a pure
    * Catalyst expression: transform over an index sequence, slicing the
    * token array — stays inside codegen, no UDF.
    */
  def shingleCol(text: Column, w: Int = 3): Column = {
    val toks = split(text, " ")
    val n = size(toks)
    when(n >= w,
      transform(sequence(lit(0), n - w), i => concat_ws(" ", slice(toks, i + 1, lit(w)))))
      .otherwise(array(text))
  }

  /** MinHash signature: for each of k seeds, min(md5(shingle || '_' || seed))
    * — min over lexicographic md5 hex strings, reproducible in any engine
    * with md5 (the classic permutation-free MinHash construction).
    * One explode + one groupBy; signature columns mh_0..mh_{k−1}.
    */
  def minhashSignatures(docs: DataFrame, k: Int = 8, shingleW: Int = 3): DataFrame = {
    val exploded = docs
      .select(col("doc_id"), explode(shingleCol(col("text"), shingleW)).as("sh"))
    val aggs = (0 until k).map(i =>
      min(md5(concat(col("sh"), lit(s"_$i")))).as(s"mh_$i"))
    exploded.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
  }

  /** LSH banding: k signature columns split into `bands` bands of k/bands
    * rows each; band key = md5 of the concatenated band slice. Docs sharing
    * any (band, key) become candidate pairs (a < b to dedup the pair space).
    * Returns (band, a, b).
    */
  def lshCandidatePairs(sigs: DataFrame, k: Int = 8, bands: Int = 4): DataFrame = {
    val rows = k / bands
    val bandCols = (0 until bands).map { b =>
      struct(lit(b).as("band"),
        md5(concat_ws("|", (0 until rows).map(r => col(s"mh_${b * rows + r}")): _*)).as("key"))
    }
    val keyed = sigs
      .select(col("doc_id"), explode(array(bandCols: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.key").as("key"))
    val a = keyed.as("a"); val b = keyed.as("b")
    a.join(b, col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.band").as("band"), col("a.doc_id").as("a"), col("b.doc_id").as("b"))
      .distinct()
  }

  /** Exact word-shingle Jaccard for candidate pairs (the verify stage after
    * LSH): returns (a, b, jaccard). Joins the shingle sets only for
    * candidate pairs — no all-pairs blowup.
    */
  def verifyJaccard(docs: DataFrame, pairs: DataFrame, shingleW: Int = 3): DataFrame = {
    val sets = docs.select(col("doc_id"),
      array_distinct(shingleCol(col("text"), shingleW)).as("sh"))
    pairs.select(col("a"), col("b")).distinct()
      .join(sets.withColumnRenamed("doc_id", "a").withColumnRenamed("sh", "sha"), Seq("a"))
      .join(sets.withColumnRenamed("doc_id", "b").withColumnRenamed("sh", "shb"), Seq("b"))
      .withColumn("inter", size(array_intersect(col("sha"), col("shb"))))
      .withColumn("uni", size(array_union(col("sha"), col("shb"))))
      .select(col("a"), col("b"),
        (col("inter").cast("double") / col("uni")).as("jaccard"))
  }

  /** Full MinHash-LSH near-dup pipeline: candidates ∧ jaccard ≥ threshold. */
  def minhashDupPairs(docs: DataFrame, k: Int = 8, bands: Int = 4,
      threshold: Double = 0.7): DataFrame = {
    val pairs = lshCandidatePairs(minhashSignatures(docs, k), k, bands)
    verifyJaccard(docs, pairs).filter(col("jaccard") >= threshold)
  }

  /** All-pairs n-gram Jaccard above a threshold via an inverted-index join
    * on shared shingles (no LSH approximation): explode shingles, self-join
    * on shingle, count shared per pair, derive jaccard from set sizes.
    * Exact, and shuffle-bounded by shingle frequency (a stopword-shingle
    * cap `maxDf` drops degenerate hubs — the standard inverted-index
    * guard).
    */
  def ngramJaccardPairs(docs: DataFrame, shingleW: Int = 3,
      threshold: Double = 0.5, maxDf: Int = 1000): DataFrame = {
    val sets = docs.select(col("doc_id"),
      array_distinct(shingleCol(col("text"), shingleW)).as("sh"))
      .withColumn("setSize", size(col("sh")))
    val inv = sets.select(col("doc_id"), col("setSize"), explode(col("sh")).as("sh"))
    val rare = inv.groupBy("sh").count().filter(col("count") <= maxDf).select("sh")
    val filtered = inv.join(rare, Seq("sh"))
    val a = filtered.select(col("sh"), col("doc_id").as("a"), col("setSize").as("sa"))
    val b = filtered.select(col("sh"), col("doc_id").as("b"), col("setSize").as("sb"))
    a.join(b, Seq("sh")).filter(col("a") < col("b"))
      .groupBy(col("a"), col("b"), col("sa"), col("sb"))
      .agg(count(lit(1)).as("inter"))
      .withColumn("jaccard",
        col("inter").cast("double") / (col("sa") + col("sb") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select("a", "b", "jaccard")
  }

  // ---- SimHash -------------------------------------------------------------------

  /** 64-bit SimHash over word tokens (FNV-64 token hashes, unweighted):
    * near-dups have small Hamming distance. Pure Scala hashing (stable
    * across JVMs), one pass per doc.
    */
  def simhash(tokens: Seq[String]): Long = {
    val acc = new Array[Int](64)
    tokens.foreach { t =>
      val h = graft.core.UrlCanon.hash64(t)
      var i = 0
      while (i < 64) { if (((h >>> i) & 1L) == 1L) acc(i) += 1 else acc(i) -= 1; i += 1 }
    }
    var out = 0L
    var i = 0
    while (i < 64) { if (acc(i) > 0) out |= (1L << i); i += 1 }
    out
  }
  private val simhashU = udf((text: String) =>
    if (text == null) 0L else simhash(text.split(" ").toSeq))
  def simhashCol(text: Column): Column = simhashU(text)

  /** SimHash near-dup pairs: block by the 4 16-bit quarters (any pair
    * within Hamming ≤ 3 of 64 bits shares at least one exact quarter —
    * pigeonhole), verify with popcount on candidates only.
    */
  def simhashDupPairs(docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    val sigs = docs.select(col("doc_id"), simhashCol(col("text")).as("sig"))
    val quarters = (0 until 4).map(q =>
      struct(lit(q).as("q"),
        shiftrightunsigned(col("sig"), q * 16).bitwiseAND(lit(0xffffL)).as("key")))
    val keyed = sigs.select(col("doc_id"), col("sig"), explode(array(quarters: _*)).as("bk"))
      .select(col("doc_id"), col("sig"), col("bk.q").as("q"), col("bk.key").as("key"))
    val a = keyed.select(col("q"), col("key"), col("doc_id").as("a"), col("sig").as("siga"))
    val b = keyed.select(col("q"), col("key"), col("doc_id").as("b"), col("sig").as("sigb"))
    a.join(b, Seq("q", "key")).filter(col("a") < col("b"))
      .select(col("a"), col("b"),
        bit_count(col("siga").bitwiseXOR(col("sigb"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  // ---- embedding cosine near-dup ----------------------------------------------------

  /** Cosine similarity of two float-array columns as a pure Catalyst
    * expression: zip_with product + aggregate sum (no UDF in the hot path).
    */
  def cosineCol(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column) =
      aggregate(zip_with(x, y, (p, q) => p * q), lit(0.0d), (acc, v) => acc + v)
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
  }

  /** Embedding near-dup pairs: random-hyperplane sign-bucket LSH (seeded,
    * deterministic planes), exact cosine verify within buckets.
    */
  def embeddingDupPairs(embeddings: DataFrame, dim: Int, planes: Int = 8,
      threshold: Double = 0.95, seed: Long = 42L): DataFrame = {
    val bucketed = embeddings.withColumn("bucket",
      Similarity.signBucketCol(col("embedding"), dim, planes, seed))
    val a = bucketed.select(col("bucket"), col("vec_id").as("a"), col("embedding").as("va"))
    val b = bucketed.select(col("bucket"), col("vec_id").as("b"), col("embedding").as("vb"))
    a.join(b, Seq("bucket")).filter(col("a") < col("b"))
      .withColumn("cosine", cosineCol(col("va"), col("vb")))
      .filter(col("cosine") >= threshold)
      .select("a", "b", "cosine")
  }
}
