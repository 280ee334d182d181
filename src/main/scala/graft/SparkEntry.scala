package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` covers the SURVEY §2 operator inventory (scans, filters,
  * joins, aggregations, windows, sorts, set ops, scalar functions) plus
  * the training-data pipeline operators (dedup family, similarity search,
  * text analysis, multimodal plumbing) over the driver-provided testdata
  * tables. Each SQL-expressible query has a DuckDB oracle in `oracleSql`
  * with IDENTICAL column names and a deterministic total ORDER BY; float
  * aggregates are rounded on both sides. Non-SQL-expressible ops (LSH
  * pairs, simhash, ANN, crawl spans, media stubs) are registered without
  * an oracle → rows-only check.
  */
object SparkEntry {

  private def rt(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- aggregations (A2/A3/A6) -----------------------------------------
    "q01_pricing_summary" -> ((s, d) => {
      rt(s, d, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          round(sum(col("l_discount")), 4).as("sum_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // ---- join + filter + top-k (J1/O3) -----------------------------------
    "q02_top_orders" -> ((s, d) => {
      val o = rt(s, d, "orders"); val c = rt(s, d, "customer")
      o.join(c, o("o_custkey") === c("c_custkey"))
        .filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey"), col("c_name"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10)
    }),

    // ---- semi / anti joins (J4/U5) ----------------------------------------
    "q03_customers_with_orders" -> ((s, d) => {
      rt(s, d, "customer")
        .join(rt(s, d, "orders").select(col("o_custkey").as("c_custkey")),
          Seq("c_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    }),
    "q04_customers_without_orders" -> ((s, d) => {
      rt(s, d, "customer")
        .join(rt(s, d, "orders").select(col("o_custkey").as("c_custkey")),
          Seq("c_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    }),

    // ---- windows (W2/W3/W1) ------------------------------------------------
    "q05_top3_orders_per_customer" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      rt(s, d, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("o_orderkey"),
          round(col("o_totalprice"), 2).as("price"), col("rn"))
        .orderBy(col("o_custkey"), col("rn"), col("o_orderkey"))
    }),
    "q06_daily_revenue_delta" -> ((s, d) => {
      val daily = rt(s, d, "orders")
        .groupBy(date_format(col("o_orderdate"), "yyyy-MM-dd").as("day"))
        .agg(round(sum(col("o_totalprice")), 2).as("revenue"))
      val w = Window.orderBy(col("day"))
      daily
        .withColumn("prev_revenue", lag(col("revenue"), 1).over(w))
        .withColumn("delta", round(col("revenue") - col("prev_revenue"), 2))
        .orderBy(col("day"))
    }),
    "q07_hot_decile_orders" -> ((s, d) => {
      // W1 scale-safe shape: count once, then a k-row top-k — Spark plans
      // orderBy().limit(k) as TakeOrderedAndProject (per-partition top-k +
      // driver merge of k·P rows), never a single-partition global window.
      val o = rt(s, d, "orders")
      val n = o.count()
      val k = math.max(1L, n / 10L)
      // limit() takes an Int and TakeOrderedAndProject materializes k rows
      // on the driver — fine for contract-scale deciles, meaningless at
      // 10^10 rows (k.toInt would overflow and no driver holds 10^9 rows).
      // At that scale use ops.Quantiles.topFraction (q47): approxQuantile
      // threshold + pushed-down filter; fail loudly rather than truncate.
      require(k <= Int.MaxValue,
        s"decile k=$k exceeds Int range — use ops.Quantiles.topFraction at this scale")
      o.orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(k.toInt)
        .select(col("o_orderkey"), round(col("o_totalprice"), 2).as("price"))
        .orderBy(col("o_orderkey"))
    }),

    // ---- time buckets / trends (A8/T6/F17) ---------------------------------
    "q08_weekly_order_trend" -> ((s, d) => {
      rt(s, d, "orders")
        .groupBy(date_format(date_trunc("week", col("o_orderdate")), "yyyy-MM-dd").as("week"))
        .agg(count(lit(1)).as("n_orders"),
          round(sum(col("o_totalprice")), 2).as("total_price"))
        .orderBy(col("week"))
    }),
    "q13_orders_per_day" -> ((s, d) => {
      rt(s, d, "orders")
        .groupBy(date_format(col("o_orderdate"), "yyyy-MM-dd").as("day"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("day"))
    }),
    "q22_events_hourly" -> ((s, d) => {
      rt(s, d, "events")
        .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("total_value"))
        .orderBy(col("hour"), col("event_type"))
    }),

    // ---- set ops / conditional agg / distinct (U1/A11/A12) ------------------
    "q09_nation_union" -> ((s, d) => {
      rt(s, d, "customer").select(col("c_nationkey").as("nationkey"))
        .union(rt(s, d, "supplier").select(col("s_nationkey").as("nationkey")))
        .distinct()
        .orderBy(col("nationkey"))
    }),
    "q10_status_breakdown" -> ((s, d) => {
      rt(s, d, "orders").agg(
        sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L)).as("n_f"),
        sum(when(col("o_orderstatus") === "O", 1L).otherwise(0L)).as("n_o"),
        sum(when(col("o_orderstatus") === "P", 1L).otherwise(0L)).as("n_p"))
    }),
    "q11_distinct_orders_per_flag" -> ((s, d) => {
      rt(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_orderkey")).as("n_orders"), count(lit(1)).as("n_lines"))
        .orderBy(col("l_returnflag"))
    }),

    // ---- scalar functions / projections (F6/O9) ------------------------------
    "q12_part_strings" -> ((s, d) => {
      rt(s, d, "part")
        .select(col("p_partkey"),
          substring(col("p_name"), 1, 10).as("name10"),
          lower(col("p_brand")).as("brand_lc"),
          concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"))
        .orderBy(col("p_partkey"))
        .limit(100)
    }),
    "q14_orders_page3" -> ((s, d) => {
      // O5: offset 20 limit 10, scale-safe — TakeOrderedAndProject takes the
      // top offset+limit rows, then the window numbers only those 30 rows
      // (single tiny partition by construction, not a global sort).
      val w = Window.orderBy(col("o_totalprice").desc, col("o_orderkey"))
      rt(s, d, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(30)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") > 20)
        .select(col("o_orderkey"), round(col("o_totalprice"), 2).as("price"))
        .orderBy(col("o_orderkey"))
    }),

    // ---- crawler-semantics operators on testdata (P1/P2/P3/F10/P12/A1) ------
    "q15_url_canon" -> ((s, d) => {
      // native Catalyst expression (codegen), not a UDF
      rt(s, d, "customer")
        .select(col("c_custkey"),
          graft.functions.functions.canon_url(
            concat(lit("HTTPS://Shop.Example.COM/cust/"),
              col("c_custkey"), lit("/?ref=X#frag"))).as("canon_url"))
        .orderBy(col("c_custkey"))
    }),
    "q16_first_wins_dedup" -> ((s, d) => {
      // P2/W4: first-wins dedup per key, expressed as the window the
      // pipeline uses (min orderkey = first occurrence here)
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderkey"))
      rt(s, d, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("o_custkey"), col("o_orderkey"))
        .orderBy(col("o_custkey"))
    }),
    "q17_relevance_score" -> ((s, d) => {
      val scoreU = udf((text: String) =>
        graft.analysis.Relevance.score(text, Seq("spark", "data"), ""))
      rt(s, d, "documents")
        .select(col("doc_id"), round(scoreU(col("text")), 9).as("relevance"))
        .orderBy(col("doc_id"))
    }),
    "q18_sentiment_lexicon" -> ((s, d) => {
      // F10 semantics with a 4-term lexicon: non-overlapping counts,
      // (p-n)/(p+n), ±0.1 label thresholds
      val scoreU = udf((text: String) => {
        val t = graft.analysis.Sentiment.preprocess(text)
        val p = Seq("fast", "good").map(graft.analysis.Relevance.countOccurrences(t, _)).sum
        val n = Seq("slow", "bad").map(graft.analysis.Relevance.countOccurrences(t, _)).sum
        if (p + n == 0) 0.0 else math.max(-1.0, math.min(1.0, (p - n).toDouble / (p + n)))
      })
      rt(s, d, "documents")
        .withColumn("score", round(scoreU(col("text")), 9))
        .withColumn("label",
          when(col("score") > 0.1, "positive")
            .when(col("score") < -0.1, "negative").otherwise("neutral"))
        .select(col("doc_id"), col("score"), col("label"))
        .orderBy(col("doc_id"))
    }),
    "q19_bug_classify" -> ((s, d) => {
      val isBug = Seq("error", "crash", "lag")
        .map(k => lower(col("text")).contains(k)).reduce(_ || _)
      rt(s, d, "documents")
        .withColumn("is_bug", isBug)
        .groupBy(col("is_bug")).agg(count(lit(1)).as("n"))
        .orderBy(col("is_bug"))
    }),
    "q20_token_topn" -> ((s, d) => {
      rt(s, d, "documents")
        .select(explode(split(col("text"), " ")).as("token"))
        .filter(length(col("token")) >= 2)
        .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("token"))
        .limit(20)
    }),
    "q21_explode_types" -> ((s, d) => {
      rt(s, d, "part")
        .select(explode(split(col("p_type"), " ")).as("word"))
        .groupBy(col("word")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("word"))
    }),

    // ---- training-data ops: dedup family ------------------------------------
    "q23_exact_dedup_groups" -> ((s, d) => {
      graft.ops.Dedup.exactGroups(rt(s, d, "documents"))
        .orderBy(col("fingerprint"))
    }),
    "q24_minhash_signatures" -> ((s, d) => {
      graft.ops.Dedup.minhashSignatures(rt(s, d, "documents"), k = 4, shingleW = 1)
        .orderBy(col("doc_id"))
    }),
    "q29_ngram_jaccard_pairs" -> ((s, d) => {
      // maxDf explicit: the DuckDB oracle is exact all-pairs (no df cap), so
      // the engine-side inverted-index guard must be off for hash parity.
      // joinParallelism 4×session width: the capless pair expansion is the
      // battery's biggest stage and per-shingle df² skews it — finer
      // partitions amortize the skew across waves (guide §2.5/§2.6;
      // measured ~1.4× on the expansion+agg). Derived from the session
      // conf, never a local-mode constant.
      graft.ops.Dedup.ngramJaccardPairs(
        rt(s, d, "documents").filter(graft.ops.TextOps.tokenCountCol(col("text")) >= 2),
        shingleW = 2, threshold = 0.05, maxDf = Int.MaxValue,
        joinParallelism = 4 * s.sessionState.conf.numShufflePartitions)
        .select(col("a"), col("b"), round(col("jaccard"), 9).as("jaccard"))
        .orderBy(col("a"), col("b"))
    }),
    "q30_simhash_pairs" -> ((s, d) => {
      // portable md5-based signatures + maxHamming=3, which the 4-block
      // pigeonhole blocking covers with FULL recall — the DuckDB oracle is
      // the brute-force all-pairs ground truth over the same signatures.
      // maxBucket uncapped to match the capless oracle exactly (the engine
      // default keeps the 10k degenerate-block guard, like q29's maxDf);
      // the engine default also uses the ~3× cheaper single-pass FNV
      // signatures — the portable md5 construction exists for this contract
      graft.ops.Dedup.simhashDupPairs(rt(s, d, "documents"), maxHamming = 3,
        bits = 60, maxBucket = Int.MaxValue,
        signatures = graft.ops.Dedup.simhashPortableSigs(_))
        .orderBy(col("a"), col("b"))
    }),
    "q36_minhash_lsh_pairs" -> ((s, d) => { // rows-only (banding layout)
      // 3-word shingles: with a small vocabulary, 1-gram MinHash would
      // degenerate into one giant LSH bucket (every doc contains nearly
      // every word) — w=3 keeps buckets selective
      graft.ops.Dedup.lshCandidatePairs(
        graft.ops.Dedup.minhashSignatures(rt(s, d, "documents"), k = 8, shingleW = 3),
        k = 8, bands = 4)
        .orderBy(col("band"), col("a"), col("b"))
    }),

    // ---- training-data ops: text analysis -----------------------------------
    "q25_token_stats_per_lang" -> ((s, d) => {
      rt(s, d, "documents")
        .withColumn("n_tokens", graft.ops.TextOps.tokenCountCol(col("text")))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("sum_tokens"),
          max(col("n_tokens")).as("max_tokens"))
        .orderBy(col("lang"))
    }),
    "q26_quality_scores" -> ((s, d) => {
      rt(s, d, "documents")
        .select(col("doc_id"),
          graft.ops.TextOps.tokenCountCol(col("text")).as("n_tokens"),
          graft.ops.TextOps.qualityScoreCol(col("text")).as("quality"))
        .orderBy(col("doc_id"))
    }),
    "q27_langid_simple" -> ((s, d) => {
      // SQL-checkable stopword cascade (the full voting heuristic is
      // q28, rows-only)
      val padded = concat(lit(" "), lower(col("text")), lit(" "))
      rt(s, d, "documents")
        .withColumn("lang_guess",
          when(padded.contains(" the "), "en")
            .when(padded.contains(" der ") || padded.contains(" und "), "de")
            .when(padded.contains(" le ") || padded.contains(" la "), "fr")
            .otherwise("und"))
        .groupBy(col("lang_guess")).agg(count(lit(1)).as("n"))
        .orderBy(col("lang_guess"))
    }),
    "q28_text_profile" -> ((s, d) => { // rows-only (JVM hash + UDF heuristics)
      graft.ops.TextOps.profile(rt(s, d, "documents"))
        .select(col("doc_id"), col("n_tokens"), col("bpe_tokens"), col("quality"),
          col("lang_id"), col("fingerprint"), col("rolling_hash"))
        .orderBy(col("doc_id"))
    }),
    "q35_fingerprints" -> ((s, d) => {
      rt(s, d, "documents")
        .select(col("doc_id"),
          graft.ops.TextOps.fingerprintCol(col("text")).as("fingerprint"))
        .orderBy(col("doc_id"))
    }),

    // ---- training-data ops: similarity search --------------------------------
    "q31_embedding_norms" -> ((s, d) => {
      val norm = sqrt(aggregate(
        transform(col("embedding"), a => a.cast("double") * a.cast("double")),
        lit(0.0d), (acc, v) => acc + v))
      rt(s, d, "embeddings")
        .select(col("vec_id"), round(norm, 4).as("norm"))
        .orderBy(col("vec_id"))
    }),
    "q32_cosine_topk" -> ((s, d) => {
      val dim = 64
      val q = (0 until dim).map(i => math.sin(i + 1.0))
      graft.ops.Similarity.bruteForceTopK(rt(s, d, "embeddings"), q, 10)
        .select(col("vec_id"), round(col("cosine"), 6).as("cosine"))
    }),
    "q33_lsh_topk" -> ((s, d) => {
      // index-backed probe: the embeddings table stored partitionBy(bucket),
      // so the probe reads ONLY the ~9 probed buckets' files (partition
      // pruning — asserted in PlanSpec); built once per JVM per sf dir
      val dim = 64
      val q = (0 until dim).map(i => math.sin(i + 1.0))
      graft.ops.Similarity.indexTopK(s, annIndex(s, d, dim), q, 10, dim)
        .select(col("vec_id"), round(col("cosine"), 6).as("cosine"),
          col("bucket").cast("int").as("bucket"))
    }),
    "q34_bucketed_neighbors" -> ((s, d) => {
      graft.ops.Similarity.bucketedNeighbors(rt(s, d, "embeddings"), dim = 64, k = 3)
        .orderBy(col("a"), col("cosine").desc, col("b"))
    }),

    // ---- crawl engine + multimodal plumbing (rows-only; full parity in
    //      sbt test vs the sequential oracle) ----------------------------------
    "q37_crawl_span_docs" -> ((s, d) => {
      import s.implicits._
      val seeds = graft.fixtures.Fixtures.seeds(120)
      val docs = seeds.flatMap { sr =>
        val canon = graft.core.UrlCanon.canonicalize(sr.url)
        graft.parse.PageParser.parse(graft.fixtures.Fixtures.html(canon), canon)
          .map(p => (canon, p.spans.map(sp => (sp.kind, sp.text, sp.media_ref, sp.offset))))
      }
      s.createDataset(docs.toSeq).toDF("doc_id", "spans")
        .select(col("doc_id"), explode(col("spans")).as("span"))
        .select(col("doc_id"), col("span._1").as("kind"), col("span._2").as("text"),
          col("span._3").as("media_ref"), col("span._4").as("offset"))
        .orderBy(col("doc_id"), col("offset"))
    }),
    // ---- dashboard endpoint shapes (P10 conjunctive filter + O3 sort +
    //      O5 limit; point lookup) over testdata --------------------------
    "q39_posts_endpoint" -> ((s, d) => {
      rt(s, d, "documents")
        .filter(col("lang") === "en" && col("n_chars") >= 200)
        .select(col("doc_id"), col("lang"), col("n_chars"),
          substring(col("text"), 1, 80).as("preview"))
        .orderBy(col("n_chars").desc, col("doc_id"))
        .limit(25)
    }),
    "q40_point_lookup" -> ((s, d) => {
      rt(s, d, "documents")
        .filter(col("doc_id") === 42L)
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
    }),
    "q38_media_features" -> ((s, d) => {
      import s.implicits._
      val seeds = graft.fixtures.Fixtures.seeds(120)
      val docRows = seeds.flatMap { sr =>
        val canon = graft.core.UrlCanon.canonicalize(sr.url)
        graft.parse.PageParser.parse(graft.fixtures.Fixtures.html(canon), canon)
          .map(p => (canon, p.spans))
      }.distinct
      val docs = s.createDataset(docRows.toSeq).toDF("doc_id", "spans")
      val media = graft.ops.Multimodal.mediaTable(s, docs)
      // the feature vector is serialized to a scalar (array cells can't be
      // hashed/ordered by the driver): milli-scaled ints, exactly
      // reproducible driver-side for the VALUES oracle (features are
      // non-negative by construction, where SQL round's HALF_UP and the
      // oracle's Math.round agree; every feature comes from a REAL decode
      // of the asset bytes — PPM/WAV/Y4M, see Multimodal.decode)
      graft.ops.Multimodal.extractFeatures(s, media, partitions = 8)
        .toDF()
        .withColumn("feature_milli",
          concat_ws(",", transform(col("feature"),
            v => round(v.cast("double") * 1000).cast("int").cast("string"))))
        .drop("feature")
        .orderBy(col("media_id"), col("doc_id"))
    }),
    "q49_frame_features" -> ((s, d) => {
      import s.implicits._
      val seeds = graft.fixtures.Fixtures.seeds(120)
      val docRows = seeds.flatMap { sr =>
        val canon = graft.core.UrlCanon.canonicalize(sr.url)
        graft.parse.PageParser.parse(graft.fixtures.Fixtures.html(canon), canon)
          .map(p => (canon, p.spans))
      }.distinct
      val docs = s.createDataset(docRows.toSeq).toDF("doc_id", "spans")
      val media = graft.ops.Multimodal.mediaTable(s, docs)
      // frame-level video sampling: every 7th frame of each Y4M asset,
      // per-frame mean luma/chroma computed from THAT frame's decoded
      // planes (milli-scaled like q38; means are non-negative, so SQL
      // HALF_UP and Math.round agree). The oracle recomputes the same
      // decode driver-side into VALUES — DuckDB then verifies the
      // distributed application down to individual frame planes.
      graft.ops.Multimodal.sampleFrameFeatures(s, media, stride = 7, partitions = 8)
        .withColumn("mean_y_milli", round(col("mean_y").cast("double") * 1000).cast("int"))
        .withColumn("mean_u_milli", round(col("mean_u").cast("double") * 1000).cast("int"))
        .withColumn("mean_v_milli", round(col("mean_v").cast("double") * 1000).cast("int"))
        .drop("mean_y", "mean_u", "mean_v")
        .orderBy(col("media_id"), col("doc_id"), col("frame_idx"))
    }),
    "q41_simhash_engine_pairs" -> ((s, d) => {
      // the ENGINE-default simhash path (single-pass FNV signatures over 64
      // bits, 10k block guard — what a pipeline actually runs); the oracle
      // recomputes the signatures driver-side into VALUES and mirrors the
      // pigeonhole blocking + guard in SQL (q36 pattern)
      graft.ops.Dedup.simhashDupPairs(rt(s, d, "documents"), maxHamming = 3)
        .orderBy(col("a"), col("b"))
    }),
    "q50_dup_clusters" -> ((s, d) => {
      // end of the dedup ladder: collapse the engine's verified simhash
      // dup pairs into connected components and emit each doc's canonical
      // representative (min doc id in its component) — alternating
      // large-star/small-star, O(log^2 n) rounds of join+groupBy. The
      // oracle computes the same components with a recursive CTE over the
      // same (independently q41-oracled) pair set.
      val pairs = graft.ops.Dedup
        .simhashDupPairs(rt(s, d, "documents"), maxHamming = 3)
        .select(col("a"), col("b"))
      graft.ops.Dedup.dupClusters(pairs).orderBy(col("doc_id"))
    }),

    // ---- corpus preparation (PII / sampling / packing / IVF) -----------------
    "q46_ngram_jaccard_engine" -> ((s, d) => {
      // the ENGINE-DEFAULT inverted-index path with the maxDf hub-shingle
      // cap ON (what a 100 TB dedup run uses — q29 is the capless exact
      // contract); the oracle mirrors the df cap in SQL, q36-style.
      // maxDf=35 so the cap genuinely fires at sf0.01 corpus sizes (max 2-gram df there is 46).
      graft.ops.Dedup.ngramJaccardPairs(
        rt(s, d, "documents").filter(graft.ops.TextOps.tokenCountCol(col("text")) >= 2),
        shingleW = 2, threshold = 0.05, maxDf = 35)
        .select(col("a"), col("b"), round(col("jaccard"), 9).as("jaccard"))
        .orderBy(col("a"), col("b"))
    }),
    "q42_pii_redact" -> ((s, d) => {
      // word-salad docs carry no PII — augment with deterministic
      // PII-shaped tails (pure SQL-expressible) so the ladder fires
      val id = col("doc_id").cast("string")
      val aug = concat(col("text"),
        when(col("doc_id") % 7 === 0,
          concat(lit(" contact user"), id, lit("@example.com"))).otherwise(lit("")),
        when(col("doc_id") % 11 === 0,
          concat(lit(" from 10.0."), (col("doc_id") % 256).cast("string"), lit(".1")))
          .otherwise(lit("")),
        when(col("doc_id") % 13 === 0,
          concat(lit(" ref 9000000"), id)).otherwise(lit("")))
      graft.ops.Par.widen(rt(s, d, "documents")) // 3-regex ladder fans out
        .select(col("doc_id"), graft.ops.Corpus.redactPiiCol(aug).as("redacted"))
        .orderBy(col("doc_id"))
    }),
    "q43_stratified_sample" -> ((s, d) => {
      graft.ops.Corpus.stratifiedSample(rt(s, d, "documents"), "lang", "doc_id",
        Map("en" -> 0.5, "de" -> 0.25), defaultFraction = 0.1)
        .select(col("doc_id"), col("lang"))
        .orderBy(col("doc_id"))
    }),
    "q44_ivf_topk" -> ((s, d) => {
      // IVF-flat ANN over the stored cell-partitioned index: the probe
      // reads only nprobe cells' files (partition pruning, q33 pattern)
      val dim = 64
      val q = (0 until dim).map(i => math.cos(i + 1.0))
      graft.ops.Similarity.ivfTopK(s, ivfIndex(s, d, dim), q, 10, dim)
        .select(col("vec_id"), round(col("cosine"), 6).as("cosine"),
          col("cell").cast("int").as("cell"))
    }),
    "q45_sequence_packing" -> ((s, d) => {
      val docs = rt(s, d, "documents").select(col("doc_id"),
        graft.ops.TextOps.tokenCountCol(col("text")).cast("long").as("n_tokens"))
      graft.ops.Corpus.packSequences(docs, 4096L, "doc_id", "n_tokens")
        .select(col("doc_id"), col("n_tokens"), col("seq_id"))
        .orderBy(col("doc_id"))
    }),
    "q47_decile_threshold" -> ((s, d) => {
      // W1's AT-SCALE path (q07 is the driver-merge top-k contract): the
      // decile as an approxQuantile threshold + pushed-down filter —
      // tie-inclusive, no TakeOrdered of n/10 rows, no global sort
      // (ops/Quantiles.scala). relativeError=0 makes the threshold the
      // exact k-th largest element, so the oracle is the rank()-based
      // tie-inclusive top-10% in SQL.
      graft.ops.Quantiles.topFraction(rt(s, d, "orders"), "o_totalprice",
          0.1, relativeError = 0.0)
        .select(col("o_orderkey"), round(col("o_totalprice"), 2).as("price"))
        .orderBy(col("o_orderkey"))
    }),
    "q48_simhash128_pairs" -> ((s, d) => {
      // the 128-bit SimHash scale path (the geometry simhashDupPairsAuto
      // switches to past ~650M docs — twice the block-keyspace exponent,
      // ceiling ~4·10^13): engine FNV two-stream signatures, 4 blocks of
      // 32 bits, 10k guard. The oracle recomputes (sig_hi, sig_lo)
      // driver-side into VALUES and mirrors the blocking in SQL (q41
      // pattern, two-limb popcount for the hamming verify).
      graft.ops.Dedup.simhashDupPairs128(rt(s, d, "documents"), maxHamming = 3)
        .orderBy(col("a"), col("b"))
    }),
  )

  /** Once-per-JVM ANN index build (deterministic content — rebuild in a
    * fresh tmp dir is idempotent). Keyed by sf dir.
    */
  private val annIndexCache = scala.collection.concurrent.TrieMap.empty[String, String]
  private def annIndex(s: SparkSession, d: String, dim: Int): String =
    annIndexCache.getOrElseUpdate(d, {
      val path = java.nio.file.Files.createTempDirectory("graft-ann-index").toString + "/emb"
      graft.ops.Similarity.writeIndex(rt(s, d, "embeddings"), path, dim)
      path
    })

  private val ivfIndexCache = scala.collection.concurrent.TrieMap.empty[String, String]
  private def ivfIndex(s: SparkSession, d: String, dim: Int): String =
    ivfIndexCache.getOrElseUpdate(d, {
      val path = java.nio.file.Files.createTempDirectory("graft-ivf-index").toString + "/emb"
      graft.ops.Similarity.writeIvfIndex(rt(s, d, "embeddings"), path, dim)
      path
    })

  /** DuckDB-runnable oracle SQL — identical column names + deterministic
    * ORDER BY. Keys absent here get the driver's rows-only check.
    * Static SQL plus the VALUES-style generated oracles (q28/q33/q34/q38/
    * q41), whose JVM-bound columns are recomputed driver-side from the same
    * pure functions — DuckDB then verifies the DISTRIBUTED application.
    */
  def oracleSql: Map[String, String] = staticOracleSql ++ generatedOracles

  private def staticOracleSql: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
         round(sum(l_quantity), 2) AS sum_qty,
         round(sum(l_extendedprice), 2) AS sum_base_price,
         round(sum(l_discount), 4) AS sum_disc,
         count(*) AS count_order
         FROM lineitem GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",
    "q02_top_orders" ->
      """SELECT o_orderkey, c_name, o_totalprice
         FROM orders JOIN customer ON o_custkey = c_custkey
         WHERE o_orderstatus = 'F'
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""",
    "q03_customers_with_orders" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
         ORDER BY c_custkey""",
    "q04_customers_without_orders" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
         ORDER BY c_custkey""",
    "q05_top3_orders_per_customer" ->
      """SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS price, rn
         FROM (SELECT o_custkey, o_orderkey, o_totalprice,
                      row_number() OVER (PARTITION BY o_custkey
                        ORDER BY o_totalprice DESC, o_orderkey) AS rn
               FROM orders) t
         WHERE rn <= 3 ORDER BY o_custkey, rn, o_orderkey""",
    "q06_daily_revenue_delta" ->
      """WITH daily AS (
           SELECT strftime(o_orderdate, '%Y-%m-%d') AS day,
                  round(sum(o_totalprice), 2) AS revenue
           FROM orders GROUP BY 1)
         SELECT day, revenue,
                lag(revenue, 1) OVER (ORDER BY day) AS prev_revenue,
                round(revenue - lag(revenue, 1) OVER (ORDER BY day), 2) AS delta
         FROM daily ORDER BY day""",
    "q07_hot_decile_orders" ->
      """WITH ranked AS (
           SELECT o_orderkey, o_totalprice,
                  row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS rn,
                  count(*) OVER () AS n
           FROM orders)
         SELECT o_orderkey, round(o_totalprice, 2) AS price
         FROM ranked WHERE rn <= greatest(1, n // 10) ORDER BY o_orderkey""",
    // tie-inclusive top-10% (rank() keeps boundary ties) — the semantics of
    // the approxQuantile-threshold engine path; ceil(n·0.1) mirrors
    // Quantiles.topFraction's k
    "q47_decile_threshold" ->
      """WITH ranked AS (
           SELECT o_orderkey, o_totalprice,
                  rank() OVER (ORDER BY o_totalprice DESC) AS r,
                  count(*) OVER () AS n
           FROM orders)
         SELECT o_orderkey, round(o_totalprice, 2) AS price
         FROM ranked WHERE r <= greatest(1, CAST(ceil(n * 0.1) AS BIGINT))
         ORDER BY o_orderkey""",
    "q08_weekly_order_trend" ->
      """SELECT strftime(date_trunc('week', o_orderdate), '%Y-%m-%d') AS week,
                count(*) AS n_orders, round(sum(o_totalprice), 2) AS total_price
         FROM orders GROUP BY 1 ORDER BY week""",
    "q13_orders_per_day" ->
      """SELECT strftime(o_orderdate, '%Y-%m-%d') AS day, count(*) AS n
         FROM orders GROUP BY 1 ORDER BY day""",
    "q22_events_hourly" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type,
                count(*) AS n, round(sum(value), 4) AS total_value
         FROM events GROUP BY 1, 2 ORDER BY hour, event_type""",
    "q09_nation_union" ->
      """SELECT DISTINCT c_nationkey AS nationkey FROM customer
         UNION SELECT DISTINCT s_nationkey AS nationkey FROM supplier
         ORDER BY nationkey""",
    "q10_status_breakdown" ->
      """SELECT CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
                CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
                CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p
         FROM orders""",
    "q11_distinct_orders_per_flag" ->
      """SELECT l_returnflag, count(DISTINCT l_orderkey) AS n_orders,
                count(*) AS n_lines
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q12_part_strings" ->
      """SELECT p_partkey, substring(p_name, 1, 10) AS name10,
                lower(p_brand) AS brand_lc,
                p_brand || '|' || p_type AS brand_type
         FROM part ORDER BY p_partkey LIMIT 100""",
    "q14_orders_page3" ->
      """WITH ranked AS (
           SELECT o_orderkey, o_totalprice,
                  row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS rn
           FROM orders)
         SELECT o_orderkey, round(o_totalprice, 2) AS price
         FROM ranked WHERE rn > 20 AND rn <= 30 ORDER BY o_orderkey""",
    "q15_url_canon" ->
      """SELECT c_custkey,
                'https://shop.example.com/cust/' || c_custkey || '?ref=x' AS canon_url
         FROM customer ORDER BY c_custkey""",
    "q16_first_wins_dedup" ->
      """SELECT o_custkey, min(o_orderkey) AS o_orderkey
         FROM orders GROUP BY o_custkey ORDER BY o_custkey""",
    "q17_relevance_score" ->
      """SELECT doc_id,
           round(least(1.0, greatest(0.0,
             0.4 * (((CASE WHEN position('spark' IN t) > 0 THEN 1 ELSE 0 END) +
                     (CASE WHEN position('data' IN t) > 0 THEN 1 ELSE 0 END)) / 2.0)
             + CASE WHEN f > 0 THEN least(0.3, 0.3 * (1 - 1.0 / (1 + f * 0.1))) ELSE 0 END)), 9)
           AS relevance
         FROM (SELECT doc_id, lower(text) AS t,
                 (length(lower(text)) - length(replace(lower(text), 'spark', ''))) / 5
               + (length(lower(text)) - length(replace(lower(text), 'data', ''))) / 4 AS f
               FROM documents) t
         ORDER BY doc_id""",
    "q18_sentiment_lexicon" ->
      """WITH c AS (
           SELECT doc_id,
             (length(t) - length(replace(t, 'fast', ''))) / 4
             + (length(t) - length(replace(t, 'good', ''))) / 4 AS p,
             (length(t) - length(replace(t, 'slow', ''))) / 4
             + (length(t) - length(replace(t, 'bad', ''))) / 3 AS n
           FROM (SELECT doc_id,
                   trim(lower(regexp_replace(text, '\s+', ' ', 'g'))) AS t
                 FROM documents) x)
         SELECT doc_id,
           round(CASE WHEN p + n = 0 THEN 0.0
                 ELSE greatest(-1.0, least(1.0, (p - n) * 1.0 / (p + n))) END, 9) AS score,
           CASE WHEN (CASE WHEN p + n = 0 THEN 0.0
                      ELSE greatest(-1.0, least(1.0, (p - n) * 1.0 / (p + n))) END) > 0.1
                  THEN 'positive'
                WHEN (CASE WHEN p + n = 0 THEN 0.0
                      ELSE greatest(-1.0, least(1.0, (p - n) * 1.0 / (p + n))) END) < -0.1
                  THEN 'negative'
                ELSE 'neutral' END AS label
         FROM c ORDER BY doc_id""",
    "q19_bug_classify" ->
      """SELECT (position('error' IN lower(text)) > 0
                 OR position('crash' IN lower(text)) > 0
                 OR position('lag' IN lower(text)) > 0) AS is_bug,
                count(*) AS n
         FROM documents GROUP BY 1 ORDER BY is_bug""",
    "q20_token_topn" ->
      """SELECT token, count(*) AS cnt
         FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents) t
         WHERE length(token) >= 2
         GROUP BY token ORDER BY cnt DESC, token LIMIT 20""",
    "q21_explode_types" ->
      """SELECT word, count(*) AS n
         FROM (SELECT unnest(string_split(p_type, ' ')) AS word FROM part) t
         GROUP BY word ORDER BY n DESC, word""",
    "q23_exact_dedup_groups" ->
      """SELECT md5(lower(regexp_replace(text, '\s+', ' ', 'g'))) AS fingerprint,
                min(doc_id) AS keep_id, count(*) AS n
         FROM documents GROUP BY 1 ORDER BY fingerprint""",
    "q24_minhash_signatures" ->
      """SELECT doc_id,
                min(md5(tok || '_0')) AS mh_0, min(md5(tok || '_1')) AS mh_1,
                min(md5(tok || '_2')) AS mh_2, min(md5(tok || '_3')) AS mh_3
         FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents) t
         GROUP BY doc_id ORDER BY doc_id""",
    "q29_ngram_jaccard_pairs" ->
      """WITH docs2 AS (
           SELECT doc_id, string_split(text, ' ') AS toks FROM documents
           WHERE (length(text) - length(replace(text, ' ', ''))) + 1 >= 2),
         sets AS (
           SELECT doc_id,
             list_distinct(list_transform(range(0, len(toks) - 1),
               i -> array_to_string(toks[i + 1:i + 2], ' '))) AS sh
           FROM docs2),
         inv AS (
           SELECT doc_id, len(sh) AS setSize, unnest(sh) AS sh FROM sets),
         pairs AS (
           SELECT a.doc_id AS a, b.doc_id AS b, a.setSize AS sa, b.setSize AS sb,
                  count(*) AS inter
           FROM inv a JOIN inv b ON a.sh = b.sh AND a.doc_id < b.doc_id
           GROUP BY 1, 2, 3, 4)
         SELECT a, b, round(inter * 1.0 / (sa + sb - inter), 9) AS jaccard
         FROM pairs WHERE inter * 1.0 / (sa + sb - inter) >= 0.05
         ORDER BY a, b""",
    "q25_token_stats_per_lang" ->
      """SELECT lang, count(*) AS n_docs,
                CAST(sum(nt) AS BIGINT) AS sum_tokens, max(nt) AS max_tokens
         FROM (SELECT lang,
                 CASE WHEN length(text) = 0 THEN 0
                      ELSE (length(text) - length(replace(text, ' ', ''))) + 1 END AS nt
               FROM documents) t
         GROUP BY lang ORDER BY lang""",
    "q26_quality_scores" ->
      """SELECT doc_id, nt AS n_tokens,
           round(least(least(length(text) / 200.0, 1.0) * 0.6 +
             (CASE WHEN nt > 0 AND
                   (length(text) - (nt - 1)) * 1.0 / nt BETWEEN 2.0 AND 12.0
              THEN 1.0 ELSE 0.5 END) * 0.4, 1.0), 6) AS quality
         FROM (SELECT doc_id, text,
                 CASE WHEN length(text) = 0 THEN 0
                      ELSE (length(text) - length(replace(text, ' ', ''))) + 1 END AS nt
               FROM documents) t
         ORDER BY doc_id""",
    "q27_langid_simple" ->
      """SELECT CASE WHEN position(' the ' IN ' ' || lower(text) || ' ') > 0 THEN 'en'
                     WHEN position(' der ' IN ' ' || lower(text) || ' ') > 0
                       OR position(' und ' IN ' ' || lower(text) || ' ') > 0 THEN 'de'
                     WHEN position(' le ' IN ' ' || lower(text) || ' ') > 0
                       OR position(' la ' IN ' ' || lower(text) || ' ') > 0 THEN 'fr'
                     ELSE 'und' END AS lang_guess,
                count(*) AS n
         FROM documents GROUP BY 1 ORDER BY lang_guess""",
    "q35_fingerprints" ->
      """SELECT doc_id, md5(lower(regexp_replace(text, '\s+', ' ', 'g'))) AS fingerprint
         FROM documents ORDER BY doc_id""",
    "q31_embedding_norms" ->
      """SELECT vec_id, round(sqrt(sum(CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), 4) AS norm
         FROM (SELECT vec_id, unnest(embedding) AS x FROM embeddings) t
         GROUP BY vec_id ORDER BY vec_id""",
    "q39_posts_endpoint" ->
      """SELECT doc_id, lang, n_chars, substring(text, 1, 80) AS preview
         FROM documents WHERE lang = 'en' AND n_chars >= 200
         ORDER BY n_chars DESC, doc_id LIMIT 25""",
    "q40_point_lookup" ->
      """SELECT doc_id, lang, source, n_chars FROM documents WHERE doc_id = 42""",
    // engine-portable simhash ground truth: identical md5-derived 60-bit
    // token hashes + per-bit majority as the Spark side, but verified
    // BRUTE-FORCE over all pairs — proving the blocked candidate
    // generation loses nothing at maxHamming=3 (pigeonhole guarantee)
    "q30_simhash_pairs" ->
      """WITH toks AS (
           SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents),
         h AS (
           SELECT doc_id, ('0x' || substring(md5(t), 1, 15))::BIGINT AS h FROM toks),
         votes AS (
           SELECT doc_id, i, sum((((h >> CAST(i AS INT)) & 1) * 2 - 1)) AS v
           FROM h, range(0, 60) r(i) GROUP BY doc_id, i),
         sigs AS (
           SELECT doc_id,
                  CAST(sum(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << CAST(i AS INT))
                           ELSE 0 END) AS BIGINT) AS sig
           FROM votes GROUP BY doc_id)
         SELECT a.doc_id AS a, b.doc_id AS b,
                CAST(bit_count(xor(a.sig, b.sig)) AS INT) AS hamming
         FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
         WHERE bit_count(xor(a.sig, b.sig)) <= 3
         ORDER BY a, b""",
    "q32_cosine_topk" -> {
      val dim = 64
      val qv = (0 until dim).map(i => sqlDouble(math.sin(i + 1.0))).mkString("[", ", ", "]")
      s"""WITH c AS (
            SELECT vec_id,
                   list_cosine_similarity(
                     list_transform(embedding, x -> CAST(x AS DOUBLE)), $qv) AS cos
            FROM embeddings)
          SELECT vec_id, round(cos, 6) AS cosine
          FROM c ORDER BY cos DESC, vec_id LIMIT 10"""
    },
    // MinHash-LSH banding layout: md5-based signatures (k=8 over 3-word
    // shingles), 4 bands of 2 rows, candidate pairs sharing a (band, key);
    // bucket guard (<=10000) mirrors the engine's skew rails
    "q36_minhash_lsh_pairs" ->
      """WITH docs2 AS (
           SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents),
         sets AS (
           SELECT doc_id,
             CASE WHEN len(toks) >= 3 THEN
               list_transform(range(0, len(toks) - 2),
                 i -> array_to_string(toks[i + 1:i + 3], ' '))
             ELSE [text] END AS sh
           FROM docs2),
         inv AS (SELECT doc_id, unnest(sh) AS sh FROM sets),
         sigs AS (
           SELECT doc_id,
             min(md5(sh || '_0')) AS mh_0, min(md5(sh || '_1')) AS mh_1,
             min(md5(sh || '_2')) AS mh_2, min(md5(sh || '_3')) AS mh_3,
             min(md5(sh || '_4')) AS mh_4, min(md5(sh || '_5')) AS mh_5,
             min(md5(sh || '_6')) AS mh_6, min(md5(sh || '_7')) AS mh_7
           FROM inv GROUP BY doc_id),
         keyed AS (
           SELECT doc_id, 0 AS band, md5(mh_0 || '|' || mh_1) AS key FROM sigs
           UNION ALL
           SELECT doc_id, 1 AS band, md5(mh_2 || '|' || mh_3) AS key FROM sigs
           UNION ALL
           SELECT doc_id, 2 AS band, md5(mh_4 || '|' || mh_5) AS key FROM sigs
           UNION ALL
           SELECT doc_id, 3 AS band, md5(mh_6 || '|' || mh_7) AS key FROM sigs),
         small AS (
           SELECT band, key FROM keyed GROUP BY band, key HAVING count(*) <= 10000),
         guarded AS (SELECT k.* FROM keyed k JOIN small USING (band, key))
         SELECT DISTINCT CAST(a.band AS INT) AS band, a.doc_id AS a, b.doc_id AS b
         FROM guarded a JOIN guarded b
           ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
         ORDER BY band, a, b""",
    // engine-default n-gram Jaccard: identical to q29's construction but
    // with the maxDf=35 hub-shingle cap mirrored (kept CTE). Set sizes
    // stay FULL (the engine computes setSize before the cap) — only the
    // shared-shingle counts run over the capped index.
    "q46_ngram_jaccard_engine" ->
      """WITH docs2 AS (
           SELECT doc_id, string_split(text, ' ') AS toks FROM documents
           WHERE (length(text) - length(replace(text, ' ', ''))) + 1 >= 2),
         sets AS (
           SELECT doc_id,
             list_distinct(list_transform(range(0, len(toks) - 1),
               i -> array_to_string(toks[i + 1:i + 2], ' '))) AS sh
           FROM docs2),
         inv AS (
           SELECT doc_id, len(sh) AS setSize, unnest(sh) AS sh FROM sets),
         kept AS (SELECT sh FROM inv GROUP BY sh HAVING count(*) <= 35),
         filtered AS (SELECT i.* FROM inv i JOIN kept USING (sh)),
         pairs AS (
           SELECT a.doc_id AS a, b.doc_id AS b, a.setSize AS sa, b.setSize AS sb,
                  count(*) AS inter
           FROM filtered a JOIN filtered b ON a.sh = b.sh AND a.doc_id < b.doc_id
           GROUP BY 1, 2, 3, 4)
         SELECT a, b, round(inter * 1.0 / (sa + sb - inter), 9) AS jaccard
         FROM pairs WHERE inter * 1.0 / (sa + sb - inter) >= 0.05
         ORDER BY a, b""",
    "q42_pii_redact" ->
      """SELECT doc_id,
           regexp_replace(regexp_replace(regexp_replace(
             text
             || (CASE WHEN doc_id % 7 = 0
                 THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
                 ELSE '' END)
             || (CASE WHEN doc_id % 11 = 0
                 THEN ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.1'
                 ELSE '' END)
             || (CASE WHEN doc_id % 13 = 0
                 THEN ' ref 9000000' || CAST(doc_id AS VARCHAR)
                 ELSE '' END),
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
             '\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}', '[IP]', 'g'),
             '\d{9,}', '[NUM]', 'g') AS redacted
         FROM documents ORDER BY doc_id""",
    "q43_stratified_sample" ->
      """SELECT doc_id, lang FROM documents
         WHERE ('0x' || substring(md5(CAST(doc_id AS VARCHAR) || '_sample'), 1, 8))::BIGINT
               / 4294967296.0
             < (CASE WHEN lang = 'en' THEN 0.5
                     WHEN lang = 'de' THEN 0.25 ELSE 0.1 END)
         ORDER BY doc_id""",
    "q45_sequence_packing" ->
      """WITH t AS (
           SELECT doc_id,
                  CAST(CASE WHEN length(text) = 0 THEN 0
                       ELSE (length(text) - length(replace(text, ' ', ''))) + 1 END
                       AS BIGINT) AS n_tokens
           FROM documents)
         SELECT doc_id, n_tokens,
                CAST(COALESCE(sum(n_tokens) OVER (ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                     AS BIGINT) // 4096 AS seq_id
         FROM t ORDER BY doc_id""",
    // deterministic span corpus: the VALUES list is generated from the
    // same pure-Scala fixture+parser functions the sbt parity suite pins
    // against the sequential oracle; the driver check then verifies the
    // DISTRIBUTED explode/order path reproduces it through DuckDB
    "q37_crawl_span_docs" ->
      s"""SELECT doc_id, kind, text, media_ref, "offset"
          FROM (VALUES $q37Values) t(doc_id, kind, text, media_ref, "offset")
          ORDER BY doc_id, "offset"""",
  )

  /** The q37 span corpus as a SQL VALUES list (pure Scala, no Spark). */
  private lazy val q37Values: String = {
    graft.fixtures.Fixtures.seeds(120).flatMap { sr =>
      val canon = graft.core.UrlCanon.canonicalize(sr.url)
      graft.parse.PageParser.parse(graft.fixtures.Fixtures.html(canon), canon)
        .toSeq.flatMap(_.spans.map(sp =>
          s"(${sqlLit(canon)}, ${sqlLit(sp.kind)}, ${sqlLit(sp.text)}, ${sqlLit(sp.media_ref)}, ${sp.offset})"))
    }.mkString(", ")
  }

  // ---- generated VALUES oracles --------------------------------------------

  /** Set by Verify before dumping oracleSql: the sf dir whose parquet
    * tables the VALUES generators read (the SAME tables DuckDB queries).
    */
  @volatile var oracleDataDir: String = "/root/testdata/sf0.01"

  private def sqlLit(s: String): String =
    if (s == null) "NULL" else "'" + s.replace("'", "''") + "'"

  /** Locale-pinned double literal: a non-English default locale would
    * otherwise render comma decimal separators inside SQL list literals.
    */
  private def sqlDouble(x: Double): String =
    String.format(java.util.Locale.ROOT, "%.17g", Double.box(x))

  // one driver-side snapshot per (table, sf dir) — several oracle
  // generators share each table; re-collecting per generator would
  // multiply full-table scans at dump time
  private val docsOracleCache =
    scala.collection.concurrent.TrieMap.empty[String, Seq[(Long, String)]]
  private def readDocsForOracle(): Seq[(Long, String)] =
    docsOracleCache.getOrElseUpdate(oracleDataDir,
      SparkSession.active.read.parquet(s"$oracleDataDir/documents.parquet")
        .select("doc_id", "text").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSeq)

  private val embOracleCache =
    scala.collection.concurrent.TrieMap.empty[String, Seq[(Long, Seq[Float])]]
  private def readEmbeddingsForOracle(): Seq[(Long, Seq[Float])] =
    embOracleCache.getOrElseUpdate(oracleDataDir,
      SparkSession.active.read.parquet(s"$oracleDataDir/embeddings.parquet")
        .select("vec_id", "embedding").collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1))).toSeq)

  /** (vec_id, sign bucket) under the q33/q34 seeded planes. */
  private def vecBucketValues(dim: Int): String = {
    val ps = graft.ops.Similarity.planes(dim, 8, 42L)
    readEmbeddingsForOracle().map { case (id, v) =>
      var bucket = 0
      ps.zipWithIndex.foreach { case (plane, p) =>
        var dot = 0.0; var i = 0
        val n = math.min(v.length, plane.length)
        while (i < n) { dot += v(i) * plane(i); i += 1 }
        if (dot > 0) bucket |= (1 << p)
      }
      s"($id, $bucket)"
    }.mkString(", ")
  }

  private val queryVecSql: String = {
    val dim = 64
    (0 until dim).map(i => sqlDouble(math.sin(i + 1.0))).mkString("[", ", ", "]")
  }

  /** Each entry individually guarded: a generation failure (e.g. missing
    * parquet when oracleSql is inspected outside Verify) degrades that
    * query to the driver's rows-only check instead of failing the dump.
    */
  private def generatedOracles: Map[String, String] = {
    def entry(name: String)(body: => String): Seq[(String, String)] =
      try Seq(name -> body)
      catch { case e: Throwable =>
        System.err.println(s"[oracle-gen] $name skipped: ${e.getMessage}"); Seq.empty }

    val q28 = entry("q28_text_profile") {
      val rows = readDocsForOracle().map { case (id, text) =>
        s"($id, ${graft.ops.TextOps.bpeCount(text)}, ${sqlLit(graft.ops.TextOps.langIdScala(text))}, " +
          s"CAST(${graft.ops.TextOps.rollingHash(text)} AS BIGINT))"
      }.mkString(", ")
      s"""WITH jvm(doc_id, bpe_tokens, lang_id, rolling_hash) AS (VALUES $rows),
          base AS (SELECT doc_id, text,
                     CASE WHEN length(text) = 0 THEN 0
                          ELSE (length(text) - length(replace(text, ' ', ''))) + 1 END AS nt
                   FROM documents)
          SELECT b.doc_id, b.nt AS n_tokens, CAST(j.bpe_tokens AS INT) AS bpe_tokens,
                 round(least(least(length(b.text) / 200.0, 1.0) * 0.6 +
                   (CASE WHEN b.nt > 0 AND
                         (length(b.text) - (b.nt - 1)) * 1.0 / b.nt BETWEEN 2.0 AND 12.0
                    THEN 1.0 ELSE 0.5 END) * 0.4, 1.0), 6) AS quality,
                 j.lang_id,
                 md5(lower(regexp_replace(b.text, '\\s+', ' ', 'g'))) AS fingerprint,
                 CAST(j.rolling_hash AS BIGINT) AS rolling_hash
          FROM base b JOIN jvm j ON b.doc_id = j.doc_id
          ORDER BY b.doc_id"""
    }

    val q33 = entry("q33_lsh_topk") {
      val dim = 64
      val probe = graft.ops.Similarity
        .probeBuckets((0 until dim).map(i => math.sin(i + 1.0)), dim)
        .mkString(", ")
      s"""WITH v(vec_id, bucket) AS (VALUES ${vecBucketValues(dim)}),
          c AS (SELECT e.vec_id, v.bucket,
                  list_cosine_similarity(
                    list_transform(e.embedding, x -> CAST(x AS DOUBLE)), $queryVecSql) AS cos
                FROM embeddings e JOIN v ON e.vec_id = v.vec_id
                WHERE v.bucket IN ($probe))
          SELECT vec_id, round(cos, 6) AS cosine, CAST(bucket AS INT) AS bucket
          FROM c ORDER BY cos DESC, vec_id LIMIT 10"""
    }

    val q34 = entry("q34_bucketed_neighbors") {
      val dim = 64
      s"""WITH v(vec_id, bucket) AS (VALUES ${vecBucketValues(dim)}),
          small AS (SELECT bucket FROM v GROUP BY bucket HAVING count(*) <= 10000),
          g AS (SELECT e.vec_id, v.bucket,
                  list_transform(e.embedding, x -> CAST(x AS DOUBLE)) AS ve
                FROM embeddings e JOIN v ON e.vec_id = v.vec_id
                            JOIN small ON v.bucket = small.bucket),
          pairs AS (SELECT a.vec_id AS a, b.vec_id AS b,
                      round(list_cosine_similarity(a.ve, b.ve), 6) AS cosine
                    FROM g a JOIN g b ON a.bucket = b.bucket AND a.vec_id <> b.vec_id),
          ranked AS (SELECT a, b, cosine,
                       row_number() OVER (PARTITION BY a ORDER BY cosine DESC, b) AS rn
                     FROM pairs)
          SELECT a, b, cosine FROM ranked WHERE rn <= 3
          ORDER BY a, cosine DESC, b"""
    }

    val q38 = entry("q38_media_features") {
      val rows = graft.fixtures.Fixtures.seeds(120).flatMap { sr =>
        val canon = graft.core.UrlCanon.canonicalize(sr.url)
        graft.parse.PageParser.parse(graft.fixtures.Fixtures.html(canon), canon)
          .map(p => (canon, p.spans))
      }.distinct.flatMap { case (canon, spans) =>
        spans.filter(_.kind == "media").map { sp =>
          // same real decode as the Spark side, over the same deterministic
          // asset bytes (PPM/WAV/Y4M for image/audio/video — no stubs)
          val f = graft.ops.Multimodal.decode(
            graft.ops.MediaAsset(sp.media_ref, canon,
              graft.ops.Multimodal.kindOf(sp.media_ref),
              graft.ops.Multimodal.fakeBytes(sp.media_ref)))
          val milli = f.feature.map(v => Math.round(v.toDouble * 1000).toInt).mkString(",")
          s"(${sqlLit(f.media_id)}, ${sqlLit(f.doc_id)}, ${sqlLit(f.kind)}, " +
            s"${f.width}, ${f.height}, ${sqlLit(f.format)}, ${f.n_frames}, ${sqlLit(milli)})"
        }
      }.mkString(", ")
      s"""SELECT media_id, doc_id, kind, CAST(width AS INT) AS width,
                 CAST(height AS INT) AS height, format,
                 CAST(n_frames AS INT) AS n_frames, feature_milli
          FROM (VALUES $rows)
            t(media_id, doc_id, kind, width, height, format, n_frames, feature_milli)
          ORDER BY media_id, doc_id"""
    }

    val q49 = entry("q49_frame_features") {
      val rows = graft.fixtures.Fixtures.seeds(120).flatMap { sr =>
        val canon = graft.core.UrlCanon.canonicalize(sr.url)
        graft.parse.PageParser.parse(graft.fixtures.Fixtures.html(canon), canon)
          .map(p => (canon, p.spans))
      }.distinct.flatMap { case (canon, spans) =>
        spans.filter(_.kind == "media").map(_.media_ref)
          .filter(r => graft.ops.Multimodal.kindOf(r) == "video")
          .flatMap { ref =>
            // same real Y4M decode and the same Float mean arithmetic as
            // the Spark side (sampleFrameFeatures), frame by frame
            val (w, h, frames) = graft.ops.Multimodal.decodeY4m(
              graft.ops.Multimodal.fakeBytes(ref))
            (0 until frames.length by 7).map { fi =>
              val fr = frames(fi)
              def milli(p: Array[Byte]): Long = {
                var s = 0L; var i = 0
                while (i < p.length) { s += p(i) & 0xff; i += 1 }
                Math.round((s.toDouble / (255.0 * math.max(1, p.length))).toFloat.toDouble * 1000)
              }
              s"(${sqlLit(ref)}, ${sqlLit(canon)}, $fi, $w, $h, " +
                s"${milli(fr.y)}, ${milli(fr.u)}, ${milli(fr.v)})"
            }
          }
      }.mkString(", ")
      s"""SELECT media_id, doc_id, CAST(frame_idx AS INT) AS frame_idx,
                 CAST(width AS INT) AS width, CAST(height AS INT) AS height,
                 CAST(mean_y_milli AS INT) AS mean_y_milli,
                 CAST(mean_u_milli AS INT) AS mean_u_milli,
                 CAST(mean_v_milli AS INT) AS mean_v_milli
          FROM (VALUES $rows)
            t(media_id, doc_id, frame_idx, width, height,
              mean_y_milli, mean_u_milli, mean_v_milli)
          ORDER BY media_id, doc_id, frame_idx"""
    }

    // shared CTE chain for the engine-simhash pair set (q41 verifies the
    // pairs themselves; q50 clusters the same set with a recursive CTE)
    def simhashPairsCtes(): String = {
      val rows = readDocsForOracle().map { case (id, text) =>
        val sig = if (text == null) 0L
          else graft.ops.Dedup.simhash(text.split(" ").toSeq)
        s"($id, CAST($sig AS BIGINT))"
      }.mkString(", ")
      s"""sigs(doc_id, sig) AS (VALUES $rows),
          keyed AS (
            SELECT doc_id, 0 AS q, (sig >> 0)  & 65535 AS key FROM sigs UNION ALL
            SELECT doc_id, 1 AS q, (sig >> 16) & 65535 AS key FROM sigs UNION ALL
            SELECT doc_id, 2 AS q, (sig >> 32) & 65535 AS key FROM sigs UNION ALL
            SELECT doc_id, 3 AS q, (sig >> 48) & 65535 AS key FROM sigs),
          small AS (SELECT q, key FROM keyed GROUP BY q, key HAVING count(*) <= 10000),
          guarded AS (SELECT k.* FROM keyed k JOIN small USING (q, key)),
          cand AS (SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
                   FROM guarded a JOIN guarded b
                     ON a.q = b.q AND a.key = b.key AND a.doc_id < b.doc_id)"""
    }

    val q41 = entry("q41_simhash_engine_pairs") {
      s"""WITH ${simhashPairsCtes()}
          SELECT c.a, c.b, CAST(bit_count(xor(sa.sig, sb.sig)) AS INT) AS hamming
          FROM cand c JOIN sigs sa ON c.a = sa.doc_id JOIN sigs sb ON c.b = sb.doc_id
          WHERE bit_count(xor(sa.sig, sb.sig)) <= 3
          ORDER BY a, b"""
    }

    val q50 = entry("q50_dup_clusters") {
      // components = per-node minimum over the reachability closure (the
      // recursive CTE's UNION dedups rows, so `walk` terminates); pair
      // generation is byte-identical to q41's
      s"""WITH RECURSIVE ${simhashPairsCtes()},
          pairs AS (
            SELECT c.a, c.b
            FROM cand c JOIN sigs sa ON c.a = sa.doc_id
                        JOIN sigs sb ON c.b = sb.doc_id
            WHERE bit_count(xor(sa.sig, sb.sig)) <= 3),
          edges AS (SELECT a AS u, b AS v FROM pairs
                    UNION SELECT b, a FROM pairs),
          walk(node, r) AS (
            SELECT u, u FROM edges
            UNION
            SELECT w.node, e.v FROM walk w JOIN edges e ON w.r = e.u)
          SELECT CAST(node AS BIGINT) AS doc_id,
                 CAST(min(r) AS BIGINT) AS cluster_id
          FROM walk GROUP BY node ORDER BY doc_id"""
    }

    val q48 = entry("q48_simhash128_pairs") {
      val rows = readDocsForOracle().map { case (id, text) =>
        val (hi, lo) = if (text == null) (0L, 0L)
          else graft.ops.Dedup.simhash128(text.split(" ").toSeq)
        s"($id, CAST($hi AS BIGINT), CAST($lo AS BIGINT))"
      }.mkString(", ")
      // block layout mirrors bits128(width=32): q0/q1 from lo, q2/q3 from
      // hi. DuckDB's >> on BIGINT may sign-extend — the & 4294967295 mask
      // keeps only the 32 low bits either way, matching shiftrightunsigned.
      s"""WITH sigs(doc_id, hi, lo) AS (VALUES $rows),
          keyed AS (
            SELECT doc_id, 0 AS q, (lo >> 0)  & 4294967295 AS key FROM sigs UNION ALL
            SELECT doc_id, 1 AS q, (lo >> 32) & 4294967295 AS key FROM sigs UNION ALL
            SELECT doc_id, 2 AS q, (hi >> 0)  & 4294967295 AS key FROM sigs UNION ALL
            SELECT doc_id, 3 AS q, (hi >> 32) & 4294967295 AS key FROM sigs),
          small AS (SELECT q, key FROM keyed GROUP BY q, key HAVING count(*) <= 10000),
          guarded AS (SELECT k.* FROM keyed k JOIN small USING (q, key)),
          cand AS (SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
                   FROM guarded a JOIN guarded b
                     ON a.q = b.q AND a.key = b.key AND a.doc_id < b.doc_id)
          SELECT c.a, c.b,
                 CAST(bit_count(xor(sa.hi, sb.hi)) + bit_count(xor(sa.lo, sb.lo)) AS INT) AS hamming
          FROM cand c JOIN sigs sa ON c.a = sa.doc_id JOIN sigs sb ON c.b = sb.doc_id
          WHERE bit_count(xor(sa.hi, sb.hi)) + bit_count(xor(sa.lo, sb.lo)) <= 3
          ORDER BY a, b"""
    }

    val q44 = entry("q44_ivf_topk") {
      val dim = 64
      val cs = graft.ops.Similarity.ivfCentroids(dim, 16, 42L)
      val cells = readEmbeddingsForOracle().map { case (id, v) =>
        s"($id, ${graft.ops.Similarity.ivfCellOf(v, cs)})"
      }.mkString(", ")
      val qSeq = (0 until dim).map(i => math.cos(i + 1.0))
      val probe = graft.ops.Similarity.ivfProbeCells(qSeq, dim, 16, 4, 42L).mkString(", ")
      val qv = qSeq.map(sqlDouble).mkString("[", ", ", "]")
      s"""WITH v(vec_id, cell) AS (VALUES $cells),
          c AS (SELECT e.vec_id, v.cell,
                  list_cosine_similarity(
                    list_transform(e.embedding, x -> CAST(x AS DOUBLE)), $qv) AS cos
                FROM embeddings e JOIN v ON e.vec_id = v.vec_id
                WHERE v.cell IN ($probe))
          SELECT vec_id, round(cos, 6) AS cosine, CAST(cell AS INT) AS cell
          FROM c ORDER BY cos DESC, vec_id LIMIT 10"""
    }

    (q28 ++ q33 ++ q34 ++ q38 ++ q41 ++ q44 ++ q48 ++ q49 ++ q50).toMap
  }
}
