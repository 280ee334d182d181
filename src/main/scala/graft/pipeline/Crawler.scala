package graft.pipeline

import graft.core._
import graft.fetch.{Fetcher, HostClock, SyntheticFetcher}
import graft.fixtures.Fixtures
import graft.frontier.DistBloomBank
import graft.parse.PageParser
import graft.analysis.Relevance
import graft.snapshot.SnapshotStore

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** A frontier candidate before dedup/scheduling. (ord0, ord1) is the
  * canonical discovery order: (seed seq, 0) in round 0, then
  * (parent seq, link index) for discovered outlinks.
  */
final case class Candidate(url: String, keyword: String, ord0: Long, ord1: Int)

/** Per-host scheduler state, checkpointed each round (SURVEY T2: the
  * reference RateLimiter's retry/suspension dicts live for the whole crawl
  * — rate_limiter.py:213-303 — so they must survive round boundaries).
  */
final case class HostState(host: String, lane: Int, retryCount: Int, suspended: Boolean, virtualTime: Double, drawCount: Long)

/** Frontier entry enriched with its salt lane and its (host, lane)'s
  * checkpointed scheduler state. The politeness clock is keyed by
  * (host, lane) — NOT host alone — so outcomes are independent of how
  * lanes co-locate into partitions (determinism across parallelism
  * levels); each lane paces at delay×saltFactor to preserve the per-host
  * budget (SURVEY §7.4.4).
  */
final case class FrontierWithState(
    round: Int, seq: Long, url: String, canonUrl: String, host: String, keyword: String,
    lane: Int, initRetry: Int, initSusp: Boolean, initVt: Double, initDraw: Long)

/** Output of the fused fetch+parse stage for one frontier entry. */
final case class FetchParseRow(
    round: Int,
    seq: Long,
    url: String,
    canonUrl: String,
    host: String,
    keyword: String,
    status: String, // fetched | fetch_failed | parse_failed | suspended
    attempts: Int,
    title: String,
    author: String,
    created_at: java.sql.Timestamp,
    view_count: Int,
    like_count: Int,
    spans: Seq[Span],
    outlinks: Seq[String],
    comments: Seq[ParsedComment],
    partitionId: Int)

/** The Spark-native crawl engine (BASELINE.json north rule): URL frontier +
  * fetch scheduler over snapshot-versioned span-document tables.
  *
  * Per round (the reference's search→dedup→fetch spine,
  * /root/reference/crawler/orchestrator.py:205-257, re-expressed as one
  * declarative plan per stage):
  *
  *   candidates (seeds ∪ discovered outlinks, canonical (ord0, ord1) order)
  *     → canonicalize (url_deduplicator.py:14-37 semantics)
  *     → relevance filter, round 0 only (manager.py:176-203, θ=0.5)
  *     → robots disallow filter (north-rule budget)
  *     → within-round first-wins dedup (window by canon, order by discovery)
  *     → cross-round dedup: bloom PRE-filter (partitioned bank, broadcast)
  *       + exact left-anti join vs the seen table (false positives re-checked,
  *       never dropped — SURVEY §7.4.3)
  *     → global sequence assignment (scalable two-pass: range partition +
  *       per-partition row_number + offset cumsum — no single-partition window)
  *     → politeness schedule: repartition by (host, salt lane) hash,
  *       sortWithinPartitions(seq), paced per-host virtual clocks inside one
  *       mapPartitions running the RateLimiter state machine
  *       (rate_limiter.py: 3 s default / robots crawl-delay, 2^n backoff,
  *       suspension after max_retries, reset on success)
  *     → fused fetch+parse (parser registry w/ generic fallback,
  *       content_crawler.py:180-238) emitting interleaved span docs
  *     → snapshot commit: docs ∪ crawl_log ∪ seen ∪ metrics + bloom bank,
  *       atomic manifest (resumable; partial rounds invisible).
  *
  * Scale design notes (100 TB / 10^10-URL frontier):
  *   - the only global ordering is the seq assignment, done without a
  *     global sort collapse (range shuffle + tiny offset map);
  *   - dedup joins shuffle on canon-url hash; the bloom pre-filter removes
  *     the (vastly dominant at steady state) already-seen candidates before
  *     the join, so the anti-join's build side is only the maybe-seen set;
  *   - fetch partitions are keyed by host (optionally salted for hot hosts,
  *     each lane pacing at delay×saltFactor to preserve the per-host
  *     budget), so per-host politeness state never crosses executors;
  *   - AQE stays on for skew-join splitting; crawl-order parity is a sort
  *     key, not a scheduling constraint (SURVEY §7.4.1).
  */
final class Crawler(
    spark: SparkSession,
    config: CrawlConfig,
    storeRoot: String,
    fetcher: Fetcher = SyntheticFetcher) extends Serializable {

  import spark.implicits._

  val store = new SnapshotStore(storeRoot)

  private val robotsB = spark.sparkContext.broadcast(Fixtures.robotsMap)
  private val cfgB = spark.sparkContext.broadcast(config)

  // ---- pure column helpers, all UDF-free (codegen stays unbroken):
  //      canonicalization is a native Catalyst expression
  //      (graft.functions.CanonicalizeUrl); host/path are regexp_extract
  //      over the (already lowercase, fragment-free) canonical form with
  //      semantics identical to UrlCanon.host/path; the robots check is a
  //      broadcast join against the (tiny) rules table + a native exists()
  //      over the disallow-prefix array.
  private def canonU(c: org.apache.spark.sql.Column) = graft.functions.functions.canon_url(c)
  private def hostCol(canon: Column): Column =
    regexp_extract(canon, "^[a-z][a-z0-9+.-]*://([^/?#]*)", 1)
  private def pathCol(canon: Column): Column =
    regexp_extract(canon, "^[a-z][a-z0-9+.-]*://[^/?#]*(/[^?#]*)", 1)

  /** (host, disallow prefixes) rules table — broadcast side of the robots
    * filter (rule sets are KB-sized even for huge crawls).
    */
  private val robotsDF = {
    val rules = Fixtures.robotsMap.values.toSeq.map(r => (r.host, r.disallow))
    spark.createDataFrame(rules).toDF("host", "__disallow")
  }

  /** Free a localCheckpoint'ed frame's blocks NOW. `Dataset.unpersist()`
    * is a no-op on a checkpointed frame — its plan is a `LogicalRDD`
    * that was never registered with the CacheManager — so without this
    * the blocks are reclaimed only when the ContextCleaner notices the
    * RDD is garbage (GC-latency-bound on long crawls with large rounds).
    *
    * GATED behind `config.eagerCheckpointFree` (default OFF): the
    * downstream consumers (seqCache, mergedState, the collapsed seen
    * chain) hold the data via persist() only, so if a cache block is
    * evicted under memory pressure — or an executor is lost on a real
    * cluster — a recomputable cache miss becomes a hard job failure once
    * the checkpoint blocks underneath are gone. Single-JVM benches (no
    * executor loss, rounds end before eviction pressure) turn it on to
    * cut GC-latency-bound block retention; production leaves the
    * ContextCleaner in charge. Non-checkpointed frames have no
    * `LogicalRDD` leaf → no-op either way.
    */
  private def dropCheckpoint(df: Dataset[_]): Unit =
    if (config.eagerCheckpointFree)
      df.queryExecution.analyzed.collectFirst {
        case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
      }.foreach(_.unpersist(blocking = false))

  /** Robots disallow filter: left-join the rules, drop candidates whose
    * path starts with any disallowed prefix (no rules → allowed).
    */
  private def filterAllowed(cands: DataFrame): DataFrame =
    cands
      .join(broadcast(robotsDF), Seq("host"), "left")
      .withColumn("__path", pathCol($"canon"))
      .filter(!coalesce(expr("exists(__disallow, d -> startswith(__path, d))"), lit(false)))
      .drop("__disallow", "__path")

  // Cross-round in-flight state. During a run, the seen set / bloom bank /
  // host scheduler state / next sequence id flow in memory (cached
  // DataFrames/RDDs + a few driver scalars); the snapshot store is
  // WRITE-ONLY while running and read only at RESUME. This avoids
  // re-reading each round what the previous round just wrote — at cluster
  // scale that read lands on distributed storage and is pure waste.
  //
  // The seen set is a CHAIN of per-round DataFrames, each persisted
  // pre-partitioned on `canon`, so the per-round exact anti-join re-uses
  // the cached partitioning instead of re-shuffling the whole accumulated
  // history every round (round-1 kept one ever-growing union — its
  // lineage AND its shuffle grew with total-seen). The chain is collapsed
  // into one partitioned cache every `collapseEvery` rounds to bound plan
  // depth. The bloom bank is a partitioner-aware distributed RDD — see
  // DistBloomBank (nothing bank-sized ever lands on the driver or gets
  // broadcast).
  private var seenParts: Vector[DataFrame] = Vector.empty
  private var bankAcc: Option[DistBloomBank.Bank] = None
  private var stateAcc: Option[DataFrame] = None
  private var lastStateCount: Long = 0L
  private var nextSeqAcc: Long = 0L
  // observed fetched-row counter, bumped by the fetch stage's executors;
  // commitRound sizes the docs table's write fan-out from the ROUND DELTA
  // of this instead of assuming every frontier row fetched (sizedForWrite
  // otherwise overshoots file count when failure rates are high). An
  // estimate only: a recomputed outcome partition double-counts — fine
  // for file sizing, never used for correctness.
  private val fetchedAcc = spark.sparkContext.longAccumulator("graft.fetched.rows")
  private var fetchedPrev: Long = 0L
  private val collapseEvery = config.collapseEvery
  private val seenP = spark.sessionState.conf.numShufflePartitions

  /** Total URLs scheduled (= fetched+deduped) so far in this run. */
  def totalScheduled: Long = nextSeqAcc

  /** Entry: run all rounds (resuming from the last committed round). */
  def run(seeds: Dataset[SeedRecord]): Unit = {
    val resumeFrom = store.latestRound().map(_ + 1).getOrElse(0)
    if (resumeFrom > 0) { // resume: load cross-round state from the store
      val last = resumeFrom - 1
      seenParts = store.read(spark, "seen").map(df =>
        df.select($"canonUrl".as("canon")).repartition(seenP, $"canon").persist()).toVector
      // the saved bank is self-describing: it loads at the geometry it was
      // BUILT with (a changed config is adopted only at the next seen-chain
      // collapse, when the bank is rebuilt from scratch)
      bankAcc = DistBloomBank.load(spark, store.bloomPath(last)).map(_.persist())
      if (bankAcc.isEmpty && seenParts.nonEmpty) {
        // unusable saved bank (foreign/older format) with real history: the
        // bank MUST cover the whole seen set before the first round-bank
        // fold installs a partial one — a partial bank's authoritative
        // "definitely new" would bypass the exact tier for pre-resume URLs
        // from the SECOND post-resume round on. Rebuild from the chain.
        val rebuilt = DistBloomBank.buildRound(
          seenParts.reduce(_.unionByName(_)), "canon", config.seenPartitions,
          config.bloomExpectedPerPartition, config.bloomFpp).persist()
        rebuilt.count()
        bankAcc = Some(rebuilt)
      }
      // host_state is committed as per-round DELTAS (only the round's
      // touched (host, lane) rows); the current state is the
      // latest-round-wins fold — paid once here, not per commit
      val st = store.readFoldedLatest(spark, "host_state", Seq("host", "lane"))
        .map(_.persist())
        .getOrElse(spark.emptyDataset[HostState].toDF().persist())
      lastStateCount = st.count()
      stateAcc = Some(st)
      nextSeqAcc = store.manifestMetric(last, "next_seq").getOrElse(0L)
    }
    var round = resumeFrom
    var candidates: Dataset[Candidate] =
      if (round == 0) seedCandidates(seeds)
      else candidatesFromStore(round)
    var haveCandidates = round == 0 || !candidates.isEmpty
    while (round < config.maxRounds && haveCandidates) {
      val (next, nextCount) = runRound(round, candidates)
      candidates = next
      haveCandidates = nextCount > 0
      round += 1
    }
  }

  /** Round-0 candidates: relevance-scored seeds (threshold filter before
    * dedup, as the reference does inside search — manager.py:176-203).
    */
  def seedCandidates(seeds: Dataset[SeedRecord]): Dataset[Candidate] = {
    val thr = config.relevanceThreshold
    val scoreU = udf((snippet: String, kw: String, title: String) =>
      Relevance.score(snippet, Seq(kw), title))
    seeds
      .withColumn("relevance_score", scoreU($"snippet", $"keyword", $"title"))
      .filter($"relevance_score" >= lit(thr))
      .select($"url", $"keyword", $"seq".as("ord0"), lit(0).as("ord1"))
      .as[Candidate]
  }

  /** Rebuild the next round's candidates from committed docs (resume path):
    * outlinks of the latest committed round's docs.
    */
  private def candidatesFromStore(round: Int): Dataset[Candidate] = {
    store.read(spark, "docs").map { docs =>
      docs.filter($"round" === (round - 1))
        .select($"seq".as("ord0"), posexplode($"outlinks").as(Seq("ord1", "url")), $"keyword")
        .select($"url", $"keyword", $"ord0", $"ord1".cast("int"))
        .as[Candidate]
    }.getOrElse(spark.emptyDataset[Candidate])
  }

  private val timing = sys.env.get("GRAFT_TIMING").contains("1")
  private def timed[T](label: String)(body: => T): T = {
    if (!timing) body
    else {
      val t0 = System.nanoTime()
      val r = body
      println(f"[graft-timing] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }
  }

  /** One crawl round; returns (next round's candidates, their count). */
  def runRound(round: Int, candidates: Dataset[Candidate]): (Dataset[Candidate], Long) = {
    val cands = filterAllowed(candidates.toDF()
      .withColumn("canon", canonU($"url"))
      .withColumn("host", hostCol($"canon")))

    // within-round first-wins dedup on canonical URL (W4): keep the
    // earliest discovery (url_deduplicator.py:40-62 keeps the original URL)
    val wDedup = Window.partitionBy($"canon").orderBy($"ord0", $"ord1")
    val roundUnique = cands
      .withColumn("rn", row_number().over(wDedup))
      .filter($"rn" === 1).drop("rn")

    // cross-round dedup: bloom pre-filter + exact anti-join (U5).
    // Persisted: the sequencer's range partitioner SAMPLES its input, so an
    // unpersisted plan would re-run the dedup window + anti-join three
    // times (sample, shuffle, count). Candidate rows are narrow.
    val fresh = antiJoinSeen(round, roundUnique).persist()

    // global sequence assignment, continuing from the in-flight counter
    val seqStart = nextSeqAcc
    val (sequencedRaw, frontierCount, seqCache) = timed(s"r$round sequencer") {
      Sequencer.addSeq(fresh, Seq(col("ord0"), col("ord1")), "seq", seqStart)
    }
    fresh.unpersist() // seqCache is materialized by addSeq's count pass
    // the consumed candidates frame (last round's materializedNext, a
    // localCheckpoint) has flowed into the now-materialized seqCache —
    // free its checkpoint blocks now instead of waiting for the
    // ContextCleaner (Dataset.unpersist alone is a no-op here; see
    // dropCheckpoint). Round-0 seed candidates carry no checkpoint and
    // fall through both calls harmlessly.
    candidates.unpersist()
    dropCheckpoint(candidates)
    val sequenced = sequencedRaw // host column flows from the candidate stage

    val frontier = sequenced.select(
      lit(round).as("round"), $"seq", $"url", $"canon".as("canonUrl"), $"host", $"keyword")
      .as[FrontierEntry]

    // politeness-scheduled fused fetch+parse (host scheduler state carried
    // over from the previous round's checkpoint). The fetch output (spans +
    // outlinks) is the round's heavyweight intermediate: in full mode it is
    // spilled columnar to disk (the snapshot write follows anyway and heap
    // eviction would trigger a full re-fetch); in bench mode (no
    // persistence) it stays memory-first.
    val outcome = fetchParse(round, frontier,
      retainContent = config.persistRounds).persist(
      if (config.persistRounds) org.apache.spark.storage.StorageLevel.DISK_ONLY
      else org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Column-level split of the (row, state) tuple stream, NOT a typed
    // flatMap: a flatMap re-decodes every cached fat row (spans/comments
    // Vectors) into JVM objects and re-encodes it — and every consumer
    // (docs write, crawl_log, metrics, next-candidates) pays that per
    // action. The null-filter + struct projection below stays inside
    // whole-stage codegen over the columnar cache (measured: the round
    // commit dropped from ~16-39 s to single digits at bench scale).
    // Tuple encoding preserves element nullness, so `_1 IS NOT NULL`
    // selects exactly the rows Option(o._1) kept.
    val results = outcome.where($"_1".isNotNull).select($"_1.*")
    val hostStates = outcome.where($"_2".isNotNull).select($"_2.*")

    // next-round candidates: outlinks in (parent seq, link idx) order,
    // inheriting the parent's keyword (orchestrator.py:222-223 analogue)
    val next = results
      .filter($"status" === "fetched")
      .select($"seq".as("ord0"), $"keyword", posexplode($"outlinks").as(Seq("ord1", "url")))
      .select($"url", $"keyword", $"ord0", $"ord1".cast("int"))
      .as[Candidate]

    // Lineage bounding for round-crossing frames. A cached plan NESTS its
    // parents' plans via InMemoryRelation's inner children, so without
    // intervention round N's logical tree contains round N-1's, which
    // contains round N-2's … — compute stays bounded (caches cut
    // recomputation) but the plan TREE grows without bound, and the
    // driver's per-action plan-description walk (SQL listener events)
    // went superlinear by round ~4 (observed: 457 s in ExplainUtils).
    // Two growth modes, two treatments:
    //  - the SEEN CHAIN is referenced 5-8× by every later round (the
    //    anti-join fan-in) — multiplicative tree growth. Flattened EVERY
    //    round via a lazy localCheckpoint under its repartition+persist
    //    (see roundSeen below).
    //  - candidates and host-state CROSS-REFERENCE each other through the
    //    outcome plan (outcome_k nests candidates_{k-1} AND state_{k-1}),
    //    so they too grow multiplicatively between flattens — measured:
    //    deferring their flattening to collapse rounds made per-round
    //    commit cost climb 7→14.5→70 s across one cycle and reset after.
    //    Flattened EVERY round (lazy localCheckpoint; the existing count
    //    is the single materializing pass — no extra scan vs persist).
    // A lost checkpoint block fails the run instead of silently
    // recomputing — resume covers that.
    val newState = hostStates
    val mergedState = timed(s"r$round host-state") {
      val m = (stateAcc match {
        case Some(old) => old.join(newState.select("host", "lane"), Seq("host", "lane"), "left_anti")
          .unionByName(newState)
        case None => newState
      }).localCheckpoint(false)
      lastStateCount = m.count()
      m
    }

    // fold the round's frontier into the seen chain. Order of operations
    // matters for BOTH pathologies here:
    //  - localCheckpoint on the narrow projection truncates lineage (see
    //    the host-state note above) — but a LogicalRDD reports UNKNOWN
    //    partitioning, so checkpointing AFTER the repartition would make
    //    every later anti-join re-shuffle the whole chain part (verified:
    //    the join plans an Exchange over Scan ExistingRDD);
    //  - repartition + persist ON TOP of the checkpoint keeps the
    //    canon-hash layout visible through InMemoryRelation, so the
    //    per-round anti-joins stay exchange-free on the history side.
    // Lazy checkpoint: the first pass (the bank build below) materializes
    // checkpoint blocks, shuffle and columnar cache in ONE scan.
    val roundSeen = frontier.select($"canonUrl".as("canon")).toDF()
      .localCheckpoint(false)
      .repartition(seenP, $"canon").persist()
    seenParts :+= roundSeen

    // bloom bank fold: build this round's bank from the cached roundSeen,
    // then OR-merge into the accumulated bank — both narrow on the bank
    // side (no driver collect, no broadcast, no bank-sized shuffle).
    // Geometry (width + expected + fpp) follows the ACCUMULATED bank (a
    // resumed bank keeps the geometry it was built with — filters cannot be
    // re-hashed or re-sized, and mergeInPlace requires identical geometry);
    // a changed config is adopted at the next collapse-cycle rebuild.
    val (bw, bexp, bfpp) = bankAcc.map(b => (b.width, b.expected, b.fpp))
      .getOrElse((config.seenPartitions, config.bloomExpectedPerPartition, config.bloomFpp))
    val roundBank = DistBloomBank.buildRound(roundSeen, "canon", bw, bexp, bfpp).persist()
    val mergedBank = bankAcc match {
      case Some(old) => DistBloomBank.merge(old, roundBank).persist()
      case None      => roundBank
    }
    timed(s"r$round bloom-build") { mergedBank.count() }
    if (!bankAcc.contains(mergedBank)) {
      bankAcc.foreach(_.unpersist())
      if (mergedBank ne roundBank) roundBank.unpersist()
    }
    bankAcc = Some(mergedBank)

    if (config.persistRounds) {
      // the round's observed fetched-row count (outcome is fully
      // materialized by the host-state count above, so the accumulator
      // already carries this round's adds)
      val fetchedDelta = math.max(0L, fetchedAcc.value - fetchedPrev)
      fetchedPrev = fetchedAcc.value
      commitRound(round, frontier, results, newState,
        seqStart + frontierCount, frontierCount,
        if (fetchedDelta > 0) fetchedDelta else frontierCount)
    }

    // bound the seen chain: collapse into one partitioned cache every
    // `collapseEvery` rounds (plan depth + per-round join fan-in stay O(1)).
    // The bloom bank is REBUILT from the collapsed chain on the same cycle:
    // the per-round OR-merge chain otherwise accumulates O(rounds) zip
    // lineage (a lost blob would recompute through every prior round), and
    // the rebuild is also where a config width change takes effect.
    if (seenParts.size > collapseEvery) {
      // same checkpoint-below-repartition-below-persist layering as
      // roundSeen: bounded plan depth AND a partitioning the anti-joins
      // can reuse
      val collapsed = timed(s"r$round seen-collapse") {
        val c = seenParts.reduce(_.unionByName(_))
          .localCheckpoint(false)
          .repartition(seenP, $"canon").persist()
        c.count()
        c
      }
      // each chain part layers persist over a localCheckpoint: unpersist
      // drops the cached copy, dropCheckpoint frees the checkpoint blocks
      // underneath (the collapsed frame re-checkpointed all of it above)
      seenParts.foreach { p => p.unpersist(); dropCheckpoint(p) }
      seenParts = Vector(collapsed)
      val rebuilt = DistBloomBank.buildRound(collapsed, "canon",
        config.seenPartitions, config.bloomExpectedPerPartition, config.bloomFpp).persist()
      timed(s"r$round bank-rebuild") { rebuilt.count() }
      bankAcc.foreach(_.unpersist())
      bankAcc = Some(rebuilt)
    }

    // next round's candidates are the one frame whose lineage reaches
    // through the outcome cache — checkpointing here is what keeps round
    // N+1's plans independent of round N's
    // flattened every round (see the lineage note above — candidates are
    // one leg of the multiplicative outcome/state cross-reference)
    val materializedNext = next.localCheckpoint(false)
    val nextCount = timed(s"r$round next-candidates") { materializedNext.count() }
    val oldState = stateAcc
    stateAcc = Some(mergedState)
    // the replaced state is either a resume-time persist (unpersist works)
    // or last round's localCheckpoint (needs dropCheckpoint) — mergedState
    // was eagerly counted above, so its blocks are fully materialized and
    // the old frame has no remaining consumer
    oldState.foreach { s => s.unpersist(); dropCheckpoint(s) }
    nextSeqAcc = seqStart + frontierCount
    outcome.unpersist()
    seqCache.unpersist()
    (materializedNext, nextCount)
  }

  /** Bloom pre-filter (distributed partition-aligned probe — only the
    * candidates shuffle, the bank never moves) + exact left-anti joins
    * against the cached seen chain. mightContain=false short-circuits the
    * exact tier entirely; false positives are re-checked exactly, never
    * dropped. Each chain part is persisted already hash-partitioned on
    * `canon`, so the per-round anti-joins never re-shuffle history — only
    * the (bloom-surviving, small) candidate side moves. On a real cluster
    * the exact tier would be an Iceberg table bucketed by canon-hash with
    * storage-partitioned joins; the cached-partitioned chain is the
    * in-memory equivalent.
    */
  private def antiJoinSeen(round: Int, cands: DataFrame): DataFrame = {
    (bankAcc, seenParts) match {
      case (Some(bank), parts) if parts.nonEmpty =>
        val flagged = DistBloomBank.probe(cands, "canon", bank, "maybe_seen")
        val definitelyNew = flagged.filter(!$"maybe_seen")
        val confirmed = parts.foldLeft(flagged.filter($"maybe_seen")) {
          (df, seen) => df.join(seen, Seq("canon"), "left_anti")
        }
        definitelyNew.unionByName(confirmed).drop("maybe_seen")
      case (None, parts) if parts.nonEmpty =>
        // defensive: history without a bank (e.g. an empty saved bank) —
        // fall back to exact anti-joins only; correctness never depends on
        // the bloom tier existing, only on it never lying "false"
        parts.foldLeft(cands) { (df, seen) => df.join(seen, Seq("canon"), "left_anti") }
      case _ => cands // first round of a fresh run
    }
  }

  /** Host-partitioned, virtually-paced fetch + parse (T1/T2 semantics).
    * Emits the fetch results AND, after each partition drains, the final
    * per-host scheduler states (retry count / suspension / virtual clock)
    * for the round's checkpoint — exactly-once state via the atomic
    * manifest commit.
    */
  /** retainContent=false (bench mode, persistRounds off): pages are still
    * fetched and fully parsed — the politeness state machine, status
    * accounting and outlink expansion are identical — but the parsed
    * spans/comments/title are not RETAINED in the row, because nothing
    * downstream reads them when no snapshot is committed. Retaining them
    * only inflates the round cache by the corpus size (≈10 GB at 3M
    * 16 KB pages), a memory-bandwidth cost that is pure overhead in a
    * fetch+dedup throughput measurement.
    */
  def fetchParse(round: Int, frontier: Dataset[FrontierEntry],
      retainContent: Boolean = true): Dataset[(FetchParseRow, HostState)] = {
    // 16 partitions per core: a single wave (p == cores) lets the slowest
    // partition set the stage's wall time; many small partitions amortize
    // (host,lane) cost imbalance across waves (hosts differ in page weight,
    // not just URL count). The per-host tail itself is bounded by
    // saltFactor (a hot host's biggest lane is 1/salt of it).
    val p = math.max(16 * spark.sparkContext.defaultParallelism, config.seenPartitions)
    val salt = config.saltFactor
    val saltCol =
      if (salt <= 1) lit(0)
      else pmod(xxhash64($"canonUrl"), lit(salt)).cast("int")

    // carry over the per-(host, lane) scheduler state from the in-flight
    // accumulator (join, not a broadcast global map — the state table
    // scales with #hosts; Spark still broadcasts it while it is small)
    val priorState: DataFrame = stateAcc
      .getOrElse(spark.emptyDataset[HostState].toDF())
      .select($"host", $"lane", $"retryCount".as("initRetry"), $"suspended".as("initSusp"),
        $"virtualTime".as("initVt"), $"drawCount".as("initDraw"))

    val parted = frontier.toDF()
      .withColumn("lane", saltCol)
      .join(broadcastIfSmall(priorState), Seq("host", "lane"), "left")
      .na.fill(Map("initRetry" -> 0, "initVt" -> 0.0, "initDraw" -> 0L)).na.fill(false, Seq("initSusp"))
      .repartition(p, $"host", $"lane")
      .sortWithinPartitions($"seq")
      .select($"round", $"seq", $"url", $"canonUrl", $"host", $"keyword", $"lane",
        $"initRetry", $"initSusp", $"initVt", $"initDraw")
      .as[FrontierWithState]

    val rb = robotsB; val cb = cfgB; val f = fetcher; val r = round
    val retain = retainContent
    val facc = fetchedAcc
    parted.mapPartitions { it =>
      val cfg = cb.value
      val robots = rb.value
      val clocks = scala.collection.mutable.LinkedHashMap.empty[(String, Int), HostClock]
      val pid = org.apache.spark.TaskContext.getPartitionId()
      val mapped = it.map { e =>
        val delay = robots.get(e.host).map(_.crawlDelay).getOrElse(cfg.defaultDelay) *
          math.max(1, cfg.saltFactor)
        val clock = clocks.getOrElseUpdate((e.host, e.lane), {
          val c = new HostClock(delay, cfg.maxRetries,
            jitter = if (cfg.jitterEnabled) Some((cfg.jitterMin, cfg.jitterMax)) else None,
            seedKey = UrlCanon.hash64(e.host) ^ e.lane.toLong)
          c.retryCount = e.initRetry; c.suspended = e.initSusp
          c.virtualTime = e.initVt; c.drawCount = e.initDraw
          c
        })
        val (status, attempts, html) = clock.fetchOne(f, e.canonUrl)
        val row = if (status == "fetched") {
          PageParser.parse(html, e.canonUrl, cfg.maxCommentPages) match {
            case Some(parsed) =>
              facc.add(1L)
              if (retain)
                FetchParseRow(r, e.seq, e.url, e.canonUrl, e.host, e.keyword, "fetched",
                  attempts, parsed.title, parsed.author,
                  parsed.createdAt.map(java.sql.Timestamp.valueOf).orNull,
                  parsed.viewCount, parsed.likeCount, parsed.spans, parsed.outlinks,
                  parsed.comments, pid)
              else // bench mode: parse happened, content not retained
                FetchParseRow(r, e.seq, e.url, e.canonUrl, e.host, e.keyword, "fetched",
                  attempts, "", "", null, parsed.viewCount, parsed.likeCount,
                  Seq.empty, parsed.outlinks, Seq.empty, pid)
            case None =>
              FetchParseRow(r, e.seq, e.url, e.canonUrl, e.host, e.keyword, "parse_failed",
                attempts, "", "", null, 0, 0, Seq.empty, Seq.empty, Seq.empty, pid)
          }
        } else {
          FetchParseRow(r, e.seq, e.url, e.canonUrl, e.host, e.keyword, status, attempts,
            "", "", null, 0, 0, Seq.empty, Seq.empty, Seq.empty, pid)
        }
        (row, null.asInstanceOf[HostState])
      }
      // trailing state rows, materialized lazily after the partition drains
      mapped ++ clocks.iterator.map { case ((host, lane), c) =>
        (null.asInstanceOf[FetchParseRow],
          HostState(host, lane, c.retryCount, c.suspended, c.virtualTime, c.drawCount))
      }
    }
  }

  /** Broadcast-hint the host-state side only while it is measurably small.
    * The table grows with distinct (host, lane) — unconditional broadcast
    * (round 1's behavior) would ship an unbounded table to every executor
    * at a 10^10-URL frontier. Above the gate the plain join shuffles
    * host-state once on (host, lane) — the same key the frontier is about
    * to repartition on anyway.
    */
  private val broadcastStateMaxRows = 1000000L
  private def broadcastIfSmall(df: DataFrame): DataFrame =
    if (lastStateCount < broadcastStateMaxRows) broadcast(df) else df

  /** Atomic snapshot commit of the round's five tables + bloom bank (all
    * inputs already computed/cached by runRound — this is write-only).
    * host_state is a DELTA: only the (host, lane) rows the round touched
    * (at 10^8 hosts a full-state rewrite per round would be
    * O(total-hosts) I/O for a fractional change); resume folds the deltas
    * latest-round-wins (SnapshotStore.readFoldedLatest).
    */
  /** Cap a table's write fan-out by its (estimated) row count: a round's
    * tables otherwise inherit the fetch stage's 16-per-core partitioning,
    * so a small round writes hundreds of near-empty files per table — the
    * classic lake small-file problem, and a measured ~6 s per-round commit
    * floor on this box. coalesce (no shuffle) — the commit is write-bound,
    * not compute-bound, and the cap scales back up with round size.
    */
  private def sizedForWrite(df: DataFrame, estRows: Long, rowsPerFile: Long): DataFrame =
    if (estRows < 0) df
    else df.coalesce(math.max(1, math.min(spark.sparkContext.defaultParallelism * 4L,
      math.ceil(estRows.toDouble / rowsPerFile).toLong).toInt))

  private def commitRound(round: Int, frontier: Dataset[FrontierEntry],
      results: DataFrame, roundStateDelta: DataFrame,
      nextSeq: Long, frontierCount: Long, fetchedCount: Long): Unit = {
    // docs holds only status='fetched' rows, so it is sized by the round's
    // OBSERVED fetched count (executor accumulator), not the frontier
    // count — under high failure rates the two diverge and the frontier
    // count would overshoot the file fan-out
    val docs = sizedForWrite(results.filter($"status" === "fetched")
      .select($"round", $"seq", $"canonUrl".as("doc_id"), $"url", $"host".as("site"),
        $"keyword", $"title", $"author", $"created_at", $"view_count", $"like_count",
        $"spans", $"outlinks", $"comments"),
      fetchedCount, rowsPerFile = 8000L) // fat rows (~16 KB) → ~128 MB files
    val crawlLog = sizedForWrite(results.select($"round", $"seq", $"url", $"canonUrl",
      $"host", $"status", $"attempts"), frontierCount, rowsPerFile = 500000L)
    val seen = sizedForWrite(frontier.select($"round", $"seq", $"canonUrl", $"host"),
      frontierCount, rowsPerFile = 500000L)
    val metrics = results.groupBy($"partitionId").agg(
      lit(round).as("round"),
      countDistinct($"host").as("hosts"),
      sum(when($"status" === "fetched", 1L).otherwise(0L)).as("fetched"),
      sum(when($"status" =!= "fetched", 1L).otherwise(0L)).as("failed"))

    // bank saved before the manifest: an orphan bank of an uncommitted
    // round is never read (readers resolve the bank via committed rounds).
    // Distributed parquet write of (pid, filter) rows — nothing collected.
    // It rides the commit's parallel write wave (the manifest still lands
    // only after every write, bank included, has completed).
    val bankSave: Seq[() => Unit] = bankAcc.toSeq.map(b =>
      () => DistBloomBank.save(spark, b, store.bloomPath(round)))

    timed(s"r$round commit-tables") { store.commit(round,
      Map("docs" -> docs, "crawl_log" -> crawlLog, "seen" -> seen,
        "metrics" -> sizedForWrite(metrics, 1L, 1L),
        "host_state" -> sizedForWrite(roundStateDelta, lastStateCount, 500000L)),
      knownCounts = Map("seen" -> frontierCount, "crawl_log" -> frontierCount),
      metricsJson = s"""{"next_seq":$nextSeq,"frontier":$frontierCount}""",
      alsoParallel = bankSave) }
  }
}

/** Scalable contiguous sequence assignment: avoids a single-partition
  * global window. Range-partition + sort by the order key, number rows
  * within each partition, then add per-partition offsets computed from the
  * (tiny, collected) partition counts. Equivalent to RDD zipWithIndex but
  * stays in the DataFrame API.
  */
object Sequencer {
  /** Returns (sequenced df, total row count, cache handle to unpersist once
    * downstream consumers are done).
    *
    * After repartitionByRange + sortWithinPartitions, rows are globally
    * ordered across partition boundaries, so monotonically_increasing_id —
    * (partitionId << 33) | localIndex, assigned in partition-scan order —
    * already numbers rows in order WITHIN each partition; one tiny
    * per-partition count pass yields the offsets. This is zipWithIndex
    * without leaving the DataFrame API and without the second shuffle a
    * window over partition ids would cost. Determinism: range boundaries
    * depend only on key values (seeded sampler), the sort is total
    * ((ord0, ord1) unique), and the id is materialized into the cache.
    */
  def addSeq(df: DataFrame, orderCols: Seq[Column], out: String,
      start: Long = 0L): (DataFrame, Long, DataFrame) = {
    val spark = df.sparkSession
    import spark.implicits._
    val parted = df.repartitionByRange(orderCols: _*).sortWithinPartitions(orderCols: _*)
      .withColumn("__mid", monotonically_increasing_id())
      .persist()
    val counts = parted
      .groupBy(shiftrightunsigned($"__mid", 33).cast("int").as("__pid")).count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val total = counts.map(_._2).sum
    val offsetOf = counts.map(_._1).zip(
      counts.scanLeft(start) { case (acc, (_, n)) => acc + n }.dropRight(1)).toMap
    val offU = udf((pid: Int) => offsetOf(pid))
    val res = parted
      .withColumn(out,
        offU(shiftrightunsigned($"__mid", 33).cast("int")) +
          ($"__mid".bitwiseAND(lit((1L << 33) - 1))))
      .drop("__mid")
    (res, total, parted)
  }
}
