package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.pipeline.TextAnalysis

/** Structured-Streaming ingest surface for a training-data pipeline.
  *
  * The reference engine has no continuous queries (SURVEY §2.8 — its
  * "streaming" is out-of-core build + chunk-wise operators); this module is
  * the beyond-reference streaming tier a 100 TB corpus ingest needs:
  * watermarked per-window corpus telemetry, in-stream exact dedup with
  * bounded state, and per-key running statistics as explicit
  * `flatMapGroupsWithState` state machines.
  *
  * Scale posture: every operator here keys its state (window, fingerprint,
  * group key) so state is hash-partitioned across executors, and every
  * stateful operator is watermark-bounded (or timeout-bounded) so state
  * size is O(active keys in the watermark horizon), never O(stream).
  */
object StreamingPipeline {

  /** Per-window ingest telemetry over an event-timestamped document stream:
    * doc/char counts, mean quality, and per-window language histogram
    * pieces (one row per window × language). Append-mode safe: results
    * emit once the watermark passes the window end.
    *
    * All columns are codegen'd built-ins (quality/langid are Column
    * expressions), so the stream stays in whole-stage codegen until the
    * windowed aggregation's state store.
    */
  def windowedIngestStats(stream: DataFrame, tsCol: String, textCol: String,
                          windowLen: String = "1 hour",
                          watermarkDelay: String = "2 hours"): DataFrame =
    stream
      .withColumn("quality", TextAnalysis.qualityScore(col(textCol)))
      .withColumn("lang", TextAnalysis.langId(col(textCol)))
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowLen), col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(length(col(textCol))).as("n_chars"),
        avg(col("quality")).as("mean_quality"))

  /** In-stream exact dedup: documents whose canonical fingerprint
    * ([[TextAnalysis.fingerprintMd5]]) was already seen within the
    * watermark horizon are dropped. State is one row per distinct
    * fingerprint inside the horizon — bounded, unlike a naive
    * `dropDuplicates` whose state grows forever on an unbounded stream.
    */
  def streamingExactDedup(stream: DataFrame, tsCol: String, textCol: String,
                          watermarkDelay: String = "24 hours"): DataFrame =
    stream
      .withColumn("__fp", TextAnalysis.fingerprintMd5(col(textCol)))
      .withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark("__fp")
      .drop("__fp")

  /** In-stream URL-level dedup — the streaming form of
    * [[graft.pipeline.UrlOps.dedupByUrl]], C4's first dedup step run at
    * crawl ingest: the FIRST document per NORMALIZED url inside the
    * watermark horizon passes, later fetches of the same page (tracking-
    * param/case/port/fragment variants included — [[graft.pipeline.UrlOps.normalizeUrl]]
    * is the key) drop. Rows that do not normalize (no scheme://host) are
    * dropped, matching the batch operator. State is one row per distinct
    * normalized url in the horizon — bounded, keyed, sharded across
    * executors. */
  def streamingUrlDedup(stream: DataFrame, tsCol: String, urlCol: String,
                        watermarkDelay: String = "24 hours"): DataFrame =
    stream
      .withColumn("__unorm", graft.pipeline.UrlOps.normalizeUrl(col(urlCol)))
      .filter(col("__unorm").isNotNull)
      .withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark("__unorm")
      .drop("__unorm")

  /** In-stream per-domain cap — the streaming form of
    * [[graft.pipeline.UrlOps.capPerDomain]] (RefinedWeb site balancing at
    * crawl ingest): the first `cap` documents per REGISTERED DOMAIN pass,
    * later arrivals from the same site drop. Arrival-order semantics (the
    * streaming contract — the batch form's orderCol cut is the
    * deterministic offline sibling); rows with no registered domain drop,
    * matching the batch operator. State is ONE Long per domain, keyed,
    * sharded, and tiny (~16 bytes/domain — even 100M domains fit a
    * cluster), so the DEFAULT keeps it forever: the cap is a corpus-level
    * budget, and evicting a domain's counter silently re-opens it.
    * Pass `maxIdle` only when re-opening after idleness IS the wanted
    * semantics (a rolling per-epoch cap) — eviction resets that domain's
    * count to zero. */
  def streamingDomainCap(stream: DataFrame, urlCol: String, cap: Int,
                         maxIdle: Option[String] = None)
      : DataFrame =
    streamingDomainCapOn(stream,
      graft.pipeline.UrlOps.urlRegisteredDomain(col(urlCol)), cap, maxIdle)

  /** [[streamingDomainCap]] under caller-supplied full-PSL
    * [[graft.pipeline.UrlOps.SuffixRules]] — same domain keying as the
    * batch `capPerDomain(…, rules)` sibling. */
  def streamingDomainCap(stream: DataFrame, urlCol: String, cap: Int,
                         maxIdle: Option[String],
                         rules: graft.pipeline.UrlOps.SuffixRules)
      : DataFrame =
    streamingDomainCapOn(stream,
      graft.pipeline.UrlOps.urlRegisteredDomain(col(urlCol), rules), cap,
      maxIdle)

  private def streamingDomainCapOn(stream: DataFrame,
                                   domain: org.apache.spark.sql.Column,
                                   cap: Int, maxIdle: Option[String])
      : DataFrame = {
    require(cap >= 1, s"cap=$cap must be >= 1")
    val withDom = stream
      .withColumn("__dom", domain)
      .filter(col("__dom").isNotNull)
    val schema = withDom.schema
    val domIdx = schema.fieldIndex("__dom")
    val timeoutConf = if (maxIdle.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
                      else GroupStateTimeout.NoTimeout()
    implicit val rowEnc: org.apache.spark.sql.Encoder[org.apache.spark.sql.Row] =
      org.apache.spark.sql.Encoders.row(schema)
    withDom
      .groupByKey(_.getString(domIdx))(org.apache.spark.sql.Encoders.STRING)
      .flatMapGroupsWithState[Long, org.apache.spark.sql.Row](
        OutputMode.Append(), timeoutConf) {
        case (_, it, state: GroupState[Long]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val seen = state.getOption.getOrElse(0L)
            val kept = it.take(math.max(0L, cap - seen).toInt).toSeq
            // count only up to the cap: past it the counter is saturated
            // and further arrivals need no state growth
            state.update(math.min(cap.toLong, seen + kept.size))
            maxIdle.foreach(state.setTimeoutDuration)
            kept.iterator
          }
      }(org.apache.spark.sql.Encoders.scalaLong, rowEnc)
      .toDF(schema.fieldNames: _*)
      .drop("__dom")
  }

  /** Streaming DSIR data selection: apply a FROZEN log-ratio model (fit
    * offline with [[graft.pipeline.Dsir.fitLogRatios]] on the batch
    * raw/target corpora) to an unbounded ingest stream and keep only
    * documents whose importance weight clears `minWeight`. Scoring is
    * row-local and stateless (broadcast model, no watermark, no state
    * store), so it composes with any downstream streaming stage — the
    * standard online shape of importance-resampled selection: the model
    * is a training-time artifact, the filter runs at ingest.
    *
    * `minWeight` calibration: run [[graft.pipeline.Dsir.resample]] on a
    * batch sample and read the weight at the wanted acceptance rank. */
  def streamingDsirFilter(stream: DataFrame, textCol: String,
                          model: graft.pipeline.Dsir.RatioModel,
                          minWeight: Double): DataFrame =
    graft.pipeline.Dsir.withImportanceWeight(stream, textCol, model)
      .filter(col("dsir_weight") >= minWeight)

  /** Streaming sessionization: Spark's built-in `session_window` (gap-
    * based merging session windows) — the continuous analogue of
    * [[graft.pipeline.Sessionize]]'s batch assignment. Sessions emit once
    * the watermark passes their (dynamic) end; state per open session,
    * bounded by the horizon. */
  def sessionStats(stream: DataFrame, userCol: String, tsCol: String,
                   gap: String = "30 minutes",
                   watermarkDelay: String = "1 hour"): DataFrame =
    stream
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(col(userCol), session_window(col(tsCol), gap))
      .agg(count(lit(1)).as("n_events"))
      .select(col(userCol),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"))

  /** Continuous ANN enrichment: every micro-batch of embedded documents is
    * run through the table-input index search and lands in `sink` with its
    * top-k neighbors attached (input.*, id, _distance) — e.g. tagging
    * incoming documents with their nearest corpus cluster, or online
    * near-dup flagging against a reference index. The per-batch work is
    * the same fully-distributed cell-pruned search as the batch operator;
    * state lives in the INDEX, not the stream, so the query itself is
    * stateless and restarts cleanly from the checkpoint. */
  def attachAnnEnrich(stream: DataFrame, idx: graft.index.AnnIndex,
                      vecCol: String, idCol: String, k: Int,
                      checkpoint: String,
                      sink: DataFrame => Unit,
                      trigger: org.apache.spark.sql.streaming.Trigger =
                        org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty)
          sink(graft.operators.AnnSearch.searchTable(idx, batch, k,
            queryVecCol = Some(vecCol), queryIdCol = Some(idCol)))
      }
      .start()

  /** Stream-stream interval join with bounded state: equality on `key`
    * plus `rightTs` constrained to [leftTs, leftTs + maxDelay]. Both
    * sides are watermarked, and the time-range condition is what lets
    * Spark compute how long each side's join state can matter — state is
    * evicted as the watermark advances, so an unbounded stream never
    * accumulates unbounded join state (the canonical Structured
    * Streaming inner-join pattern). Typical shape: document-ingest
    * events joined to their quality-check/annotation events arriving
    * within the delay horizon.
    *
    * The right side's `key` column is dropped from the output (it equals
    * the left's); all other column names must be distinct across sides.
    * Inner join: matches emit as soon as both rows are present —
    * the watermark bounds state, not emission latency. */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
                   leftTs: String, rightTs: String,
                   maxDelay: String = "1 hour",
                   watermarkDelay: String = "2 hours"): DataFrame = {
    require(leftTs != rightTs,
      s"leftTs and rightTs must have distinct names (both '$leftTs')")
    // The stated horizon semantics ("right rows within [leftTs, leftTs +
    // maxDelay] are joined") only hold while the watermark keeps such rows
    // in state. With watermarkDelay < maxDelay, in-horizon right rows are
    // silently dropped as late once the watermark passes them — that
    // presents as missed joins, not as a config error, so fail fast here.
    require(intervalMicros(watermarkDelay) >= intervalMicros(maxDelay),
      s"watermarkDelay ('$watermarkDelay') must cover maxDelay ('$maxDelay'): " +
        "a shorter watermark evicts in-horizon right-side rows as late data")
    val l = left.withWatermark(leftTs, watermarkDelay).alias("l")
    val r = right.withWatermark(rightTs, watermarkDelay).alias("r")
    l.join(r,
        expr(s"l.`$key` = r.`$key`") &&
          col(s"r.`$rightTs`") >= col(s"l.`$leftTs`") &&
          col(s"r.`$rightTs`") <= col(s"l.`$leftTs`") + expr(s"interval $maxDelay"))
      .drop(col(s"r.`$key`"))
  }

  /** One buffered right-side row of the streaming as-of state. */
  final case class AsofRight(rid: Long, rts: Long)
  /** One left row waiting for the watermark to certify its predecessor. */
  final case class AsofPendingLeft(lid: Long, lts: Long)
  /** Per-key streaming as-of state: right rows sorted by (rts, rid) and
    * the left rows whose event time the watermark has not passed yet. */
  final case class AsofJoinState(rights: List[AsofRight],
                                 pending: List[AsofPendingLeft])
  /** Streaming as-of output; right fields are None when no right row
    * at-or-before the left event existed (left-outer semantics).
    * Timestamps are epoch millis (the watermark's clock). */
  final case class AsofEnriched(key: Long, left_id: Long, left_ts: Long,
                                right_id: Option[Long], right_ts: Option[Long])

  /** Event-time streaming as-of join — the continuous analogue of
    * [[graft.operators.AsofJoin]] and of Flink's temporal join: each left
    * event is enriched with the latest right event at-or-before it (same
    * key), CORRECTLY under out-of-order arrival. A left row is held in
    * state until the watermark passes its event time — at that point no
    * in-horizon right row older than it can still arrive, so its
    * predecessor is final — then emits exactly once (append mode).
    * Rows later than the watermark are dropped by Spark as late data on
    * BOTH sides (the standard horizon contract).
    *
    * State per key is O(horizon): pending lefts not yet certified, right
    * rows newer than the watermark, plus ONE right row below it (the only
    * one any future left can still need — future lefts carry event times
    * above the watermark). Pruned every invocation; an event-time timer
    * (min pending left ts) flushes keys that stop receiving data. Ties on
    * right event time resolve to the max rid, matching the batch
    * operator's tie-break.
    *
    * Both inputs need TimestampType `tsCol`; `keyCol`/`idCol` LongType.
    */
  def streamingAsofJoin(left: DataFrame, right: DataFrame, keyCol: String,
                        leftTsCol: String, rightTsCol: String,
                        leftIdCol: String, rightIdCol: String,
                        watermarkDelay: String = "10 minutes"): Dataset[AsofEnriched] = {
    import left.sparkSession.implicits._
    val tagged = left.select(col(keyCol).cast("long").as("key"),
        col(leftTsCol).as("ts"), lit(1).as("side"),
        col(leftIdCol).cast("long").as("id"))
      .unionByName(right.select(col(keyCol).cast("long").as("key"),
        col(rightTsCol).as("ts"), lit(0).as("side"),
        col(rightIdCol).cast("long").as("id")))
      .withWatermark("ts", watermarkDelay)
      .as[(Long, java.sql.Timestamp, Int, Long)]

    tagged.groupByKey(_._1)
      .flatMapGroupsWithState[AsofJoinState, AsofEnriched](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (key, it, state: GroupState[AsofJoinState]) =>
          var s = state.getOption.getOrElse(AsofJoinState(Nil, Nil))
          it.foreach { case (_, ts, side, id) =>
            val ms = ts.getTime
            if (side == 0) s = s.copy(rights = AsofRight(id, ms) :: s.rights)
            else s = s.copy(pending = AsofPendingLeft(id, ms) :: s.pending)
          }
          val wm = state.getCurrentWatermarkMs()
          // certified lefts: the right buffer is complete at-or-below wm
          val (ready, stillPending) = s.pending.partition(_.lts <= wm)
          val rightsSorted = s.rights.sortBy(r => (r.rts, r.rid))
          val out = ready.sortBy(p => (p.lts, p.lid)).map { p =>
            val m = rightsSorted.foldLeft(Option.empty[AsofRight]) {
              (acc, r) => if (r.rts <= p.lts) Some(r) else acc
            }
            AsofEnriched(key, p.lid, p.lts, m.map(_.rid), m.map(_.rts))
          }
          // prune: rights above wm stay; below wm only the latest survives
          val (above, below) = rightsSorted.partition(_.rts > wm)
          val keptRights = (below.lastOption.toList ++ above)
          if (stillPending.isEmpty && keptRights.isEmpty) state.remove()
          else {
            state.update(AsofJoinState(keptRights, stillPending))
            // flush timer: fires once the watermark passes the oldest
            // uncertified left (strictly above wm here by construction);
            // with no pending lefts, fire when it passes the earliest
            // still-multiple right so the buffer prunes toward the single
            // row a temporal join must keep per key (Flink keeps the same)
            if (stillPending.nonEmpty)
              state.setTimeoutTimestamp(stillPending.map(_.lts).min)
            else if (above.nonEmpty)
              state.setTimeoutTimestamp(math.max(wm + 1, above.map(_.rts).min))
          }
          out.iterator
      }
  }

  /** Running per-key corpus state (docs/chars/quality mean) emitted as an
    * update row per key per micro-batch. */
  final case class CorpusState(nDocs: Long, nChars: Long, qualitySum: Double)
  final case class CorpusUpdate(key: String, nDocs: Long, nChars: Long,
                                meanQuality: Double)

  /** Per-key running corpus statistics as an explicit state machine
    * (`flatMapGroupsWithState`, update mode): the streaming analogue of a
    * running `GROUP BY` that must survive across micro-batches and emit
    * intermediate results. With `maxIdle = Some(d)`, `ProcessingTimeTimeout`
    * evicts keys idle longer than `d`, bounding state on unbounded key
    * spaces (e.g. keying by source domain); `None` keeps state forever
    * (bounded key spaces only).
    *
    * NOTE: with a timeout set, Spark schedules no-data micro-batches
    * indefinitely to fire evictions — `shouldRunAnotherBatch` is always
    * true — so `processAllAvailable()` never returns on such a query; pace
    * it with a processing-time trigger and poll the sink instead.
    *
    * Input must be pre-projected to (key, nChars, quality) rows — keeping
    * the shuffled payload to 3 columns matters when the raw stream carries
    * multi-KB documents.
    */
  def runningCorpusStats(rows: Dataset[(String, Long, Double)],
                         maxIdle: Option[String] = Some("30 minutes")): Dataset[CorpusUpdate] = {
    import rows.sparkSession.implicits._
    val timeoutConf = if (maxIdle.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
                      else GroupStateTimeout.NoTimeout()
    rows.groupByKey(_._1)
      .flatMapGroupsWithState[CorpusState, CorpusUpdate](
        OutputMode.Update(), timeoutConf) {
        case (key, it, state: GroupState[CorpusState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var s = state.getOption.getOrElse(CorpusState(0L, 0L, 0.0))
            var changed = false
            it.foreach { case (_, nChars, quality) =>
              s = CorpusState(s.nDocs + 1, s.nChars + nChars, s.qualitySum + quality)
              changed = true
            }
            if (changed) {
              state.update(s)
              maxIdle.foreach(state.setTimeoutDuration)
              Iterator.single(CorpusUpdate(key, s.nDocs, s.nChars,
                s.qualitySum / s.nDocs))
            } else Iterator.empty
          }
      }
  }

  /** Per-bucket LSH state: ids and their full minhash signatures, parallel
    * seqs (bounded by `maxPerBucket`). */
  final case class BucketState(ids: Seq[Long], sigs: Seq[Seq[Long]])

  /** A cross-batch near-duplicate candidate: `id` collided with the
    * earlier-seen `match_id` in LSH `band`, with the estimated Jaccard
    * from the FULL signatures. The same pair can surface from several
    * bands (each band is its own state partition — deduplicating across
    * bands would need a second stateful stage); group on (id, match_id)
    * downstream if one row per pair is wanted. */
  final case class NearDupCandidate(id: Long, match_id: Long, band: Int,
                                    est_jaccard: Double)

  /** Streaming MinHash near-dup detection — the continuous analogue of
    * [[graft.pipeline.Dedup.minhashNearDups]]: every incoming document's
    * banded signature is checked against the documents already seen in the
    * same LSH buckets, across micro-batches, and collisions whose
    * full-signature Jaccard estimate clears `threshold` emit
    * [[NearDupCandidate]] rows. The batch operator answers "which pairs in
    * this corpus are near-dups"; this one answers "is the document arriving
    * NOW a near-dup of anything in the ingest horizon" — online filtering
    * during continuous ingest.
    *
    * State is per (band, bucket): at most `maxPerBucket` (id, signature)
    * entries — the same skew stance as the batch bucket caps (a degenerate
    * bucket of boilerplate stops absorbing state instead of growing without
    * bound; later arrivals in a full bucket still emit candidates against
    * the retained entries). `maxIdle` evicts buckets idle longer than the
    * horizon via ProcessingTimeTimeout — same caveat as
    * [[runningCorpusStats]]: with a timeout set, pace the query with a
    * trigger and poll the sink; `processAllAvailable` never returns.
    *
    * Within a micro-batch, bucket members are processed in id order and
    * also compared to each other — output is deterministic per batch.
    */
  def streamingMinhashCandidates(stream: DataFrame, idCol: String,
                                 textCol: String, threshold: Double = 0.7,
                                 shingleSize: Int = 3, numHashes: Int = 64,
                                 bands: Int = 16, maxPerBucket: Int = 256,
                                 maxIdle: Option[String] = None)
      : Dataset[NearDupCandidate] = {
    require(numHashes % bands == 0,
      s"numHashes=$numHashes must be divisible by bands=$bands")
    val rowsPerBand = numHashes / bands
    import stream.sparkSession.implicits._
    import graft.pipeline.Dedup
    val sig = Dedup.minhashUdf(numHashes)(
      Dedup.shingleUdf(shingleSize)(col(textCol)))
    val banded = stream
      .select(col(idCol).cast("long").as("id"), sig.as("sig"))
      .withColumn("band", explode(array((0 until bands).map(lit): _*)))
      .withColumn("bucket", hash(col("band"),
        slice(col("sig"), col("band") * rowsPerBand + 1, lit(rowsPerBand))))
      .select("band", "bucket", "id", "sig")
      .as[(Int, Int, Long, Seq[Long])]
    val timeoutConf = if (maxIdle.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
                      else GroupStateTimeout.NoTimeout()
    banded.groupByKey(t => (t._1, t._2))
      .flatMapGroupsWithState[BucketState, NearDupCandidate](
        OutputMode.Append(), timeoutConf) {
        case ((band, _), it, state: GroupState[BucketState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var s = state.getOption.getOrElse(BucketState(Nil, Nil))
            var ids = s.ids.toVector
            var sigs = s.sigs.toVector
            val out = Seq.newBuilder[NearDupCandidate]
            for ((_, _, id, sg) <- it.toSeq.sortBy(_._3)
                 if !ids.contains(id)) {
              var j = 0
              while (j < ids.length) {
                var eq = 0
                var p = 0
                val other = sigs(j)
                while (p < numHashes) {
                  if (sg(p) == other(p)) eq += 1
                  p += 1
                }
                val est = eq.toDouble / numHashes
                if (est >= threshold) out += NearDupCandidate(id, ids(j), band, est)
                j += 1
              }
              if (ids.length < maxPerBucket) { ids :+= id; sigs :+= sg }
            }
            state.update(BucketState(ids, sigs))
            maxIdle.foreach(state.setTimeoutDuration)
            out.result().iterator
          }
      }
  }

  /** Per-group MG summary carried across micro-batches: parallel
    * item/counter seqs (bounded by k) plus the group's total item count. */
  final case class MgGroupState(items: Seq[String], counts: Seq[Long], n: Long)

  /** One certified candidate emitted for a group after a trigger:
    * `est_low <= true count <= est_high`; `group_n` is the group's items
    * observed so far. */
  final case class HeavyHitterUpdate(key: String, item: String,
                                     est_low: Long, est_high: Long,
                                     group_n: Long)

  /** Streaming per-group heavy hitters — the continuous analogue of
    * [[graft.pipeline.HeavyHitters.frequentItemsByGroup]] as an explicit
    * `flatMapGroupsWithState` state machine (update mode): each trigger
    * folds the group's new items into its bounded k-counter Misra-Gries
    * summary (k = ceil(1/phi), state O(k) per group at ANY stream length)
    * and re-emits the group's current certified candidate set — every item
    * whose TRUE count could reach ceil(phi·n) given the summary's anytime
    * bound `est <= true <= est + n/(k+1)`. A guaranteed superset of the
    * group's true heavy hitters at every trigger (phi > 1/(k+1) holds by
    * construction); recount the reported items against retained data when
    * exact counts are needed — same contract as
    * [[HeavyHittersMaintenance]], but keyed state sharded across executors
    * instead of one driver-resident summary, so group cardinality scales
    * with the cluster.
    *
    * `maxIdle` evicts groups idle longer than the horizon
    * (ProcessingTimeTimeout — same pacing caveat as
    * [[runningCorpusStats]]); `None` keeps state forever (bounded group
    * spaces only, and `processAllAvailable` works). */
  def streamingGroupedHeavyHitters(rows: Dataset[(String, String)],
      phi: Double, maxIdle: Option[String] = Some("30 minutes"))
      : Dataset[HeavyHitterUpdate] = {
    import rows.sparkSession.implicits._
    require(phi > 0.0 && phi <= 1.0, s"phi=$phi must be in (0, 1]")
    require(1.0 / phi <= graft.pipeline.HeavyHitters.MaxK,
      s"phi=$phi needs more than ${graft.pipeline.HeavyHitters.MaxK} counters per group")
    val k = math.max(1, math.ceil(1.0 / phi).toInt)
    val timeoutConf = if (maxIdle.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
                      else GroupStateTimeout.NoTimeout()
    // Match the batch operator's contract: null group keys and null items
    // are dropped (a null item would otherwise enter the per-group map and
    // surface as HeavyHitterUpdate(item = null)).
    rows.filter(r => r._1 != null && r._2 != null)
      .groupByKey(_._1)
      .flatMapGroupsWithState[MgGroupState, HeavyHitterUpdate](
        OutputMode.Update(), timeoutConf) {
        case (key, it, state: GroupState[MgGroupState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val s0 = state.getOption.getOrElse(MgGroupState(Nil, Nil, 0L))
            val m = new java.util.HashMap[String, Long](k * 2)
            s0.items.iterator.zip(s0.counts.iterator).foreach { case (x, c) =>
              m.put(x, c)
            }
            var n = s0.n
            var changed = false
            it.foreach { case (_, x) =>
              n += 1L; changed = true
              val cur = m.get(x)
              if (cur != 0L) m.put(x, cur + 1L)
              else if (m.size < k) m.put(x, 1L)
              else {
                val itr = m.entrySet().iterator()
                while (itr.hasNext) {
                  val e = itr.next()
                  if (e.getValue == 1L) itr.remove()
                  else e.setValue(e.getValue - 1L)
                }
              }
            }
            if (!changed) Iterator.empty
            else {
              val items = new scala.collection.mutable.ArrayBuffer[String](m.size)
              val counts = new scala.collection.mutable.ArrayBuffer[Long](m.size)
              m.forEach { (x, c) => items += x; counts += c }
              state.update(MgGroupState(items.toSeq, counts.toSeq, n))
              maxIdle.foreach(state.setTimeoutDuration)
              val thr = math.max(1L, math.ceil(phi * n).toLong)
              val err = n / (k + 1L)
              items.iterator.zip(counts.iterator).collect {
                case (x, c) if c + err >= thr =>
                  HeavyHitterUpdate(key, x, c, c + err, n)
              }
            }
          }
      }
  }

  /** EXACT per-group heavy hitters from accumulated
    * [[streamingGroupedHeavyHitters]] emissions — the one-call verify hook
    * for the grouped streaming path: `updates` is the collected sink
    * output (any set of triggers that includes each group's latest —
    * accumulated update-mode emissions qualify, being a certified superset
    * by the anytime bound), `retained` the corpus those triggers observed.
    * Delegates to [[graft.pipeline.HeavyHitters.recountGroupedCandidates]]
    * with the emission schema's `key`/`item` columns; the result equals
    * `HeavyHitters.frequentItemsByGroup(retained, …)` exactly. */
  def exactGroupedHeavyHitters(retained: DataFrame, groupCol: String,
                               itemCol: String, phi: Double,
                               updates: DataFrame): DataFrame =
    graft.pipeline.HeavyHitters.recountGroupedCandidates(
      retained, groupCol, itemCol, phi, updates,
      candGroupCol = "key", candItemCol = "item")

  /** Interval string → microseconds, via the same catalyst parser Spark
    * applies to `withWatermark` delays. Calendar units are flattened the
    * way streaming state management does (a month as 31 days), which only
    * has to be monotone and consistent across both operands for the
    * `watermarkDelay >= maxDelay` guard to be meaningful. */
  private def intervalMicros(s: String): Long = {
    val iv = org.apache.spark.sql.catalyst.util.IntervalUtils.stringToInterval(
      org.apache.spark.unsafe.types.UTF8String.fromString(s))
    require(iv != null, s"cannot parse interval '$s'")
    iv.microseconds + iv.days * 86400000000L + iv.months * 31L * 86400000000L
  }
}
