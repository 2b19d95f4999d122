package graft.store

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField}
import org.apache.spark.util.sketch.BloomFilter

import graft._
import graft.embed.Embedder
import graft.functions.VectorFunctions
import graft.index.{IvfIndex, PqIndex, VectorIndex}
import graft.ops.TextSearch

/** The VectorStore-equivalent facade (reference:
  * src/langchain_memvid/vectorstore.py — `MemVid`): ingest, top-k
  * semantic search with optional full-metadata enrichment, point lookup,
  * deletion with index maintenance, persistence, stats.
  *
  * Dual-store layout on disk (reference's hybrid FAISS dir + video file,
  * vectorstore.py:7-13, index.py:71-84), as copy-on-write snapshot
  * versions under one root:
  *
  * {{{
  * <path>/MANIFEST.json          # current version + dim/metric/count/nlist
  * <path>/v<N>/essential/        # parquet: id, text, source, category,
  * #                               metadata_hash, vec [, cluster=...]
  * <path>/v<N>/centroids/        # parquet (IVF only): cluster, centroid
  * <path>/v<N>/payload/          # parquet: doc_id, text, metadata,
  * #                               payload_json (full-fidelity record)
  * }}}
  *
  * Mutation (add/delete) writes a NEW version directory and atomically
  * swaps the manifest pointer — the Spark-native version of the
  * reference's temp-file + move dance (vectorstore.py:563-581).
  * `StoreConfig.keepVersions` retains that many snapshots (MVCC-style
  * grace for readers still planned against an older version); older
  * ones are pruned on each swap.
  *
  * Deletion does NOT re-embed anything: vectors are stored as data, so
  * the reference's O(n) re-embed on delete (index.py:404-440, an
  * artifact of FAISS flat indexes lacking deletion) becomes two
  * anti-joins. Ids are reassigned densely 0..n-1 after deletion exactly
  * like the reference (index.py:433-435) — ids are positional, not
  * stable keys.
  */
final class DocumentStore private (
    val spark: SparkSession,
    val path: String,
    val config: StoreConfig,
    val embedder: Embedder) {

  import DocumentStore._

  // Serializes MUTATIONS within this driver: concurrent add/delete
  // Futures (the async API) must not race on the same next-version
  // directory and manifest swap. Reads stay lock-free (snapshot
  // isolation via version dirs + keepVersions). Cross-driver writers
  // are out of scope — one writer process per store path, like any
  // single-writer table format.
  private val mutationLock = new Object

  // Arms a one-time directory-list retention sweep on this instance's
  // first snapshot write (collects stray version dirs a previous
  // process's crash left behind); subsequent writes sweep a bounded
  // window only. See writeVersion.
  private val fullSweepArmed = new java.util.concurrent.atomic.AtomicBoolean(true)

  @volatile private var manifest: StoreManifest = readManifest(spark, path)
    .getOrElse(StoreManifest(0L, embedder.dim, config.metric, 0L, config.nlist))

  private def versionDir(v: Long) = s"$path/v$v"
  private def essentialDir(v: Long) = s"${versionDir(v)}/essential"
  private def payloadDir(v: Long) = s"${versionDir(v)}/payload"
  private def centroidsDir(v: Long) = s"${versionDir(v)}/centroids"
  private def bloomPath(v: Long) = s"${versionDir(v)}/dedup_bloom.bin"
  private def dedupKeysDir(v: Long) = s"${versionDir(v)}/dedup_keys"
  private def lexicalDir(v: Long) = s"${versionDir(v)}/lexical"
  private def pqDir(v: Long) = s"${versionDir(v)}/pq"
  private def chunksDir(v: Long) = s"${versionDir(v)}/chunks"
  private def tuningDir(v: Long) = s"${versionDir(v)}/tuning"
  private def ivfStatsDir(v: Long) = s"${versionDir(v)}/ivf_stats"

  // --- snapshot pinning for multi-step reads -------------------------
  // A read operation that touches the store more than once (hits +
  // payload enrichment, fused ranks + text fetch, stats over two dirs)
  // must see ONE version even if a concurrent async mutation swaps
  // `manifest` mid-operation: ids are densely REASSIGNED across
  // versions, so mixing two versions silently attaches wrong rows (or
  // hits a pruned dir). Multi-step read methods wrap their body in
  // [[withSnapshot]]; every read accessor resolves through [[snap]] —
  // the pinned manifest inside such an operation, the live pointer
  // otherwise. Mutations never pin: they hold mutationLock and must see
  // the live pointer.
  // CAVEAT: pinning gives version-CONSISTENCY, not retention. With
  // keepVersions=1 (the default) a concurrent mutation prunes the
  // pinned version's dirs right after its pointer swap, so the pinned
  // reader can still crash loudly with FileNotFound mid-operation.
  // Concurrent async mutation + read requires keepVersions >= 2
  // (see StoreConfig.keepVersions).
  private val pinnedSnapshot = new ThreadLocal[StoreManifest]
  private def snap: StoreManifest = {
    val p = pinnedSnapshot.get(); if (p != null) p else manifest
  }
  private def withSnapshot[A](body: => A): A =
    if (pinnedSnapshot.get() != null) body // nested op: keep the outer pin
    else {
      pinnedSnapshot.set(manifest)
      try body finally pinnedSnapshot.remove()
    }

  /** Current essential store (searchable projection + vectors). */
  def essential: DataFrame = spark.read.parquet(essentialDir(snap.version))

  /** Current full-fidelity payload store. */
  def payload: DataFrame = spark.read.parquet(payloadDir(snap.version))

  /** Current chunk table (multi-vector mode only): (id, vec[, cluster])
    * — one row per chunkSize-token window of each document. */
  def chunkVectors: DataFrame = {
    if (snap.chunkSize <= 0) throw new SearchException(
      "store is not multi-vector: build with StoreConfig.chunkSize > 0")
    spark.read.parquet(chunksDir(snap.version))
  }

  /** Time-travel read: the essential store AS OF snapshot `version`,
    * readable for any version still retained by
    * `StoreConfig.keepVersions` (mutations write new version dirs and
    * prune `keepVersions` behind the pointer) — the audit/
    * reproducibility read of a versioned store: "what did the store
    * contain when job X ran?". */
  def essentialAt(version: Long): DataFrame = versionedRead(version, essentialDir)

  /** Time-travel read of the payload store — see [[essentialAt]]. */
  def payloadAt(version: Long): DataFrame = versionedRead(version, payloadDir)

  private def versionedRead(version: Long, dirOf: Long => String): DataFrame = {
    if (!(version >= 1 && version <= manifest.version)) throw new StorageException(
      s"version $version out of range 1..${manifest.version}")
    val dir = dirOf(version)
    if (!fsFor(dir).exists(hadoopPath(dir))) throw new StorageException(
      s"version $version already pruned (keepVersions=${config.keepVersions})")
    spark.read.parquet(dir)
  }

  def documentCount: Long = manifest.count
  def currentManifest: StoreManifest = manifest

  // ------------------------------------------------------------------
  // Ingest (reference I1-I8: vectorstore.py:174-225, encoder.py:90-227,
  // index.py:177-307)
  // ------------------------------------------------------------------

  /** Ingest texts + metadata. Like the reference, duplicate texts (both
    * intra-batch and vs. the existing store) are dropped with
    * first-occurrence-wins (index.py:202-218), yet the returned ids are
    * str(0..len(texts)-1) of the INPUT — a reference surface
    * inconsistency we replicate deliberately (vectorstore.py:221). */
  def addTexts(texts: Seq[String], metadatas: Seq[Map[String, String]] = Nil): Seq[String] = {
    if (!(metadatas.isEmpty || metadatas.length == texts.length)) throw new IngestException(
      s"texts/metadatas length mismatch: ${texts.length} vs ${metadatas.length}")
    val metas = if (metadatas.isEmpty) Seq.fill(texts.length)(Map.empty[String, String]) else metadatas
    import spark.implicits._
    val staged = texts.zip(metas).toDF("text", "metadata")
    appendBuild(staged)
    texts.indices.map(_.toString)
  }

  /** Bulk ingest from a DataFrame with columns (text STRING,
    * metadata MAP<STRING,STRING>). The scale path: no driver-side data. */
  def addDF(staged: DataFrame): Unit = appendBuild(staged)

  /** Document-list adapter over addTexts (reference I2,
    * vectorstore.py:254-270). */
  def addDocuments(docs: Seq[Doc]): Seq[String] =
    addTexts(docs.map(_.text), docs.map(_.metadata))

  private def appendBuild(staged: DataFrame): Unit = mutationLock.synchronized {
    val existing =
      if (manifest.count > 0) Some(essential.select("id", "text", "source", "category", "metadata_hash", "vec"))
      else None
    // Offset from the DATA, not the manifest (same hardening as
    // addDFIncremental): a crashed incremental append can leave orphan
    // rows with ids >= manifest.count on disk; since `existing` reads
    // the disk (orphans included), minting new ids from the stale count
    // would publish DUPLICATE ids and permanently break the dense-id
    // invariant.
    val offset = existing match {
      case None => 0L
      case Some(ex) => ex.agg(max("id")).head.get(0) match {
        case null => 0L
        case m    => m.asInstanceOf[Long] + 1L
      }
    }
    val base = buildNewRows(staged, existing, offset, loadBloom())
    try {
      // A fully-deduped (or empty) batch against an existing store is a
      // no-op: don't rewrite the corpus, re-fit IVF, and churn versions
      // for zero new rows (the incremental path has the same guard).
      if (existing.isDefined && base.isEmpty) return
      val allEssential = existing match {
        case Some(ex) => ex.unionByName(essentialProjection(base))
        case None     => essentialProjection(base)
      }
      val allPayload = existing match {
        case Some(_) => payload.unionByName(payloadProjection(base))
        case None    => payloadProjection(base)
      }
      // Multi-vector append: ids are stable (append never renumbers),
      // so existing chunks carry verbatim and only the BATCH's chunks
      // are embedded — O(batch) inference, not O(corpus). The carry is
      // clipped to ids BELOW the mint offset: a crashed incremental
      // append can leave orphan chunk rows for ids its essential write
      // never published (chunks land first — see addDFIncremental), and
      // this batch mints exactly those ids next, so carrying the orphans
      // verbatim would attach the dead batch's vectors to the NEW
      // documents (a poisoned searchMaxSim hit, not just a stale stat).
      // Live essential ids are 0..offset-1 by construction, so the
      // clip drops precisely the orphans.
      val carry = existing.flatMap(_ => existingChunks())
        .map(_.where(col("id") < offset)
          .unionByName(chunkRows(essentialProjection(base))))
      writeVersion(allEssential, allPayload, carry)
    } finally base.unpersist()
  }

  private def essentialProjection(base: DataFrame): DataFrame =
    base.select("id", "text", "source", "category", "metadata_hash", "vec")

  /** Derive the chunk table rows for multi-vector mode: every document
    * split into chunkSize-token windows (chunkOverlap overlap), each
    * window embedded with the SAME embedder as the doc vector. Narrow
    * explode + map — no shuffle; null-text docs produce no chunks
    * (their doc vector is null too, so search behavior is consistent). */
  private def chunkRows(docs: DataFrame): DataFrame = {
    val chunked = docs.select(col("id"), explode(
      graft.functions.TextFunctions.chunks(
        col("text"), config.chunkSize, config.chunkOverlap)).as("__chunk"))
    embedder.embed(chunked, "__chunk", "vec").select(col("id"), col("vec"))
  }

  /** The CURRENT snapshot's chunk table as carry input — Some((id, vec))
    * only when carrying across a mutation is sound: the store is
    * multi-vector, the live config still matches the manifest's chunk
    * geometry (a changed chunkSize/chunkOverlap invalidates every
    * existing window), and the table exists on disk. None ⇒ the caller
    * lets writeVersion rebuild from the essential text. */
  private def existingChunks(): Option[DataFrame] = {
    val dir = chunksDir(manifest.version)
    if (manifest.chunkSize > 0 && config.chunkSize == manifest.chunkSize &&
        config.chunkOverlap == manifest.chunkOverlap &&
        fsFor(dir).exists(hadoopPath(dir)))
      Some(spark.read.parquet(dir).select("id", "vec"))
    else None
  }

  /** Carry surviving chunk vectors across a delete/renumber WITHOUT
    * re-embedding: inner-join the previous snapshot's chunk table
    * against `idMap` (__old_id → id, the dense renumbering the mutation
    * already computes) — deleted docs' chunks drop out of the join,
    * survivors get their new doc id, and the vectors travel as data.
    * One equi-join shuffling (old_id, vec) pairs — survivor IO, the
    * cost class the copy-on-write rewrite already pays — versus model
    * inference over every chunk in the corpus. */
  private def chunkCarry(idMap: DataFrame): Option[DataFrame] =
    existingChunks().map(_.withColumnRenamed("id", "__old_id")
      .join(idMap, Seq("__old_id"))
      .select("id", "vec"))

  private def payloadProjection(base: DataFrame): DataFrame =
    base.select(col("id").as("doc_id"), col("text"), col("metadata"),
      to_json(struct(col("text"), col("metadata"))).as("payload_json"))

  /** Dedup + embed + project one staged batch into a CACHED base of new
    * rows with dense ids starting at the current count. Caching is
    * load-bearing, not an optimization: the essential and payload writes
    * both derive from this plan, and recomputing it from a staged input
    * that changed between the two writes would produce payload rows that
    * do not match the essential rows already written. */
  private def buildNewRows(staged: DataFrame, existing: Option[DataFrame],
                           offset: Long,
                           bloom: Option[BloomFilter] = None): DataFrame = {
    // Pin the staged batch ONCE before anything reads it: zipWithIndex
    // alone runs a partition-count job plus the final compute, and the
    // Bloom confirm both COLLECTS maybe-keys from and anti-joins
    // against plans over this input — independent executions all. A
    // nondeterministic source (unseeded sample(), rand()-derived, a
    // directory racing appends) could otherwise disagree with itself
    // between the dedup decision and the published rows — admitting a
    // true duplicate past the screen or shifting ids under the embed.
    // Batch-sized by contract; released in the finally once the result
    // cache is materialized.
    val pinned = staged
      .select(col("text"), col("metadata").cast("map<string,string>"))
      .cache()
    try {
    // Input-order sequence for first-occurrence-wins dedup.
    val withSeq = withDenseId(pinned, "seq")

    // Intra-batch dedup: first occurrence per text (index.py:202-218).
    val firstPerText = Window.partitionBy(col("text")).orderBy(col("seq"))
    var fresh = withSeq
      .withColumn("__rn", row_number().over(firstPerText))
      .where(col("__rn") === 1).drop("__rn")

    // Dedup vs. already-indexed texts. With a persisted store Bloom
    // filter (keyed on sha2(text)), batch rows that MISS it are
    // definitely new; positives (true dups + ~fpp of the batch) are
    // confirmed EXACTLY through the sha-sorted key table + id-pruned
    // point lookups (see confirmDups) — same result as the plain
    // anti-join for any filter contents, and per-ingest cost genuinely
    // stops scaling with the corpus (the r10 witness run caught the
    // previous shape still shuffling the whole corpus for the confirm
    // branch even when every row missed the filter).
    existing.foreach { ex =>
      fresh = bloom match {
        case Some(b) =>
          val bc = spark.sparkContext.broadcast(b)
          // Null-safe: a null text hashes to null — route it to the
          // confirm path (treat as "maybe") instead of NPEing inside
          // the task.
          val probe = udf((h: String) => h == null || bc.value.mightContainString(h))
          confirmDups(fresh.withColumn("__maybe",
            probe(sha2(col("text"), 256))), ex)
        case None =>
          // <=> (null-safe): the intra-batch window already dedupes
          // null texts as equal, so the cross-batch screen must too —
          // a plain equi-anti-join never matches null = null and would
          // append one null-text doc per ingest batch forever.
          fresh.join(ex.select(col("text").as("__ex_text")),
            col("text") <=> col("__ex_text"), "left_anti")
      }
    }

    // Embed (narrow map stage) + essential projection + integrity hash
    // (index.py:220-237). Hash = sha256 over key-sorted metadata JSON —
    // an opaque self-consistency token (SURVEY §7.4), recomputable by
    // [[verifyIntegrity]] (same shared expression).
    val embedded = embedder.embed(fresh, "text", "vec")
      .withColumn("source", col("metadata").getItem("source"))
      .withColumn("category", col("metadata").getItem("category"))
      .withColumn("metadata_hash", DocumentStore.metadataHashCol(col("metadata")))

    // Dense id assignment at the append offset (index.py:230):
    // zipWithIndex (no shuffle), input order preserved via sort by seq.
    val base = withDenseId(embedded.orderBy("seq"), "id", offset).cache()
    // Materialize base's cache (load-bearing — see callers) from the
    // still-pinned input before the finally releases it; otherwise the
    // first downstream action would re-execute the raw staged plan.
    base.count()
    base
    } finally { pinned.unpersist(); () }
  }

  /** Exact cross-batch dedup for rows the Bloom flagged `__maybe`,
    * WITHOUT a corpus-sized anti-join. The previous shape unioned a
    * "definitely new" branch with a maybe-rows anti-join against the
    * whole essential store — but that branch executes regardless of
    * how few maybe rows exist, so every ingest still paid a
    * corpus-sized shuffle (caught by ScaleBench's ingest row at ×200).
    * Now the confirm walks bounded, PRUNED reads:
    *
    *  1. collect the distinct maybe shas (≤ batch-sized; driver
    *     decision point);
    *  2. probe the snapshot's sha-SORTED key table: up to
    *     [[DocumentStore.SafeInProbe]] keys as an `isin` pushdown —
    *     parquet min/max skips every row group not containing a probed
    *     key, so this reads O(|maybe|) row groups, not the corpus;
    *     larger sets as a BROADCAST join against the key table — no
    *     row-group pruning, but a shuffle-free columnar scan of the
    *     2-column table (never of the corpus texts). The split exists
    *     because a parquet In pushdown compiles to an or-CHAIN whose
    *     evaluation recursion overflows the task stack at depth
    *     ~768 on a cold JVM (measured; see SafeInProbe) — the In form
    *     is only safe when small;
    *  3. fetch the matched candidate ids' TEXTS from the id-laid-out
    *     essential store (the same pruned point-lookup path as
    *     getDocumentsByIds; same In-vs-broadcast split) and anti-join
    *     the batch against them — driver-collected + broadcast only
    *     while the measured candidate bytes stay under
    *     [[DocumentStore.MaxConfirmTextBytes]] (the row cap bounds
    *     count, not bytes), executor-side join otherwise. The final
    *     compare stays EXACT TEXT equality, so a sha collision can
    *     only cost a wasted fetch, never a wrong drop.
    *
    * Crash safety: the key table is appended BEFORE rows publish (the
    * bloom-fold discipline), so it only ever OVERAPPROXIMATES — a
    * phantom (k, id) from a crashed append matches in step 2, fetches
    * nothing in step 3 (the id never published), and the row is
    * re-admitted. Fallbacks preserve the old exact shape: a missing
    * key table (legacy store), or more than [[DocumentStore.MaxConfirmKeys]]
    * maybe keys / candidate ids (a batch that is mostly dups —
    * corpus-sized work is then inherent), run the plain anti-join. */
  private def confirmDups(flagged: DataFrame, ex: DataFrame): DataFrame = {
    val keysDir = dedupKeysDir(manifest.version)
    def legacyConfirm(): DataFrame =
      flagged.where(!col("__maybe")).drop("__maybe")
        .unionByName(flagged.where(col("__maybe")).drop("__maybe")
          .join(ex.select(col("text").as("__ex_text")),
            col("text") <=> col("__ex_text"), "left_anti"))
    if (!fsFor(keysDir).exists(hadoopPath(keysDir))) return legacyConfirm()
    val cap = DocumentStore.MaxConfirmKeys
    val maybeKeys = flagged.where(col("__maybe"))
      .select(sha2(col("text"), 256).as("__k")).distinct()
      .limit(cap + 1).collect().map(r => Option(r.getString(0)))
    if (maybeKeys.isEmpty) return flagged.drop("__maybe")
    if (maybeKeys.length > cap) return legacyConfirm()
    val nonNull = maybeKeys.flatten.toSeq
    val hasNull = maybeKeys.exists(_.isEmpty)
    val inCap = DocumentStore.SafeInProbe
    val keyTable = spark.read.parquet(keysDir)
    // Probe-mode split. In form: above `pushdown.inFilterThreshold`
    // (default 10) Spark degrades a parquet In filter to a [min, max]
    // RANGE filter — random shas span the whole key space, so every
    // row group would "match" and the probe silently reads the full
    // corpus-sized table; the threshold is therefore raised, scoped to
    // this one plan (cloned-session conf, same mechanism as
    // withBoundedTopKConf) — but ONLY up to SafeInProbe values,
    // because the pushed In compiles to an or-chain whose evaluation
    // overflows a cold-JVM task stack at depth ~768 (measured; JIT'd
    // frames survive 1000+, so warm tests lie). Join form: broadcast
    // the probe keys and null-safe-join the key table — no pruning,
    // but a shuffle-free scan of 2 thin columns, never of the corpus.
    val matched =
      if (nonNull.length <= inCap) {
        val probeCond =
          (if (nonNull.nonEmpty) Some(col("k").isin(nonNull: _*)) else None) ++
            (if (hasNull) Some(col("k").isNull) else None)
        org.apache.spark.sql.GraftSqlBridge.withSessionConfs(
          keyTable.where(probeCond.reduce(_ || _)),
          Map("spark.sql.parquet.pushdown.inFilterThreshold" ->
            (inCap + 1).toString))
      } else {
        import spark.implicits._
        val probe = maybeKeys.map(_.orNull).toSeq.toDF("__pk")
        keyTable.join(broadcast(probe), col("k") <=> col("__pk"), "leftsemi")
      }
    val candIds = matched
      .select("id").distinct().limit(cap + 1).collect().map(_.getLong(0))
    if (candIds.isEmpty) return flagged.drop("__maybe")
    if (candIds.length > cap) return legacyConfirm()
    // Candidate-TEXT fetch + final anti-join. Two hazards shape this:
    // (a) MaxConfirmKeys bounds candidate COUNT, not BYTES — 100k
    //     1 MB documents would be a ~100 GB broadcast/collect, so the
    //     broadcast path is gated on a measured byte budget;
    // (b) the raised In-filter conf must not ESCAPE this method: the
    //     old shape rebound the RETURNED plan to the cloned session,
    //     so the caller's embed, id assignment, and all three store
    //     writes silently executed under the altered pushdown conf
    //     (and every ingest batch allocated a fresh SessionState for
    //     the lifetime of its frame). The scoped conf is now consumed
    //     by bounded IN-METHOD actions only — nothing cloned is ever
    //     returned.
    import spark.implicits._
    def joinFormFetch(): DataFrame =
      ex.join(broadcast(candIds.toSeq.toDF("__cid")),
          col("id") === col("__cid"), "leftsemi")
        .select(col("text").as("__ex_text")).distinct()
    if (candIds.length <= inCap) {
      // In-form fetch: row-group-pruned point reads of the candidate
      // texts — but only execute it under the scoped conf, inside this
      // method. The byte probe reads octet lengths through the same
      // pruned path (bounded), then the texts are COLLECTED (the bytes
      // a broadcast would ship to the driver anyway) and rebuilt as a
      // local frame on the caller's session.
      val pruned = org.apache.spark.sql.GraftSqlBridge.withSessionConfs(
        ex.where(col("id").isin(candIds.toSeq: _*))
          .select(col("text").as("__ex_text")).distinct(),
        Map("spark.sql.parquet.pushdown.inFilterThreshold" ->
          (inCap + 1).toString))
      // Persist across the two actions (byte probe, then collect):
      // both consume the same pruned point-read, and this is the HOT
      // ingest path — without the cache every under-budget confirm
      // paid the candidate-text fetch twice. Bounded: <= cap rows, and
      // the collect only proceeds under the byte budget.
      pruned.persist()
      try {
        val approxBytes = pruned
          .agg(coalesce(sum(octet_length(col("__ex_text"))), lit(0L)))
          .head.getLong(0)
        if (approxBytes <= DocumentStore.MaxConfirmTextBytes) {
          val texts = pruned.collect().map(_.getString(0)).toSeq
          return flagged.drop("__maybe")
            .join(broadcast(texts.toDF("__ex_text")),
              col("text") <=> col("__ex_text"), "left_anti")
        }
      } finally { pruned.unpersist(); () }
      // Over budget: fall through to the join-form fetch + a plain
      // (non-broadcast) anti-join — bounded executor-side shuffle of
      // batch vs candidates, no driver collection of GBs of text.
    }
    // Join-form: broadcast the tiny id set into the essential scan
    // (shuffle-free columnar read; no In conf needed), then a plain
    // anti-join — AQE may still broadcast the candidate side at
    // runtime if it measures small, but nothing forces an unbounded
    // byte collection.
    flagged.drop("__maybe")
      .join(joinFormFetch(), col("text") <=> col("__ex_text"), "left_anti")
  }

  /** SCALE-PATH append: write ONLY the new rows into the current
    * version's directories (parquet append) instead of rewriting the
    * whole snapshot. The reference rebuilds the entire store on every
    * add (vectorstore.py:197-212) because FAISS flat indexes cannot be
    * appended persistently; columnar storage can — at 100 TB a per-batch
    * full rewrite is the difference between O(batch) and O(corpus) per
    * ingest. Semantics match [[addDF]] exactly (same dedup-vs-store,
    * same dense ids); only the physical write differs:
    *  - IVF stores assign new rows to the EXISTING centroids (no
    *    re-fit; cluster boundaries drift only as much as the data does),
    *  - appended files are unsorted relative to old ones.
    * Run [[compact]] after heavy append traffic to re-fit/re-layout.
    * First-ever append delegates to the snapshot path (creates v1).
    *
    * Failure atomicity: all appends run off one CACHED row set
    * (identical rows in every store by construction), payload and (in
    * multi-vector mode) chunk rows land BEFORE essential, and the
    * manifest count is bumped last — so a
    * crash mid-append leaves either invisible orphan payload/chunk rows
    * (harmless: payload is keyed by doc_id and joined from essential)
    * or nothing; it never publishes essential rows without their
    * payload, and the unbumped count means a retry re-derives the same
    * id range for a batch that then dedups against what was already
    * published. [[compact]] rewrites the snapshot from the essential
    * rows and so also drops any orphan payload rows. */
  def addDFIncremental(staged: DataFrame): Unit = mutationLock.synchronized {
    if (manifest.count == 0) { appendBuild(staged); return }
    val existing = essential.select("id", "text", "source", "category", "metadata_hash", "vec")
    // Offset from the DATA, not the manifest: if a prior incremental
    // append crashed between the essential write and the manifest bump,
    // manifest.count undercounts and reusing it would hand out ids that
    // already exist on disk.
    val offset = existing.agg(max("id")).head.get(0) match {
      case null => 0L
      case m    => m.asInstanceOf[Long] + 1L
    }
    val bloom = loadBloom()
    val base = buildNewRows(staged, Some(existing), offset, bloom)
    try {
      val nNew = base.count()
      if (nNew > 0) {
        // Fold the new keys into the persisted Bloom filter BEFORE the
        // essential rows publish (batch-sized driver work; capacity was
        // sized at snapshot time, so sustained appends degrade fpp
        // gracefully until the next compact()/writeVersion rebuilds
        // it). Ordering is load-bearing for crash-retry dedup: a bloom
        // that OVERAPPROXIMATES published texts only sends extra rows
        // to the confirm anti-join, but a crash after the essential
        // write with a stale bloom would make a retried batch MISS the
        // probe and skip the anti-join — re-ingesting every text.
        bloom.foreach { b =>
          val keys = base.where(col("text").isNotNull)
            .select(sha2(col("text"), 256).as("k"))
          // Fold executor-side: build the batch's keys into a filter
          // with the SAME creation params as the persisted one (from
          // the .meta sidecar) — identical (expectedNumItems, fpp)
          // yields identical numBits/numHashFunctions, so the bitwise
          // mergeInPlace is exact. The driver receives ONE bloom-sized
          // blob from the aggregate instead of every batch key — a
          // 100M-row ingest batch no longer pins the driver. Legacy
          // stores without the sidecar (or an incompatible merge) fall
          // back to the driver fold, which is correct at batch size.
          val merged = loadBloomParams() match {
            case Some((n, fpp)) =>
              try { b.mergeInPlace(keys.stat.bloomFilter("k", n, fpp)); true }
              catch { case _: Exception => false }
            case None => false
          }
          if (!merged)
            keys.collect().foreach(r => b.putString(r.getString(0)))
          writeBloom(manifest.version, b)
        }
        // Key-table append, also BEFORE any row publishes (the same
        // overapproximation discipline as the bloom fold): a phantom
        // (k, id) left by a crash here matches in confirmDups step 2
        // but fetches no essential row in step 3, so the retried batch
        // is re-admitted — while appending AFTER publish would let a
        // crash UNDERapproximate and re-ingest published texts as
        // duplicates. One batch-sized file per ingest; writeVersion
        // regenerates the sorted layout (compact() is the heal for
        // accumulated small key files too).
        if (fsFor(dedupKeysDir(manifest.version))
            .exists(hadoopPath(dedupKeysDir(manifest.version))))
          base.select(sha2(col("text"), 256).as("k"), col("id"))
            .write.mode("append").parquet(dedupKeysDir(manifest.version))
        payloadProjection(base)
          .write.mode("append").parquet(payloadDir(manifest.version))
        val added = essentialProjection(base)
        // Multi-vector mode: O(batch) chunk append, matching the chunk
        // table's layout (clustered iff the store is clustered).
        // Ordered BEFORE the essential append for the same reason
        // payload is: a crash here leaves orphan chunk rows for ids
        // that never published — invisible (searchMaxSim's enrichment
        // drops hits with no essential row) — and never publishes
        // searchable docs that silently have no chunks. A retried
        // batch re-appends the same chunk rows (duplicate n_chunks
        // until compact(), which rebuilds the chunk table — the same
        // heal as duplicate payload rows).
        val centroidModel = loadCentroids()
        def appendTo(df: DataFrame, dir: String): Unit = centroidModel match {
          case Some(model) =>
            df.withColumn("cluster", model.assignCol(col("vec")))
              .write.mode("append").partitionBy("cluster").parquet(dir)
          case None => df.write.mode("append").parquet(dir)
        }
        if (manifest.chunkSize > 0)
          appendTo(chunkRows(added), chunksDir(manifest.version))
        appendTo(added, essentialDir(manifest.version))
        // Staleness ledger: fold this batch's assignment distances
        // into the per-version sidecar (batch-sized agg + a tiny
        // overwrite — the same cost class as the bloom fold).
        centroidModel.foreach { model =>
          readIvfStats(manifest.version).foreach { case (base0, n0, s0) =>
            val r = added
              .withColumn("__c", model.assignCol(col("vec")))
              .withColumn("__d", model.distToCol(col("vec"), col("__c")))
              .agg(count(col("__d")).as("n"),
                sum(coalesce(col("__d"), lit(0.0))).as("s")).head
            val batchSum = if (r.isNullAt(1)) 0.0 else r.getDouble(1)
            writeIvfStats(manifest.version, base0,
              n0 + r.getLong(0), s0 + batchSum)
          }
        }
        manifest = manifest.copy(count = offset + nNew)
        writeManifest(spark, path, manifest)
      }
    } finally base.unpersist()
  }

  /** Re-layout the current snapshot (copy-on-write, same data): re-fit
    * IVF clustering when gated, range-sort the flat layout by id, and
    * merge the small files incremental appends accumulate. Also
    * reconciles after a crashed incremental append: duplicate payload
    * rows from a retried batch (same doc_id) collapse to one.
    *
    * Tuning lifecycle: if nprobe was ever tuned on this store
    * (manually or via the config gate) and the fresh snapshot didn't
    * get a curve from `tuneTargetRecall`, compact REPLAYS the last
    * recorded tuneNprobe params on the new clustering — a re-layout
    * must not silently demote searches from a measured-recall choice
    * to the static default. PQ is reported stale by [[tuningStale]]
    * instead (rebuilding its per-snapshot index is an explicit
    * [[buildPqIndex]] + [[tunePqCandidates]] decision). */
  def compact(): Unit = mutationLock.synchronized {
    writeVersion(
      essential.select("id", "text", "source", "category", "metadata_hash", "vec"),
      payload.dropDuplicates("doc_id"))
    readTuningHistory("nprobe").foreach { h =>
      val dir = s"${tuningDir(manifest.version)}/nprobe"
      if (manifest.nlist > 0 && !fsFor(dir).exists(hadoopPath(dir)))
        tuneNprobe(h.targetRecall, h.k, h.sampleQueries, h.settings, h.seed)
    }
  }

  /** Write a new snapshot version (optionally IVF-clustered), swap the
    * manifest pointer, prune old versions.
    *
    * `carriedChunks` (multi-vector mode): pre-embedded chunk rows
    * (id, vec) — already renumbered to the NEW snapshot's ids — that
    * replace the from-scratch chunk+embed rebuild. Mutation callers pass
    * the previous snapshot's chunk table carried through their delete/
    * renumber (see [[chunkCarry]]); None rebuilds from the essential
    * text (first build, compact(), chunk-config change). */
  private def writeVersion(essentialDf: DataFrame, payloadDf: DataFrame,
                           carriedChunks: Option[DataFrame] = None): Unit = {
    val v = manifest.version + 1
    val ess = essentialDf.cache()
    val count = ess.count()

    var modelOpt: Option[IvfIndex.Model] = None
    if (IvfIndex.shouldUseIvf(config.nlist, count)) {
      // config.nlist = -1 (AUTO) fits with nlist = 0, the IvfIndex
      // auto mode — the cluster count derives from the corpus via the
      // √n rule, and the manifest records the model's ACTUAL nlist
      // (nlistUsed below), so load/search/tune see a concrete value.
      val model = IvfIndex.fit(ess, "vec",
        if (config.nlist == -1) 0 else config.nlist)
      modelOpt = Some(model)
      // Within each cluster partition, sort by id so point lookups still
      // prune row groups on the id min/max statistics.
      ess.withColumn("cluster", model.assignCol(col("vec")))
        .sortWithinPartitions("cluster", "id")
        .write.mode("overwrite").partitionBy("cluster").parquet(essentialDir(v))
      import spark.implicits._
      model.centroids.zipWithIndex
        .map { case (c, i) => (i, c.toSeq) }.toDF("cluster", "centroid")
        .coalesce(1).write.mode("overwrite").parquet(centroidsDir(v))
      // Staleness baseline for incremental ingest: the fit-time mean
      // assignment distance (per-row k-means cost). Appends against
      // frozen centroids accumulate their own mean next to it; the
      // ratio is the drift gate (see needsCompaction). One extra agg
      // over the cached essential rows.
      val baseRow = ess
        .withColumn("__c", model.assignCol(col("vec")))
        .agg(avg(model.distToCol(col("vec"), col("__c"))).as("m")).head
      val baseline = if (baseRow.isNullAt(0)) 0.0 else baseRow.getDouble(0)
      writeIvfStats(v, baseline, 0L, 0.0)
    } else {
      // Range-partition + sort by id: each file covers a disjoint id
      // range, so getDocumentById/getDocumentsByIds read one file's row
      // groups instead of the whole store (parquet min/max pruning).
      // Partition count targets ~250k rows/file — snapshot writes are
      // where incremental-append small files get merged away.
      val nParts = math.max(1L, (count + 249999L) / 250000L).toInt
      ess.repartitionByRange(nParts, col("id"))
        .sortWithinPartitions("id")
        .write.mode("overwrite").parquet(essentialDir(v))
    }
    // Layout baseline for the small-files advisory: the data-file
    // count this fresh write produced (one listing; appends grow the
    // count from here, recommendCompaction compares against it).
    writeLayoutBaseline(v, countDataFiles(essentialDir(v)))
    payloadDf.write.mode("overwrite").parquet(payloadDir(v))
    // Ingest-dedup Bloom filter for the new snapshot: one narrow pass
    // over the (cached) essential rows; sized to the snapshot count.
    if (config.dedupBloomFpp > 0.0) {
      val expected = math.max(count, 1L)
      writeBloom(v, ess.select(sha2(col("text"), 256).as("k"))
        .stat.bloomFilter("k", expected, config.dedupBloomFpp))
      // Sidecar the creation params: incremental appends rebuild a
      // BATCH filter with the same (n, fpp) so the executor-side merge
      // is bit-compatible (see addDFIncremental).
      writeBloomMeta(v, expected, config.dedupBloomFpp)
      // Dedup key table, SORTED by sha: the Bloom-confirm path probes
      // it with an isin pushdown so parquet min/max skips every row
      // group without a probed key — per-ingest confirm cost is then
      // O(|maybe set|) row groups, corpus-independent (confirmDups).
      // ~72 B/row; ≤ 4M keys per range partition keeps row-group stats
      // selective.
      val kparts = math.max(1L, (count + 3999999L) / 4000000L).toInt
      ess.select(sha2(col("text"), 256).as("k"), col("id"))
        .repartitionByRange(kparts, col("k"))
        .sortWithinPartitions("k")
        .write.mode("overwrite").parquet(dedupKeysDir(v))
    }
    // Multi-vector mode: chunk VECTORS are data, not derived state —
    // mutation callers carry survivors through the delete/renumber
    // (`carriedChunks`) so a delete/upsert performs ZERO embedding
    // calls over the standing corpus (chunk text didn't change; only
    // ids did). Model inference is the dominant per-row cost with any
    // real embedder, and re-running it per mutation is exactly the
    // reference artifact SURVEY §3.3 rules out (index.py:404-440's
    // O(n) re-embed on delete). The from-scratch chunk+embed rebuild
    // runs only when no carry is possible: first build, compact()
    // (which is also the heal for crash-orphaned duplicate chunk rows,
    // same as for payload), or a chunk-config change. Cluster
    // assignment below is always recomputed against the NEW coarse
    // quantizer — that's vector arithmetic over carried vecs, not
    // embedding. Chunks are partitioned by the DOC-level coarse
    // quantizer when IVF is active (chunk vectors live in the same
    // metric space), which is what makes searchMaxSim's nprobe pruning
    // file-level.
    if (config.chunkSize > 0) {
      val ch = carriedChunks.getOrElse(chunkRows(ess))
      modelOpt match {
        case Some(model) =>
          ch.withColumn("cluster", model.assignCol(col("vec")))
            .sortWithinPartitions("cluster", "id")
            .write.mode("overwrite").partitionBy("cluster").parquet(chunksDir(v))
        case None =>
          ch.write.mode("overwrite").parquet(chunksDir(v))
      }
    }
    ess.unpersist()

    val nlistUsed = modelOpt.map(_.nlist).getOrElse(0)
    manifest = StoreManifest(v, embedder.dim, config.metric, count, nlistUsed,
      chunkSize = config.chunkSize,
      chunkOverlap = if (config.chunkSize > 0) config.chunkOverlap else 0,
      autoNlist = config.nlist == -1)
    writeManifest(spark, path, manifest)
    // Snapshot retention: keep the last `keepVersions` versions so
    // readers holding an older snapshot (a long job planned against
    // v-1) finish undisturbed — MVCC-style grace. Default 1 = prune
    // immediately after the pointer swap. The sweep probes only a
    // BOUNDED window below the cutoff (each write makes at most one new
    // version stale; earlier writes already swept everything older), so
    // per-mutation cost is O(window) filesystem calls, not O(total
    // versions) — a store at v10000 must not issue 10000 exists() RPCs
    // per write. The first write of this instance arms a directory-list
    // full sweep to collect strays left by a previous process's crash;
    // the +8 slack absorbs sweeps skipped by crashes since.
    val cutoff = v - config.keepVersions
    if (fullSweepArmed.getAndSet(false)) {
      val VDir = "v(\\d+)".r
      val fs = fsFor(path)
      if (fs.exists(hadoopPath(path))) fs.listStatus(hadoopPath(path)).foreach { st =>
        st.getPath.getName match {
          case VDir(n) if st.isDirectory && n.toLong <= cutoff =>
            fs.delete(st.getPath, true); ()
          case _ => ()
        }
      }
    } else {
      (math.max(1L, cutoff - 8) to cutoff).foreach { stale =>
        deleteDir(spark, versionDir(stale))
      }
    }
    // Measured-recall auto-tuning (opt-in): every IVF snapshot build
    // re-measures the nprobe/recall trade-off on the fresh clustering
    // and persists the curve; searches pick up the choice via
    // effectiveNprobe. Sample-sized work, but a real cost per build —
    // hence the explicit config gate.
    if (config.tuneTargetRecall > 0.0 && nlistUsed > 0)
      tuneNprobe(config.tuneTargetRecall)
    ()
  }

  // ------------------------------------------------------------------
  // Search (reference Q1-Q10: vectorstore.py:602-684, index.py:309-338,
  // retriever.py:157-316)
  // ------------------------------------------------------------------

  private def hadoopPath(s: String) = new Path(s)
  private def fsFor(s: String) =
    hadoopPath(s).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def writeBloom(v: Long, bloom: BloomFilter): Unit = {
    val out = fsFor(bloomPath(v)).create(hadoopPath(bloomPath(v)), true)
    try bloom.writeTo(out) finally out.close()
  }

  private def loadBloom(): Option[BloomFilter] = {
    val p = bloomPath(manifest.version)
    val fs = fsFor(p)
    if (!fs.exists(hadoopPath(p))) None
    else {
      val in = fs.open(hadoopPath(p))
      try Some(BloomFilter.readFrom(in)) finally in.close()
    }
  }

  /** The persisted bloom's creation params (`expectedNumItems fpp`),
    * written by [[writeBloomMeta]] at snapshot time. None for stores
    * written before the sidecar existed. */
  private def loadBloomParams(): Option[(Long, Double)] = {
    val p = bloomPath(manifest.version) + ".meta"
    val fs = fsFor(p)
    if (!fs.exists(hadoopPath(p))) None
    else {
      val in = fs.open(hadoopPath(p))
      try {
        val txt = scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
        val parts = txt.split("\\s+")
        Some((parts(0).toLong, parts(1).toDouble))
      } catch { case _: Exception => None }
      finally in.close()
    }
  }

  // --- layout baseline sidecar (small-files compaction advisory) -----

  private def layoutMetaPath(v: Long) = s"${versionDir(v)}/layout_files.meta"

  /** Count the `part-*` data files under `dir` (recursive — clustered
    * layouts nest them under partition dirs). One listing, no data IO. */
  private def countDataFiles(dir: String): Long = {
    val fs = fsFor(dir)
    if (!fs.exists(hadoopPath(dir))) 0L
    else {
      var files = 0L
      val it = fs.listFiles(hadoopPath(dir), true)
      while (it.hasNext) {
        if (it.next().getPath.getName.startsWith("part-")) files += 1
      }
      files
    }
  }

  private def writeLayoutBaseline(v: Long, files: Long): Unit = {
    val p = layoutMetaPath(v)
    val out = fsFor(p).create(hadoopPath(p), true)
    try out.write(files.toString.getBytes("UTF-8")) finally out.close()
  }

  private def readLayoutBaseline(v: Long): Option[Long] = {
    val p = layoutMetaPath(v)
    val fs = fsFor(p)
    if (!fs.exists(hadoopPath(p))) None
    else {
      val in = fs.open(hadoopPath(p))
      try Some(scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim.toLong)
      catch { case _: Exception => None }
      finally in.close()
    }
  }

  private def writeBloomMeta(v: Long, n: Long, fpp: Double): Unit = {
    val p = bloomPath(v) + ".meta"
    val out = fsFor(p).create(hadoopPath(p), true)
    try out.write(s"$n $fpp".getBytes("UTF-8")) finally out.close()
  }

  // ------------------------------------------------------------------
  // Lexical (BM25) index over the essential store — the keyword
  // complement to the vector index, persisted alongside the snapshot.
  // ------------------------------------------------------------------

  /** Build/refresh the persisted inverted index for the CURRENT
    * snapshot version (postings/df/stats under the version dir — see
    * TextSearch.writeIndex). Incremental appends after the build make
    * it stale; stale indexes are detected and bypassed, so building is
    * always safe and never required. */
  def buildLexicalIndex(numFiles: Int = 16): Unit = withSnapshot {
    // Pinned like buildPqIndex: the index write and its built_for
    // sidecar must land under the SAME version a concurrent mutation
    // can't swap between them.
    if (snap.count == 0) throw new IndexException("store is empty or not built")
    TextSearch.writeIndex(essential.select(col("id"), col("text")),
      "id", "text", lexicalDir(snap.version), numFiles)
    // Freshness sidecar: the STORE count at build time. The index's
    // own stats n_docs counts non-null-TEXT docs only (writeIndex
    // filters them), so comparing it to snap.count would brand a fresh
    // index permanently stale the moment one null-text doc exists.
    import spark.implicits._
    Seq(snap.count).toDF("store_count").coalesce(1)
      .write.mode("overwrite")
      .parquet(s"${lexicalDir(snap.version)}/built_for")
  }

  /** Build/refresh a product-quantization index for the CURRENT
    * snapshot: fit per-subspace codebooks (PqIndex.fit, m·ksub KMeans
    * centroids) on the stored vectors and persist codebooks + per-doc
    * codes under the version dir — the store-level FAISS IndexPQ
    * artifact. Codes are `m` small ints per doc (vs `dim` floats —
    * 32× smaller at m=8/dim=64), so the ADC prescreen scans a fraction
    * of the bytes the exact scan reads. Incremental appends make it
    * stale; stale indexes are detected and bypassed, so building is
    * always safe and never required.
    *
    * `rotate = true` builds the OPQ variant: a PCA rotation is fitted
    * first ([[PqIndex.fitRotation]] — parametric OPQ) and codebooks +
    * codes live in the ROTATED space, which balances per-subspace
    * variance and lifts prescreen recall at the same (m, ksub) budget
    * when corpus variance is concentrated (spec-measured in
    * PqIndexSpec). Search/tuning stay transparent: the persisted
    * rotation rotates only the QUERY for the ADC stage (driver-side,
    * O(d²) once per search); the exact rerank keeps original-space
    * vectors — rotations are orthonormal, so the ranks agree. */
  def buildPqIndex(m: Int = 8, ksub: Int = 16, seed: Long = 42L,
                   rotate: Boolean = false, fitFraction: Double = 1.0,
                   fitPartitions: Int = 0): Unit = withSnapshot {
    // withSnapshot pins ONE manifest for the whole build: the body
    // reads `essential` three to four times (rotation fit, PQ fit,
    // encode), and without the pin each read re-resolved the live
    // pointer — a concurrent mutation could yield a rotation fitted on
    // vN with codes encoded from vN+1, written into pqDir(vN) behind a
    // count-only freshness gate that still passed. `fitFraction`/
    // `fitPartitions` (FAISS-style sample training) reach both fits:
    // at corpus scale a full-fraction fit persists the whole vector
    // column twice and runs PCA over the corpus — the sample knob is
    // the documented scale posture and must be reachable from here.
    if (snap.count == 0) throw new IndexException("store is empty or not built")
    if (embedder.dim % m != 0) throw new IndexException(s"dim ${embedder.dim} not divisible by m=$m")
    val dir = pqDir(snap.version)
    import spark.implicits._
    val rotOpt =
      if (rotate) Some(PqIndex.fitRotation(essential, "vec", m,
        fitFraction = fitFraction, fitPartitions = fitPartitions, seed = seed))
      else None
    val (model, encodeInput) = rotOpt match {
      case Some(rot) =>
        val rotated = essential.withColumn("__rvec", rot.rotateCol(col("vec")))
        (PqIndex.fit(rotated, "__rvec", m, ksub, seed,
          fitFraction = fitFraction, fitPartitions = fitPartitions), rotated)
      case None =>
        (PqIndex.fit(essential, "vec", m, ksub, seed,
          fitFraction = fitFraction, fitPartitions = fitPartitions), essential)
    }
    // REBUILD discipline: the previous build's meta stays fresh-looking
    // for this whole rebuild (same snapshot, same n_docs), so a crash
    // between the first artifact write and the final meta write would
    // otherwise pair OLD codes with a NEW rotation (or rotated codes
    // with a deleted rotation) behind a passing freshness gate —
    // silently garbage ADC ranks. Invalidate meta FIRST (the lexical
    // index's _complete discipline): any torn state now reads as
    // absent and searches fall back to exact.
    DocumentStore.deleteDir(spark, s"$dir/meta")
    // Rotation state lands BEFORE meta (the freshness gate): a torn
    // build reads as absent, never as unrotated-codes-with-rotation or
    // vice versa. A plain rebuild over a previously-rotated index must
    // REMOVE the stale rotation, or loadPq would rotate queries against
    // unrotated codes — silently wrong ADC ranks.
    rotOpt match {
      case Some(rot) =>
        rot.rows.zipWithIndex.map { case (r, i) => (i, r) }
          .toDF("idx", "row")
          .coalesce(1).write.mode("overwrite").parquet(s"$dir/rotation")
      case None =>
        DocumentStore.deleteDir(spark, s"$dir/rotation")
    }
    val cbRows = for {
      (book, sub) <- model.codebooks.zipWithIndex
      (cent, code) <- book.zipWithIndex
    } yield (sub, code, cent)
    cbRows.toDF("sub", "code", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/codebooks")
    encodeInput.select(col("id"),
        model.encodeCol(
          col(if (rotate) "__rvec" else "vec"), roundScale = 4).as("codes"))
      .write.mode("overwrite").parquet(s"$dir/codes")
    Seq((snap.count, m, ksub))
      .toDF("n_docs", "m", "ksub")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/meta")
    // Opt-in measured-recall tuning: the PQ build ships with its
    // rerank-depth/recall curve (see tunePqCandidates).
    if (config.tuneTargetRecall > 0.0)
      tunePqCandidates(config.tuneTargetRecall)
    ()
  }

  // ------------------------------------------------------------------
  // Measured-recall ANN auto-tuning (round-8): recall is a measured
  // number, not a hope — completes the Eval story (ops/Eval.scala).
  // ------------------------------------------------------------------

  /** Deterministic query sample for tuning: every row whose seeded id
    * hash lands on a stride, capped at `n` — stable across runs and
    * partitionings, spread over the id range. */
  private def tuningSample(n: Int, seed: Long): Array[(Long, Seq[Double])] = {
    val stride = math.max(1L, snap.count / n)
    // Null vectors (null-text docs, which the store supports) can't be
    // queries; and the hash-stride filter can come back empty for tiny
    // n — fall back to the first n embeddable rows rather than NPE
    // inside a snapshot build.
    val base = essential.where(col("vec").isNotNull)
    val picked = base
      .where(pmod(abs(hash(col("id"), lit(seed.toInt))), lit(stride)) === 0)
      .select(col("id"), col("vec")).orderBy("id").limit(n)
      .collect()
    val rows =
      if (picked.nonEmpty) picked
      else base.select(col("id"), col("vec")).orderBy("id").limit(n).collect()
    if (rows.isEmpty) throw new IndexException(
      "tuning: store has no non-null vectors to sample")
    rows.map(r => (r.getLong(0), r.getSeq[Double](1)))
  }

  /** Exact top-k ids per sample query — ONE batched job (the ground
    * truth the approximate settings are scored against). */
  private def exactTopIds(sample: Array[(Long, Seq[Double])],
                          k: Int): DataFrame = {
    import spark.implicits._
    val queries = sample.toSeq.toDF("qid", "qv")
    VectorIndex.topKBatch(essential, "vec", queries, "qid", "qv", k,
        config.metric, scoreCol = "__s", tieBreak = Seq("id"), roundScale = 4)
      .select(col("qid"), col("id"))
  }

  /** Tune nprobe from a MEASURED recall target: sweep `candidates`
    * nprobe values over a seeded `sampleQueries`-query sample, score
    * each against the exact top-k ([[graft.ops.Eval.recallAtK]]), and
    * persist the (nprobe, mean recall, mean scanned-corpus fraction)
    * curve under the snapshot's `tuning/nprobe` dir — next to the
    * manifest, so the trade-off travels with the store. The cheapest
    * setting meeting `targetRecall` is marked `chosen` (the largest
    * candidate if none reaches it) and becomes [[effectiveNprobe]] —
    * every subsequent search on this snapshot uses it automatically.
    *
    * Cost: TWO batched scoring jobs total (exact ground truth, then
    * every (candidate, query) pair as one composite-id batch) plus a
    * cluster-size aggregate — sample-sized driver state only; adding
    * candidates widens the broadcast query side, it does not add jobs.
    * Runs automatically at IVF snapshot build when
    * `StoreConfig.tuneTargetRecall > 0`. */
  def tuneNprobe(targetRecall: Double = 0.95, k: Int = 10,
                 sampleQueries: Int = 20,
                 candidates: Seq[Int] = Seq(1, 2, 4, 8),
                 seed: Long = 42L): Seq[TuningPoint] = withSnapshot {
    if (snap.count == 0) throw new SearchException("store is empty or not built")
    require(targetRecall > 0.0 && targetRecall <= 1.0,
      s"targetRecall out of (0,1]: $targetRecall")
    val model = loadCentroids().getOrElse(throw new IndexException(
      "tuneNprobe requires an IVF store (nlist > 0 and enough rows)"))
    val cands = candidates.filter(_ >= 1).map(math.min(_, model.nlist))
      .distinct.sorted
    require(cands.nonEmpty, "no usable nprobe candidates")
    val sample = tuningSample(sampleQueries, seed)
    // Null-vec docs land under the null cluster partition — they are
    // unreachable by any probe, so they don't belong in the scan cost.
    val clusterSizes = essential.groupBy("cluster").count().collect()
      .filter(!_.isNullAt(0)).map(r => r.getInt(0) -> r.getLong(1)).toMap
    // Denominator = REACHABLE rows (sum of non-null cluster sizes), not
    // snap.count: null-vec docs are excluded from the numerator's probe
    // sums, and counting them below would make costFraction understate
    // the scan and never reach 1.0 even when every cluster is probed.
    val total = math.max(clusterSizes.values.sum, 1L).toDouble
    import spark.implicits._
    // The WHOLE sweep is ONE batched scoring job: every (candidate
    // nprobe, sample query) pair becomes a composite query id with its
    // own probe set, so the cost is |settings|·|sample| broadcast query
    // rows against one corpus scan — not one job per setting (at a
    // handful of fixed-overhead jobs each, the job count, not the
    // work, dominated the sweep).
    def cqid(np: Int, qid: Long): Long = (np.toLong << 40) | qid
    require(sample.forall(_._1 < (1L << 40)),
      "tuning sample id exceeds the composite-id range (2^40)")
    val exactRows = exactTopIds(sample, k).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val exact2 = cands.flatMap(np =>
      exactRows.map { case (q, id) => (cqid(np, q), id) }).toDF("qid", "id")
    val probedAll = cands.flatMap { np =>
      sample.map { case (qid, qv) =>
        (cqid(np, qid), qv, model.nearestCentroids(qv, np))
      }
    }
    val approx = VectorIndex.topKBatch(essential, "vec",
        probedAll.toDF("qid", "qv", "__probes"),
        "qid", "qv", k, config.metric, scoreCol = "__s",
        tieBreak = Seq("id"), roundScale = 4,
        keep = Some(expr("array_contains(__probes, cluster)")))
      .select(col("qid"), col("id"))
    val perQuery = graft.ops.Eval.recallAtK(exact2, approx, "qid", "id")
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    val points = cands.map { np =>
      val recalls = sample.map { case (qid, _) =>
        perQuery.getOrElse(cqid(np, qid), 0.0) }
      val recall = recalls.sum / recalls.length
      val frac = sample.map { case (qid, qv) =>
        model.nearestCentroids(qv, np)
          .map(p => clusterSizes.getOrElse(p, 0L)).sum / total
      }.sum / sample.length
      (np, math.rint(recall * 10000) / 10000.0,
        math.rint(frac * 10000) / 10000.0)
    }
    val chosenNp = points.find(_._2 >= targetRecall).map(_._1)
      .getOrElse(points.last._1)
    val curve = points.map { case (np, r, f) =>
      TuningPoint(np, r, f, chosen = np == chosenNp)
    }
    writeCurve("nprobe", curve)
    tuningCache.put(snap.version, Some(chosenNp))
    writeTuningHistory("nprobe", targetRecall, k, sampleQueries, seed, candidates)
    curve
  }

  /** Persist a tuning curve under the snapshot's tuning dir (the
    * parquet twin of [[tuningCurve]]'s reader). */
  private def writeCurve(kind: String, curve: Seq[TuningPoint]): Unit = {
    import spark.implicits._
    curve.toDF().withColumnRenamed("costFraction", "cost_fraction")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"${tuningDir(snap.version)}/$kind")
  }

  /** Tune the PQ rerank depth the same way: for each depth d =
    * factor·k, approx top-k = exact rerank of the d best ADC
    * candidates; the curve (depth, mean recall, rerank fraction d/N)
    * is persisted under `tuning/pq`. The scan side is the persisted
    * codes table; per query the top max-depth ADC candidates (with
    * their exact vectors) come back to the driver ONCE, so the depth
    * sweep is driver arithmetic — |sample| bounded jobs total. The
    * chosen depth is recorded in the curve AND adopted: a
    * [[similaritySearchPq]] call that doesn't pass `candidates` uses it
    * via [[effectivePqCandidates]], symmetric with [[effectiveNprobe]].
    * Requires [[buildPqIndex]] for the current snapshot. */
  def tunePqCandidates(targetRecall: Double = 0.95, k: Int = 10,
                       sampleQueries: Int = 20,
                       depthFactors: Seq[Int] = Seq(2, 4, 8),
                       seed: Long = 42L): Seq[TuningPoint] = withSnapshot {
    if (snap.count == 0) throw new SearchException("store is empty or not built")
    require(targetRecall > 0.0 && targetRecall <= 1.0,
      s"targetRecall out of (0,1]: $targetRecall")
    val (pqModel, codes, pqRot) = loadPq().getOrElse(throw new IndexException(
      "tunePqCandidates requires a fresh buildPqIndex for this snapshot"))
    val depths = depthFactors.filter(_ >= 1).map(f =>
      math.min(f.toLong * k, snap.count).toInt).distinct.sorted
    require(depths.nonEmpty, "no usable rerank depths")
    val sample = tuningSample(sampleQueries, seed)
    val exactIds = exactTopIds(sample, k).collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    val maxDepth = depths.max
    val higherBetter = config.metric != "l2"
    // One job per sample query: top max-depth ADC candidates joined to
    // their exact vectors (depth-bounded collect).
    val perQuery = sample.map { case (qid, qv) =>
      // Rotated (OPQ) index: ADC against rotated codes needs the
      // rotated query; the recall ground truth (exactTopIds) and the
      // rerank scores below stay original-space, as in search.
      val qAdc = pqRot.map(_.applyVec(qv).toSeq).getOrElse(qv)
      val top = codes
        .withColumn("__am", pqModel.adcMicrosCol(col("codes"), qAdc, roundScale = 4))
        // null ADC = null-codes (null-vec) doc: never a result, and
        // ASC NULLS FIRST would rank it ahead of every real candidate
        // (then NPE at getLong). Same null discipline as
        // similaritySearchPq's prescreen.
        .where(col("__am").isNotNull)
        .orderBy(col("__am"), col("id")).limit(maxDepth)
        .join(essential.select(col("id"), col("vec")), Seq("id"))
        .where(col("vec").isNotNull)
        .select(col("id"), col("__am"), col("vec")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Double](2)))
        .sortBy(t => (t._2, t._1))
      (qid, qv, top)
    }
    def scoreOf(a: Seq[Double], b: Seq[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var l2 = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i)
        val d = a(i) - b(i); l2 += d * d; i += 1
      }
      val raw = config.metric match {
        case "cosine" => dot / math.sqrt(na * nb)
        case "ip"     => dot
        case _        => math.sqrt(l2)
      }
      // A zero-norm vector under cosine gives NaN (BigDecimal(NaN)
      // would throw); rank it strictly worst, mirroring the engine's
      // usable() gate that drops unusable scores from results.
      if (raw.isNaN) { if (higherBetter) Double.NegativeInfinity else Double.PositiveInfinity }
      else BigDecimal(raw).setScale(4, scala.math.BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val points = depths.map { d =>
      val recalls = perQuery.map { case (qid, qv, top) =>
        val rerank = top.take(d)
          .map { case (id, _, v) => (id, scoreOf(qv, v)) }
          .sortBy { case (id, s) => (if (higherBetter) -s else s, id) }
          .take(k).map(_._1).toSet
        val truth = exactIds.getOrElse(qid, Set.empty)
        if (truth.isEmpty) 1.0 else rerank.intersect(truth).size.toDouble / truth.size
      }
      val recall = math.rint(recalls.sum / recalls.length * 10000) / 10000.0
      val frac = math.rint(d / snap.count.toDouble * 10000) / 10000.0
      (d, recall, frac)
    }
    val chosenD = points.find(_._2 >= targetRecall).map(_._1)
      .getOrElse(points.last._1)
    val curve = points.map { case (d, r, f) =>
      TuningPoint(d, r, f, chosen = d == chosenD)
    }
    writeCurve("pq", curve)
    pqTuningCache.put(snap.version, Some(chosenD))
    writeTuningHistory("pq", targetRecall, k, sampleQueries, seed, depthFactors)
    curve
  }

  /** The persisted tuning curve for the current snapshot (`"nprobe"` or
    * `"pq"`), if a tuning pass has written one. */
  def tuningCurve(kind: String): Option[Seq[TuningPoint]] = {
    val dir = s"${tuningDir(snap.version)}/$kind"
    if (!fsFor(dir).exists(hadoopPath(dir))) None
    else Some(spark.read.parquet(dir).orderBy("setting").collect()
      .map(r => TuningPoint(r.getAs[Int]("setting"), r.getAs[Double]("recall"),
        r.getAs[Double]("cost_fraction"), r.getAs[Boolean]("chosen"))).toSeq)
  }

  // ------------------------------------------------------------------
  // Tuning lifecycle across mutations (round-10): curves live in the
  // VERSION dir (staleness-by-construction — a mutation orphans them),
  // but the PARAMS of the last explicit tuning pass live in a
  // store-level sidecar that survives version pruning. That is what
  // lets compact() replay the measurement on the fresh layout, and
  // what lets tuningStale REPORT (instead of silently reverting to
  // static defaults) on snapshots whose curve a mutation dropped.
  // ------------------------------------------------------------------
  private def tuningHistoryDir(kind: String) = s"$path/tuning_last/$kind"

  private case class TuneParams(version: Long, targetRecall: Double, k: Int,
                                sampleQueries: Int, seed: Long, settings: Seq[Int])

  private def writeTuningHistory(kind: String, targetRecall: Double, k: Int,
                                 sampleQueries: Int, seed: Long,
                                 settings: Seq[Int]): Unit = {
    import spark.implicits._
    Seq((snap.version, targetRecall, k, sampleQueries, seed, settings))
      .toDF("version", "target_recall", "k", "sample_queries", "seed", "settings")
      .coalesce(1).write.mode("overwrite").parquet(tuningHistoryDir(kind))
  }

  private def readTuningHistory(kind: String): Option[TuneParams] = {
    val dir = tuningHistoryDir(kind)
    if (!fsFor(dir).exists(hadoopPath(dir))) None
    else try {
      spark.read.parquet(dir).collect().headOption.map(r => TuneParams(
        r.getAs[Long]("version"), r.getAs[Double]("target_recall"),
        r.getAs[Int]("k"), r.getAs[Int]("sample_queries"),
        r.getAs[Long]("seed"), r.getSeq[Int](r.fieldIndex("settings"))))
    } catch {
      // mode("overwrite") is delete-then-write, so a crash can leave
      // the dir present with no readable parquet; tuningStale is
      // documented as safe to poll after every mutation, and compact()
      // reads this — a torn sidecar must read as ABSENT (the _complete
      // discipline), not brick every compact until a manual rm.
      case _: org.apache.spark.sql.AnalysisException => None
    }
  }

  /** Forget the recorded last-tuning params for `"nprobe"` or `"pq"`
    * — the opt-out for a store that deliberately abandoned a tuned
    * index (otherwise [[tuningStale]] keeps reporting it). */
  def clearTuningHistory(kind: String): Unit =
    deleteDir(spark, tuningHistoryDir(kind))

  /** Reason-coded tuning staleness — the mutation-side complement of
    * the adoption rule: a tuned nprobe/PQ depth applies only to the
    * snapshot it was measured on, so any mutation silently drops
    * searches back to the static defaults. Each entry names a kind
    * whose LAST tuning pass (recorded params sidecar) predates the
    * current snapshot and whose current snapshot has no fresh curve:
    * `nprobe(tuned_at=v3, current=v5)`. Fixes: [[compact]] re-tunes
    * nprobe automatically from the recorded params; PQ needs
    * [[buildPqIndex]] + [[tunePqCandidates]] (the index itself is
    * per-snapshot — auto-rebuilding it would silently re-add its full
    * encode cost to every compact, so it stays explicit);
    * [[clearTuningHistory]] opts out. Empty = nothing stale. Flat
    * (non-IVF) snapshots skip the nprobe entry — no probe pruning to
    * tune. */
  def tuningStale: Seq[String] = withSnapshot {
    Seq("nprobe", "pq").flatMap { kind =>
      readTuningHistory(kind) match {
        case Some(h) if h.version < snap.version &&
            (kind != "nprobe" || snap.nlist > 0) &&
            !fsFor(s"${tuningDir(snap.version)}/$kind")
              .exists(hadoopPath(s"${tuningDir(snap.version)}/$kind")) =>
          Some(s"$kind(tuned_at=v${h.version}, current=v${snap.version})")
        case _ => None
      }
    }
  }

  // (version -> tuned nprobe) memo: one tiny parquet read per snapshot,
  // not per search; a mutation bumps the version, so staleness is
  // impossible by construction (same doctrine as the centroid cache).
  private val tuningCache =
    scala.collection.concurrent.TrieMap.empty[Long, Option[Int]]
  private def tunedNprobe(v: Long): Option[Int] =
    tuningCache.getOrElseUpdate(v, {
      val dir = s"${tuningDir(v)}/nprobe"
      if (!fsFor(dir).exists(hadoopPath(dir))) None
      else spark.read.parquet(dir).where(col("chosen"))
        .select("setting").collect().headOption.map(_.getInt(0))
    })

  /** The nprobe searches actually use: the measured-recall choice when
    * a tuning pass has run on this snapshot, else the static config. */
  def effectiveNprobe: Int = tunedNprobe(snap.version).getOrElse(config.nprobe)

  // (version -> tuned PQ rerank depth) memo — the PQ twin of
  // tunedNprobe, same staleness-by-construction doctrine (a mutation
  // bumps the version; the new version has no curve until re-tuned).
  private val pqTuningCache =
    scala.collection.concurrent.TrieMap.empty[Long, Option[Int]]
  private def tunedPqDepth(v: Long): Option[Int] =
    pqTuningCache.getOrElseUpdate(v, {
      val dir = s"${tuningDir(v)}/pq"
      if (!fsFor(dir).exists(hadoopPath(dir))) None
      else spark.read.parquet(dir).where(col("chosen"))
        .select("setting").collect().headOption.map(_.getInt(0))
    })

  /** The PQ rerank depth a no-argument [[similaritySearchPq]] uses:
    * the measured-recall choice when [[tunePqCandidates]] has run on
    * this snapshot, else the static default (100) — the adoption twin
    * of [[effectiveNprobe]], so both tuned knobs apply symmetrically. */
  def effectivePqCandidates: Int =
    tunedPqDepth(snap.version).getOrElse(DefaultPqCandidates)

  // ------------------------------------------------------------------
  // Centroid-staleness gate (round-8): incremental appends assign new
  // rows to FROZEN centroids, so the partition layout drifts as the
  // data does. The gate compares appended rows' mean assignment
  // distance to the fit-time baseline — one tiny sidecar per version.
  // ------------------------------------------------------------------

  private def writeIvfStats(v: Long, baseline: Double,
                            appendedN: Long, appendedSum: Double): Unit = {
    import spark.implicits._
    Seq((baseline, appendedN, appendedSum))
      .toDF("baseline_mean", "appended_n", "appended_sum")
      .coalesce(1).write.mode("overwrite").parquet(ivfStatsDir(v))
  }

  private def readIvfStats(v: Long): Option[(Double, Long, Double)] = {
    val dir = ivfStatsDir(v)
    if (!fsFor(dir).exists(hadoopPath(dir))) None
    else {
      val r = spark.read.parquet(dir).head
      Some((r.getDouble(0), r.getLong(1), r.getDouble(2)))
    }
  }

  /** Appended-rows drift: mean assignment distance of rows added by
    * [[addDFIncremental]] since the last snapshot fit, as a RATIO to
    * the fit-time baseline. None when nothing was appended (or the
    * store is flat / predates the gate). ~1.0 = appends look like the
    * fitted data; growing ratio = the frozen centroids no longer
    * describe what is being ingested. */
  def centroidDriftRatio: Option[Double] = withSnapshot {
    readIvfStats(snap.version).flatMap { case (baseline, n, sum) =>
      if (n == 0L) None
      else {
        val appendedMean = sum / n
        Some(
          if (baseline > 0.0) appendedMean / baseline
          else if (appendedMean > 0.0) Double.PositiveInfinity
          else 1.0)
      }
    }
  }

  /** The staleness gate: true when incremental ingest has drifted past
    * `driftThreshold` × the fit baseline — time to [[compact]] (which
    * re-fits the centroids on ALL current rows, resetting both the
    * baseline and the appended ledger, so the flag clears itself). */
  def needsCompaction(driftThreshold: Double = 1.25): Boolean = {
    require(driftThreshold > 0.0, "driftThreshold must be positive")
    centroidDriftRatio.exists(_ > driftThreshold)
  }

  /** Reason-coded compaction advisory — the operational superset of
    * [[needsCompaction]] (which gates on centroid drift alone).
    * Incremental appends degrade a snapshot in three independent ways;
    * each returned string names one detected condition:
    *  - `centroid-drift(ratio=r)` — appended rows' mean assignment
    *    distance vs the fit-time baseline exceeds `driftThreshold`
    *    (recall of nprobe-pruned searches erodes);
    *  - `small-files(files=n, baseline=b)` — the essential layout
    *    holds more than max(2×, +8) the data files the snapshot write
    *    itself produced (recorded in a per-version sidecar at write
    *    time); every append lands new unsorted files, and scan task
    *    count + footer overhead grow with them;
    *  - `bloom-capacity(count=n, sized_for=m)` — the live count
    *    exceeds `bloomSlack` × the dedup Bloom's creation capacity, so
    *    its fpp has degraded past the design point and ingest batches
    *    pay more confirm anti-join traffic;
    *  - `tuning-stale(kind(tuned_at=vK, current=vN))` — a measured
    *    nprobe/PQ tuning choice was dropped by a mutation and searches
    *    silently run at static defaults (see [[tuningStale]]).
    * Empty = nothing to recommend. [[compact]] resolves the first
    * three (re-fit + re-layout + Bloom rebuild at the current count)
    * and the nprobe half of the fourth (it replays the recorded
    * tuning); a stale PQ curve needs [[buildPqIndex]] +
    * [[tunePqCandidates]]. Cost: the drift sidecar read, ONE recursive
    * directory listing, the Bloom .meta sidecar, and two tiny tuning
    * sidecar reads — no data scan, safe to poll after every append. */
  def recommendCompaction(driftThreshold: Double = 1.25,
                          bloomSlack: Double = 2.0): Seq[String] = withSnapshot {
    require(driftThreshold > 0.0, "driftThreshold must be positive")
    require(bloomSlack >= 1.0, "bloomSlack must be >= 1.0")
    val reasons = scala.collection.mutable.ArrayBuffer.empty[String]
    centroidDriftRatio.filter(_ > driftThreshold).foreach { r =>
      reasons += f"centroid-drift(ratio=$r%.3f)"
    }
    val files = countDataFiles(essentialDir(snap.version))
    if (files > 0) {
      // Baseline = the file count the snapshot write itself produced
      // (sidecar written by writeVersion); legacy versions without one
      // fall back to the fresh-write estimate (ceil(count/250k) range
      // files, or >= one per cluster for IVF). The absolute +8 slack
      // keeps tiny stores from flagging after a couple of appends.
      val baseline = readLayoutBaseline(snap.version).getOrElse(
        math.max(math.max(1L, (snap.count + 249999L) / 250000L),
          snap.nlist.toLong))
      if (files > math.max(2L * baseline, baseline + 8L))
        reasons += s"small-files(files=$files, baseline=$baseline)"
    }
    loadBloomParams().foreach { case (sizedFor, _) =>
      if (snap.count > bloomSlack * sizedFor)
        reasons += s"bloom-capacity(count=${snap.count}, sized_for=$sizedFor)"
    }
    reasons ++= tuningStale.map(s => s"tuning-stale($s)")
    reasons.toSeq
  }

  /** The persisted PQ index for the current version, if present AND
    * fresh (its meta row records the indexed n_docs). */
  /** Load the persisted PQ artifact for the pinned snapshot: the
    * codebook model, the codes table, and — when the index was built
    * with `rotate = true` — the OPQ rotation, which consumers apply to
    * the QUERY before any ADC against these (rotated-space) codes. */
  private def loadPq(): Option[(PqIndex.Model, DataFrame,
      Option[PqIndex.MatrixRotation])] = {
    val dir = pqDir(snap.version)
    val metaDir = s"$dir/meta"
    if (!fsFor(metaDir).exists(hadoopPath(metaDir))) None
    else {
      val meta = spark.read.parquet(metaDir).head
      if (meta.getAs[Long]("n_docs") != snap.count) None
      else {
        val books = spark.read.parquet(s"$dir/codebooks")
          .orderBy("sub", "code").collect()
          .groupBy(_.getAs[Int]("sub")).toSeq.sortBy(_._1)
          .map(_._2.sortBy(_.getAs[Int]("code"))
            .map(_.getSeq[Double](2).toIndexedSeq).toIndexedSeq)
          .toIndexedSeq
        val rotDir = s"$dir/rotation"
        val rot =
          if (!fsFor(rotDir).exists(hadoopPath(rotDir))) None
          else Some(PqIndex.MatrixRotation(
            spark.read.parquet(rotDir).orderBy("idx").collect()
              .map(_.getSeq[Double](1).toIndexedSeq).toIndexedSeq))
        Some((PqIndex.Model(books), spark.read.parquet(s"$dir/codes"), rot))
      }
    }
  }

  /** Approximate top-k served from the persisted PQ index: the ADC
    * prescreen ranks the CODES table (m integer lookups per row, no
    * float math, 32× fewer bytes than the vector scan), the surviving
    * `candidates` ids fetch their exact vectors via the id-sorted
    * layout's min/max pruning, and the exact metric reranks to k —
    * recall < 1 by construction, `candidates` is the knob. Absent or
    * stale index falls back to exact [[similaritySearch]] (same output
    * shape, so callers can't break on staleness).
    *
    * `candidates <= 0` (the default) means AUTO: use the measured
    * rerank depth [[tunePqCandidates]] chose for this snapshot when its
    * curve is fresh, else the static default — the same adoption rule
    * as [[effectiveNprobe]]. An explicit positive value always wins.
    * Either way the depth is clamped to ≥ k: a tuned depth was measured
    * at the TUNING-time k (default 10), so a later search with a larger
    * k must not be starved below k candidates — and its measured recall
    * does not transfer to that larger k (the exact rerank still makes
    * the returned k best-of-depth). */
  def similaritySearchPq(query: String, k: Int = 4,
                         candidates: Int = 0): DataFrame = withSnapshot {
    if (snap.count == 0) throw new SearchException("store is empty or not built")
    val depth = math.max(k,
      if (candidates > 0) candidates else effectivePqCandidates)
    loadPq() match {
      case None => similaritySearch(query, k)
      case Some((model, codes, rot)) =>
        val qv = embedder.embedQuery(query)
        // OPQ index: codes live in rotated space — the ADC query must
        // too. The exact rerank below stays in ORIGINAL space (the
        // rotation is orthonormal; ranks agree, and the returned
        // similarity is the plain-metric number callers expect).
        val qAdc = rot.map(_.applyVec(qv.toSeq).toSeq).getOrElse(qv.toSeq)
        val candIds = codes
          .withColumn("adc", model.adcMicrosCol(col("codes"), qAdc, 4))
          // null adc = null codes = null-vec doc: it can never be a
          // result, and ASC NULLS FIRST would let such rows consume
          // the whole candidate budget before any real row.
          .where(col("adc").isNotNull)
          .orderBy(col("adc"), col("id"))
          .limit(depth)
          .select("id").collect().map(_.getLong(0))
        val cand = essential.where(col("id").isin(candIds: _*))
        VectorIndex.topK(cand, "vec", qv.toSeq, k, config.metric,
            scoreCol = "similarity", tieBreak = Seq("id"))
          .select(col("id").as("doc_id"), col("text"), col("source"),
            col("category"), col("similarity"),
            lit("essential").as("metadata_type"))
    }
  }

  /** BM25 score set for the query terms: served from the persisted
    * index when one exists AND covers exactly the current document
    * count (its stats row records the indexed n_docs — incremental
    * appends since the build make it stale and force the scan path).
    * Index-backed and scan-time scores are bit-identical, so callers
    * cannot observe which path ran. */
  private def lexicalScores(queryTerms: Seq[String]): DataFrame = {
    val dir = lexicalDir(snap.version)
    // Freshness = the store count recorded at build time (the
    // `built_for` sidecar) still matches: incremental appends since
    // the build bump the count and force the scan path. Legacy indexes
    // without the sidecar fall back to the stats n_docs compare (which
    // is exact only for all-non-null-text stores — the sidecar exists
    // because stats counts only docs writeIndex could tokenize).
    val builtForDir = s"$dir/built_for"
    val statsDir = s"$dir/stats"
    // Completeness first: a crash mid-writeIndex leaves new postings
    // next to stale df/stats (silently wrong scores); the _complete
    // marker is removed before any data write, so a torn index reads
    // as absent here and the scan path serves instead. An index written
    // BEFORE the marker existed is indistinguishable from a torn
    // rebuild (neither has the marker), so it also reads as absent:
    // scores stay correct via the scan path, but such stores pay the
    // full BM25 scan until buildLexicalIndex is re-run once — a
    // documented perf-only upgrade step, never a wrong answer.
    val fresh = TextSearch.indexComplete(spark, dir) && {
      if (fsFor(builtForDir).exists(hadoopPath(builtForDir)))
        spark.read.parquet(builtForDir).head.getLong(0) == snap.count
      else fsFor(statsDir).exists(hadoopPath(statsDir)) && {
        spark.read.parquet(statsDir).head.getAs[Double]("n_docs").toLong ==
          snap.count
      }
    }
    if (fresh) TextSearch.searchIndexScores(spark, dir, queryTerms)
    else TextSearch.bm25Scores(essential.select(col("id"), col("text")),
      "id", "text", queryTerms)
  }

  /** Diversified top-k (maximal marginal relevance) — the
    * `max_marginal_relevance_search` of the LangChain VectorStore
    * surface: fetch `fetchK` candidates from the (IVF-prunable) search
    * space, then greedily trade relevance against redundancy with
    * weight `lambdaParam`. Returns the essential projection with the
    * MMR rank and the query similarity. */
  def maxMarginalRelevanceSearch(query: String, k: Int = 4,
                                 fetchK: Int = 20,
                                 lambdaParam: Double = 0.5): DataFrame = withSnapshot {
    if (snap.count == 0) throw new SearchException("store is empty or not built")
    val qv = embedder.embedQuery(query)
    val sel = VectorIndex.mmr(searchSpace(qv), "vec", qv.toSeq, k, fetchK,
      lambdaParam, config.metric, idCol = "id")
    val ids = sel.select("id").collect().map(_.getLong(0))
    attachEssential(sel, ids.toSeq)
      .orderBy("rank")
      .select(col("id").as("doc_id"), col("rank"), col("text"),
        col("source"), col("category"), col("qsim").as("similarity"),
        lit("essential").as("metadata_type"))
  }

  /** Keyword top-k over the store (BM25), the lexical sibling of
    * [[similaritySearch]]: returns (doc_id, text, source, category,
    * score, metadata_type). Uses the persisted index when fresh. */
  def searchLexical(queryTerms: Seq[String], k: Int = 4): DataFrame = withSnapshot {
    if (snap.count == 0) throw new SearchException("store is empty or not built")
    val hits = lexicalScores(queryTerms)
      .orderBy(col("score").desc, col("id")).limit(k).collect()
    import spark.implicits._
    val hitsDf = hits.map(r => (r.getLong(0), r.getDouble(1)))
      .toSeq.toDF("id", "score")
    attachEssential(hitsDf, hits.map(_.getLong(0)).toSeq)
      .orderBy(col("score").desc, col("id"))
      .select(col("id").as("doc_id"), col("text"), col("source"),
        col("category"), col("score"), lit("essential").as("metadata_type"))
  }

  /** Late-interaction (ColBERT-style max-sim) top-k over the persisted
    * chunk table: a document scores as its BEST chunk against the
    * query, so long documents whose relevant passage is buried are
    * found where single-vector pooling dilutes them. Multi-vector mode
    * only (StoreConfig.chunkSize > 0).
    *
    * Composition mirrors [[hybridSearch]]'s building blocks: the
    * IVF-prunable chunk space (nprobe nearest clusters of the DOC-level
    * coarse quantizer → partition pruning on the chunk table) →
    * [[graft.index.VectorIndex.maxSimTopK]] (per-doc best-chunk partial
    * aggregate + TakeOrdered, no window, no join) → k-row payload
    * enrichment ([[searchLexical]]'s broadcast shape). Returns
    * (doc_id, text, source, category, similarity, n_chunks,
    * metadata_type); `n_chunks` is the doc's chunk count in the scored
    * space. */
  def searchMaxSim(query: String, k: Int = 4,
                   includeFullMetadata: Boolean = false): DataFrame = withSnapshot {
    if (snap.count == 0) throw new SearchException("store is empty or not built")
    if (snap.chunkSize <= 0) throw new SearchException(
      "store is not multi-vector: build with StoreConfig.chunkSize > 0")
    val qv = embedder.embedQuery(query)
    val chunks = spark.read.parquet(chunksDir(snap.version))
    val space = loadCentroids() match {
      case Some(model) =>
        val probes = model.nearestCentroids(qv.toSeq, effectiveNprobe)
        chunks.where(col("cluster").isin(probes: _*))
      case None => chunks
    }
    val hits = VectorIndex.maxSimTopK(space, "id", "vec", qv.toSeq, k,
        config.metric)
      .withColumnRenamed("score", "similarity")
      .collect()
    import spark.implicits._
    val hitsDf = hits.map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
      .toSeq.toDF("id", "similarity", "n_chunks")
    val enriched = attachEssential(hitsDf, hits.map(_.getLong(0)).toSeq)
      .orderBy(VectorIndex.ranking(config.metric, "similarity", Seq("id")): _*)
      .select(col("id").as("doc_id"), col("text"), col("source"),
        col("category"), col("similarity"), col("n_chunks"),
        lit("essential").as("metadata_type"))
    if (includeFullMetadata) enhanceWithFullMetadata(enriched) else enriched
  }

  // Centroids are persisted per snapshot version, so the in-memory copy
  // is memoized under (path, version): search-many pays the parquet
  // read + collect once per snapshot instead of once per query, and a
  // mutation (version bump) gets fresh centroids with NO manual
  // invalidation — the versioned key IS the invalidation.
  private def loadCentroids(): Option[IvfIndex.Model] =
    if (snap.nlist > 0) {
      Some(IvfIndex.modelCached(s"$path#centroids", snap.version) {
        val rows = spark.read.parquet(centroidsDir(snap.version))
          .orderBy("cluster").collect()
        IvfIndex.Model(rows.map(r =>
          r.getSeq[Double](r.fieldIndex("centroid")).toIndexedSeq).toIndexedSeq)
      })
    } else None

  /** Search-space DataFrame for a query vector: IVF-pruned (nprobe
    * nearest clusters → partition pruning) when clustered, full scan
    * otherwise. */
  private def searchSpace(qv: Array[Double]): DataFrame =
    loadCentroids() match {
      case Some(model) =>
        // effectiveNprobe: the measured-recall tuning choice when a
        // tuning pass has run on this snapshot (see tuneNprobe).
        val probes = model.nearestCentroids(qv.toSeq, effectiveNprobe)
        essential.where(col("cluster").isin(probes: _*))
      case None => essential
    }

  /** Top-k semantic search (reference Q1/Q4). Returns a DataFrame of
    * (doc_id, text, source, category, similarity, metadata_type
    * [, metadata]); `similarity` follows the reference's raw-score
    * semantics (higher=better for cosine/ip, distance for l2). */
  def similaritySearch(query: String, k: Int = 4,
                       includeFullMetadata: Boolean = false,
                       filter: Option[org.apache.spark.sql.Column] = None): DataFrame = withSnapshot {
    if (snap.count == 0) throw new SearchException("store is empty or not built")
    val qv = embedder.embedQuery(query)
    // Metadata-filtered ANN (the `filter` arg of the LangChain
    // similarity_search surface): the predicate lands on the scored
    // scan BEFORE top-k selection — pre-filtering, so the result is
    // exactly "top-k among matching docs", never k minus casualties —
    // and pushes into the parquet read where the columns allow.
    val space = filter.foldLeft(searchSpace(qv))((df, f) => df.where(f))
    val hits = VectorIndex.topK(
        space, "vec", qv.toSeq, k, config.metric,
        scoreCol = "similarity", tieBreak = Seq("id"))
      .select(col("id").as("doc_id"), col("text"), col("source"),
        col("category"), col("similarity"),
        lit("essential").as("metadata_type"))
    if (includeFullMetadata) enhanceWithFullMetadata(hits) else hits
  }

  /** Q2 (vectorstore.py:659-684): hits as typed (SearchHit, score)
    * pairs — the score IS the similarity column, single source of
    * truth. */
  def similaritySearchWithScore(query: String, k: Int = 4): Seq[(SearchHit, Double)] =
    similaritySearch(query, k).collect().toSeq
      .map(rowToHit).map(h => (h, h.similarity))

  /** Radius variant of [[similaritySearch]]: every document within the
    * similarity threshold (>= for cosine/ip, distance <= for l2) —
    * result size is data-dependent; pure scan + filter over the
    * (IVF-pruned) search space, no sort or limit. */
  def similaritySearchRadius(query: String, threshold: Double,
                             includeFullMetadata: Boolean = false): DataFrame = withSnapshot {
    if (snap.count == 0) throw new SearchException("store is empty or not built")
    val qv = embedder.embedQuery(query)
    val hits = VectorIndex.radiusSearch(
        searchSpace(qv), "vec", qv.toSeq, threshold, config.metric,
        scoreCol = "similarity")
      .select(col("id").as("doc_id"), col("text"), col("source"),
        col("category"), col("similarity"),
        lit("essential").as("metadata_type"))
    if (includeFullMetadata) enhanceWithFullMetadata(hits) else hits
  }

  /** Approximate top-k via a binary sign-bit prescreen: 63-bit codes
    * derived on the (IVF-pruned) scan collapse each vector to one long
    * — a 64× cheaper compare — Hamming-nearest `candidates` survive,
    * and the exact metric reranks them to k. Recall < 1 by
    * construction; raise `candidates` to trade scan cost for recall.
    * Sign codes approximate ANGLE, so this serves cosine/ip; for l2
    * it falls back to exact [[similaritySearch]]. Composable with IVF:
    * the prescreen runs over the nprobe-pruned search space. */
  def similaritySearchApprox(query: String, k: Int = 4,
                             candidates: Int = 100): DataFrame = withSnapshot {
    if (snap.count == 0) throw new SearchException("store is empty or not built")
    if (!VectorFunctions.higherIsBetter(config.metric))
      similaritySearch(query, k)
    else {
      val qv = embedder.embedQuery(query)
      val qbits = qv.take(63).zipWithIndex.foldLeft(0L) {
        case (acc, (x, j)) => if (x > 0.0) acc | (1L << j) else acc
      }
      val cand = searchSpace(qv)
        .withColumn("hamming", VectorFunctions.hammingDistance(
          VectorFunctions.binarySign63(col("vec")), lit(qbits)).cast("int"))
        // null hamming = null-vec doc: never a result, and ASC NULLS
        // FIRST would let such rows starve the candidate budget.
        .where(col("hamming").isNotNull)
        .orderBy(col("hamming"), col("id"))
        .limit(candidates)
      VectorIndex.topK(cand, "vec", qv.toSeq, k, config.metric,
          scoreCol = "similarity", tieBreak = Seq("id"))
        .select(col("id").as("doc_id"), col("text"), col("source"),
          col("category"), col("similarity"),
          lit("essential").as("metadata_type"))
    }
  }

  /** Predicate delete — the Spark-natural generalization of the
    * reference's by-id/by-text deletes: remove every document whose
    * ESSENTIAL row matches `condition` (e.g. `col("category") ===
    * "spam"`), with the same copy-on-write snapshot + dense id
    * recompaction semantics as [[deleteByIds]]. Fully distributed: the
    * matching id set flows through a semijoin, never the driver (a
    * broad predicate can match hundreds of millions of rows). Returns
    * the number of documents removed. */
  def deleteWhere(condition: org.apache.spark.sql.Column): Long = mutationLock.synchronized {
    if (manifest.count == 0) throw new IndexException("store is empty or not built")
    val doomedIds = essential.where(condition).select("id")
    val removed = doomedIds.count()
    if (removed == 0) return 0L
    val survivorsE = essential.join(doomedIds, Seq("id"), "left_anti")
    // Whole-store wipe is decided by SURVIVORS being empty, never by
    // `removed >= manifest.count`: crash-orphaned essential rows (ids
    // >= manifest.count, see addDFIncremental) can inflate the match
    // count past the live total, and the count-based test would then
    // drop() surviving documents — silent data loss.
    if (survivorsE.isEmpty) { drop(); return removed }
    val survivorsP = payload.join(
      doomedIds.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left_anti")
    // Old id retained through the renumbering for the multi-vector
    // chunk carry — see deleteByIds for the caching rationale.
    val chunked = manifest.chunkSize > 0
    val reKeyed = withDenseId(
      survivorsE.withColumnRenamed("id", "__old_id").orderBy("__old_id"), "id")
    val reBase = if (chunked)
      reKeyed.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    else reKeyed
    val reE = reBase.select("id", "text", "source", "category", "metadata_hash", "vec")
    val reP = withDenseId(survivorsP.orderBy("doc_id").drop("doc_id"), "doc_id")
      .select("doc_id", "text", "metadata", "payload_json")
    try writeVersion(reE, reP, chunkCarry(reBase.select("__old_id", "id")))
    finally if (chunked) { reBase.unpersist(); () }
    removed
  }

  /** All queries in ONE distributed job (replaces the reference's
    * sequential Retriever.batch loop, retriever.py:110-155). Output adds
    * (query, rank).
    *
    * On an IVF store the batch prunes like single search: the scan is
    * filtered to the UNION of every query's nprobe clusters (partition
    * pruning — files outside any query's probes are never read), and a
    * per-(doc, query) probe-membership predicate restricts each query's
    * ranking to ITS clusters, so batch and single-query results agree
    * exactly. */
  def similaritySearchBatch(queries: Seq[String], k: Int = 4): DataFrame = withSnapshot {
    if (snap.count == 0) throw new SearchException("store is empty or not built")
    import spark.implicits._
    // Distinct queries: a duplicated query string would score every doc
    // once per copy and interleave duplicate rows inside its own top-k.
    val embedded = queries.distinct.map(q => (q, embedder.embedQuery(q).toSeq))
    val (docs, qdf, keep) = loadCentroids() match {
      case Some(model) =>
        // effectiveNprobe everywhere a probe set is computed: batch
        // and single-query search MUST prune identically or the
        // documented batch==single parity breaks under tuning.
        val withProbes = embedded.map { case (q, qv) =>
          (q, qv, model.nearestCentroids(qv, effectiveNprobe))
        }
        val union = withProbes.flatMap(_._3).distinct
        (essential.where(col("cluster").isin(union: _*)),
          withProbes.toDF("query", "qv", "probes"),
          Some(array_contains(col("probes"), col("cluster"))))
      case None =>
        (essential, embedded.toDF("query", "qv"), None)
    }
    VectorIndex.topKBatch(docs, "vec", qdf, "query", "qv", k,
        config.metric, scoreCol = "similarity", tieBreak = Seq("id"),
        keep = keep)
      .select(col("query"), col("rank"), col("id").as("doc_id"), col("text"),
        col("source"), col("category"), col("similarity"),
        lit("essential").as("metadata_type"))
  }

  /** Hybrid retrieval over the store: BM25 keyword relevance on the
    * essential text fused with dense vector search by reciprocal-rank
    * fusion (TextSearch.hybridRrf) — the lexical+semantic combination
    * production RAG stacks run. For l2 the vector score is negated
    * before fusion so "higher = better" holds for the rank; the rrf
    * column is the fused score. The k fused ids are materialized
    * driver-side and pushed into the essential scan as an isin filter
    * (same scale shape as full-metadata enrichment: predicate pushdown
    * reads only k rows, which become the broadcast build side). */
  def hybridSearch(query: String, queryTerms: Seq[String], k: Int = 4,
                   perSourceK: Int = 50, rrfK: Int = 60): DataFrame = withSnapshot {
    if (snap.count == 0) throw new SearchException("store is empty or not built")
    val qv = embedder.embedQuery(query)
    val vecScores = VectorIndex.topK(searchSpace(qv), "vec", qv.toSeq,
        perSourceK, config.metric, scoreCol = "score", tieBreak = Seq("id"))
      .select(col("id"), col("score"))
    val vecForFuse =
      if (VectorFunctions.higherIsBetter(config.metric)) vecScores
      else vecScores.withColumn("score", -col("score"))
    val bmScores = lexicalScores(queryTerms)
    val fused = TextSearch.hybridRrf(bmScores, vecForFuse, "id",
      perSourceK, rrfK, k).collect()
    import spark.implicits._
    val fusedDf = fused.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getDouble(3))).toSeq.toDF("id", "rank_keyword", "rank_vector", "rrf")
    attachEssential(fusedDf, fused.map(_.getLong(0)).toSeq)
      .orderBy(col("rrf").desc, col("id"))
      .select(col("id").as("doc_id"), col("text"), col("source"),
        col("category"), col("rrf"), col("rank_keyword"), col("rank_vector"),
        lit("essential").as("metadata_type"))
  }

  /** Shared k-row enrichment: attach (text, source, category) from the
    * essential store to a driver-materialized hit frame keyed by `id`.
    * The id set pushes into the essential scan as an `isin` filter
    * (parquet pruning reads only the matching row groups) and the k-row
    * result is the broadcast build side. INNER join on purpose: a hit
    * id with no essential row can only be a crash-orphan (e.g. chunk
    * rows whose batch never published — see addDFIncremental), and
    * surfacing it as a null-text result would be worse than one
    * short-of-k response in a crash window. One definition for every
    * search surface, so a fix here fixes them all. */
  private def attachEssential(hitsDf: DataFrame, ids: Seq[Long]): DataFrame = {
    val matching = essential
      .where(col("id").isin(ids: _*))
      .select(col("id"), col("text"), col("source"), col("category"))
    hitsDf.join(broadcast(matching), Seq("id"), "inner")
  }

  /** Full-metadata enrichment (reference Q6,
    * vectorstore.py:782-813). Scale shape: the hit ids (k rows) are
    * collected driver-side — exactly the reference's positional lookups
    * — and pushed into the payload scan as an `isin` filter (parquet
    * predicate pushdown), so only the k matching payload rows are read;
    * those are then the BUILD side of the broadcast join. (Broadcasting
    * the hits themselves would be ignored: Spark cannot build the
    * stream-preserved left side of a LEFT OUTER join.) */
  private def enhanceWithFullMetadata(hits: DataFrame): DataFrame = {
    // Materialize the k hit rows: an orderBy.limit subquery left under a
    // join is fragile (downstream limit pushdown can compose with it and
    // surface rows outside the top-k — see SparkEntry.qEnrichmentJoin).
    val hitRows = hits.drop("metadata_type").collect()
    val local = spark.createDataFrame(
      spark.sparkContext.parallelize(hitRows.toIndexedSeq, 1),
      hits.drop("metadata_type").schema)
    val ids = hitRows.map(_.getAs[Long]("doc_id")).toIndexedSeq
    val matching = payload
      .where(col("doc_id").isin(ids: _*))
      .select(col("doc_id"), col("metadata"))
    local.join(broadcast(matching), Seq("doc_id"), "left")
      .withColumn("metadata_type",
        when(col("metadata").isNotNull, lit("full")).otherwise(lit("essential")))
  }

  /** Point lookup by id (reference Q7, retriever.py:258-316). */
  def getDocumentById(id: Long, includeFullMetadata: Boolean = false): Option[SearchHit] = {
    // An empty store has no v-dir to read: the point lookup answers
    // "not found" (None) instead of leaking a path-not-found error.
    if (currentManifest.count == 0) return None
    val df = getDocumentsByIds(Seq(id), includeFullMetadata)
    df.collect().headOption.map(rowToHit)
  }

  /** Set lookup — one semijoin job, not a loop (reference Q8 loops Q7,
    * retriever.py:372-394). Empty store: typed SearchException like
    * every other DataFrame-returning read (there is no version dir to
    * derive an empty frame's schema from). */
  def getDocumentsByIds(ids: Seq[Long], includeFullMetadata: Boolean = false): DataFrame = withSnapshot {
    if (snap.count == 0) throw new SearchException("store is empty or not built")
    val base = essential.where(col("id").isin(ids: _*))
      .select(col("id").as("doc_id"), col("text"), col("source"),
        col("category"), lit(0.0).as("similarity"),
        lit("essential").as("metadata_type"))
    if (includeFullMetadata) enhanceWithFullMetadata(base) else base
  }

  private def rowToHit(r: Row): SearchHit = SearchHit(
    r.getAs[Long]("doc_id"), r.getAs[String]("text"),
    Option(r.getAs[String]("source")), Option(r.getAs[String]("category")),
    r.getAs[Double]("similarity"), r.getAs[String]("metadata_type"))

  // ------------------------------------------------------------------
  // Delete (reference D1-D7: vectorstore.py:290-412, index.py:347-440)
  // ------------------------------------------------------------------

  /** Delete by ids; returns false on empty input, throws on invalid ids
    * (reference delete matrix, tests/test_index.py:162-261). Ids are
    * recompacted to 0..n-1 afterwards (index.py:433-435). Deleting the
    * last document removes the store (vectorstore.py:482-490). */
  def deleteByIds(ids: Seq[Long]): Boolean = mutationLock.synchronized {
    if (ids.isEmpty) return false
    if (manifest.count == 0) throw new IndexException("store is empty or not built")
    val bad = ids.filter(i => i < 0 || i >= manifest.count)
    if (bad.nonEmpty) throw new IndexException(s"invalid ids: ${bad.mkString(",")} (count=${manifest.count})")

    import spark.implicits._
    val idsDf = ids.toDF("id")
    val survivorsE = essential.join(broadcast(idsDf), Seq("id"), "left_anti")
    val survivorsP = payload.join(
      broadcast(idsDf.withColumnRenamed("id", "doc_id")), Seq("doc_id"), "left_anti")

    if (manifest.count - ids.distinct.length <= 0) { drop(); return true }

    // Dense id reassignment preserving order (index.py:433-435). The
    // old id rides along as __old_id: multi-vector stores use the
    // old→new map to carry surviving chunk vectors instead of
    // re-embedding the corpus (see chunkCarry). Cached when chunked —
    // the essential write and the carry join both consume the
    // renumbering, and ONE materialization guarantees they see the
    // same assignment.
    val chunked = manifest.chunkSize > 0
    val reKeyed = withDenseId(
      survivorsE.withColumnRenamed("id", "__old_id").orderBy("__old_id"), "id")
    val reBase = if (chunked)
      reKeyed.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    else reKeyed
    val reE = reBase.select("id", "text", "source", "category", "metadata_hash", "vec")
    val reP = withDenseId(survivorsP.orderBy("doc_id").drop("doc_id"), "doc_id")
      .select("doc_id", "text", "metadata", "payload_json")
    try writeVersion(reE, reP, chunkCarry(reBase.select("__old_id", "id")))
    finally if (chunked) { reBase.unpersist(); () }
    true
  }

  /** Delete by texts — only the FIRST (lowest-id) occurrence per text is
    * deleted, reference semantics (index.py:389-393). */
  def deleteByTexts(texts: Seq[String]): Boolean = mutationLock.synchronized {
    // The whole resolve-then-delete runs under the (re-entrant)
    // mutation lock: ids are POSITIONAL and densely recompacted by
    // every mutation, so resolving them outside the lock opens a
    // TOCTOU window in which a concurrent delete re-numbers the store
    // and the inner deleteByIds removes the WRONG documents.
    if (texts.isEmpty) return false
    if (manifest.count == 0) throw new IndexException("store is empty or not built")
    import spark.implicits._
    val tdf = texts.distinct.toDF("text")
    val firstIds = essential.join(broadcast(tdf), Seq("text"), "left_semi")
      .groupBy("text").agg(min("id").as("id"))
      .select("id").as[Long].collect()
    if (firstIds.isEmpty) false else deleteByIds(firstIds.toSeq)
  }

  // ------------------------------------------------------------------
  // Async API parity (reference I4: aadd_texts / aadd_documents /
  // asimilarity_search / adelete, vectorstore.py:227-252, :272-288,
  // :913-1007 — thread-pool wrappers there, Future wrappers here).
  // Spark job submission is already thread-safe; mutations serialize on
  // the store's own snapshot swap. These exist for surface parity and
  // for interleaving searches with driver-side work.
  // ------------------------------------------------------------------

  def addTextsAsync(texts: Seq[String], metadatas: Seq[Map[String, String]] = Nil)(
      implicit ec: scala.concurrent.ExecutionContext): scala.concurrent.Future[Seq[String]] =
    scala.concurrent.Future(addTexts(texts, metadatas))

  def similaritySearchAsync(query: String, k: Int = 4)(
      implicit ec: scala.concurrent.ExecutionContext)
      : scala.concurrent.Future[Seq[(SearchHit, Double)]] =
    scala.concurrent.Future(similaritySearchWithScore(query, k))

  def deleteByIdsAsync(ids: Seq[Long])(
      implicit ec: scala.concurrent.ExecutionContext): scala.concurrent.Future[Boolean] =
    scala.concurrent.Future(deleteByIds(ids))

  /** Upsert by text identity: documents whose text matches an existing
    * store row are REPLACED (the incoming metadata wins); new texts
    * append. The ingest path's exact-text dedup would silently DROP a
    * re-ingested text (first occurrence wins, index.py:202-218) —
    * upsert is the "latest wins" complement. Only the FIRST (lowest-id)
    * occurrence per matching text is replaced, mirroring
    * [[deleteByTexts]]; ids recompact exactly as any delete does.
    *
    * Atomicity: the whole merge — anti-join out the replaced rows,
    * recompact survivor ids, build the incoming batch at the survivor
    * offset — is ONE copy-on-write version under ONE lock acquisition.
    * There is no intermediate "deleted but not yet re-added" published
    * state for a crash to expose or a concurrent async mutation to
    * interleave into (the lock is re-entrant, so the empty-store /
    * pure-append delegations to [[addTexts]] stay atomic too). */
  def upsertTexts(texts: Seq[String],
                  metadatas: Seq[Map[String, String]] = Nil): Seq[String] = mutationLock.synchronized {
    if (!(metadatas.isEmpty || metadatas.length == texts.length)) throw new IngestException(
      s"texts/metadatas length mismatch: ${texts.length} vs ${metadatas.length}")
    if (manifest.count == 0) return addTexts(texts, metadatas)
    import spark.implicits._
    val tdf = texts.distinct.toDF("text")
    val firstIds = essential.join(broadcast(tdf), Seq("text"), "left_semi")
      .groupBy("text").agg(min("id").as("id"))
      .select("id").as[Long].collect().toSeq
    if (firstIds.isEmpty) return addTexts(texts, metadatas) // pure append
    val idsDf = firstIds.toDF("id")
    val survivorsE = essential.join(broadcast(idsDf), Seq("id"), "left_anti")
    val survivorsP = payload.join(
      broadcast(idsDf.withColumnRenamed("id", "doc_id")), Seq("doc_id"), "left_anti")
    // Dense-id recompaction of the survivors (delete semantics,
    // index.py:433-435), then the incoming batch builds at the
    // survivor-count offset — same dedup-vs-store as any ingest, now
    // against the survivors (later duplicate copies of a matched text
    // still win over the incoming row, as in the composed form). The
    // persisted Bloom is NOT passed: it still contains the just-replaced
    // texts, and correctness here needs the exact anti-join anyway.
    // CACHED like buildNewRows' base and writeVersion's ess: the
    // recompaction pipeline (anti-join + global orderBy + zipWithIndex)
    // is consumed at least three times — the survivor count, the
    // dedup anti-join inside buildNewRows, and the snapshot write —
    // and uncached it would re-scan the corpus each time.
    val reBase = withDenseId(
      survivorsE.withColumnRenamed("id", "__old_id").orderBy("__old_id"), "id")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val reE = reBase.select("id", "text", "source", "category", "metadata_hash", "vec")
    val reP = withDenseId(survivorsP.orderBy("doc_id").drop("doc_id"), "doc_id")
      .select("doc_id", "text", "metadata", "payload_json")
    val metas = if (metadatas.isEmpty) Seq.fill(texts.length)(Map.empty[String, String]) else metadatas
    val staged = texts.zip(metas).toDF("text", "metadata")
    // Offset = ACTUAL survivor count (recompacted ids are dense
    // 0..n-1): deriving it from manifest.count would collide with the
    // recompacted ids when crash-orphaned rows inflate the on-disk row
    // count past the manifest (see appendBuild). Counting reE (not
    // survivorsE) also forces the cache before its other consumers.
    val survivorCount = reE.count()
    val base = buildNewRows(staged, Some(reE), survivorCount)
    // Multi-vector carry: survivors' chunk vectors travel through the
    // old→new id map un-re-embedded; only the INCOMING batch's chunks
    // are embedded (its text may differ from anything replaced).
    val carrySurv = chunkCarry(reBase.select("__old_id", "id"))
    try {
      if (base.isEmpty) writeVersion(reE, reP, carrySurv) // publish just the deletes
      else writeVersion(reE.unionByName(essentialProjection(base)),
        reP.unionByName(payloadProjection(base)),
        carrySurv.map(_.unionByName(chunkRows(essentialProjection(base)))))
    } finally { base.unpersist(); reBase.unpersist(); () }
    texts.indices.map(_.toString)
  }

  /** Remove the entire store from disk (reference empty-store removal,
    * vectorstore.py:482-490). */
  def drop(): Unit = mutationLock.synchronized {
    deleteDir(spark, path)
    manifest = StoreManifest(0L, embedder.dim, config.metric, 0L, config.nlist)
    // A rebuild at this path restarts versions at 1, so every
    // version-keyed cache for the old generation must go: the global
    // centroid cache (keyed (path, version) — a collision would prune
    // searches with the DEAD corpus's centroids) and this instance's
    // tuned-nprobe memo.
    DocumentStore.invalidateModelCaches(path)
    tuningCache.clear()
    pqTuningCache.clear()
  }

  // ------------------------------------------------------------------
  // Stats (reference S1-S4: vectorstore.py:815-879, index.py:590-607)
  // ------------------------------------------------------------------

  def frameMappingStats: FrameMappingStats = withSnapshot {
    if (snap.count == 0) FrameMappingStats(0, -1, -1, 0.0)
    else {
      val r = payload.agg(
        count(col("doc_id")).as("n"), min("doc_id").as("lo"), max("doc_id").as("hi")
      ).collect()(0)
      val n = r.getAs[Long]("n")
      val span = r.getAs[Long]("hi") - r.getAs[Long]("lo") + 1
      FrameMappingStats(n, r.getAs[Long]("lo"), r.getAs[Long]("hi"),
        if (span > 0) 100.0 * n / span else 0.0)
    }
  }

  def storageStats: StorageStats = withSnapshot {
    StorageStats(
      snap.count,
      dirSize(spark, payloadDir(snap.version)),
      dirSize(spark, essentialDir(snap.version)),
      frameMappingStats)
  }

  /** Integrity audit: recompute each document's `metadata_hash` from
    * the PAYLOAD store's metadata and compare to the token stored in
    * the essential store at ingest. The reference computes and persists
    * this hash (index.py:224-226) but never re-checks it — this is the
    * consumption side. One full-outer hash-join on doc_id; both sides
    * are narrow projections, so the audit cost is one shuffle of
    * (id, hash) pairs, not the corpus payloads.
    *
    * Statuses: `ok` (hashes agree), `mismatch` (payload metadata no
    * longer hashes to the stored token — corruption or out-of-band
    * edit), `missing_payload` (essential row with no payload row —
    * broken store), `orphan_payload` (payload row with no essential
    * row — harmless leftover of a crashed incremental append; compact()
    * removes them). Filter `status != 'ok'` for the defect list. */
  def verifyIntegrity(): DataFrame = withSnapshot {
    if (snap.count == 0) throw new StorageException("store is empty or not built")
    // Presence is tracked with explicit side flags, NOT hash nullness:
    // a doc ingested with a null metadata map has a null hash on BOTH
    // sides and is healthy — using the hash as a join-miss sentinel
    // would flag it orphan_payload forever (and compact() would never
    // clear the alarm).
    val stored = essential.select(col("id").as("doc_id"),
      col("metadata_hash").as("stored_hash"))
      .withColumn("__has_essential", lit(true))
    val recomputed = payload.select(col("doc_id"),
      DocumentStore.metadataHashCol(col("metadata")).as("computed_hash"))
      .withColumn("__has_payload", lit(true))
    stored.join(recomputed, Seq("doc_id"), "full_outer")
      .withColumn("status",
        when(col("__has_essential").isNull, lit("orphan_payload"))
          .when(col("__has_payload").isNull, lit("missing_payload"))
          .when(col("stored_hash") <=> col("computed_hash"), lit("ok"))
          .otherwise(lit("mismatch")))
      .drop("__has_essential", "__has_payload")
  }
}

object DocumentStore {

  /** Static PQ rerank depth when no measured curve exists for the
    * snapshot — see [[DocumentStore.similaritySearchPq]]. */
  val DefaultPqCandidates: Int = 100

  /** Bound on the driver-collected probe sets of the Bloom-confirm
    * path (distinct maybe shas; candidate ids) — ~64 B per sha, so the
    * cap holds the confirm's driver state under ~10 MB. Batches whose
    * maybe set exceeds it are dominated by duplicates, where
    * corpus-sized confirm work is inherent — they fall back to the
    * plain exact anti-join. */
  val MaxConfirmKeys: Int = 100000

  /** Byte budget for driver-collecting (and broadcasting) the
    * Bloom-confirm candidate TEXTS: [[MaxConfirmKeys]] bounds row
    * count, not bytes, and a dup-heavy batch of megabyte documents
    * would otherwise OOM the driver (or trip maxResultSize) through
    * the broadcast's collect. Measured with a bounded pruned
    * octet_length aggregate BEFORE collecting; over-budget confirms
    * use an executor-side join instead. */
  val MaxConfirmTextBytes: Long = 64L << 20

  /** Bound on probe values pushed as a parquet In filter (the
    * Bloom-confirm key probe and id fetch). The pushed In compiles to
    * an or-CHAIN of equalities whose recursive evaluation overflows
    * the task thread's stack once the chain is deep enough — measured
    * on this Spark: 768 string equalities SOE a COLD JVM every run,
    * 512 pass; after JIT compilation shrinks the frames, 1000+ pass,
    * so warm measurements are not evidence of safety. 256 leaves a 2×
    * margin below the worst observed cliff (the margin matters: real
    * confirm plans sit deeper in the call stack than the bare-scan
    * harness that measured it). Probe sets larger than this switch to
    * a broadcast-join probe — no row-group pruning, but a shuffle-free
    * columnar scan bounded by the thin key table, never the corpus. */
  val SafeInProbe: Int = 256

  /** The store's metadata integrity token (reference index.py:224-226):
    * sha256 over the key-sorted JSON rendering of the metadata map.
    * ONE definition shared by ingest (buildNewRows), the audit
    * ([[DocumentStore.verifyIntegrity]]), and the oracle-checked
    * q_integrity_check query — the recipe can't drift between the
    * producer and the checker. */
  def metadataHashCol(metadata: Column): Column =
    sha2(to_json(map_from_entries(array_sort(map_entries(metadata)))), 256)

  /** Drop every global version-keyed cache entry for a store path —
    * called whenever a path's version history restarts (drop, factory
    * rebuild), because generation 2's v1 would otherwise alias
    * generation 1's cached centroids. */
  private[store] def invalidateModelCaches(path: String): Unit =
    IvfIndex.invalidateCached(s"$path#centroids")

  /** Factory: construct + ingest (reference from_texts,
    * vectorstore.py:881-911). */
  def fromTexts(
      spark: SparkSession, path: String,
      texts: Seq[String], metadatas: Seq[Map[String, String]] = Nil,
      config: StoreConfig = StoreConfig(), embedder: Embedder): DocumentStore = {
    val store = new DocumentStore(spark, path, config, embedder)
    if (readManifest(spark, path).isDefined) {
      deleteDir(spark, path)
      // New generation at an existing path: versions restart at 1, so
      // the old generation's (path, version)-keyed centroid cache
      // entries would silently serve the DEAD corpus's centroids.
      invalidateModelCaches(path)
    }
    store.manifest = StoreManifest(0L, embedder.dim, config.metric, 0L, config.nlist)
    store.addTexts(texts, metadatas)
    store
  }

  /** Factory from Documents (reference from_documents,
    * vectorstore.py:945-975). */
  def fromDocuments(
      spark: SparkSession, path: String, docs: Seq[Doc],
      config: StoreConfig = StoreConfig(), embedder: Embedder): DocumentStore =
    fromTexts(spark, path, docs.map(_.text), docs.map(_.metadata), config, embedder)

  /** Async factory twins (reference afrom_texts/afrom_documents,
    * vectorstore.py:914-943 — thread-pool wrappers there, Future
    * wrappers here, same posture as the instance async API). The
    * returned Future completes when the store is fully built and
    * published. */
  def fromTextsAsync(
      spark: SparkSession, path: String,
      texts: Seq[String], metadatas: Seq[Map[String, String]] = Nil,
      config: StoreConfig = StoreConfig(), embedder: Embedder)(
      implicit ec: scala.concurrent.ExecutionContext)
      : scala.concurrent.Future[DocumentStore] =
    scala.concurrent.Future(fromTexts(spark, path, texts, metadatas, config, embedder))

  def fromDocumentsAsync(
      spark: SparkSession, path: String, docs: Seq[Doc],
      config: StoreConfig = StoreConfig(), embedder: Embedder)(
      implicit ec: scala.concurrent.ExecutionContext)
      : scala.concurrent.Future[DocumentStore] =
    scala.concurrent.Future(fromDocuments(spark, path, docs, config, embedder))

  /** Factory from a (text, metadata) DataFrame — the 100TB-scale entry
    * point: data never touches the driver. */
  def fromDF(
      spark: SparkSession, path: String, staged: DataFrame,
      config: StoreConfig = StoreConfig(), embedder: Embedder): DocumentStore = {
    val store = new DocumentStore(spark, path, config, embedder)
    if (readManifest(spark, path).isDefined) {
      deleteDir(spark, path)
      invalidateModelCaches(path) // see fromTexts
    }
    store.manifest = StoreManifest(0L, embedder.dim, config.metric, 0L, config.nlist)
    store.addDF(staged)
    store
  }

  /** Restore a persisted store (reference IndexManager.load,
    * index.py:637-670): manifest carries dim/metric — dim mismatch with
    * the supplied embedder is rejected like the reference's
    * dimension-from-index check (index.py:660-661). */
  def load(spark: SparkSession, path: String, embedder: Embedder,
           config: StoreConfig = StoreConfig()): DocumentStore = {
    val m = readManifest(spark, path).getOrElse(
      throw new StorageException(s"no store manifest at $path"))
    if (m.dim != embedder.dim) throw new IndexException(
      s"embedder dim ${embedder.dim} != stored dim ${m.dim}")
    // Restore STORED index parameters, not the caller's defaults: a
    // reloaded IVF store whose config said nlist=0 would silently write
    // its next snapshot flat (searches keep working off manifest.nlist,
    // which makes the clustering loss invisible until it's gone). Same
    // for multi-vector mode: a reloaded chunked store must keep writing
    // its chunk table on mutation.
    new DocumentStore(spark, path,
      // auto_nlist restores the AUTO config (-1), not the fitted count:
      // a reloaded auto store must keep re-deriving its cluster count
      // as the corpus grows (freezing at the first fit's value is the
      // measured r15 x100 cliff). Search still reads the fitted value
      // from the snapshot manifest.
      config.copy(metric = m.metric,
        nlist = if (m.autoNlist) -1 else m.nlist.toInt,
        chunkSize = m.chunkSize, chunkOverlap = m.chunkOverlap), embedder)
  }

  // ---------------- manifest + fs helpers ----------------

  private val ManifestName = "MANIFEST.json"

  private[store] def readManifest(spark: SparkSession, path: String): Option[StoreManifest] = {
    val p = new Path(s"$path/$ManifestName")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def readParsed(f: Path): Option[StoreManifest] = {
      val in = fs.open(f)
      val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
      Some(parseManifest(txt))
    }
    if (fs.exists(p)) readParsed(p)
    else {
      // Crash window of writeManifest's delete+rename: if the .tmp was
      // fully written and closed before the swap began, it IS the
      // manifest. But a crash mid-write of the very FIRST manifest (no
      // dst yet) leaves a PARTIAL .tmp — so the fallback only trusts a
      // .tmp that parses; garbage means no store was ever published,
      // and the correct answer is "absent", not a parse exception.
      val tmp = new Path(s"$path/.$ManifestName.tmp")
      if (!fs.exists(tmp)) None
      else try readParsed(tmp)
      catch { case scala.util.control.NonFatal(_) => None }
    }
  }

  private[store] def writeManifest(spark: SparkSession, path: String, m: StoreManifest): Unit = {
    val dir = new Path(path)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dir)) fs.mkdirs(dir)
    val tmp = new Path(s"$path/.$ManifestName.tmp")
    val out = fs.create(tmp, true)
    try out.write(renderManifest(m).getBytes("UTF-8")) finally out.close()
    val dst = new Path(s"$path/$ManifestName")
    // Pointer swap (reference's shutil.move, vectorstore.py:563-581).
    // delete+rename isn't atomic on every FS: readManifest heals the
    // crash window by falling back to the fully-written .tmp file.
    if (fs.exists(dst)) fs.delete(dst, false)
    if (!fs.rename(tmp, dst)) throw new StorageException(s"manifest rename failed: $tmp -> $dst")
  }

  private[store] def renderManifest(m: StoreManifest): String =
    s"""{"version":${m.version},"dim":${m.dim},"metric":"${m.metric}","count":${m.count},"nlist":${m.nlist},"chunk_size":${m.chunkSize},"chunk_overlap":${m.chunkOverlap},"auto_nlist":${m.autoNlist}}"""

  private[store] def parseManifest(s: String): StoreManifest = {
    def longOf(k: String): Long =
      s""""$k"\\s*:\\s*(-?\\d+)""".r.findFirstMatchIn(s)
        .map(_.group(1).toLong)
        .getOrElse(throw new StorageException(s"manifest missing $k: $s"))
    // Lenient: manifests written before multi-vector mode existed have
    // no chunk fields — they are single-vector stores (0).
    def longOr0(k: String): Long =
      s""""$k"\\s*:\\s*(-?\\d+)""".r.findFirstMatchIn(s)
        .map(_.group(1).toLong).getOrElse(0L)
    def strOf(k: String): String =
      s""""$k"\\s*:\\s*"([^"]*)"""".r.findFirstMatchIn(s)
        .map(_.group(1))
        .getOrElse(throw new StorageException(s"manifest missing $k: $s"))
    // Lenient like the chunk fields: pre-r16 manifests have no
    // auto_nlist — they were explicit-nlist (or flat) stores (false).
    val auto = """\"auto_nlist\"\s*:\s*(true|false)""".r
      .findFirstMatchIn(s).exists(_.group(1) == "true")
    StoreManifest(longOf("version"), longOf("dim").toInt, strOf("metric"),
      longOf("count"), longOf("nlist").toInt,
      chunkSize = longOr0("chunk_size").toInt,
      chunkOverlap = longOr0("chunk_overlap").toInt,
      autoNlist = auto)
  }

  private[store] def deleteDir(spark: SparkSession, dir: String): Unit = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
  }

  private[store] def dirSize(spark: SparkSession, dir: String): Long = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.getContentSummary(p).getLength else 0L
  }

  /** Dense sequential id column via zipWithIndex — NOT
    * monotonically_increasing_id, which is sparse (SURVEY §7.4). Costs
    * one extra pass for partition sizes; no shuffle. */
  private[graft] def withDenseId(df: DataFrame, idCol: String, offset: Long = 0L): DataFrame = {
    val schema = df.schema.add(StructField(idCol, LongType, nullable = false))
    val rdd = df.rdd.zipWithIndex.map { case (r, i) => Row.fromSeq(r.toSeq :+ (i + offset)) }
    df.sparkSession.createDataFrame(rdd, schema)
  }
}
