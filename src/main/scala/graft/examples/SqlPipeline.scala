package graft.examples

import org.apache.spark.sql.SparkSession

/** A pre-embedding filter chain written entirely in `spark.sql` text
  * against the registered `graft_*` functions — no Scala API calls
  * past session setup. This is the surface a SQL-only frontend (a
  * warehouse job, a notebook cell, generated SQL) actually has. Each
  * FUNCTION lowers to the exact Column tree the Scala API builds
  * (bit-parity by construction — GraftExtensionsSpec pins it); the
  * PIPELINE itself is a deliberately simpler chain than
  * [[TrainingPipeline]] (Gopher gate only vs its quantile/repetition
  * gates; simhash banding vs its MinHash-LSH + containment + CC
  * keeper), so the two examples do NOT select the same rows — compare
  * per-function values, not kept sets.
  *
  * Chain: normalize -> Gopher quality gate + language filter ->
  * exact dedup on content fingerprint (min-doc_id keeper) -> simhash
  * near-dup candidate screen via graft_hamming64 -> MinHash-LSH
  * near-dup screen (shingle -> banded signature -> band equi-join ->
  * exact Jaccard confirm — the canonical SQL shape of
  * Dedup.minhashLshPairs, r13#8/r14#7) -> PII scrub -> token-budget
  * chunking. Each stage is a CTE over the previous one; plans stay
  * narrow projections + the dedup shuffles, identical to the Scala
  * path's audited shapes. BOTH near-dup screens appear deliberately:
  * simhash (Hamming on token votes) and MinHash-LSH (Jaccard on
  * shingle sets) catch different near-dup families, and a SQL-only
  * consumer needs the banded-join idiom for each spelled out — the
  * LSH block is the one that replaces the all-pairs `JOIN ON
  * graft_jaccard(a.text, b.text, 3) >= t` a naive consumer writes.
  */
object SqlPipeline {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-sql-pipeline")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.GraftExtensions.register(spark)

    spark.read.parquet(s"$sfDir/documents.parquet")
      .createOrReplaceTempView("documents")

    val kept = spark.sql("""
      WITH normalized AS (
        SELECT doc_id, lang, source,
               graft_normalize_text(text) AS text
        FROM documents
        WHERE text IS NOT NULL),
      gated AS (
        SELECT doc_id, lang, source, text,
               graft_quality_signals(text) AS sig
        FROM normalized),
      quality AS (
        SELECT doc_id, lang, source, text
        FROM gated
        WHERE coalesce(sig.gopher_keep, false)
          AND graft_lang_guess(text) IN ('en', 'de', 'es', 'fr')),
      -- exact dedup: one hash shuffle on the content fingerprint,
      -- smallest doc_id survives (the Dedup.exact keeper rule)
      exact AS (
        SELECT doc_id, lang, source, text
        FROM (SELECT *, row_number() OVER (
                PARTITION BY graft_fingerprint(text)
                ORDER BY doc_id) AS rn
              FROM quality)
        WHERE rn = 1),
      -- near-dup screen, the Dedup.simhashPairs shape in SQL: simhash
      -- once per doc, 4 x 16-bit bands, candidates from the band
      -- equi-join (pigeonhole: hamming <= 3 collides in >= 1 band),
      -- exact hamming confirm — NEVER an all-pairs self-join
      fingerprinted AS (
        SELECT *, graft_simhash63(text) AS sh FROM exact),
      banded AS (
        SELECT doc_id, sh, b,
               CAST(shiftright(sh, b * 16) & 65535 AS INT) AS bkey
        FROM fingerprinted LATERAL VIEW explode(array(0, 1, 2, 3)) t AS b),
      near_dupes AS (
        SELECT DISTINCT x.doc_id
        FROM banded x JOIN banded y
          ON x.b = y.b AND x.bkey = y.bkey AND x.doc_id > y.doc_id
        WHERE graft_hamming64(x.sh, y.sh) <= 3),
      -- MinHash-LSH near-dup screen, the Dedup.minhashLshPairs shape
      -- in pure SQL (r13#8): shingle once per doc, explode the banded
      -- minhash signature ('b|v0|..' keys), drop corpus-hot band
      -- buckets (the capPerBand rule — a bucket of mass near-identical
      -- docs is quadratic pair fuel; exact dedup upstream already owns
      -- those), candidates from the band equi-join on (doc_id, band)
      -- ONLY — texts rejoin on the SMALL candidate set afterwards, so
      -- wide data never rides the join shuffle — then the exact
      -- Jaccard confirm. This is the canonical replacement for the
      -- quadratic `JOIN ON graft_jaccard(a.text, b.text, 3) >= 0.5`:
      -- the confirm runs on band-collision pairs, never n^2.
      lsh_banded AS (
        SELECT doc_id, band
        FROM fingerprinted
        LATERAL VIEW explode(
          graft_minhash_bands(graft_shingles(text, 3), 16, 4)) t AS band),
      lsh_hot AS (
        SELECT band FROM lsh_banded GROUP BY band HAVING count(*) > 1024),
      lsh_kept AS (
        SELECT doc_id, band FROM lsh_banded
        LEFT ANTI JOIN lsh_hot USING (band)),
      lsh_cand AS (
        SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
        FROM lsh_kept x JOIN lsh_kept y
          ON x.band = y.band AND x.doc_id > y.doc_id),
      -- Keeper rule: pairwise larger-id-drops (id_a > id_b by the join
      -- above), the same convention as the simhash block. NOTE for SQL
      -- copiers (r15 ADVICE): this intentionally OVER-drops relative to
      -- the Scala path's connected-components keeper — in a chain
      -- A<B<C with only B~C confirmed, C drops here even though its
      -- sole smaller near-dup B was itself dropped, whereas
      -- TrainingPipeline's cluster keeper would keep C's family root.
      -- Pairwise min-id is the cheap SQL-only approximation; use
      -- graft.ops.Dedup.connectedComponents when cluster-exact keeper
      -- semantics matter.
      lsh_dupes AS (
        SELECT DISTINCT c.id_a AS doc_id
        FROM lsh_cand c
        JOIN fingerprinted a ON a.doc_id = c.id_a
        JOIN fingerprinted b ON b.doc_id = c.id_b
        WHERE graft_jaccard(a.text, b.text, 3) >= 0.5),
      -- PII scrub BEFORE chunking/estimation: the chunks array is what
      -- a downstream embed step consumes, so it must carry the
      -- redacted text, never the raw PANs/emails
      scrubbed AS (
        SELECT f.doc_id, f.lang, f.source,
               graft_cc_redact(graft_pii_redact(f.text)) AS text
        FROM fingerprinted f
        WHERE f.doc_id NOT IN (SELECT doc_id FROM near_dupes)
          AND f.doc_id NOT IN (SELECT doc_id FROM lsh_dupes))
      SELECT doc_id, lang, source, text,
             graft_token_estimate(text) AS est_tokens,
             graft_chunks(text, 64, 8) AS chunks
      FROM scrubbed""")

    kept.createOrReplaceTempView("kept")
    val stats = spark.sql("""
      SELECT count(*) AS docs,
             sum(est_tokens) AS est_tokens,
             sum(size(chunks)) AS chunks
      FROM kept""").head
    println(s"== pure-SQL pipeline: ${stats.getLong(0)} docs kept, " +
      s"${stats.getLong(1)} est tokens, ${stats.getLong(2)} chunks ==")
    kept.show(5, 60)
    spark.stop()
  }
}
