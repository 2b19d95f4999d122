package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization + URL-keyed dedup — the first gate of a web-crawl
  * training-data pipeline (CC-style corpora dedupe by canonical URL before
  * any content pass, because it is free: one narrow projection + one
  * hash aggregate, no text ever shuffled).
  *
  * The reference engine (langchain-memvid) keys documents by opaque ids
  * and leaves URL handling to the caller; this module supplies the piece a
  * crawl-scale corpus needs in front of `Dedup.exact`
  * (vectorstore.py add_documents dedupes by exact text only).
  *
  * Everything is built from codegen'd built-ins (`regexp_extract`,
  * `filter`, `array_sort`) — no UDF, so the canonical key participates in
  * whole-stage codegen and the groupBy gets map-side partial aggregation.
  * At 100 TB the plan is: narrow scan (url column only) -> project
  * canonical key -> hash-partial agg -> one shuffle of (key, id) pairs —
  * corpus text never moves.
  */
object UrlOps {

  /** Canonical form of a URL:
    *   - scheme and host lowercased (path/query case is significant, RFC 3986 §6.2.2.1)
    *   - default port stripped (`:80` for http, `:443` for https)
    *   - fragment dropped (never sent to the server)
    *   - tracking params (`utm_*`) dropped, remaining query params sorted
    *   - trailing slashes stripped from the path
    *
    * Null-safe AND malformed-safe: a null URL canonicalizes to null,
    * and so does anything without a `scheme://` prefix (scheme-less
    * crawl rows like `www.a.com/page`) — otherwise every malformed URL
    * would collapse to the same degenerate `"://"`-prefixed key and
    * [[dedupByUrl]] would silently merge unrelated documents. Callers
    * that want to keep scheme-less rows should normalize a scheme in
    * first; the dedup gate treats null as "no canonical identity" and
    * leaves those rows alone.
    */
  def canonicalize(url: Column): Column = {
    val wellFormed = url.rlike("^[A-Za-z][A-Za-z0-9+.-]*://")
    val scheme   = lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val hostport = lower(regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    val host = when(scheme === "https", regexp_replace(hostport, ":443$", ""))
      .when(scheme === "http", regexp_replace(hostport, ":80$", ""))
      .otherwise(hostport)
    val path = regexp_replace(
      regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1), "/+$", "")
    // the '?' must precede any '#': a '?' inside the fragment is
    // fragment text, not a query (RFC 3986 §3.4-3.5 ordering)
    val query  = regexp_extract(url, "^[^#?]*\\?([^#]*)", 1)
    val params = filter(split(query, "&"),
      p => !p.startsWith("utm_") && (p =!= ""))
    val sortedQuery = array_join(array_sort(params), "&")
    when(wellFormed,
      concat(scheme, lit("://"), host, path,
        when(sortedQuery === "", "").otherwise(concat(lit("?"), sortedQuery))))
      .otherwise(lit(null).cast("string"))
  }

  /** Group documents by canonical URL, keeping the smallest id per group
    * (first-crawled wins, the CC convention). Returns one row per
    * canonical URL: (url, keeper idCol, n_dups). Scale: a single hash
    * aggregate on the canonical key — text and payload columns are never
    * read, never shuffled.
    */
  def dedupByUrl(df: DataFrame, idCol: String, urlCol: String): DataFrame =
    df.select(canonicalize(col(urlCol)).as("url"), col(idCol))
      // null canonical form = no URL identity (null or malformed input):
      // those rows are KEPT by the gate, never merged into one keeper.
      .where(col("url").isNotNull)
      .groupBy("url")
      .agg(min(col(idCol)).as(s"keeper_$idCol"),
        count(lit(1)).as("n_dups"))
}
