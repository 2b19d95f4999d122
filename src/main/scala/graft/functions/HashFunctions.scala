package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine deterministic hashing.
  *
  * `hash60` maps any string to a non-negative 60-bit long via sha256 —
  * the same value is computable in any SQL engine with a sha256
  * function (e.g. DuckDB: `CAST(concat('0x', substr(sha256(s),1,15)) AS
  * BIGINT)`), unlike Spark's Murmur3 `hash()` or DuckDB's internal
  * `hash()`. Used as the seed hash for MinHash/SimHash signatures and
  * for the deterministic hash embedder, so every derived result has an
  * exact external oracle.
  *
  * (The reference seeds its deterministic benchmark embeddings the same
  * way: `int(sha256(text)[:8], 16)`, tests/conftest.py:96-99.)
  */
object HashFunctions {

  /** Non-negative 60-bit hash of a string column (first 15 hex chars of
    * sha256, parsed base-16). Codegen'd built-ins only. */
  def hash60(s: Column): Column =
    conv(substring(sha2(s, 256), 1, 15), 16, 10).cast("long")

  /** Seeded variant: hash60(seed || ':' || s). */
  def hash60(seed: Int, s: Column): Column =
    hash60(concat(lit(seed.toString), lit(":"), s))

  private val mdPool: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("SHA-256"))

  /** JVM-side mirror of [[hash60]] — MUST stay bit-identical to the SQL
    * form (asserted in HashEmbedderSpec). The first 15 hex chars of the
    * digest are bytes 0..6 plus the high nibble of byte 7. Used by
    * driver-side code and by the fused [[HashEmbedExpr]] hot path. */
  def hash60Local(s: String): Long =
    hash60Parts(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  def hash60Local(seed: Int, s: String): Long = hash60Local(s"$seed:$s")

  /** Same 60-bit digest over the concatenation of byte chunks —
    * lets hot paths (e.g. per-dimension embedding hashes) stream
    * "<j>:" + textBytes without building 64 strings per row. */
  def hash60Parts(parts: Array[Byte]*): Long = {
    val md = mdPool.get()
    md.reset()
    parts.foreach(md.update)
    val d = md.digest()
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xFFL); i += 1 }
    (v << 4) | ((d(7) & 0xFF) >>> 4)
  }
}
