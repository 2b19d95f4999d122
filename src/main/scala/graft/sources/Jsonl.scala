package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** JSONL (one JSON object per line) source/sink — the lingua franca of
  * training-data exchange (every open-data corpus and most training
  * frameworks speak it). The reference's payload store is exactly this
  * idea one frame at a time (a JSON document per QR frame,
  * encoder.py:190-195); at scale the same contract becomes sharded
  * line-delimited JSON files.
  *
  * Parquet remains the engine-internal format (columnar pruning,
  * predicate pushdown, min/max indexes — none of which JSON can do);
  * JSONL is the interchange boundary: export shards for a trainer or
  * another team, import a corpus someone else produced.
  */
object Jsonl {

  /** Export as sharded JSONL. Every column is serialized by `to_json`
    * (maps/arrays/structs included). `shards` controls write
    * parallelism AND downstream consumer granularity — one task per
    * shard file.
    *
    * `compression`: "none" (default), "gzip", or "zstd". NO compressed
    * text codec splits under Hadoop's readers (zstd included — only
    * bzip2 implements SplittableCompressionCodec), so a compressed
    * shard always reads as ONE task: when exporting compressed, the
    * shard COUNT is the read-parallelism knob — size shards to a few
    * hundred MB compressed. Plain text splits normally. */
  def write(df: DataFrame, path: String, shards: Int = 0,
            compression: String = "none"): Unit = {
    // Backtick-quote names (a dotted column would parse as a nested
    // field reference), escaping embedded backticks by doubling them
    // (a column literally named a`b is legal and crashed the quoted
    // parse), and KEEP null fields: to_json drops them by default,
    // which breaks the "every column on every line" interchange
    // contract for fixed-key-set consumers.
    val lines = df.select(to_json(
      struct(df.columns.map(n =>
        col(s"`${n.replace("`", "``")}`")).toIndexedSeq: _*),
      Map("ignoreNullFields" -> "false")).as("value"))
    val sharded = if (shards > 0) lines.repartition(shards) else lines
    sharded.write.mode("overwrite")
      .option("compression", compression)
      .text(path)
  }

  /** Read JSONL with an explicit schema (the scale path: schema
    * inference scans the data once before the real read — fine
    * interactively, a full extra pass at 100 TB). Malformed lines land
    * in nulls under the default PERMISSIVE mode rather than failing the
    * job; count them via a null-filter if ingest must be strict. */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** Read JSONL inferring the schema from the data (one extra pass —
    * interactive use only; prefer [[read]] with a pinned schema in
    * pipelines: inference can widen types between runs and silently
    * change downstream semantics). */
  def readInferred(spark: SparkSession, path: String): DataFrame =
    spark.read.json(path)
}
