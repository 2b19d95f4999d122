package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

import graft.ops.MediaCodec

/** The REAL media codecs ([[graft.ops.MediaCodec]]) as Catalyst
  * expressions, so a pure-SQL pipeline can decode assets without the
  * DataFrame API: `SELECT graft_image_stats(content) FROM assets`.
  * Same shapes as [[graft.ops.Multimodal.decodeImageFeatures]] /
  * `decodeAudioFeatures` (parity spec-pinned), same contracts:
  * null bytes -> null STRUCT; undecodable bytes -> a non-null struct
  * with decode_ok=false and null features (a flagged row, never a
  * task failure).
  *
  * CodegenFallback like every graft kernel whose work dominates
  * dispatch: a PNG inflate or RIFF walk is orders of magnitude heavier
  * than the virtual call codegen would fuse away.
  */
case class ImageStatsExpr(child: Expression)
    extends UnaryExpression with CodegenFallback
    with org.apache.spark.sql.GraftSqlBridge.BinaryUnaryInputs {

  override def dataType: DataType = StructType(Seq(
    StructField("decode_ok", BooleanType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("n_pixels", LongType, nullable = true),
    StructField("sum_gray", LongType, nullable = true),
    StructField("min_gray", IntegerType, nullable = true),
    StructField("max_gray", IntegerType, nullable = true),
    StructField("sum_sq_gray", LongType, nullable = true),
    StructField("n_distinct_gray", IntegerType, nullable = true),
    StructField("top_gray_freq", LongType, nullable = true),
    StructField("ahash63", LongType, nullable = true)))
  override def prettyName: String = "graft_image_stats"

  override protected def nullSafeEval(input: Any): Any =
    MediaCodec.decodeGray(input.asInstanceOf[Array[Byte]]) match {
      case Some(img) =>
        val (n, sum, mn, mx) = MediaCodec.grayStats(img)
        val (sumSq, nDist, topFreq) = MediaCodec.grayQualityStats(img)
        val hash: Any =
          if (img.width % 8 == 0 && img.height % 8 == 0)
            MediaCodec.aHash63(img)
          else null
        InternalRow(true, img.width, img.height, n, sum, mn, mx,
          sumSq, nDist, topFreq, hash)
      case None =>
        InternalRow(false, null, null, null, null, null, null, null,
          null, null, null)
    }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Per-channel color decode as a SQL-callable kernel — the RGB twin
  * of [[ImageStatsExpr]] (r15): exact R/G/B sums/mins/maxs from ONE
  * decode, so SQL-only quality gates on real color corpora judge
  * every channel instead of the gray kernel's defined red-channel
  * choice. Same contracts: null -> null struct, undecodable ->
  * decode_ok=false row; parity with
  * [[graft.ops.Multimodal.decodeRgbFeatures]] is spec-pinned. */
case class RgbStatsExpr(child: Expression)
    extends UnaryExpression with CodegenFallback
    with org.apache.spark.sql.GraftSqlBridge.BinaryUnaryInputs {

  override def dataType: DataType = StructType(Seq(
    StructField("decode_ok", BooleanType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("n_pixels", LongType, nullable = true),
    StructField("sum_r", LongType, nullable = true),
    StructField("min_r", IntegerType, nullable = true),
    StructField("max_r", IntegerType, nullable = true),
    StructField("sum_g", LongType, nullable = true),
    StructField("min_g", IntegerType, nullable = true),
    StructField("max_g", IntegerType, nullable = true),
    StructField("sum_b", LongType, nullable = true),
    StructField("min_b", IntegerType, nullable = true),
    StructField("max_b", IntegerType, nullable = true)))
  override def prettyName: String = "graft_rgb_stats"

  override protected def nullSafeEval(input: Any): Any =
    MediaCodec.decodeRgb(input.asInstanceOf[Array[Byte]]) match {
      case Some(img) =>
        val (n, (sr, mnr, mxr), (sg, mng, mxg), (sb, mnb, mxb)) =
          MediaCodec.rgbChannelStats(img)
        InternalRow(true, img.width, img.height, n,
          sr, mnr, mxr, sg, mng, mxg, sb, mnb, mxb)
      case None =>
        InternalRow(false, null, null, null, null, null, null,
          null, null, null, null, null, null)
    }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** WAV-PCM16 decode + exact audio features as a SQL-callable kernel —
  * the audio twin of [[ImageStatsExpr]], same contracts. */
case class WavStatsExpr(child: Expression)
    extends UnaryExpression with CodegenFallback
    with org.apache.spark.sql.GraftSqlBridge.BinaryUnaryInputs {

  override def dataType: DataType = StructType(Seq(
    StructField("decode_ok", BooleanType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = true),
    StructField("channels", IntegerType, nullable = true),
    StructField("n_samples", LongType, nullable = true),
    StructField("peak", IntegerType, nullable = true),
    StructField("sum_sq", LongType, nullable = true),
    StructField("zero_crossings", LongType, nullable = true),
    StructField("audio_hash63", LongType, nullable = true)))
  override def prettyName: String = "graft_wav_stats"

  override protected def nullSafeEval(input: Any): Any =
    MediaCodec.decodeWav(input.asInstanceOf[Array[Byte]]) match {
      case Some(a) =>
        val (n, peak, sumSq, zc) = MediaCodec.audioStats(a)
        val hash: Any = MediaCodec.audioHash63(a).map(Long.box).orNull
        InternalRow(true, a.sampleRate, a.channels, n, peak, sumSq, zc, hash)
      case None =>
        InternalRow(false, null, null, null, null, null, null, null)
    }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
