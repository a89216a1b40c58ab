package graft.ops

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Pure-JVM image header parsing — the REAL decode step of the multimodal
  * path (no native codec needed to read dimensions: every common container
  * carries them in its header, in public, documented byte layouts).
  *
  * Formats: PNG (IHDR width/height, big-endian 32-bit at offsets 16/20),
  * JPEG (marker-segment scan to the first SOF frame header; height then
  * width, big-endian 16-bit), GIF87a/89a (logical screen descriptor,
  * LITTLE-endian 16-bit at offsets 6/8). Anything else → null.
  */
object MediaCodec {

  /** (format, width, height) from the payload's header bytes, or None when
    * the payload is not a recognized container (or truncated).
    */
  def parseDims(p: Array[Byte]): Option[(String, Int, Int)] = {
    def be16(i: Int): Int = ((p(i) & 0xff) << 8) | (p(i + 1) & 0xff)
    def le16(i: Int): Int = (p(i) & 0xff) | ((p(i + 1) & 0xff) << 8)
    def be32(i: Int): Int =
      ((p(i) & 0xff) << 24) | ((p(i + 1) & 0xff) << 16) |
        ((p(i + 2) & 0xff) << 8) | (p(i + 3) & 0xff)

    if (p.length >= 24 &&
      (p(0) & 0xff) == 0x89 && p(1) == 'P' && p(2) == 'N' && p(3) == 'G' &&
      p(4) == 0x0d && p(5) == 0x0a && p(6) == 0x1a && p(7) == 0x0a &&
      p(12) == 'I' && p(13) == 'H' && p(14) == 'D' && p(15) == 'R') {
      Some(("png", be32(16), be32(20)))
    } else if (p.length >= 10 &&
      p(0) == 'G' && p(1) == 'I' && p(2) == 'F' && p(3) == '8' &&
      (p(4) == '7' || p(4) == '9') && p(5) == 'a') {
      Some(("gif", le16(6), le16(8)))
    } else if (p.length >= 4 &&
      (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xd8) {
      // JPEG: walk the marker segments; dimensions live in the first
      // start-of-frame marker (0xC0-0xCF minus the non-frame C4/C8/CC).
      var i = 2
      while (i + 3 < p.length) {
        if ((p(i) & 0xff) != 0xff) return None // lost sync
        val m = p(i + 1) & 0xff
        if (m == 0xff) i += 1 // fill byte before a marker
        else if (m == 0x01 || (m >= 0xd0 && m <= 0xd9)) i += 2 // standalone
        else {
          val segLen = be16(i + 2)
          if (segLen < 2) return None
          if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc) {
            // SOF: [marker 2][len 2][precision 1][height 2][width 2]...
            if (i + 8 >= p.length) return None
            return Some(("jpeg", be16(i + 7), be16(i + 5)))
          }
          i += 2 + segLen
        }
      }
      None
    } else None
  }

  /** Catalyst-facing adapter: struct row or null (shared by the interpreted
    * and generated code paths of [[ImageDims]]).
    */
  def parseDimsRow(p: Array[Byte]): InternalRow = parseDims(p) match {
    case Some((f, w, h)) => InternalRow(UTF8String.fromString(f), w, h)
    case None => null
  }

  /** WAV (RIFF) header parse: a REAL chunk walk — "RIFF"[size]"WAVE",
    * then 8-byte chunk headers (id + LE32 size) skipped with the spec's
    * odd-size pad byte until both the "fmt " block (PCM layout: channels
    * LE16@+2, sample rate LE32@+4, byte rate LE32@+8, block align
    * LE16@+12, bits LE16@+14 within the chunk body) and the "data" chunk
    * size are found. Returns (channels, sampleRate, bits, nSamples,
    * durationMs); None for non-WAV / truncated payloads or a zero block
    * align / byte rate (which would otherwise divide by zero).
    */
  def parseAudio(p: Array[Byte]): Option[(Int, Int, Int, Long, Long)] = {
    def le16(i: Int): Int = (p(i) & 0xff) | ((p(i + 1) & 0xff) << 8)
    def le32(i: Int): Long =
      (p(i) & 0xffL) | ((p(i + 1) & 0xffL) << 8) |
        ((p(i + 2) & 0xffL) << 16) | ((p(i + 3) & 0xffL) << 24)
    def tag(i: Int, s: String): Boolean =
      i + 3 < p.length && p(i) == s(0) && p(i + 1) == s(1) &&
        p(i + 2) == s(2) && p(i + 3) == s(3)

    if (p.length < 44 || !tag(0, "RIFF") || !tag(8, "WAVE")) return None
    // The offset walks in Long: a hostile LE32 size like 0xFFFFFFF8
    // truncates to -8 as Int (zero advance → infinite loop) or drives the
    // offset negative (ArrayIndexOutOfBounds escaping nullSafeEval). As
    // unsigned Long the advance is always >= 8, so the walk terminates,
    // and a chunk whose declared size overruns the buffer (common for a
    // trailing data chunk) just ends the walk instead of faulting.
    var i = 12L
    var fmt = -1
    var dataSize = -1L
    while (i + 8 <= p.length && (fmt < 0 || dataSize < 0)) {
      val at = i.toInt
      val size = le32(at + 4) // unsigned: 0 <= size <= 0xFFFFFFFF
      if (tag(at, "fmt ")) {
        if (size < 16 || i + 8 + 16 > p.length) return None
        fmt = at + 8
      } else if (tag(at, "data")) {
        dataSize = size
      }
      i += 8 + size + (size & 1) // chunks pad to even offsets
    }
    if (fmt < 0 || dataSize < 0) return None
    val channels = le16(fmt + 2)
    val sampleRate = le32(fmt + 4)
    val byteRate = le32(fmt + 8)
    val blockAlign = le16(fmt + 12)
    val bits = le16(fmt + 14)
    if (blockAlign == 0 || byteRate == 0L) return None
    Some((channels, sampleRate.toInt, bits,
      dataSize / blockAlign, dataSize * 1000L / byteRate))
  }

  /** Catalyst-facing adapter for [[AudioMeta]]. */
  def parseAudioRow(p: Array[Byte]): InternalRow = parseAudio(p) match {
    case Some((c, sr, b, n, d)) => InternalRow(c, sr, b, n, d)
    case None => null
  }
}

/** Catalyst expression: `graft_image_dims(binary)` →
  * `struct<format:string, width:int, height:int>` (null for unrecognized
  * payloads). Native with `doGenCode` so header parsing runs inside
  * whole-stage codegen — at 100 TB of media the dims probe must not break
  * the pipeline the way a UDF would.
  */
case class ImageDims(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false)))
  override def nullable: Boolean = true
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_image_dims requires binary input, got ${child.dataType}")
  override def nullSafeEval(input: Any): Any =
    MediaCodec.parseDimsRow(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.ops.MediaCodec.parseDimsRow($c);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)
  override protected def withNewChildInternal(newChild: Expression): ImageDims =
    copy(child = newChild)
  override def prettyName: String = "graft_image_dims"
}

/** Catalyst expression: `graft_audio_meta(binary)` →
  * `struct<channels:int, sample_rate:int, bits:int, n_samples:bigint,
  * duration_ms:bigint>` (null for non-WAV payloads). Codegen'd for the
  * same reason as [[ImageDims]]: a metadata probe over 100 TB of audio
  * must stay inside whole-stage codegen.
  */
case class AudioMeta(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("channels", IntegerType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("bits", IntegerType, nullable = false),
    StructField("n_samples", LongType, nullable = false),
    StructField("duration_ms", LongType, nullable = false)))
  override def nullable: Boolean = true
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_audio_meta requires binary input, got ${child.dataType}")
  override def nullSafeEval(input: Any): Any =
    MediaCodec.parseAudioRow(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.ops.MediaCodec.parseAudioRow($c);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)
  override protected def withNewChildInternal(newChild: Expression): AudioMeta =
    copy(child = newChild)
  override def prettyName: String = "graft_audio_meta"
}
