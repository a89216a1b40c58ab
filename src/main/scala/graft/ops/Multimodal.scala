package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.GraftFunctions

/** Multimodal-column plumbing (SURVEY §7.6): media payloads as opaque
  * `binary` columns with typed metadata, processed per-partition in batch.
  *
  * The decode step is REAL: [[MediaCodec]] parses PNG/JPEG/GIF dimensions
  * straight from header bytes (public container layouts, no native codec
  * required), both as a codegen'd expression ([[ImageDims]]) and through
  * the per-partition [[decodeAll]] path. Full pixel decode would swap a
  * JNI/FFI codec into the same mapPartitions shape without changing the
  * plan. [[syntheticMedia]] builds REAL container bytes (valid headers,
  * content-dependent segment lengths) so the parser is exercised
  * end-to-end and oracle-checked: DuckDB recomputes the dimensions the
  * constructor embedded, and the gate passes only if the byte parser
  * inverts the byte constructor.
  */
object Multimodal {

  /** Typed record for the per-partition decode path. */
  case class MediaRecord(doc_id: Long, payload: Array[Byte])
  case class DecodedMeta(doc_id: Long, byte_len: Long, format: String,
      width: Int, height: Int)

  /** Build a binary "media" table from documents (payload = UTF-8 bytes of
    * the text — a stand-in for image/audio bytes with identical plumbing).
    */
  def payloads(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))

  /** Expression-only metadata: byte length, leading "magic" bytes (hex),
    * and stub-decoded dimensions derived from the payload hash. Pure
    * columns — this is the oracle-checkable face of the operator.
    */
  def metadata(docs: DataFrame): DataFrame = {
    val p = payloads(docs)
    p.select(
      col("doc_id"),
      octet_length(col("payload")).cast("long").as("byte_len"),
      upper(substring(hex(col("payload")), 1, 8)).as("magic_hex"),
      (GraftFunctions.hash64(concat(lit("w|"), col("doc_id").cast("string")))
        % 1920).as("width"),
      (GraftFunctions.hash64(concat(lit("h|"), col("doc_id").cast("string")))
        % 1080).as("height"),
      (octet_length(col("payload")) % 240).cast("long").as("n_frames"))
      .orderBy("doc_id")
  }

  /** Content-hash dedup over the binary payload: the "same image uploaded
    * twice under different ids" case. One map-side md5 per payload (the
    * digest, not the blob, rides the shuffle — at 100 TB of media this is
    * the difference between shuffling 16-byte keys and shuffling the
    * corpus), then keep-first per digest; output = the duplicate groups
    * with their canonical (minimum) doc_id and member count.
    */
  def dedupPayloads(docs: DataFrame): DataFrame =
    payloads(docs)
      .select(col("doc_id"), md5(col("payload")).as("digest"))
      .groupBy("digest")
      .agg(min(col("doc_id")).as("canonical_id"),
        count(lit(1)).as("n_copies"))
      .filter(col("n_copies") > 1)
      .orderBy("canonical_id")

  /** Frame sampling over the binary payload: one row per sampled window —
    * 8 "frame" bytes every 32-byte stride (the video-frame-sampling shape:
    * explode positions, slice bytes). Pure expressions over the hex string
    * so the oracle mirrors byte-for-byte.
    */
  def frameSample(docs: DataFrame): DataFrame = {
    val p = payloads(docs)
      .withColumn("hx", hex(col("payload")))
      .withColumn("n_frames",
        greatest(floor((octet_length(col("payload")) - 8) / 32), lit(0))
          .cast("int"))
    p.select(col("doc_id"), col("hx"),
        explode(expr("sequence(0, n_frames)")).as("frame_idx"))
      .select(col("doc_id"), col("frame_idx").cast("long").as("frame_idx"),
        upper(expr("substr(hx, frame_idx * 64 + 1, 16)")).as("frame_hex"))
      .orderBy("doc_id", "frame_idx")
  }

  /** REAL container bytes, built column-side: one of PNG / JPEG / GIF per
    * doc (round-robin on doc_id), with dimensions derived from the stable
    * hash and the document text embedded as body bytes (PNG trailing data,
    * a variable-length JPEG COM segment — so the JPEG marker scan has to
    * skip real content-dependent segments — GIF trailing data). Every
    * payload is hex-assembled with plain expressions and `unhex`, entirely
    * codegen'd; nothing leaves the executors.
    */
  def syntheticMedia(docs: DataFrame): DataFrame = {
    def dim(seed: String, mod: Int) =
      (GraftFunctions.hash64(
        concat(lit(seed + "|"), col("doc_id").cast("string"))) % mod) + 1
    def hx(c: org.apache.spark.sql.Column, digits: Int) =
      lpad(hex(c), digits, "0")
    val w = dim("iw", 1920)
    val h = dim("ih", 1080)
    val bodyBin = encode(expr("substr(text, 1, 64)"), "UTF-8")
    val bodyHex = hex(bodyBin)
    val png = concat(
      lit("89504E470D0A1A0A"), // signature
      lit("0000000D49484452"), // IHDR chunk length + type
      hx(w, 8), hx(h, 8), // 32-bit big-endian dims
      lit("0806000000DEADBEEF"), // bit depth/color/etc + placeholder CRC
      bodyHex)
    val jpeg = concat(
      lit("FFD8"), // SOI
      lit("FFE000104A46494600010100004800480000"), // APP0/JFIF, 16 bytes
      lit("FFFE"), hx(octet_length(bodyBin) + 2, 4), bodyHex, // COM segment
      lit("FFC0001108"), hx(h, 4), hx(w, 4), // SOF0: len 17, precision 8
      lit("03012200021101031101"), // 3 components
      lit("FFD9")) // EOI
    val hLe = hx(h, 4)
    val wLe = hx(w, 4)
    val gif = concat(
      lit("474946383961"), // GIF89a
      substring(wLe, 3, 2), substring(wLe, 1, 2), // 16-bit LITTLE-endian
      substring(hLe, 3, 2), substring(hLe, 1, 2),
      lit("F70000"), bodyHex, lit("3B"))
    docs.select(col("doc_id"),
      unhex(when(col("doc_id") % 3 === 0, png)
        .when(col("doc_id") % 3 === 1, jpeg)
        .otherwise(gif)).as("payload"))
  }

  /** REAL WAV (RIFF) bytes, built column-side: PCM parameters derived
    * from the stable hash (1-2 channels, 8/16/44.1 kHz, 8/16-bit), the
    * document text as sample data truncated/zero-padded to the computed
    * data size, and a LIST/INFO chunk wedged between "fmt " and "data" so
    * the parser's chunk walk is exercised for real (a fixed-offset reader
    * would misparse every payload). Entirely codegen'd hex assembly, one
    * `unhex` at the end.
    */
  def syntheticAudio(docs: DataFrame): DataFrame = {
    def h(seed: String, mod: Int) =
      GraftFunctions.hash64(
        concat(lit(seed + "|"), col("doc_id").cast("string"))) % mod
    def hx(c: org.apache.spark.sql.Column, digits: Int) =
      lpad(hex(c), digits, "0")
    def le16(c: org.apache.spark.sql.Column) = {
      val x = hx(c, 4); concat(substring(x, 3, 2), substring(x, 1, 2))
    }
    def le32(c: org.apache.spark.sql.Column) = {
      val x = hx(c, 8)
      concat(substring(x, 7, 2), substring(x, 5, 2),
        substring(x, 3, 2), substring(x, 1, 2))
    }
    val p = docs
      .withColumn("ch", h("ch", 2) + 1)
      .withColumn("sr", when(h("sr", 3) === 0, 8000L)
        .when(h("sr", 3) === 1, 16000L).otherwise(44100L))
      .withColumn("bps", h("bw", 2) + 1) // bytes per sample: 8- or 16-bit
      .withColumn("ba", col("ch") * col("bps")) // block align
      .withColumn("ns", h("ns", 1000) + 1)
      .withColumn("ds", col("ns") * col("ba")) // data chunk size
      .withColumn("br", col("sr") * col("ba")) // byte rate
      .withColumn("body", expr(
        """rpad(substr(hex(encode(text, 'UTF-8')), 1, CAST(ds * 2 AS INT)),
          |     CAST(ds * 2 AS INT), '0')""".stripMargin))
    p.select(col("doc_id"), unhex(concat(
      lit("52494646"), le32(col("ds") + 48), lit("57415645"), // RIFF/WAVE
      lit("666D7420"), lit("10000000"), lit("0100"), // "fmt ", 16, PCM
      le16(col("ch")), le32(col("sr")), le32(col("br")),
      le16(col("ba")), le16(col("bps") * 8),
      lit("4C495354"), lit("04000000"), lit("494E464F"), // LIST(4)=INFO
      lit("64617461"), le32(col("ds")), col("body"))).as("payload"))
  }

  /** Audio header decode as a single codegen'd expression — same
    * oracle-declared contract as [[decodedDims]]: the oracle recomputes
    * the constructed PCM parameters from doc_id, so the gate passes only
    * if [[MediaCodec.parseAudio]]'s chunk walk inverts
    * [[syntheticAudio]]'s bytes.
    */
  def decodedAudio(docs: DataFrame): DataFrame = {
    GraftFunctions.ensureRegistered(docs.sparkSession)
    syntheticAudio(docs)
      .select(col("doc_id"),
        call_function("graft_audio_meta", col("payload")).as("a"))
      .select(col("doc_id"), col("a.channels").as("channels"),
        col("a.sample_rate").as("sample_rate"), col("a.bits").as("bits"),
        col("a.n_samples").as("n_samples"),
        col("a.duration_ms").as("duration_ms"))
      .orderBy("doc_id")
  }

  /** Header decode as a single codegen'd expression over the payload
    * column — the oracle-declared face of the decode path (the oracle
    * recomputes the constructed dimensions from doc_id; the gate passes
    * only if [[MediaCodec.parseDims]] inverts [[syntheticMedia]]'s bytes).
    */
  def decodedDims(docs: DataFrame): DataFrame = {
    GraftFunctions.ensureRegistered(docs.sparkSession)
    syntheticMedia(docs)
      .select(col("doc_id"),
        call_function("graft_image_dims", col("payload")).as("d"))
      .select(col("doc_id"), col("d.format").as("format"),
        col("d.width").as("width"), col("d.height").as("height"))
      .orderBy("doc_id")
  }

  /** Partition-wise decode path: the real-world shape for codec work —
    * one decoder instance per partition, streaming records through it
    * (a full pixel decoder would slot into this exact loop).
    */
  def decodeAll(spark: SparkSession, docs: DataFrame): Dataset[DecodedMeta] = {
    import spark.implicits._
    syntheticMedia(docs).as[MediaRecord].mapPartitions { it =>
      it.map { rec =>
        val (f, w, h) =
          MediaCodec.parseDims(rec.payload).getOrElse(("unknown", 0, 0))
        DecodedMeta(rec.doc_id, rec.payload.length.toLong, f, w, h)
      }
    }
  }
}
