package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.GraftFunctions

/** Multimodal-column plumbing (SURVEY §7.6): media payloads as opaque
  * `binary` columns with typed metadata, processed per-partition in batch.
  *
  * The container ships no image/audio codecs, so the decode kernel is a
  * clearly-marked deterministic STUB ([[MultimodalStub.decode]]); everything
  * Spark-side — schema, binary column handling, partition-wise batch
  * processing, metadata extraction — is real and tested. Swapping the stub
  * for a JNI/FFI decoder changes nothing in the plan shape.
  */
object Multimodal {

  /** Typed record for the per-partition decode path. */
  case class MediaRecord(doc_id: Long, payload: Array[Byte])
  case class DecodedMeta(doc_id: Long, byte_len: Long, width: Int,
      height: Int, n_frames: Int)

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

  /** Partition-wise decode path: the real-world shape for codec work —
    * one decoder instance per partition, streaming records through it.
    * Used by MultimodalSpec; not oracle-declared (the stub is the point).
    */
  def decodeAll(spark: SparkSession, docs: DataFrame): Dataset[DecodedMeta] = {
    import spark.implicits._
    payloads(docs).as[MediaRecord].mapPartitions { it =>
      val decoder = MultimodalStub // real code: open codec once per partition
      it.map { rec =>
        val (w, hgt, frames) = decoder.decode(rec.payload)
        DecodedMeta(rec.doc_id, rec.payload.length.toLong, w, hgt, frames)
      }
    }
  }
}

/** STUB decoder — deterministic fake in place of an image/audio codec
  * (libs not present in this container). Replace `decode` with a real
  * codec call; the Spark plumbing above is unchanged.
  */
object MultimodalStub extends Serializable {
  def decode(payload: Array[Byte]): (Int, Int, Int) = {
    // ??? real codec goes here; deterministic fake derived from content:
    val sum = payload.foldLeft(0L)((a, b) => a + (b & 0xff))
    ((sum % 1920).toInt, (sum % 1080).toInt, (payload.length % 240))
  }
}
