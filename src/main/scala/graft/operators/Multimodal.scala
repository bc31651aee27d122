package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media payloads ride as opaque `binary`
  * columns with typed metadata, processed partition-wise in batches.
  *
  * The decode step is a STUB (this environment ships no image/audio codecs):
  * [[decodeStub]] produces deterministic fake features from the raw bytes.
  * Everything around it — schema, partitioning, batch iteration shape,
  * frame sampling — is real Spark plumbing: swap [[decodeStub]] for a JNI /
  * codec call and the pipeline is production-shaped. At scale the binary
  * column stays columnar in Parquet (never shuffled unless a downstream op
  * needs it), and decode runs `mapPartitions`-style so per-batch setup cost
  * (codec init) amortizes over the partition.
  */
object Multimodal {

  /** A media row: opaque payload + typed metadata. */
  final case class MediaRow(media_id: Long, kind: String, bytes: Array[Byte])

  /** Deterministic fake features standing in for a real decoder. */
  final case class MediaFeatures(
      media_id: Long, kind: String, n_bytes: Long,
      width: Long, height: Long, checksum: String)

  /** Synthesize a media table from documents (text → utf-8 payload) — the
    * test double for a real binary source; schema is the real one. */
  def mediaFromDocs(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      when(col("doc_id") % 3 === 0, lit("image"))
        .when(col("doc_id") % 3 === 1, lit("audio"))
        .otherwise(lit("video")).as("kind"),
      encode(col("text"), "UTF-8").as("bytes"))

  /** STUB decoder: deterministic pseudo-features from byte content. A real
    * implementation would decode the payload here (per-partition, so codec
    * initialization amortizes); the Spark plumbing is identical. */
  def decodeStub(r: MediaRow): MediaFeatures = {
    val n = r.bytes.length.toLong
    MediaFeatures(
      r.media_id, r.kind, n,
      width = n % 640, height = n % 480,
      checksum = java.security.MessageDigest.getInstance("MD5")
        .digest(r.bytes).map("%02x".format(_)).mkString)
  }

  /** Batch feature extraction: typed mapPartitions over the media table —
    * the Scala analogue of a vectorized/batched decode UDF. */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      // per-partition setup would init the codec once here
      rows.map(decodeStub)
    }
  }

  /** Columnar (codegen'd) metadata pass — the operations that never need
    * the decoder: sizes, checksums, head-sample. Oracle-comparable. */
  def mediaMeta(media: DataFrame): DataFrame =
    media.select(
      col("media_id"), col("kind"),
      octet_length(col("bytes")).cast("long").as("n_bytes"),
      md5(col("bytes")).as("content_md5"),
      hex(substring(col("bytes"), 1, 8)).as("head_hex"))

  /** Resize STUB: downsample each payload to `target` evenly spaced bytes
    * (byte i of the output is input byte ⌊i·len/target⌋) — the plumbing
    * shape of image resizing (nearest-neighbor over a byte grid); a real
    * codec swaps into the same columnar slot. Payloads shorter than
    * `target` repeat bytes, empty payloads yield an empty sample. Output is
    * hex so the result is oracle-comparable. Pure per-row projection work:
    * scales embarrassingly, never shuffles. */
  def resizeStub(media: DataFrame, target: Int): DataFrame = {
    val h = hex(col("bytes"))
    val nb = octet_length(col("bytes")).cast("long")
    media.select(col("media_id"), nb.as("n_bytes"), h.as("__h"))
      .select(col("media_id"), col("n_bytes"),
        when(col("n_bytes") === 0, lit(""))
          .otherwise(concat_ws("",
            transform(sequence(lit(0L), lit(target - 1L)), i => {
              val bytePos = graft.model.floorDivCol(i * col("n_bytes"), target.toLong)
              col("__h").substr((bytePos * 2 + 1).cast("int"), lit(2))
            }))).as("resized_hex"))
  }

  /** Frame sampling: `n` evenly spaced fixed-size byte slices per payload
    * (the shape of video frame extraction; slicing is pure columnar work). */
  def frameSample(media: DataFrame, frames: Int, frameBytes: Int): DataFrame =
    media
      .select(col("media_id"), col("bytes"),
        explode(sequence(lit(0L), lit(frames - 1L))).as("frame_idx"))
      .select(
        col("media_id"), col("frame_idx"),
        expr(s"substring(bytes, CAST(frame_idx AS INT) * " +
          s"(octet_length(bytes) DIV $frames) + 1, $frameBytes)").as("frame"))
      .filter(octet_length(col("frame")) > 0)
}
