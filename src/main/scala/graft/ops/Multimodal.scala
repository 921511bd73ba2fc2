package graft.ops

import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: treat image/audio/video payloads as opaque
  * `binary` columns with typed metadata, decoded/feature-extracted by a
  * batched per-partition stage.
  *
  * The actual media codecs are NOT available in this offline container,
  * so the decode step is a clearly-marked deterministic STUB
  * ([[DecodeStub]]); everything around it — the binary-column schema,
  * the micro-batched mapPartitions signature (the same shape a Pandas-UDF
  * `mapInPandas` stage has in PySpark), partitioning, and the
  * explode-style frame sampling — is real, tested Spark plumbing that a
  * real decoder drops into.
  */
object Multimodal {

  final case class MediaRow(doc_id: Long, media: Array[Byte], media_type: String)

  final case class MediaMeta(
      doc_id: Long,
      media_type: String,
      byte_len: Long,
      checksum: String,
      width: Long,
      height: Long,
      n_frames: Long
  )

  /** STUB decoder — stands in for an image/audio/video codec. Output is
    * a pure function of the payload + id, so tests and oracles are
    * exact. A production build replaces `decodeBatch` with real codec
    * calls; the batched signature is what matters (one call per
    * micro-batch, amortizing decoder/session init — exactly like
    * `mapInPandas` batches).
    */
  object DecodeStub {
    def decodeBatch(rows: Seq[MediaRow]): Seq[MediaMeta] =
      rows.map { r =>
        val md = MessageDigest.getInstance("MD5")
        val checksum = md.digest(r.media).map(b => f"$b%02x").mkString
        MediaMeta(
          doc_id = r.doc_id,
          media_type = r.media_type,
          byte_len = r.media.length.toLong,
          checksum = checksum,
          width = 320L + (r.doc_id % 5) * 160L,
          height = 240L + (r.doc_id % 3) * 120L,
          n_frames = r.media.length.toLong / 10L
        )
      }
  }

  /** Build the opaque media table from `documents` (payload = UTF-8 text
    * bytes — the deterministic stand-in for real image bytes).
    */
  def mediaTable(docs: DataFrame): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(
        col("doc_id"),
        encode(col("text"), "UTF-8").as("media"),
        concat(lit("image/fake-"), (col("doc_id") % 3).cast("string")).as("media_type")
      )
      .as[MediaRow]
  }

  /** The decode stage: micro-batched mapPartitions over binary payloads. */
  def decode(media: Dataset[MediaRow], batchSize: Int = 64): Dataset[MediaMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.grouped(batchSize).flatMap(b => DecodeStub.decodeBatch(b)))
  }

  /** Frame sampling plumbing: one row per sampled frame index
    * (every `stride`-th frame), with deterministic fake timestamps.
    */
  def sampleFrames(meta: Dataset[MediaMeta], stride: Long = 7L): DataFrame =
    meta
      .toDF()
      .where(col("n_frames") > 0)
      .select(
        col("doc_id"),
        explode(expr(s"sequence(0L, n_frames - 1, ${stride}L)")).as("frame_idx")
      )
      .withColumn("ts_milli", col("frame_idx") * lit(40L)) // 25 fps stand-in

  /** Resize plumbing: target box fit preserving aspect ratio in exact
    * integer math (the real resampler is a codec call inside the same
    * batched stage as [[decode]]; what is tested here is the metadata
    * contract every resizer must satisfy — fit-within-box, never
    * upscale, aspect preserved under integer floor).
    */
  def resize(meta: Dataset[MediaMeta], maxW: Long = 640L, maxH: Long = 480L): DataFrame =
    meta
      .toDF()
      .withColumn(
        "scale_milli",
        expr(s"least(1000L, (${maxW}L * 1000L) div width, (${maxH}L * 1000L) div height)")
      )
      .select(
        col("doc_id"),
        col("width"),
        col("height"),
        expr("(width * scale_milli) div 1000L").as("out_w"),
        expr("(height * scale_milli) div 1000L").as("out_h")
      )

  /** Feature-extraction plumbing: a fixed-length integer feature vector
    * per payload — here a 16-bin byte histogram (real and exact: it IS a
    * feature of the payload, no codec needed), emitted long-format
    * (doc_id, bin, n) so downstream similarity ops can consume it like
    * any embedding column. Batched per partition like [[decode]].
    */
  def extractFeatures(media: Dataset[MediaRow], bins: Int = 16): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media
      .mapPartitions { it =>
        it.map { r =>
          val hist = new Array[Long](bins)
          r.media.foreach { b => hist(((b & 0xff) * bins) / 256) += 1L }
          (r.doc_id, hist.toSeq)
        }
      }
      .toDF("doc_id", "hist")
      .select(col("doc_id"), posexplode(col("hist")).as(Seq("bin", "n")))
      .select(col("doc_id"), col("bin").cast("long").as("bin"), col("n"))
  }

  /** Perceptual-hash-style payload fingerprint (the aHash rule on the
    * byte-histogram feature vector): bit j of the `bins`-bit hash is set
    * iff bin j's mass exceeds the per-payload mean bin mass — the
    * threshold-against-mean construction average-hash uses on pixel
    * blocks, applied to the codec-free byte histogram. Near-identical
    * payloads land within a small hamming distance, so the SimHash
    * pigeonhole pair machinery applies to media exactly as to text.
    * Integer-exact: bit j = (bins * hist[j] > total). Output:
    * (doc_id, phash).
    *
    * Shape at scale: one exchange keyed by doc_id, shared by the
    * per-payload total window and the bit-sum aggregate that follows
    * on the same partitioning.
    */
  def perceptualHash(media: Dataset[MediaRow], bins: Int = 16): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy("doc_id")
    extractFeatures(media, bins)
      .withColumn("total", sum("n").over(w))
      .groupBy("doc_id")
      .agg(
        sum(
          when(
            lit(bins) * col("n") > col("total"),
            expr("CAST(1 AS BIGINT) << CAST(bin AS INT)")
          ).otherwise(0L)
        ).as("phash")
      )
  }
}
