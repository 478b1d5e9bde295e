package graft.multimodal

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: treat image/audio/video payloads as opaque
  * `binary` columns plus typed metadata, with per-batch feature extraction
  * through the typed mapPartitions path (the JVM analog of `mapInPandas`
  * batch processing: one iterator of rows per partition, decode amortized
  * across the batch, output schema declared up front).
  *
  * The actual media decode is STUBBED deterministically (this container has
  * no image/audio codecs): `decodeStub` treats the payload bytes themselves
  * as the "decoded" sample stream. Everything around it — binary schema,
  * partition-parallel batch shape, stride sampling ("frame sampling"),
  * digesting — is real and scale-true: map-only, no shuffle, no driver
  * involvement, output size independent of payload size.
  */
object Binary {

  final case class MediaRow(doc_id: Long, payload: Array[Byte])
  final case class MediaFeature(doc_id: Long, n_bytes: Int, md5_hex: String, strided_md5: String)

  private def hex(bytes: Array[Byte]): String =
    bytes.map(b => f"$b%02x").mkString

  private def md5hex(md: MessageDigest, bytes: Array[Byte]): String = {
    md.reset()
    hex(md.digest(bytes))
  }

  /** STUB decode: identity over payload bytes (stands in for
    * image-decode / audio-PCM; swap for a real codec off-container).
    */
  def decodeStub(payload: Array[Byte]): Array[Byte] = payload

  /** "Frame sampling": every `stride`-th byte of the decoded stream,
    * starting at byte 0 — the batch-shape of sampling k frames from a
    * video without materializing all frames.
    */
  def strideSample(decoded: Array[Byte], stride: Int): Array[Byte] =
    Iterator.range(0, decoded.length, stride).map(decoded).toArray

  /** Attach a binary payload column (here synthesized from text — the
    * TESTDATA corpus has no true media; schema/shape are what matter).
    */
  def withPayload(docs: DataFrame): DataFrame =
    docs.withColumn("payload", encode(col("text"), "UTF-8"))

  /** Batch feature extraction over (doc_id, payload) partitions. */
  def extractFeatures(media: DataFrame, stride: Int)(implicit s: SparkSession): Dataset[MediaFeature] = {
    import s.implicits._
    media.select(col("doc_id"), col("payload")).as[MediaRow]
      .mapPartitions { batch =>
        // One digest instance per partition batch, not per row — the
        // mapInPandas-style amortization this path exists for.
        val md = MessageDigest.getInstance("MD5")
        batch.map { row =>
          val decoded = decodeStub(row.payload)
          MediaFeature(
            row.doc_id,
            decoded.length,
            md5hex(md, decoded),
            md5hex(md, strideSample(decoded, stride)))
        }
      }
  }
}
