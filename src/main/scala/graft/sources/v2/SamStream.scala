package graft.sources.v2

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.json4s.{DefaultFormats, Formats, JLong, JObject}
import org.json4s.jackson.JsonMethods.{compact, parse, render}

/** Offset = the byte length consumed per file. Files are assumed
  * append-at-line-boundary (or immutable once written — the usual
  * drop-a-finished-file ingest); a grown file contributes exactly its new
  * byte range to the next micro-batch, and LineRecordReader's split
  * contract (skip to the first full line after a non-zero start) makes the
  * range boundary safe.
  */
final case class SamStreamOffset(files: Map[String, Long]) extends Offset {
  override def json(): String =
    compact(render(JObject(
      files.toSeq.sortBy(_._1).map { case (k, v) => k -> (JLong(v): org.json4s.JValue) }.toList)))
}

object SamStreamOffset {
  private implicit val formats: Formats = DefaultFormats
  def fromJson(json: String): SamStreamOffset =
    SamStreamOffset(parse(json).extract[Map[String, Long]])
}

/** Micro-batch streaming read of a growing directory of SAM-like files —
  * the streaming face of the `graft-sam` connector (the reference's ingest
  * edge is "new FASTQ/SAM files appear on the shared filesystem",
  * `MiscUtils.java:15-38`; here that becomes a Structured Streaming source
  * with exactly-once file-range accounting via the offset log). Reuses the
  * batch reader stack end-to-end — `readerFactory` is built by SamScan, so
  * pruning and pushed filters are shared by construction, not re-derived.
  */
final class SamMicroBatchStream(
    rawPath: String, maxBytes: Long, readerFactory: PartitionReaderFactory,
    confMap: Map[String, String])
    extends MicroBatchStream {

  private def conf: Configuration = SamSourceV2.confFromMap(confMap)

  private def currentFiles(): Map[String, Long] =
    SamSourceV2.listFiles(rawPath, conf).map(st => st.getPath.toString -> st.getLen).toMap

  override def initialOffset(): Offset = SamStreamOffset(Map.empty)
  override def latestOffset(): Offset = SamStreamOffset(currentFiles())
  override def deserializeOffset(json: String): Offset = SamStreamOffset.fromJson(json)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val done = start.asInstanceOf[SamStreamOffset].files
    val target = end.asInstanceOf[SamStreamOffset].files
    target.toSeq.sortBy(_._1).flatMap { case (path, len) =>
      val from = done.getOrElse(path, 0L)
      if (len > from)
        (from until len by maxBytes).map { off =>
          // The first range of a grown file starts AT the committed length —
          // a line boundary per the append contract, so its first line is
          // data, not a continuation (skipFirstLine=false). Later ranges of
          // the same region follow the normal split rule.
          SamInputPartition(path, off, math.min(maxBytes, len - off),
            skipFirstLine = off != from)
        }
      else Nil
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = readerFactory
}
