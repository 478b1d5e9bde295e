package graft.sources.v2

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.StructType
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
  * batch reader stack end-to-end: same splits, same pruning, same pushed
  * filters.
  */
final class SamMicroBatchStream(
    rawPath: String, maxBytes: Long, required: StructType, pushed: Array[Filter],
    confMap: Map[String, String])
    extends MicroBatchStream {

  private def conf: Configuration = {
    val c = new Configuration(false)
    confMap.foreach { case (k, v) => c.set(k, v) }
    c
  }

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
          SamInputPartition(path, off, math.min(maxBytes, len - off))
        }
      else Nil
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val contigEq = pushed.collectFirst {
      case org.apache.spark.sql.sources.EqualTo("contig", v: String) => v
    }
    val contigNotNull = pushed.exists {
      case org.apache.spark.sql.sources.IsNotNull("contig") => true; case _ => false
    }
    SamPartitionReaderFactory(required.fieldNames, contigEq, contigNotNull, confMap)
  }
}
