package graft.sources.v2

import java.io.{BufferedWriter, OutputStreamWriter}
import java.nio.charset.StandardCharsets
import java.util.UUID

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.MapData
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.types.StructType

/** Batch write side of the `graft-sam` connector: each task streams its
  * partition to a temp file (`_tmp-<uuid>-part-<pid>.sam`) and the driver
  * commit renames temps to final `part-<pid>.sam` names — the classic
  * two-phase output commit (task output is invisible until the driver
  * rename), so failed/speculative tasks leave no partial output behind.
  * Scale shape: one sequential stream per task, no driver data movement —
  * the gather the reference does by driver-side BAM merging
  * (`utils/BAMMerger.java:19-47`) is here a directory of per-partition
  * files, mergeable lazily by any downstream scan.
  *
  * Serialization conventions (documented loss vs. a real SAM writer): null
  * strings → `*`, null numerics → 0, attrs written as `KEY:Z:value` (the
  * read path drops the original type code, so round-trips preserve the
  * key→value map, not the type letter).
  */
final class SamWriteBuilder(path: String, info: LogicalWriteInfo)
    extends WriteBuilder with SupportsTruncate {
  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }
  override def build(): Write = new SamWrite(path, info.schema(), doTruncate, info.queryId())
}

final class SamWrite(path: String, schema: StructType, truncate: Boolean, queryId: String)
    extends Write {
  override def toBatch: BatchWrite = new SamBatchWrite(path, schema, truncate)
  override def toStreaming: StreamingWrite = {
    // Complete-mode truncation is not implemented for this sink; accepting
    // it (SupportsTruncate is advertised for BATCH overwrite) and then
    // ignoring it would accumulate every epoch's full snapshot. Fail fast.
    if (truncate) throw new UnsupportedOperationException(
      "graft-sam streaming sink supports append output mode only")
    new SamStreamingWrite(path, schema, queryId)
  }
}

/** Streaming sink face: same per-task temp + driver-rename protocol, with
  * the epoch id baked into the final file names
  * (`part-<pid>-e<epoch>-q<queryId>.sam`), so a replayed epoch (failure
  * between task success and offset-log commit — including a QUERY RESTART
  * from the checkpoint) overwrites its own files instead of duplicating
  * rows. The suffix derives from the STABLE streaming queryId, never a
  * per-run random id: a restarted run must regenerate the same names for
  * the replayed epoch or idempotency is lost.
  */
final class SamStreamingWrite(path: String, schema: StructType, queryId: String)
    extends StreamingWrite {
  private val sinkId = s"q${queryId.replace("-", "").take(8)}"

  override def createStreamingWriterFactory(info: PhysicalWriteInfo): StreamingDataWriterFactory =
    SamDataWriterFactory(path, schema.fieldNames, sinkId,
      SamSourceV2.confMap(SparkSession.active.sparkContext.hadoopConfiguration))

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    SamWriteCommit.renameAll(path, messages, replaceExisting = true,
      context = s"epoch $epochId")
    // Overwrite-by-name alone has a hole: a replayed epoch can produce
    // FEWER partitions than the crashed attempt (changed
    // spark.sql.shuffle.partitions, AQE coalescing differently), and the
    // first attempt's higher-pid files for THIS epoch would survive as
    // duplicate rows. This epoch's files are exactly `part-*-e<id>-q*.sam`,
    // so anything with the epoch suffix NOT in this commit set is stale.
    val committed = messages.collect { case SamCommit(_, fin) => new Path(fin).getName }.toSet
    val suffix = s"-e$epochId-$sinkId.sam"
    val dir = new Path(path)
    val fs = dir.getFileSystem(SparkSession.active.sparkContext.hadoopConfiguration)
    if (fs.exists(dir)) fs.listStatus(dir).map(_.getPath).foreach { p =>
      val n = p.getName
      if (n.startsWith("part-") && n.endsWith(suffix) && !committed.contains(n))
        fs.delete(p, false)
    }
  }

  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
    SamWriteCommit.deleteTemps(path, messages)
}

final class SamBatchWrite(path: String, schema: StructType, truncate: Boolean)
    extends BatchWrite {

  // Job-scoped id in final file names: appends never collide with earlier
  // jobs' output, and truncate = "delete part files not carrying this id".
  private val jobId = UUID.randomUUID().toString.take(8)

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    SamDataWriterFactory(path, schema.fieldNames, jobId,
      SamSourceV2.confMap(SparkSession.active.sparkContext.hadoopConfiguration))

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val conf = SparkSession.active.sparkContext.hadoopConfiguration
    val dir = new Path(path)
    val fs = dir.getFileSystem(conf)
    if (truncate && fs.exists(dir)) {
      fs.listStatus(dir)
        .filter { st =>
          val n = st.getPath.getName
          n.startsWith("part-") && n.endsWith(".sam") && !n.contains(jobId)
        }
        .foreach(st => fs.delete(st.getPath, false))
    }
    SamWriteCommit.renameAll(path, messages, replaceExisting = false, context = "batch")
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    SamWriteCommit.deleteTemps(path, messages)
}

/** Shared driver-side commit/abort mechanics for the batch and streaming
  * sink faces.
  */
private[v2] object SamWriteCommit {
  private def fileSystem(path: String) =
    new Path(path).getFileSystem(SparkSession.active.sparkContext.hadoopConfiguration)

  def renameAll(path: String, messages: Array[WriterCommitMessage],
                replaceExisting: Boolean, context: String): Unit = {
    val fs = fileSystem(path)
    messages.foreach {
      case SamCommit(tmp, fin) =>
        val t = new Path(tmp)
        val f = new Path(fin)
        if (fs.exists(t)) {
          if (replaceExisting && fs.exists(f)) fs.delete(f, false) // replayed epoch
          if (!fs.rename(t, f))
            throw new java.io.IOException(s"$context commit rename failed: $tmp -> $fin")
        } else if (!fs.exists(f)) {
          // A missing temp is only legal if a previous commit attempt
          // already renamed it — otherwise the partition's output is LOST
          // and the job must fail, not silently succeed.
          throw new java.io.IOException(
            s"$context commit lost task output: $tmp missing and $fin absent")
        }
      case other => throw new IllegalStateException(s"unexpected commit $other")
    }
  }

  def deleteTemps(path: String, messages: Array[WriterCommitMessage]): Unit = {
    val fs = fileSystem(path)
    messages.foreach {
      case SamCommit(tmp, _) => fs.delete(new Path(tmp), false)
      case _ =>
    }
  }
}

final case class SamCommit(tmpPath: String, finalPath: String) extends WriterCommitMessage

/** Task-side writer factory for both the batch and streaming faces; the
  * streaming path bakes the epoch into the per-writer id so replayed
  * epochs regenerate identical final names.
  */
final case class SamDataWriterFactory(
    path: String, fields: Array[String], jobId: String, confMap: Map[String, String])
    extends DataWriterFactory with StreamingDataWriterFactory {
  private def conf(): Configuration = SamSourceV2.confFromMap(confMap)
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new SamDataWriter(path, fields, jobId, partitionId, conf())
  override def createWriter(
      partitionId: Int, taskId: Long, epochId: Long): DataWriter[InternalRow] =
    new SamDataWriter(path, fields, s"e$epochId-$jobId", partitionId, conf())
}

final class SamDataWriter(
    dir: String, fields: Array[String], jobId: String, partitionId: Int, conf: Configuration)
    extends DataWriter[InternalRow] {

  private val base = new Path(dir)
  private val fs = base.getFileSystem(conf)
  private val tmp = new Path(base, s"_tmp-${UUID.randomUUID()}-part-$partitionId.sam")
  private val fin = new Path(base, f"part-$partitionId%05d-$jobId.sam")
  private lazy val out: BufferedWriter = {
    fs.mkdirs(base)
    new BufferedWriter(new OutputStreamWriter(fs.create(tmp, true), StandardCharsets.UTF_8))
  }

  // Canonical SAM column order; written independent of input field order.
  private val order = Seq(
    "qname", "flag", "contig", "pos", "mapq", "cigar",
    "rnext", "pnext", "tlen", "seq", "qual")
  private val idx: Map[String, Int] = fields.zipWithIndex.toMap

  private def str(row: InternalRow, f: String): String = idx.get(f) match {
    case Some(i) if !row.isNullAt(i) =>
      f match {
        case "flag" | "mapq" | "tlen" => row.getInt(i).toString
        case "pos" | "pnext" => row.getLong(i).toString
        case _ => row.getUTF8String(i).toString
      }
    case _ => f match {
      case "flag" | "mapq" | "tlen" | "pos" | "pnext" => "0"
      case _ => "*"
    }
  }

  override def write(row: InternalRow): Unit = {
    val sb = new StringBuilder()
    order.foreach { f => sb.append(str(row, f)).append('\t') }
    sb.setLength(sb.length - 1)
    idx.get("attrs").foreach { i =>
      if (!row.isNullAt(i)) {
        val m: MapData = row.getMap(i)
        val keys = m.keyArray(); val vals = m.valueArray()
        var j = 0
        while (j < m.numElements()) {
          sb.append('\t').append(keys.getUTF8String(j).toString)
            .append(":Z:").append(vals.getUTF8String(j).toString)
          j += 1
        }
      }
    }
    out.write(sb.toString()); out.newLine()
  }

  override def commit(): WriterCommitMessage = {
    out.close()
    SamCommit(tmp.toString, fin.toString)
  }
  override def abort(): Unit = { try out.close() catch { case _: Exception => } ; fs.delete(tmp, false) }
  override def close(): Unit = ()
}
