package graft.sources.v2

import java.util

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.hadoop.mapreduce.TaskAttemptID
import org.apache.hadoop.mapreduce.lib.input.{FileSplit, LineRecordReader}
import org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayBasedMapData
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, WriteBuilder}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, IsNotNull}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSourceV2 reader for the SAM-like alignment text format — the engine's
  * "real" connector face for the reference's primary domain format (SURVEY.md
  * §1.1b; the reference shells whole .sam files to samtools/Picard,
  * `SAMToSortedBAM.java:11-31`). Same record semantics as
  * [[graft.sources.Formats.readSamLike]] (parity asserted in FormatsSpec),
  * but as a first-class table provider:
  *
  *   - **splittable**: each file is cut into byte-range partitions
  *     (`maxPartitionBytes`, default 128 MiB) with standard
  *     first-line-after-offset split semantics via Hadoop's
  *     LineRecordReader — a 1 TB SAM file scans as ~8,000 parallel tasks
  *     without a driver-side line scan;
  *   - **column pruning** (SupportsPushDownRequiredColumns): only requested
  *     fields are parsed/materialized — `select(contig, pos)` never splits
  *     attrs or allocates the seq/qual strings;
  *   - **filter pushdown** (SupportsPushDownFilters): `contig = <lit>`
  *     is evaluated during the scan on the raw split fields, before any
  *     other column is materialized (row-skip, not IO-skip — text has no
  *     zone maps; the parquet path q19 covers stats pruning).
  *
  * Registered as `graft-sam` through DataSourceRegister:
  * `spark.read.format("graft-sam").load(path)`.
  */
class SamDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-sam"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = SamSourceV2.schema
  override def getTable(
      schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new SamTable(new CaseInsensitiveStringMap(properties))
}

object SamSourceV2 {
  /** Glob/dir-expanded, hidden-file-filtered listing shared by the batch
    * scan and the micro-batch stream.
    */
  def listFiles(raw: String, conf: Configuration): Array[org.apache.hadoop.fs.FileStatus] = {
    val globbed = new Path(raw)
    val fs = globbed.getFileSystem(conf)
    Option(fs.globStatus(globbed)).getOrElse(Array.empty).flatMap { st =>
      if (st.isDirectory) fs.listStatus(st.getPath).filterNot(_.isDirectory) else Array(st)
    }.filterNot(st => st.getPath.getName.startsWith("_") || st.getPath.getName.startsWith("."))
  }

  /** Hadoop conf as a serializable map (rebuilt executor-side). */
  def confMap(conf: Configuration): Map[String, String] = {
    val it = conf.iterator()
    val b = Map.newBuilder[String, String]
    while (it.hasNext) { val e = it.next(); b += (e.getKey -> e.getValue) }
    b.result()
  }

  /** The deserialization half of [[confMap]] — the ONE place executor-side
    * code rebuilds a Configuration (reader, stream, writer all call this;
    * three hand-rolled copies had already drifted into existence once).
    */
  def confFromMap(m: Map[String, String]): Configuration = {
    val conf = new Configuration(false)
    m.foreach { case (k, v) => conf.set(k, v) }
    conf
  }

  val schema: StructType = StructType(Seq(
    StructField("qname", StringType),
    StructField("flag", IntegerType),
    StructField("contig", StringType),
    StructField("pos", LongType),
    StructField("mapq", IntegerType),
    StructField("cigar", StringType),
    StructField("rnext", StringType),
    StructField("pnext", LongType),
    StructField("tlen", IntegerType),
    StructField("seq", StringType),
    StructField("qual", StringType),
    StructField("attrs", MapType(StringType, StringType))))
}

final class SamTable(options: CaseInsensitiveStringMap) extends Table
    with SupportsRead with SupportsWrite {
  override def name(): String = s"graft-sam(${options.get("path")})"
  override def schema(): StructType = SamSourceV2.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.STREAMING_WRITE,
      TableCapability.TRUNCATE)
  override def newScanBuilder(caseInsensitiveOptions: CaseInsensitiveStringMap): ScanBuilder =
    new SamScanBuilder(options)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new SamWriteBuilder(
      Option(options.get("path"))
        .orElse(Option(info.options.get("path")))
        .getOrElse(throw new IllegalArgumentException("graft-sam write needs a path")),
      info)
}

final class SamScanBuilder(options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownRequiredColumns with SupportsPushDownFilters {

  private var required: StructType = SamSourceV2.schema
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema

  /** Handles `contig = <lit>` and `contig IS NOT NULL` (the NOT NULL
    * residual Catalyst derives from the equality — accepting it keeps
    * contig out of the required columns when only used in the filter).
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (handled, rest) = filters.partition {
      case EqualTo("contig", _: String) => true
      case IsNotNull("contig") => true
      case _ => false
    }
    pushed = handled
    rest // everything else stays a post-scan Filter
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = new SamScan(options, required, pushed)
}

/** One byte range of one file; every range reads through the line crossing
  * its end (standard text-split contract, delegated to LineRecordReader).
  * `skipFirstLine` controls the start boundary: true = the usual split rule
  * (the first partial line belongs to the previous range); false = `start`
  * IS a line boundary (a streamed append at the previously committed
  * length), so the first line must NOT be discarded — the reader anchors
  * at `start-1` so LineRecordReader consumes exactly the boundary newline.
  */
final case class SamInputPartition(
    path: String, start: Long, length: Long, skipFirstLine: Boolean = true)
    extends InputPartition

final class SamScan(
    options: CaseInsensitiveStringMap, required: StructType, pushed: Array[Filter])
    extends Scan with Batch {

  // ALL pushed equalities apply conjunctively: pushFilters claimed every
  // EqualTo("contig", _) as handled, so every one must be enforced here —
  // keeping only the first would silently drop `contig = a AND contig = b`
  // (correct answer: empty) and return a's rows
  private val contigEqs: Seq[String] =
    pushed.collect { case EqualTo("contig", v: String) => v }.toSeq
  private val contigNotNull: Boolean =
    pushed.exists { case IsNotNull("contig") => true; case _ => false }

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-sam ReadSchema: ${required.simpleString}, " +
      s"PushedFilters: [${pushed.mkString(", ")}]"

  private def rawPath: String = Option(options.get("path")).getOrElse(
    throw new IllegalArgumentException("graft-sam needs a path option"))

  private def maxBytes: Long = {
    val spark = SparkSession.active
    Option(options.get("maxPartitionBytes")).map(_.toLong)
      .getOrElse(spark.sessionState.conf.filesMaxPartitionBytes)
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val conf = SparkSession.active.sparkContext.hadoopConfiguration
    val max = maxBytes
    SamSourceV2.listFiles(rawPath, conf).flatMap { st =>
      val len = st.getLen
      if (len == 0) Nil
      else (0L until len by max).map { off =>
        SamInputPartition(st.getPath.toString, off, math.min(max, len - off))
      }
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    // Ship the Hadoop conf entries needed to reopen the file on executors
    // (Configuration itself is not java-serializable).
    val confMap =
      SamSourceV2.confMap(SparkSession.active.sparkContext.hadoopConfiguration)
    SamPartitionReaderFactory(required.fieldNames, contigEqs, contigNotNull, confMap)
  }

  override def toMicroBatchStream(
      checkpointLocation: String): org.apache.spark.sql.connector.read.streaming.MicroBatchStream = {
    val confMap =
      SamSourceV2.confMap(SparkSession.active.sparkContext.hadoopConfiguration)
    new SamMicroBatchStream(
      rawPath, maxBytes,
      SamPartitionReaderFactory(required.fieldNames, contigEqs, contigNotNull, confMap),
      confMap)
  }
}

final case class SamPartitionReaderFactory(
    fields: Array[String], contigEqs: Seq[String], contigNotNull: Boolean,
    confMap: Map[String, String])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[SamInputPartition]
    new SamPartitionReader(p, fields, contigEqs, contigNotNull,
      SamSourceV2.confFromMap(confMap))
  }
}

/** Parses one split. Field extraction mirrors Formats.readSamLike exactly:
  * tab split keeping trailing empties, element_at-style null past the end,
  * cast-failure → null, attrs value = text after the LAST ':' (type code
  * dropped), header (`@`) and empty lines skipped.
  */
final class SamPartitionReader(
    part: SamInputPartition, fields: Array[String], contigEqs: Seq[String],
    contigNotNull: Boolean, conf: Configuration)
    extends PartitionReader[InternalRow] {

  private val reader = {
    val r = new LineRecordReader()
    // LineRecordReader discards everything up to the first newline whenever
    // start != 0. When `start` is itself a line boundary (streamed append),
    // anchor one byte earlier: the discarded prefix is then exactly the
    // boundary newline and the first appended line survives.
    val (s, l) =
      if (part.skipFirstLine || part.start == 0) (part.start, part.length)
      else (part.start - 1, part.length + 1)
    val split = new FileSplit(new Path(part.path), s, l, Array.empty[String])
    r.initialize(split, new TaskAttemptContextImpl(conf, new TaskAttemptID()))
    r
  }
  private var row: InternalRow = _

  private def utf8(s: String): UTF8String = UTF8String.fromString(s)
  private def at(parts: Array[String], i: Int): String =
    if (i <= parts.length) parts(i - 1) else null
  private def toIntOrNull(s: String): Any =
    if (s == null) null else try Integer.valueOf(s.trim.toInt) catch { case _: NumberFormatException => null }
  private def toLongOrNull(s: String): Any =
    if (s == null) null else try java.lang.Long.valueOf(s.trim.toLong) catch { case _: NumberFormatException => null }

  private def attrsMap(parts: Array[String]): ArrayBasedMapData = {
    val n = math.max(parts.length - 11, 0)
    val keys = new Array[Any](n)
    val vals = new Array[Any](n)
    var i = 0
    while (i < n) {
      val a = parts(11 + i)
      val first = a.indexOf(':')
      val last = a.lastIndexOf(':')
      keys(i) = utf8(if (first < 0) a else a.substring(0, first))
      vals(i) = utf8(if (last < 0) a else a.substring(last + 1))
      i += 1
    }
    ArrayBasedMapData(keys, vals)
  }

  private def extract(parts: Array[String], field: String): Any = field match {
    case "qname" => Option(at(parts, 1)).map(utf8).orNull
    case "flag"  => toIntOrNull(at(parts, 2))
    case "contig" => Option(at(parts, 3)).map(utf8).orNull
    case "pos"   => toLongOrNull(at(parts, 4))
    case "mapq"  => toIntOrNull(at(parts, 5))
    case "cigar" => Option(at(parts, 6)).map(utf8).orNull
    case "rnext" => Option(at(parts, 7)).map(utf8).orNull
    case "pnext" => toLongOrNull(at(parts, 8))
    case "tlen"  => toIntOrNull(at(parts, 9))
    case "seq"   => Option(at(parts, 10)).map(utf8).orNull
    case "qual"  => Option(at(parts, 11)).map(utf8).orNull
    case "attrs" => attrsMap(parts)
    case other => throw new IllegalArgumentException(s"unknown SAM field $other")
  }

  override def next(): Boolean = {
    while (reader.nextKeyValue()) {
      val line = reader.getCurrentValue.toString
      if (line.nonEmpty && line.charAt(0) != '@') {
        val parts = line.split("\t", -1)
        val contig = at(parts, 3)
        if ((!contigNotNull || contig != null) && contigEqs.forall(contig == _)) {
          val values = new Array[Any](fields.length)
          var i = 0
          while (i < fields.length) { values(i) = extract(parts, fields(i)); i += 1 }
          row = new GenericInternalRow(values)
          return true
        }
      }
    }
    false
  }

  override def get(): InternalRow = row
  override def close(): Unit = reader.close()
}
