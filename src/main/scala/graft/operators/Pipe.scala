package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** External-process escape hatch: stream partitions of line-formatted rows
  * through a subprocess and parse its stdout back into a DataFrame.
  *
  * This is the record-level re-expression of the reference's
  * subprocess-per-file pattern (embedded samtools runner, daas-apps
  * `utils/MiscUtils.executeResourceBinary:88-135` + `rdd.pipe`-style
  * SparkAligner chunking, SURVEY.md S7/O21) — but partition-parallel and
  * with failure = task failure (the reference swallows exhausted retries,
  * `utils/BaseGATKProgram.java:31-39`; we deliberately do NOT).
  *
  * Scale: one external process per partition, streaming both directions —
  * no per-record fork, no driver involvement. Keep for genuinely external
  * tools only; native expressions always beat pipes (no codegen across the
  * pipe boundary).
  */
object Pipe {

  /** Pipe tab-joined `cols` through `cmd`; parse stdout lines as
    * tab-separated `outCols` (all LongType for simplicity of the contract —
    * widen as needed).
    */
  def pipeLongs(df: DataFrame, cols: Seq[String], cmd: Seq[String],
                outCols: Seq[String])(implicit s: SparkSession): DataFrame = {
    // null guard in the same pass: concat_ws SKIPS nulls, which would
    // silently shift the tab-separated fields the subprocess sees (column
    // c read in column b's slot) — a misaligned pipe must be a task
    // failure, not wrong output
    val checked = cols.map(c =>
      when(col(c).isNull,
        raise_error(lit(s"pipeLongs: column $c is null — piped fields would shift")))
        .otherwise(col(c)))
    pipeParse(df.select(concat_ws("\t", checked: _*)), cmd, outCols)
  }

  /** Pipe (id, binary) rows through an external decoder as
    * "id \t base64(payload)" lines, parsing stdout lines as tab-separated
    * longs — THE production recipe for the compressed multimodal codecs
    * (MP3, video frame-sampling) the JVM can't decode natively
    * (`multimodal.Binary`'s documented stubs): `cmd` wraps the real tool —
    * `ffmpeg -i pipe:`, `sox -t mp3 -`, a frame-sampler — reading base64
    * payloads from stdin and emitting one feature line per input row.
    * Base64 is the framing, not a format opinion: it keeps arbitrary
    * bytes inside the line protocol `rdd.pipe` speaks, with the id riding
    * alongside so the subprocess's output joins back without ordering
    * assumptions. Partition-parallel, one process per partition,
    * streaming both directions, no driver involvement; a decoder crash
    * is a task failure, never a silently-skipped row. MultimodalSpec
    * drives the full path with a stand-in shell decoder; swap in the
    * codec binary and the plumbing is unchanged.
    */
  def pipeBinaryLongs(df: DataFrame, idCol: String, binCol: String,
                      cmd: Seq[String], outCols: Seq[String])
                     (implicit s: SparkSession): DataFrame = {
    val id = when(col(idCol).isNull,
      raise_error(lit(s"pipeBinaryLongs: $idCol is null"))).otherwise(col(idCol))
    val payload = when(col(binCol).isNull,
      raise_error(lit(s"pipeBinaryLongs: $binCol is null — decode a null " +
        "payload explicitly upstream"))).otherwise(col(binCol))
    // Spark's base64 can emit MIME-CHUNKED output (76-char lines joined
    // with \r\n — version/legacy-conf dependent), which would shatter one
    // payload across several pipe lines and feed the decoder truncated
    // base64 for any payload over 56 bytes. Deleting CR/LF restores the
    // one-row-one-line framing unconditionally (RFC 4648 decoders ignore
    // none/it's absent when unchunked — translate is a no-op then), so
    // the recipe does not depend on spark.sql.legacy.chunkBase64String.
    // Caught by the real-decoder MultimodalSpec case: a 244-byte WAV
    // arrived as four lines.
    pipeParse(df.select(concat_ws("\t", id.cast("string"),
        translate(base64(payload), "\r\n", ""))),
      cmd, outCols)
  }

  private def pipeParse(lines: DataFrame, cmd: Seq[String],
                        outCols: Seq[String])
                       (implicit s: SparkSession): DataFrame = {
    import s.implicits._
    val piped = lines.as[String].rdd.pipe(cmd).map { line =>
      line.split("\t", -1).map(_.toLong).toSeq
    }
    val out = piped.map(xs => org.apache.spark.sql.Row.fromSeq(xs))
    val schema = org.apache.spark.sql.types.StructType(outCols.map(c =>
      org.apache.spark.sql.types.StructField(c, org.apache.spark.sql.types.LongType, nullable = false)))
    s.createDataFrame(out, schema)
  }
}
