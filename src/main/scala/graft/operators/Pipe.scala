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
    import s.implicits._
    // null guard in the same pass: concat_ws SKIPS nulls, which would
    // silently shift the tab-separated fields the subprocess sees (column
    // c read in column b's slot) — a misaligned pipe must be a task
    // failure, not wrong output
    val checked = cols.map(c =>
      when(col(c).isNull,
        raise_error(lit(s"pipeLongs: column $c is null — piped fields would shift")))
        .otherwise(col(c)))
    val lines = df.select(concat_ws("\t", checked: _*)).as[String]
    val piped = lines.rdd.pipe(cmd).map { line =>
      line.split("\t", -1).map(_.toLong).toSeq
    }
    val out = piped.map(xs => org.apache.spark.sql.Row.fromSeq(xs))
    val schema = org.apache.spark.sql.types.StructType(outCols.map(c =>
      org.apache.spark.sql.types.StructField(c, org.apache.spark.sql.types.LongType, nullable = false)))
    s.createDataFrame(out, schema)
  }
}
