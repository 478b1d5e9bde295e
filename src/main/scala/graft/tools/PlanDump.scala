package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.execution.ExplainMode

import graft.{Sessions, SparkEntry}

/** Dumps `explain("formatted")` for the named SparkEntry queries to
  * `plans/<tag>/<query>_<suffix>.txt` — the per-query before/after plan
  * evidence an optimization round commits next to its numbers.
  *
  * Usage: sbt "runMain graft.tools.PlanDump r17 before q103_triangles ..."
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDump <tag> <suffix> <query>...")
    val (tag, suffix, names) = (args(0), args(1), args.drop(2).toSeq)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    spark.sparkContext.setLogLevel("WARN")
    val dir = Paths.get(s"plans/$tag")
    Files.createDirectories(dir)
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val formatted =
        df.queryExecution.explainString(ExplainMode.fromString("formatted"))
      Files.writeString(dir.resolve(s"${name}_$suffix.txt"), formatted)
      println(s"wrote plans/$tag/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
