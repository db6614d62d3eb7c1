package graft.tools

import graft.{GraftSession, Materialize, SparkEntry}
import java.nio.file.{Files, Paths}

/** Dump `.explain("formatted")` for named gates to files:
  * `runMain graft.tools.PlanDump <outDir> <suffix> <name1,name2,...>`
  * writes `<outDir>/<name>_<suffix>.txt` per gate. Building a gate's frame
  * runs its fixture side-effects (produces etc.); the dumped plan is the
  * gate's RETURNED DataFrame — the thing the bench times with count(). */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val Array(outDir, suffix, names) = args.take(3)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.get()
    Files.createDirectories(Paths.get(outDir))
    names.split(",").filter(_.nonEmpty).foreach { name =>
      try {
        val df = SparkEntry.queries(name)(spark, dir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.writeString(Paths.get(s"$outDir/${name}_$suffix.txt"), plan)
        println(s"PLAN $name -> $outDir/${name}_$suffix.txt (${plan.length} chars)")
      } catch { case e: Throwable =>
        System.err.println(s"PLAN $name FAILED: ${e.getMessage}")
      }
      Materialize.sweep(spark)
    }
    spark.stop()
  }
}
