package graft

import java.nio.file.{Files, Paths}

/** Plan-audit helper: writes `explain("formatted")` of the named
  * SparkEntry queries (all of them when no filter is given) to a file,
  * for the PLANS.md review pass. Usage:
  * `runMain graft.PlanDump <sfDir> <outFile> [name,name,...]` */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val (sfDir, outFile) = (args(0), args(1))
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else None
    val spark = GraftSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sb = new StringBuilder
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
        sb.append(s"==== $name ====\n")
        try sb.append(fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)).append("\n")
        catch { case e: Throwable => sb.append(s"FAILED: ${e.getMessage}\n") }
      }
    Files.writeString(Paths.get(outFile), sb.toString)
    spark.stop()
  }
}
