package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.execution.FormattedMode

import graft.{GraftSession, SparkEntry}

/** Dump `.explain("formatted")` for declared queries — the plan evidence
  * the optimization rounds commit under `plans/`.
  *
  * Usage: runMain graft.tools.PlanDump <sfDir> <outDir> [q1,q2,...]
  * One `<outDir>/<query>.txt` per query (all queries when no list given).
  * Plans are compiled, not executed, so this is cheap enough to run for
  * the full suite; AQE plans print `isFinalPlan=false` (pre-execution
  * shape) which is the comparable artifact across rounds.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").map(_.trim).toSet) else None
    val cpus = sys.env.getOrElse(
      "SPARK_GRAFT_CPUS", Runtime.getRuntime.availableProcessors().toString)
    val spark = GraftSession
      .builder(appName = "graft-plandump", master = s"local[$cpus]",
        shufflePartitions = cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    val failed = scala.collection.mutable.ListBuffer.empty[String]
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .foreach { case (name, fn) =>
        try {
          val plan = fn(spark, sfDir).queryExecution.explainString(FormattedMode)
          Files.writeString(Paths.get(outDir, s"$name.txt"), plan)
        } catch { case e: Throwable =>
          failed += name
          System.err.println(s"[plandump] $name failed: ${e.getMessage}")
        }
      }
    spark.stop()
    require(failed.isEmpty, s"plan dump failed for: ${failed.mkString(",")}")
  }
}
