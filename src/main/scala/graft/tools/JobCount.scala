package graft.tools

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}

import graft.{GraftSession, SparkEntry}

/** Measure how many Spark jobs/stages a declared query fires — the
  * fixed-cost profile behind the gate-scale wall-time floor (each job
  * pays scheduling + AQE stage waves + codegen regardless of data).
  *
  * Usage: runMain graft.tools.JobCount <sfDir> q1,q2,...
  * Prints one line per query: name, jobs, stages, wall seconds.
  */
object JobCount {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val names = args(1).split(",").map(_.trim).filter(_.nonEmpty)
    val cpus = sys.env.getOrElse(
      "SPARK_GRAFT_CPUS", Runtime.getRuntime.availableProcessors().toString)
    val spark = GraftSession
      .builder(appName = "graft-jobcount", master = s"local[$cpus]",
        shufflePartitions = cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        stages.incrementAndGet()
    })
    def run(name: String): Unit = {
      SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
    }
    // warm pass: JIT + any per-JVM fixtures, uncounted
    names.foreach(run)
    names.foreach { name =>
      Thread.sleep(200) // drain listener events from the previous query
      jobs.set(0); stages.set(0)
      val t0 = System.nanoTime()
      run(name)
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(200)
      println(f"JOBCOUNT $name%-36s jobs=${jobs.get}%3d stages=${stages.get}%3d wall=$wall%6.2f")
    }
    spark.stop()
  }
}
