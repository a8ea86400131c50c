package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Dev probe (r17): the EXECUTED adaptive plan — what AQE actually ran,
  * including ReusedQueryStage/ReusedExchange nodes the initial explain
  * cannot show — plus job/stage/task counts and total input bytes, for
  * a set of registered queries. The initial plan for ngram_jaccard
  * shows 4 copies of the `hashed` subplan; whether runtime stage reuse
  * dedupes them decides which optimization is real (guide §7.2).
  * Usage: runMain graft.ProbeExecPlan <outDir> <suffix> <q1,q2,...> [sfDir]
  */
object ProbeExecPlan {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val names = args(2).split(",").map(_.trim).filter(_.nonEmpty)
    val dir = if (args.length > 3) args(3) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicInteger(0)
    val inputBytes = new AtomicLong(0L)
    val shuffleWrite = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        tasks.addAndGet(sc.stageInfo.numTasks)
        inputBytes.addAndGet(sc.stageInfo.taskMetrics.inputMetrics.bytesRead)
        shuffleWrite.addAndGet(
          sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
        ()
      }
    })
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    for (name <- names) {
      // warm pass (JIT/codegen), then 3 measured passes, min reported
      // (the bench convention — single passes on these latency-bound
      // rows swing ±25%) — timed like the bench: builder invocation
      // INSIDE the window, so eager checkpoint/fit jobs are charged
      // to the row
      SparkEntry.queries(name)(spark, dir).queryExecution.toRdd.count()
      var dt = Double.MaxValue
      var df: org.apache.spark.sql.DataFrame = null
      for (_ <- 0 until 3) {
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
        try org.apache.spark.graftbench.BroadcastDrain.drain(spark.sparkContext)
        catch { case _: Throwable => }
        System.gc()
        jobs.set(0); stages.set(0); tasks.set(0)
        inputBytes.set(0L); shuffleWrite.set(0L)
        val t0 = System.nanoTime()
        df = SparkEntry.queries(name)(spark, dir)
        df.queryExecution.toRdd.count()
        dt = math.min(dt, (System.nanoTime() - t0) / 1e9)
      }
      org.apache.spark.graftbench.ListenerSync.waitUntilEmpty(spark.sparkContext)
      val txt = df.queryExecution.executedPlan.toString()
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt"), txt)
      val reused = "ReusedQueryStage|ReusedExchange".r
        .findAllIn(txt).length
      val scans = "Scan parquet".r.findAllIn(txt).length
      println(f"EXECPLAN $name%-28s ${dt}%7.3f s jobs=${jobs.get()}%-3d " +
        f"stages=${stages.get()}%-3d tasks=${tasks.get()}%-5d " +
        f"input=${inputBytes.get() / 1048576.0}%8.1f MB " +
        f"shufW=${shuffleWrite.get() / 1048576.0}%8.1f MB " +
        f"scans=$scans reused=$reused")
    }
    spark.stop()
  }
}
