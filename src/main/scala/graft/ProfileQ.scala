package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Dev tool (round 16): per-query cost ATTRIBUTION, not just wall time.
  * For each named query it separates
  *   - plan construction (the Scala fn building the DataFrame — includes
  *     any eager work the builder does: localCheckpoints, bounded
  *     collects, shared-index builds),
  *   - analysis+optimization+physical planning (executedPlan),
  *   - execution (count), with listener-counted jobs / stages / tasks and
  *     the summed task time (so wall − task/cores ≈ scheduling + driver
  *     overhead).
  * At sf0.1 the corpus is tiny, so a query whose wall time dwarfs its
  * summed task time is dominated by per-job fixed costs (driver-side
  * planning, codegen, job scheduling, broadcast creation) — a different
  * optimization target than a shuffle-bound plan. `reps` (args(2), default
  * 2) shows the warm-path cost once shared indices/codegen are cached. */
object ProfileQ {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",")
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.cleaner.periodicGC.interval", "15s")
    sys.env.get("PROFILEQ_EVENTLOG").foreach { dir =>
      new java.io.File(dir).mkdirs()
      b.config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.dir", dir)
    }
    Bench.tmpfsScratch().foreach(p => b.config("spark.local.dir", s"$p/local"))
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0
    @volatile var taskTimeMs = 0L
    val stageTime = new java.util.concurrent.ConcurrentHashMap[Int, (String, Long)]()
    val stageOfTask = new java.util.concurrent.ConcurrentHashMap[Int, Int]()
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs += 1
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages += 1
        val prev = stageTime.getOrDefault(s.stageInfo.stageId, ("", 0L))
        stageTime.put(s.stageInfo.stageId,
          (s.stageInfo.name.take(120), prev._2))
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks += 1
        if (t.taskInfo != null) {
          taskTimeMs += t.taskInfo.duration
          val prev = stageTime.getOrDefault(t.stageId, ("", 0L))
          stageTime.put(t.stageId, (prev._1, prev._2 + t.taskInfo.duration))
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    def resetCounters(): Unit =
      { jobs = 0; stages = 0; tasks = 0; taskTimeMs = 0; stageTime.clear() }
    def topStages(k: Int): String = {
      import scala.jdk.CollectionConverters._
      stageTime.asScala.toSeq.sortBy(-_._2._2).take(k)
        .map { case (id, (nm, ms)) => f"  stage $id ${ms / 1e3}%.2f s  $nm" }
        .mkString("\n")
    }

    try SparkEntry.queries("q_exact_counts")(spark, sfDir).count()
    catch { case scala.util.control.NonFatal(_) => () }

    def gcMs(): Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(_.getCollectionTime).sum
    }
    names.foreach { name =>
      (1 to reps).foreach { i =>
        resetCounters()
        val gc0 = gcMs()
        val t0 = System.nanoTime()
        val df = SparkEntry.queries(name)(spark, sfDir)
        val t1 = System.nanoTime()
        val buildJobs = jobs
        df.queryExecution.executedPlan // force analysis/optimization/planning
        val t2 = System.nanoTime()
        val n = df.count()
        val t3 = System.nanoTime()
        // let async listener events drain before reading counters
        Thread.sleep(200)
        println(f"[profile] $name rep$i: total=${(t3 - t0) / 1e9}%.2f " +
          f"build=${(t1 - t0) / 1e9}%.2f (jobs_in_build=$buildJobs) " +
          f"plan=${(t2 - t1) / 1e9}%.2f exec=${(t3 - t2) / 1e9}%.2f " +
          f"jobs=$jobs stages=$stages tasks=$tasks " +
          f"taskTime=${taskTimeMs / 1e3}%.2f s gc=${(gcMs() - gc0) / 1e3}%.2f s ($n rows)")
        if (sys.env.contains("PROFILEQ_STAGES")) println(topStages(8))
      }
    }
    spark.stop()
  }
}
