package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Per-job time attribution for one or more declared queries — the
 * measure-first harness of the optimization rounds (guide §1): runs each
 * named query once at sf0.1 (after one warm-up pass at sf0.001), with a
 * listener recording every Spark job's (description, duration, stage
 * count), then prints jobs in submission order plus a by-description
 * rollup. Call sites label phases via setJobDescription, so the rollup
 * attributes fixture-build vs serve cost inside a query.
 *
 * Usage: sbt "runMain graft.tools.Profile t30_bm25_maintained [more...]"
 * Env: SPARK_GRAFT_PROFILE_SF overrides the data dir. */
object Profile {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "pass query names")
    val sf = sys.env.getOrElse("SPARK_GRAFT_PROFILE_SF", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries",
        sys.env.getOrElse("SPARK_GRAFT_CODEGEN_CACHE", "10000"))
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    LocalIo.tuneLocalFs(spark)

    case class Job(id: Int, desc: String, start: Long, var end: Long = -1L,
                   var stages: Int = 0)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, Job]()
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    var recording = false
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = if (recording) {
        val desc = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .filter(_.nonEmpty)
          .orElse(e.stageInfos.sortBy(_.stageId).lastOption.map(_.name))
          .getOrElse("")
        jobs.put(e.jobId, Job(e.jobId, desc, e.time, stages = e.stageInfos.size))
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val j = jobs.get(e.jobId)
        if (j != null) j.end = e.time
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        if (recording) {
          val si = e.stageInfo
          val tm = si.taskMetrics
          val wall = (for {a <- si.completionTime; b <- si.submissionTime}
            yield a - b).getOrElse(-1L)
          stages.add(f"stage ${si.stageId}%4d tasks=${si.numTasks}%3d " +
            f"wall=${wall / 1e3}%6.2fs run=${tm.executorRunTime / 1e3}%7.2fs " +
            f"cpu=${tm.executorCpuTime / 1e9}%7.2fs " +
            f"deser=${tm.executorDeserializeTime / 1e3}%5.2fs " +
            f"shR=${tm.shuffleReadMetrics.totalBytesRead / 1024}%7dK " +
            f"shW=${tm.shuffleWriteMetrics.bytesWritten / 1024}%7dK " +
            s"${si.name.take(80)}")
        }
    }
    spark.sparkContext.addSparkListener(listener)

    val sampleHist = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    @volatile var sampling = false
    val samplerOn = sys.env.get("SPARK_GRAFT_PROFILE_SAMPLE").contains("1")
    val sampler = new Thread(() => {
      while (true) {
        if (sampling) {
          val stacks = Thread.getAllStackTraces
          stacks.forEach { (t, frames) =>
            if (t.getState == Thread.State.RUNNABLE && frames.nonEmpty &&
                !t.getName.contains("sampler")) {
              // attribute to the first frame from an interesting package
              val interesting = frames.find { f =>
                val c = f.getClassName
                c.startsWith("graft.") ||
                c.contains("catalyst.analysis") || c.contains("catalyst.optimizer") ||
                c.contains("RuleExecutor") || c.contains("QueryExecution") ||
                c.contains("ParquetFileReader") || c.contains("listStatus") ||
                c.contains("InMemoryFileIndex") || c.contains("DataSource") ||
                c.contains("FileFormatWriter") || c.contains("CodeGenerator") ||
                c.contains("ClosureCleaner") || c.contains("janino")
              }
              val key = interesting.map(f => s"${f.getClassName.split('.').takeRight(2).mkString(".")}.${f.getMethodName}")
                .getOrElse {
                  val f = frames.head
                  s"[top] ${f.getClassName.split('.').takeRight(2).mkString(".")}.${f.getMethodName}"
                }
              sampleHist.merge(key, 1, (a, b) => a + b)
            }
          }
        }
        Thread.sleep(10)
      }
    }, "profile-sampler")
    sampler.setDaemon(true)
    if (samplerOn) sampler.start()

    args.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      // warm-up: JIT + codegen caches, like Bench's warm pass
      try fn(spark, "/root/testdata/sf0.001").count()
      catch { case _: Throwable => () }
      graft.operators.Materialize.releaseAll()
      jobs.clear()
      stages.clear()
      sampleHist.clear()
      recording = true
      sampling = true
      val t0 = System.nanoTime()
      fn(spark, sf).count()
      val dt = (System.nanoTime() - t0) / 1e9
      sampling = false
      recording = false
      graft.operators.Materialize.releaseAll()
      // give the listener bus a beat so every end event lands
      Thread.sleep(300)
      val js = jobs.values.toArray(Array.empty[Job]).sortBy(_.id)
      println(f"======== $name  total=$dt%.3f s, ${js.length} jobs")
      js.foreach { j =>
        val d = if (j.end < 0) Double.NaN else (j.end - j.start) / 1e3
        println(f"  job ${j.id}%3d ${d}%7.3f s  stages=${j.stages}%2d  ${j.desc.take(150)}")
      }
      val roll = js.groupBy(_.desc).map { case (d, g) =>
        (g.map(j => if (j.end < 0) 0L else j.end - j.start).sum / 1e3, g.length, d)
      }.toSeq.sortBy(-_._1)
      println("  -- rollup by description --")
      roll.foreach { case (s, n, d) =>
        println(f"  $s%7.3f s  n=$n%3d  ${d.take(150)}")
      }
      val attributed = js.map(j => if (j.end < 0) 0L else j.end - j.start).sum / 1e3
      println(f"  attributed=${attributed}%.3f s of $dt%.3f s (gaps = driver-side work)")
      if (sys.env.get("SPARK_GRAFT_PROFILE_STAGES").contains("1")) {
        println("  -- stages (completion order) --")
        stages.forEach(s => println(s"  $s"))
      }
      if (samplerOn) {
        println("  -- RUNNABLE stack samples (10 ms tick) --")
        sampleHist.entrySet().toArray(Array.empty[java.util.Map.Entry[String, Integer]])
          .sortBy(e => -e.getValue.intValue).take(25)
          .foreach(e => println(f"  ${e.getValue.intValue}%5d  ${e.getKey}"))
      }
    }
    spark.stop()
  }
}
