package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.state.StateStore
import scala.collection.mutable

/**
 * Per-query profiling harness for the optimization rounds (guide §1:
 * measure first). Runs each named query exactly like [[Bench]] does, with
 * a [[SparkListener]] attached that attributes wall-clock to Spark jobs
 * (count, duration, task count, shuffle bytes) — the remainder is
 * driver-side work (log IO, planning, collects). Also dumps
 * `.explain("formatted")` of the returned DataFrame when
 * SPARK_GRAFT_EXPLAIN_DIR is set (the plans/r12 before/after artifacts).
 *
 * Dev-only tool: not part of the bench contract; never overwrites bench
 * artifacts.
 */
object ProfileQuery {
  private final case class JobRec(id: Int, desc: String, start: Long,
      var end: Long = -1L, var nTasks: Int = 0, var taskTimeMs: Long = 0L,
      var shuffleReadB: Long = 0L, var shuffleWriteB: Long = 0L,
      var stages: Int = 0, var stageNames: List[String] = Nil)

  private class L extends SparkListener {
    val jobs = mutable.LinkedHashMap.empty[Int, JobRec]
    private val stageToJob = mutable.Map.empty[Int, Int]
    override def onJobStart(e: SparkListenerJobStart): Unit = synchronized {
      val desc = Option(e.properties)
        .flatMap(p => Option(p.getProperty("spark.job.description")))
        .orElse(Option(e.properties)
          .flatMap(p => Option(p.getProperty("callSite.short"))))
        .getOrElse("")
      jobs(e.jobId) = JobRec(e.jobId, desc, e.time)
      e.stageIds.foreach(s => stageToJob(s) = e.jobId)
    }
    override def onJobEnd(e: SparkListenerJobEnd): Unit = synchronized {
      jobs.get(e.jobId).foreach(_.end = e.time)
    }
    override def onStageCompleted(e: SparkListenerStageCompleted): Unit = synchronized {
      val si = e.stageInfo
      stageToJob.get(si.stageId).flatMap(jobs.get).foreach { j =>
        j.stages += 1
        j.nTasks += si.numTasks
        j.taskTimeMs += si.taskMetrics.executorRunTime
        j.shuffleReadB += si.taskMetrics.shuffleReadMetrics.totalBytesRead
        j.shuffleWriteB += si.taskMetrics.shuffleWriteMetrics.bytesWritten
        if (!j.stageNames.contains(si.name)) j.stageNames ::= si.name
      }
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val explainDir = sys.env.get("SPARK_GRAFT_EXPLAIN_DIR")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version",
        sys.env.getOrElse("SPARK_GRAFT_COMMITTER_V", "1"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    Seq("lineitem", "orders", "events", "documents", "embeddings").foreach { t =>
      try spark.read.parquet(s"$sfDir/$t.parquet").limit(1).collect()
      catch { case scala.util.control.NonFatal(_) => () }
    }
    val names = if (args.nonEmpty) args.toSeq else sys.env
      .getOrElse("SPARK_GRAFT_PROFILE", "").split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val repeats = sys.env.getOrElse("SPARK_GRAFT_PROFILE_RUNS", "2").toInt
    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        throw new IllegalArgumentException(s"unknown query $name"))
      (1 to repeats).foreach { rep =>
        val l = new L
        spark.sparkContext.addSparkListener(l)
        graft.log.LogMetrics.reset()
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val t1 = System.nanoTime()
        val n = df.count()
        val t2 = System.nanoTime()
        try StateStore.stop()
        catch { case scala.util.control.NonFatal(_) => () }
        spark.sparkContext.removeSparkListener(l)
        // listener bus is async; give it a beat to drain
        Thread.sleep(300)
        val build = (t1 - t0) / 1e9; val count = (t2 - t1) / 1e9
        val jobs = l.jobs.values.toSeq
        val jobMs = jobs.map(j => math.max(0L, j.end - j.start)).sum
        println(f"== $name rep$rep rows=$n build=$build%.3f count=$count%.3f " +
          f"wall=${build + count}%.3f jobs=${jobs.size} jobTime=${jobMs / 1000.0}%.3f " +
          f"driverGap=${build + count - jobMs / 1000.0}%.3f")
        println(s"   log: ${graft.log.LogMetrics.report()}")
        if (rep == repeats) {
          jobs.sortBy(j => -(j.end - j.start)).take(40).foreach { j =>
            val d = if (j.end >= 0) j.end - j.start else -1
            println(f"   job ${j.id}%4d ${d}%6d ms tasks=${j.nTasks}%4d " +
              f"stages=${j.stages} taskTime=${j.taskTimeMs}%6d ms " +
              f"shR=${j.shuffleReadB}%9d shW=${j.shuffleWriteB}%9d  " +
              (j.desc + " | " + j.stageNames.reverse.mkString("; ")).take(150))
          }
          val byName = jobs.groupBy(_.stageNames.headOption.getOrElse("?"))
            .map { case (n, js) =>
              (n, js.size, js.map(j => math.max(0L, j.end - j.start)).sum,
                js.map(_.taskTimeMs).sum)
            }.toSeq.sortBy(-_._3)
          byName.take(20).foreach { case (n, cnt, ms, tt) =>
            println(f"   group n=$cnt%3d wall=${ms}%6d ms taskTime=${tt}%6d ms  ${n.take(120)}")
          }
          explainDir.foreach { dir =>
            val p = java.nio.file.Paths.get(dir)
            java.nio.file.Files.createDirectories(p)
            val plan = df.queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode)
            java.nio.file.Files.write(p.resolve(s"$name.txt"),
              plan.getBytes("UTF-8"))
            ()
          }
        }
      }
    }
    spark.stop()
  }
}
