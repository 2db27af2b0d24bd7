package graft
import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import scala.collection.mutable

/** Optimization-round tooling: run one declared query under Bench's
  * session config and print a per-Spark-job decomposition — wall time,
  * stage count, task count, shuffle read/write bytes, input bytes —
  * so a query's seconds can be attributed to its actions (the §1
  * "empirical" loop without the UI, which is disabled in this
  * sandbox). Construction (side-effect builds: registry writes, temp
  * stages) is timed separately from the final noop sink.
  *
  * Usage: ProfileQuery <sfDir> <name> [passes]
  */
object ProfileQuery {
  final case class JobRow(id: Int, desc: String, ms: Long, stages: Int,
    tasks: Int, shufR: Long, shufW: Long, input: Long)

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val passes = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val jobs = mutable.ArrayBuffer[JobRow]()
    val starts = mutable.Map[Int, (Long, String)]()
    val stageOfJob = mutable.Map[Int, Int]()
    val agg = mutable.Map[Int, (Int, Long, Long, Long)]() // tasks, shufR, shufW, input
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        starts(js.jobId) =
          (System.nanoTime(), Option(js.properties)
            .flatMap(p => Option(p.getProperty("spark.job.description")))
            .getOrElse(""))
        js.stageIds.foreach(sid => stageOfJob(sid) = js.jobId)
        agg(js.jobId) = (0, 0L, 0L, 0L)
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        stageOfJob.get(si.stageId).foreach { jid =>
          val (t, r, w, i) = agg.getOrElse(jid, (0, 0L, 0L, 0L))
          val m = si.taskMetrics
          agg(jid) = (t + si.numTasks,
            r + m.shuffleReadMetrics.totalBytesRead,
            w + m.shuffleWriteMetrics.bytesWritten,
            i + m.inputMetrics.bytesRead)
        }
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        starts.remove(je.jobId).foreach { case (t0, desc) =>
          val (t, r, w, i) = agg.getOrElse(je.jobId, (0, 0L, 0L, 0L))
          jobs.synchronized {
            jobs += JobRow(je.jobId, desc,
              (System.nanoTime() - t0) / 1000000, 0, t, r, w, i)
          }
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)

    def mb(b: Long): String = f"${b / 1048576.0}%8.2f"
    (1 to passes).foreach { pass =>
      jobs.clear()
      val t0 = System.nanoTime()
      val df = Queries.all(name)(spark, sfDir)
      val t1 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val t2 = System.nanoTime()
      // listener bus is async; give it a moment to drain
      Thread.sleep(300)
      println(f"== pass $pass: construct ${(t1 - t0) / 1e9}%.3f s, " +
        f"noop-sink ${(t2 - t1) / 1e9}%.3f s, " +
        f"total ${(t2 - t0) / 1e9}%.3f s, jobs ${jobs.size}")
      println(f"${"job"}%4s ${"ms"}%7s ${"tasks"}%6s ${"inMB"}%9s " +
        f"${"shRMB"}%9s ${"shWMB"}%9s  desc")
      jobs.sortBy(-_.ms).take(30).foreach { j =>
        println(f"${j.id}%4d ${j.ms}%7d ${j.tasks}%6d ${mb(j.input)}%9s " +
          f"${mb(j.shufR)}%9s ${mb(j.shufW)}%9s  ${j.desc.take(70)}")
      }
    }
    spark.stop()
  }
}
