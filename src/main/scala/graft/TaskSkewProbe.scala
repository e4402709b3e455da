package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** r18 measurement tool (guide §2.5, VERDICT item 7): run a declared
  * query and report per-STAGE task-time distributions (n, median, max,
  * max/median ratio, total) so a skew claim is checked against task
  * metrics instead of asserted from the plan. A max/median ratio above
  * ~5–10 on the dominant stage is the guide's fix-worthy skew signal.
  *
  * Usage: sbt "runMain graft.TaskSkewProbe <query> [sfDir] [out.json]"
  */
object TaskSkewProbe {

  def main(args: Array[String]): Unit = {
    val qname = args.headOption.getOrElse("join_bbox_grid")
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val out = args.lift(2).getOrElse(s"/tmp/taskskew_$qname.json")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val byStage = new java.util.concurrent.ConcurrentHashMap[Int,
      scala.collection.mutable.ArrayBuffer[(Long, Long, Long, Long)]]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        val buf = byStage.computeIfAbsent(te.stageId,
          _ => scala.collection.mutable.ArrayBuffer[(Long, Long, Long, Long)]())
        buf.synchronized {
          buf += ((te.taskInfo.duration,
            Option(te.taskMetrics).map(_.shuffleReadMetrics.totalBytesRead).getOrElse(0L),
            Option(te.taskMetrics).map(_.jvmGCTime).getOrElse(0L),
            Option(te.taskMetrics).map(_.executorRunTime).getOrElse(0L)))
        }
      }
    })

    val fn = SparkEntry.queries(qname)
    // warmup (codegen/footers) outside the profiled run
    spark.sparkContext.setJobDescription(s"taskskew warmup: $qname")
    fn(spark, sfDir).write.mode("overwrite").format("noop").save()
    byStage.clear()
    spark.sparkContext.setJobDescription(s"taskskew: $qname")
    val t0 = System.nanoTime()
    fn(spark, sfDir).write.mode("overwrite").format("noop").save()
    val wall = (System.nanoTime() - t0) / 1e9
    org.apache.spark.graftbridge.ListenerFlush.waitUntilEmpty(spark.sparkContext)

    def med(xs: Seq[Long]): Long = xs.sorted.apply(xs.size / 2)
    val stages = byStage.entrySet().iterator()
    val rows = scala.collection.mutable.ArrayBuffer[String]()
    while (stages.hasNext) {
      val e = stages.next()
      val ds = e.getValue.map(_._1).toSeq
      val sh = e.getValue.map(_._2).toSeq
      val gc = e.getValue.map(_._3).toSeq
      val rt = e.getValue.map(_._4).toSeq
      rows += s"""{"stage":${e.getKey},"n_tasks":${ds.size},""" +
        s""""median_ms":${med(ds)},"max_ms":${ds.max},""" +
        s""""ratio":${"%.2f".format(ds.max.toDouble / math.max(1L, med(ds)))},""" +
        s""""total_ms":${ds.sum},"gc_ms":${gc.sum},"run_ms":${rt.sum},""" +
        s""""shuffle_read_mb_max":${sh.max / (1024 * 1024)}}"""
    }
    val json = s"""{"query":"$qname","sf":"$sfDir","wall_sec":${"%.3f".format(wall)},""" +
      s""""stages":[${rows.sortBy(r => -r.split("\"total_ms\":")(1).dropRight(1).takeWhile(_.isDigit).toLong).mkString(",")}]}"""
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), json + "\n")
    println(json)
    spark.stop()
  }
}
