package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measurement harness for the optimization rounds (not part of the
  * declared query surface): decomposed phase timers, 3-pass noop-sink
  * A/B timing (`benchonly`), full-result md5 identity proofs (`hash`),
  * plan dumps (`explain`), and a noise-immune Spark job/task counter
  * (`jobs`). Kept committed so the second optimization round A/Bs
  * against the same instruments. */
object Scratch {
  def t[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    System.err.println(f"[scratch] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Engine.tuned(
      SparkSession.builder().master(s"local[$cpus]"),
      shufflePartitions = cpus.toInt
    ).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup (same as Bench)
    Seq("q12_pricing_summary", "q03_class_share", "t3_token_count", "s2_ann_bucket")
      .foreach { q =>
        SparkEntry.queries(q)(spark, sfDir).write.format("noop").mode("overwrite").save()
      }
    val what = args.headOption.getOrElse("m15")

    what match {
      case "deal" =>
        // cost of the legacy per-wave deal shape, measured standalone:
        // 4 filtered scans + coalesce(1) writes (what runWaveReplay did)
        // vs one partitioned write (what it does now)
        val docs = graft.io.Sources.table(spark, sfDir, "documents").select("doc_id", "text")
        for (i <- 1 to 3) {
          val work = java.nio.file.Files.createTempDirectory("graft_scratch_deal_").toString
          t(s"deal 4-scan #$i") {
            (0 until 4).foreach { b =>
              docs.filter(pmod(col("doc_id"), lit(4)) === b)
                .coalesce(1).write.mode("append").parquet(s"$work/in")
            }
          }
          val work2 = java.nio.file.Files.createTempDirectory("graft_scratch_deal_").toString
          t(s"deal 1-job #$i") {
            docs.withColumn("__wave", pmod(col("doc_id"), lit(4)))
              .repartition(4, col("__wave"))
              .write.partitionBy("__wave").parquet(s"$work2/in")
          }
        }
      case "m15" =>
        for (i <- 1 to 2) {
          val times = t(s"m15BatchTimes #$i") {
            graft.streaming.StreamMediaDedup.m15BatchTimes(spark, sfDir, 4)
          }
          System.err.println("[scratch] m15 batch times: " +
            times.map(v => f"$v%.3f").mkString(", ") + f" sum=${times.sum}%.3f")
        }
        for (i <- 1 to 2) {
          t(s"m15 full gate #$i") {
            SparkEntry.queries("m15_stream_near_dup")(spark, sfDir)
              .write.format("noop").mode("overwrite").save()
          }
        }
      case "m20" =>
        for (i <- 1 to 2) {
          t(s"m20 full gate #$i") {
            SparkEntry.queries("m20_stream_consensus")(spark, sfDir)
              .write.format("noop").mode("overwrite").save()
          }
        }
      case "p3" =>
        for (i <- 1 to 2) {
          t(s"p3 full gate #$i") {
            SparkEntry.queries("p3_full_funnel")(spark, sfDir)
              .write.format("noop").mode("overwrite").save()
          }
        }
      case "hash" =>
        // result-identity proof harness: md5 over sorted collected rows
        // per gate, written to the path in arg(1); diff two runs to
        // prove an optimization changed nothing the gate computes.
        val outPath = args(1)
        val only = args.drop(2).headOption.map(_.split(",").toSet)
        val sb = new StringBuilder
        SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
          if (only.forall(_.contains(name))) {
            try {
              val rows = fn(spark, sfDir).collect().map(_.toString).sorted
              val md = java.security.MessageDigest.getInstance("MD5")
              rows.foreach(r => md.update(r.getBytes("UTF-8")))
              val h = md.digest().map("%02x".format(_)).mkString
              sb.append(s"$name $h rows=${rows.length}\n")
              System.err.println(s"[scratch] $name $h rows=${rows.length}")
            } catch { case e: Throwable =>
              sb.append(s"$name FAILED ${e.getMessage}\n")
              System.err.println(s"[scratch] $name FAILED ${e.getMessage}")
            }
          }
        }
        java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath), sb.toString)
        ()
      case "explain" =>
        // dump .explain("formatted") for the named queries to dir arg(1)
        val outDir = args(1)
        new java.io.File(outDir).mkdirs()
        args(2).split(",").foreach { name =>
          val df = SparkEntry.queries(name)(spark, sfDir)
          val plan = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          java.nio.file.Files.writeString(
            java.nio.file.Paths.get(s"$outDir/$name.txt"), plan)
          System.err.println(s"[scratch] wrote $outDir/$name.txt")
        }
      case "jobs" =>
        // noise-immune measurement: Spark jobs + tasks launched per gate
        // (one run each) — structural evidence that an optimization
        // removed work, independent of host contention
        val counter = new org.apache.spark.scheduler.SparkListener {
          val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
          val tasks = new java.util.concurrent.atomic.AtomicInteger(0)
          override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
            jobs.incrementAndGet(); ()
          }
          override def onTaskStart(t: org.apache.spark.scheduler.SparkListenerTaskStart): Unit = {
            tasks.incrementAndGet(); ()
          }
        }
        spark.sparkContext.addSparkListener(counter)
        args(1).split(",").foreach { n =>
          counter.jobs.set(0); counter.tasks.set(0)
          val t0 = System.nanoTime()
          SparkEntry.queries(n)(spark, sfDir).write.format("noop").mode("overwrite").save()
          Thread.sleep(300) // let listener events drain
          System.err.println(f"[scratch] $n jobs=${counter.jobs.get} tasks=${counter.tasks.get} " +
            f"wall=${(System.nanoTime() - t0) / 1e9}%.3f")
        }
      case "benchonly" =>
        // 3-pass noop-sink timing for the named queries (arg 1)
        val names = args(1).split(",").toSeq
        val res = scala.collection.mutable.Map.empty[String, List[Double]]
        for (p <- 1 to 3; n <- names) {
          val t0 = System.nanoTime()
          SparkEntry.queries(n)(spark, sfDir).write.format("noop").mode("overwrite").save()
          res(n) = ((System.nanoTime() - t0) / 1e9) :: res.getOrElse(n, Nil)
        }
        names.foreach { n =>
          val xs = res(n)
          System.err.println(f"[scratch] $n min=${xs.min}%.3f med=${xs.sorted.apply(xs.size / 2)}%.3f raw=" +
            xs.reverse.map(v => f"$v%.3f").mkString(","))
        }
      case q =>
        for (i <- 1 to 2) {
          t(s"$q #$i") {
            SparkEntry.queries(q)(spark, sfDir)
              .write.format("noop").mode("overwrite").save()
          }
        }
    }
    spark.stop()
  }
}
