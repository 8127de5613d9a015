package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc optimization-round profiler: for each named query, after one
  * discarded warm pass, times (a) `fn(spark, dir)` construction — which
  * for driver-orchestrated operators (EM loops, learner rounds, pinned
  * scaffolds) executes every internal action — and (b) the final noop
  * sink, separately. Also reports per-job wall seconds from a listener,
  * so "many small jobs" vs "one slow stage" is readable at a glance.
  *
  * usage: runMain graft.TimeProbe <name>[,<name>...]
  * env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS as Bench.
  */
object TimeProbe {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").map(_.trim).filter(_.nonEmpty)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val byName = Registry.all.map(q => q.name -> q).toMap

    val jobs = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long)]()
    // Boxed key/value types so remove() on a missing key returns null
    // (a primitive-typed map unboxes the miss to 0L and the null check
    // below can never fire — a job whose start event was missed would
    // record a garbage epoch-sized duration).
    val jobStart = new java.util.concurrent.ConcurrentHashMap[Integer, java.lang.Long]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobStart.put(j.jobId, System.nanoTime())
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val t0 = jobStart.remove(Integer.valueOf(j.jobId))
        if (t0 != null) jobs.add(j.jobId -> (System.nanoTime() - t0.longValue()))
      }
    })

    def cleanup(): Unit = try {
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    } catch { case _: Throwable => () }

    names.foreach { name =>
      val q = byName(name)
      q.setup.foreach(_(spark, sfDir))
      // warm pass (codegen/JIT)
      try { q.fn(spark, sfDir).write.format("noop").mode("overwrite").save() }
      catch { case e: Throwable => System.err.println(s"$name warm failed: $e") }
      cleanup()
      jobs.clear()
      jobStart.clear() // drop warm-run jobs still in flight so a late end event can't pollute the timed list
      val t0 = System.nanoTime()
      val df = q.fn(spark, sfDir)
      val t1 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val t2 = System.nanoTime()
      val jl = jobs.toArray(Array.empty[(Int, Long)]).sortBy(_._1)
      println(f"$name%-35s construct=${(t1 - t0) / 1e9}%6.2fs sink=${(t2 - t1) / 1e9}%6.2fs jobs=${jl.length}%3d " +
        jl.map(j => f"${j._2 / 1e9}%.2f").mkString("[", ",", "]"))
      cleanup()
    }
    spark.stop()
  }
}
