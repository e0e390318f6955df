package graft

import org.apache.spark.sql.SparkSession

/** Session factory with scale-appropriate defaults.
  *
  * Shuffle partitions default to the core count (local mode); on a real
  * cluster these would be sized to ~2-3x total cores via --conf. AQE is on so
  * skewed cell joins get split at runtime (SURVEY.md §4 item 2).
  */
object Session {

  /** Free the block-cache of a localCheckpoint()ed DataFrame. Dataset
    * .unpersist only drops CacheManager entries, not the checkpoint RDD's
    * blocks — long-running drivers that checkpoint in a loop (merge batches,
    * level probes) otherwise accumulate blocks until the RDD is GC'd.
    */
  def freeLocalCheckpoint(df: org.apache.spark.sql.DataFrame): Unit =
    df.queryExecution.analyzed match {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.unpersist(false)
      case _ => ()
    }
  def local(cores: Int = 32, appName: String = "graft"): SparkSession = {
    var builder = SparkSession
      .builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", (cores * 2).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      // keep at least one shuffle partition per core: the default 64 MB
      // advisory target coalesces CPU-heavy small-row stages below the core
      // count (fine for IO-bound 100 TB scans, wrong for compute-bound
      // stages); parallelismFirst + a small min size preserves parallelism
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "true")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "1m")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // local-mode split sizing: default 128 MB splits would give a
      // GB-scale local input only ~10 map tasks, idling most cores. A real
      // 100 TB table has tens of thousands of splits at the default — keep
      // that default in cluster deployments.
      .config("spark.sql.files.maxPartitionBytes",
        sys.env.getOrElse("SPARK_GRAFT_MAXPART", "32m"))
      .config("spark.sql.files.openCostInBytes", "1m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "127.0.0.1")
    // extra confs from the environment ("key=value;key=value") — lets a
    // deployment or an A/B measurement tune scale-dependent settings without
    // a code change; unset keeps the defaults above, so the driver's bench
    // stays comparable
    sys.env.get("SPARK_GRAFT_EXTRA_CONF").foreach(_.split(";").foreach { kv =>
      val i = kv.indexOf('=')
      if (i > 0) builder = builder.config(kv.take(i).trim, kv.drop(i + 1).trim)
    })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
