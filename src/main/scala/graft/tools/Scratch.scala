package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc profiler: `sbt "runMain graft.tools.Scratch q09_semi_join ..."`
  * times each named SparkEntry query at sf0.1 (noop-forced, 2 runs) and
  * optionally dumps the formatted plan with -v. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val verbose = args.contains("-v")
    val names = args.filterNot(_.startsWith("-")).toSeq
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names.foreach { name =>
      val q = graft.SparkEntry.queries(name)
      if (verbose) q(spark, dir).explain("formatted")
      (1 to 2).foreach { i =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        q(spark, dir).write.format("noop").mode("overwrite").save()
        println(f"[scratch] $name run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
