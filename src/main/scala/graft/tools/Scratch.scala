package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.{MinHashSig, Text}

object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    val t0 = System.nanoTime()
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), Text.charShingles(col("text"), 5).as("sh"))
      .withColumn("sig", MinHashSig.minhashSig(col("sh"), 128))
      .persist()
    println(s"docs=${docs.count()} sigtime=${(System.nanoTime()-t0)/1e9}")
    val t1 = System.nanoTime()
    val bands = docs.select(col("doc_id"),
        explode(Text.lshBands(col("sig"), 128, 32)).as("b"))
      .select(col("doc_id"), col("b.band").as("band"), col("b.bh").as("bh"))
      .persist()
    println(s"bands=${bands.count()} bandtime=${(System.nanoTime()-t1)/1e9}")
    val t2 = System.nanoTime()
    val buckets = bands.groupBy("band", "bh").count().persist()
    buckets.orderBy(col("count").desc).show(10)
    val pairs = buckets.agg(sum(col("count") * (col("count") - 1) / 2)).collect()(0)
    println(s"candidate pair slots (with dup): $pairs buckettime=${(System.nanoTime()-t2)/1e9}")
    spark.stop()
  }
}
