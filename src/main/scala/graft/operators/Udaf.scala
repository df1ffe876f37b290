package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Custom aggregate surface (SURVEY.md §2.11 / A4).
  *
  * The reference's only aggregation mechanism is arbitrary state
  * accumulation in table entries (ST1–ST3); the engine's typed extension
  * point is org.apache.spark.sql.expressions.Aggregator — partial+final
  * merge automatically, codegen'd buffer encoding, usable from both the
  * typed and untyped APIs.
  */
object Udaf {

  /** Weighted mean as a two-accumulator Aggregator (sum(w*x), sum(w)). */
  class WeightedMean extends Aggregator[(Double, Double), (Double, Double), Double] {
    override def zero: (Double, Double) = (0.0, 0.0)
    override def reduce(b: (Double, Double), a: (Double, Double)): (Double, Double) =
      (b._1 + a._1 * a._2, b._2 + a._2)
    override def merge(x: (Double, Double), y: (Double, Double)): (Double, Double) =
      (x._1 + y._1, x._2 + y._2)
    override def finish(r: (Double, Double)): Double =
      if (r._2 == 0.0) Double.NaN else r._1 / r._2
    override def bufferEncoder: Encoder[(Double, Double)] =
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Query: quantity-weighted mean extended price per return flag, via the
    * custom Aggregator registered as an untyped UDAF. */
  def weightedMeanQuery(s: SparkSession, dir: String): DataFrame = {
    val wmean = udaf(new WeightedMean())
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(round(wmean(col("l_extendedprice"), col("l_quantity")), 2)
        .as("w_mean_price"))
      .orderBy(col("l_returnflag"))
  }
}
