package graft.operators

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkTestSession.spark

case class Click(user: Long, clickTime: Timestamp, page: String)
case class Purchase(user: Long, buyTime: Timestamp, amount: Double)

/** J5 — stream-stream join with watermarks and an event-time bound
  * (purchases joined to clicks within the preceding hour). */
class StreamJoinSpec extends AnyFunSuite {
  import spark.implicits._

  private def t(min: Int) = new Timestamp(1700000000000L + min * 60000L)

  test("watermarked interval join matches the batch equivalent") {
    val clicks = MemoryStream[Click](spark)
    val buys = MemoryStream[Purchase](spark)

    val c = clicks.toDS().withWatermark("clickTime", "20 minutes")
    val b = buys.toDS().withWatermark("buyTime", "20 minutes")
    val j2 = c.join(b,
      c("user") === b("user") &&
        b("buyTime") >= c("clickTime") &&
        b("buyTime") <= c("clickTime") + expr("interval 1 hour"))
      .select(c("user"), col("page"), col("amount"))

    val q = j2.writeStream.format("memory").queryName("ssjoin_out")
      .outputMode("append").start()
    try {
      clicks.addData(Click(1, t(0), "home"), Click(1, t(10), "item"),
        Click(2, t(5), "home"))
      buys.addData(Purchase(1, t(30), 9.99), Purchase(2, t(100), 5.0))
      q.processAllAvailable()
      val got = spark.table("ssjoin_out").as[(Long, String, Double)]
        .collect().toSet
      // purchase(1,t30) joins both clicks of user 1 (within 1h);
      // purchase(2,t100) is 95min after click(2,t5): outside the bound
      assert(got == Set((1L, "home", 9.99), (1L, "item", 9.99)))
    } finally q.stop()
  }
}
