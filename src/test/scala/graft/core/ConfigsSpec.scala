package graft.core

import org.scalatest.funsuite.AnyFunSuite
import graft.core.Configs._

/** Config-compilation parity with the reference's own unit tests
  * (reference: tests/unit/test_consumer_config.py:7-40,
  * test_producer_config.py:4-8). */
class ConfigsSpec extends AnyFunSuite {

  test("consumer defaults compile to the reference's exact client dict") {
    assert(ConsumerConfig().asClientDict == Map(
      "auto.commit.interval.ms" -> "20000",
      "auto.offset.reset" -> "latest",
      "fetch.max.bytes" -> "5242880",
      "heartbeat.interval.ms" -> "23000",
      "max.poll.interval.ms" -> "240000",
      "message.max.bytes" -> "2097152",
      "queued.max.messages.kbytes" -> "20480",
      "session.timeout.ms" -> "120000"))
  }

  test("producer defaults compile to the reference's exact client dict") {
    assert(ProducerConfig().asClientDict == Map("transaction.timeout.ms" -> "60000"))
  }

  test("env overrides win over defaults (FLUVII_CONSUMER_ prefix)") {
    val cfg = ConsumerConfig.fromEnv(Map(
      "FLUVII_CONSUMER_AUTO_OFFSET_RESET" -> "earliest",
      "FLUVII_CONSUMER_TIMEOUT_MINUTES" -> "7"))
    assert(cfg.autoOffsetReset == "earliest")
    assert(cfg.asClientDict("max.poll.interval.ms") == "420000")
    assert(cfg.asClientDict("session.timeout.ms") == "120000") // untouched default
  }

  test("validator-computed fields derive from their inputs") {
    // reference: fetch.max.bytes derives from message_batch_max_mb
    assert(ConsumerConfig(messageBatchMaxMb = 3).asClientDict("fetch.max.bytes")
      == (3 * 1024 * 1024).toString)
  }

  test("spark option form is kafka.-prefixed") {
    assert(ConsumerConfig().asSparkOptions.keySet.forall(_.startsWith("kafka.")))
  }

  test("changelog topic naming") {
    assert(AppConfig(name = "my_app").changelogTopic == "my_app__changelog")
  }
}
