package graft.core

/** Config model (SURVEY.md §1.4): case classes with env-prefixed resolution
  * (precedence: explicit arg > environment > default), each compiling itself
  * to a Kafka client option map exactly like the reference's
  * as_client_dict() (reference: fluvii/config_bases.py:10-27). The compiled
  * dicts are the contract the reference's own unit tests pin down
  * (reference: tests/unit/test_consumer_config.py:8-19,
  * tests/unit/test_producer_config.py:4-8) — ours reproduce them verbatim,
  * and the Spark mapping is `kafka.`-prefixed source/sink options.
  */
object Configs {

  def env(name: String, e: Map[String, String] = sys.env): Option[String] = e.get(name)

  /** Consumer config (reference: fluvii/components/consumer/config.py). */
  case class ConsumerConfig(
      autoOffsetReset: String = "latest",
      autoCommitIntervalMs: Int = 20000,
      heartbeatIntervalMs: Int = 23000,
      sessionTimeoutMs: Int = 120000,
      timeoutMinutes: Int = 4,
      messageBatchMaxMb: Int = 5,
      messageSingletonMaxMb: Int = 2,
      messageQueueMaxMb: Int = 20,
      pollTimeoutSeconds: Int = 5,
      batchConsumeMaxCount: Int = 100,
      batchConsumeMaxEmptyPolls: Int = 2,
      batchConsumeMaxTimeSeconds: Int = 10,
      batchConsumeTriggerMessageAgeSeconds: Int = 5) {

    /** librdkafka dict parity (reference: test_consumer_config.py:8-19). */
    def asClientDict: Map[String, String] = Map(
      "auto.commit.interval.ms" -> autoCommitIntervalMs.toString,
      "auto.offset.reset" -> autoOffsetReset,
      "fetch.max.bytes" -> (messageBatchMaxMb * 1024 * 1024).toString,
      "heartbeat.interval.ms" -> heartbeatIntervalMs.toString,
      "max.poll.interval.ms" -> (timeoutMinutes * 60 * 1000).toString,
      "message.max.bytes" -> (messageSingletonMaxMb * 1024 * 1024).toString,
      "queued.max.messages.kbytes" -> (messageQueueMaxMb * 1024).toString,
      "session.timeout.ms" -> sessionTimeoutMs.toString)

    /** The same options as Spark Kafka source settings (kafka.-prefixed). */
    def asSparkOptions: Map[String, String] =
      asClientDict.map { case (k, v) => s"kafka.$k" -> v }
  }

  object ConsumerConfig {
    val EnvPrefix = "FLUVII_CONSUMER_"
    def fromEnv(e: Map[String, String] = sys.env): ConsumerConfig = {
      val d = ConsumerConfig()
      def s(k: String, dv: String) = e.getOrElse(EnvPrefix + k, dv)
      def i(k: String, dv: Int) = s(k, dv.toString).toInt
      ConsumerConfig(
        autoOffsetReset = s("AUTO_OFFSET_RESET", d.autoOffsetReset),
        autoCommitIntervalMs = i("AUTO_COMMIT_INTERVAL_MS", d.autoCommitIntervalMs),
        heartbeatIntervalMs = i("HEARTBEAT_INTERVAL_MS", d.heartbeatIntervalMs),
        sessionTimeoutMs = i("SESSION_TIMEOUT_MS", d.sessionTimeoutMs),
        timeoutMinutes = i("TIMEOUT_MINUTES", d.timeoutMinutes),
        messageBatchMaxMb = i("MESSAGE_BATCH_MAX_MB", d.messageBatchMaxMb),
        messageSingletonMaxMb = i("MESSAGE_SINGLETON_MAX_MB", d.messageSingletonMaxMb),
        messageQueueMaxMb = i("MESSAGE_QUEUE_MAX_MB", d.messageQueueMaxMb),
        pollTimeoutSeconds = i("POLL_TIMEOUT_SECONDS", d.pollTimeoutSeconds),
        batchConsumeMaxCount = i("BATCH_CONSUME_MAX_COUNT", d.batchConsumeMaxCount),
        batchConsumeMaxEmptyPolls = i("BATCH_CONSUME_MAX_EMPTY_POLLS", d.batchConsumeMaxEmptyPolls),
        batchConsumeMaxTimeSeconds = i("BATCH_CONSUME_MAX_TIME_SECONDS", d.batchConsumeMaxTimeSeconds),
        batchConsumeTriggerMessageAgeSeconds =
          i("BATCH_CONSUME_TRIGGER_MESSAGE_AGE_SECONDS", d.batchConsumeTriggerMessageAgeSeconds))
    }
  }

  /** Producer config (reference: fluvii/components/producer/config.py). */
  case class ProducerConfig(transactionTimeoutMinutes: Int = 1) {
    /** (reference: test_producer_config.py:4-8). */
    def asClientDict: Map[String, String] =
      Map("transaction.timeout.ms" -> (transactionTimeoutMinutes * 60 * 1000).toString)
    def asSparkOptions: Map[String, String] =
      asClientDict.map { case (k, v) => s"kafka.$k" -> v }
  }

  object ProducerConfig {
    val EnvPrefix = "FLUVII_PRODUCER_"
    def fromEnv(e: Map[String, String] = sys.env): ProducerConfig =
      ProducerConfig(
        transactionTimeoutMinutes = e.getOrElse(EnvPrefix + "TRANSACTION_TIMEOUT_MINUTES", "1").toInt)
  }

  /** App-level config (reference: fluvii/apps/config.py). */
  case class AppConfig(
      name: String = "graft_app",
      tableRecoveryMultiplier: Int = 10) {
    def changelogTopic: String = Message.changelogTopic(name)
  }

  object AppConfig {
    val EnvPrefix = "FLUVII_APP_"
    def fromEnv(e: Map[String, String] = sys.env): AppConfig =
      AppConfig(
        name = e.getOrElse(EnvPrefix + "NAME", "graft_app"),
        tableRecoveryMultiplier = e.getOrElse(EnvPrefix + "TABLE_RECOVERY_MULTIPLIER", "10").toInt)
  }
}
