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

  /** Dotenv config layer (reference: fluvii/config_bases.py:22-27 — pydantic
    * BaseSettings with `env_file` taken from the FLUVII_CONFIG_DOTENV
    * environment variable). Parses KEY=VALUE lines; blank lines and
    * #-comments are skipped; surrounding single/double quotes are stripped;
    * an optional leading `export ` is tolerated. */
  def dotenv(path: String): Map[String, String] = {
    val f = new java.io.File(path)
    if (!f.isFile) Map.empty
    else {
      val src = scala.io.Source.fromFile(f)
      try src.getLines()
        .map(_.trim)
        .filter(l => l.nonEmpty && !l.startsWith("#") && l.contains('='))
        .map { l =>
          val body = if (l.startsWith("export ")) l.stripPrefix("export ").trim else l
          val i = body.indexOf('=')
          val k = body.take(i).trim
          val raw = body.drop(i + 1).trim
          val v =
            if (raw.length >= 2 &&
                ((raw.head == '"' && raw.last == '"') || (raw.head == '\'' && raw.last == '\'')))
              raw.substring(1, raw.length - 1)
            else raw
          k -> v
        }
        .toMap
      finally src.close()
    }
  }

  /** Effective environment with the reference's precedence: explicit arg >
    * process env > dotenv file > default. The dotenv file is named by the
    * FLUVII_CONFIG_DOTENV variable, exactly like the reference; absent that
    * (or the file), this is just `e`. */
  def effectiveEnv(e: Map[String, String] = sys.env): Map[String, String] =
    e.get("FLUVII_CONFIG_DOTENV") match {
      case Some(path) => dotenv(path) ++ e // process env wins over dotenv
      case None       => e
    }

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
    def fromEnv(e: Map[String, String] = effectiveEnv()): ConsumerConfig = {
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

  /** Producer config (reference: fluvii/components/producer/config.py):
    * transaction timeout + bootstrap urls + optional auth + the schema
    * library root consumed by [[graft.avro.SchemaResolver]]. The client
    * dict merges the auth dict exactly like the reference's
    * as_client_dict (config.py:23-29); with no urls/auth configured it
    * reduces to the shape the reference's unit test pins. */
  case class ProducerConfig(
      transactionTimeoutMinutes: Int = 1,
      urls: Option[String] = None,
      authConfig: Option[AuthKafkaConfig] = None,
      schemaLibraryRoot: Option[String] = None) {
    /** (reference: test_producer_config.py:4-8). */
    def asClientDict: Map[String, String] =
      urls.map("bootstrap.servers" -> _).toMap ++
        Map("transaction.timeout.ms" -> (transactionTimeoutMinutes * 60 * 1000).toString) ++
        authConfig.map(_.asClientDict).getOrElse(Map.empty)
    def asSparkOptions: Map[String, String] =
      urls.map("kafka.bootstrap.servers" -> _).toMap ++
        Map("kafka.transaction.timeout.ms" -> (transactionTimeoutMinutes * 60 * 1000).toString) ++
        authConfig.map(_.asSparkOptions).getOrElse(Map.empty)
  }

  object ProducerConfig {
    val EnvPrefix = "FLUVII_PRODUCER_"
    def fromEnv(e: Map[String, String] = effectiveEnv()): ProducerConfig = {
      // reference: get_auth_kafka_config() yields None when auth is unset
      val auth = AuthKafkaConfig.fromEnv(e)
      ProducerConfig(
        transactionTimeoutMinutes = e.getOrElse(EnvPrefix + "TRANSACTION_TIMEOUT_MINUTES", "1").toInt,
        urls = e.get(EnvPrefix + "URLS"),
        authConfig = if (auth.username.isDefined) Some(auth) else None,
        schemaLibraryRoot = e.get(EnvPrefix + "SCHEMA_LIBRARY_ROOT"))
    }
  }

  /** App-level config (reference: fluvii/apps/config.py). */
  case class AppConfig(
      name: String = "graft_app",
      tableRecoveryMultiplier: Int = 10) {
    def changelogTopic: String = Message.changelogTopic(name)
  }

  object AppConfig {
    val EnvPrefix = "FLUVII_APP_"
    def fromEnv(e: Map[String, String] = effectiveEnv()): AppConfig =
      AppConfig(
        name = e.getOrElse(EnvPrefix + "NAME", "graft_app"),
        tableRecoveryMultiplier = e.getOrElse(EnvPrefix + "TABLE_RECOVERY_MULTIPLIER", "10").toInt)
  }

  /** SASL auth config (reference: fluvii/components/auth/config.py:9-51).
    *
    * Mechanism selection mirrors the reference's validator: OAUTHBEARER iff
    * an oauth token endpoint is configured, else PLAIN; protocol is always
    * SASL_SSL. [[asClientDict]] reproduces the librdkafka dict shape: empty
    * when no username is set; PLAIN carries sasl.username/sasl.password;
    * OAUTHBEARER carries the token callback (config.py:25-37 — a
    * client-credentials POST with basic auth, modeled here as
    * [[oauthTokenPayload]] + [[parseOauthToken]] so the HTTP hop stays
    * pluggable/testable offline). [[asSparkOptions]] translates to the JVM
    * client's names (`sasl.mechanism` singular, JAAS module config) with the
    * `kafka.` prefix Spark sources/sinks expect. */
  case class AuthKafkaConfig(
      username: Option[String] = None,
      password: Option[String] = None,
      oauthUrl: Option[String] = None,
      oauthScope: Option[String] = None) {

    /** OAUTHBEARER iff a token endpoint is configured (config.py:19-23). */
    def mechanisms: String = if (oauthUrl.isDefined) "OAUTHBEARER" else "PLAIN"
    def protocol: String = "SASL_SSL"

    /** librdkafka dict parity (config.py:39-49). The oauth callback itself
      * is a function value in the reference dict; here the dict stays
      * string-typed and the callback contract lives in
      * [[oauthTokenPayload]]/[[parseOauthToken]]. */
    def asClientDict: Map[String, String] = username match {
      case None => Map.empty
      case Some(u) =>
        val base = Map(
          "security.protocol" -> protocol,
          "sasl.mechanisms" -> mechanisms)
        if (oauthUrl.isDefined)
          base + ("sasl.oauthbearer.token.endpoint.url" -> oauthUrl.get)
        else
          base ++ Map("sasl.username" -> u, "sasl.password" -> password.getOrElse(""))
    }

    /** The same auth as Spark Kafka source/sink options: JVM client names
      * (sasl.mechanism, sasl.jaas.config) under the kafka. prefix. */
    def asSparkOptions: Map[String, String] = username match {
      case None => Map.empty
      case Some(u) =>
        val base = Map(
          "kafka.security.protocol" -> protocol,
          "kafka.sasl.mechanism" -> mechanisms)
        if (oauthUrl.isDefined)
          base ++ Map(
            "kafka.sasl.jaas.config" ->
              "org.apache.kafka.common.security.oauthbearer.OAuthBearerLoginModule required;",
            "kafka.sasl.oauthbearer.token.endpoint.url" -> oauthUrl.get,
            "kafka.sasl.login.callback.handler.class" ->
              "org.apache.kafka.common.security.oauthbearer.secured.OAuthBearerLoginCallbackHandler")
        else
          base + ("kafka.sasl.jaas.config" ->
            ("org.apache.kafka.common.security.plain.PlainLoginModule required " +
              s"""username="$u" password="${password.getOrElse("")}";"""))
    }

    /** The client-credentials form body the oauth callback POSTs
      * (config.py:28-31); basic-auth is (username, password). */
    def oauthTokenPayload: Map[String, String] =
      Map("grant_type" -> "client_credentials") ++
        oauthScope.map("scope" -> _)

    /** Parse the token endpoint's JSON response into
      * (access_token, expiry epoch seconds) exactly like config.py:36-37:
      * expiry = now + expires_in. */
    def parseOauthToken(json: String, nowEpochSeconds: Double): (String, Double) = {
      import org.json4s._
      import org.json4s.jackson.JsonMethods
      implicit val fmts: Formats = DefaultFormats
      val parsed = JsonMethods.parse(json)
      val token = (parsed \ "access_token").extract[String]
      // reference applies float(): accept both numeric and string forms
      val expiresIn = (parsed \ "expires_in") match {
        case JString(s) => s.toDouble
        case v          => v.extract[Double]
      }
      (token, nowEpochSeconds + expiresIn)
    }
  }

  object AuthKafkaConfig {
    val EnvPrefix = "FLUVII_AUTH_KAFKA_"
    def fromEnv(e: Map[String, String] = effectiveEnv()): AuthKafkaConfig =
      AuthKafkaConfig(
        username = e.get(EnvPrefix + "USERNAME"),
        password = e.get(EnvPrefix + "PASSWORD"),
        oauthUrl = e.get(EnvPrefix + "OAUTH_URL"),
        oauthScope = e.get(EnvPrefix + "OAUTH_SCOPE"))
  }
}
