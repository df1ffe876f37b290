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

  test("auth: no username compiles to an empty client dict") {
    assert(AuthKafkaConfig().asClientDict == Map.empty)
    assert(AuthKafkaConfig().asSparkOptions == Map.empty)
  }

  test("auth PLAIN: client dict carries sasl username/password (reference shape)") {
    val cfg = AuthKafkaConfig(username = Some("u"), password = Some("pw"))
    assert(cfg.mechanisms == "PLAIN")
    assert(cfg.asClientDict == Map(
      "security.protocol" -> "SASL_SSL",
      "sasl.mechanisms" -> "PLAIN",
      "sasl.username" -> "u",
      "sasl.password" -> "pw"))
    val sp = cfg.asSparkOptions
    assert(sp("kafka.security.protocol") == "SASL_SSL")
    assert(sp("kafka.sasl.mechanism") == "PLAIN") // JVM client: singular
    assert(sp("kafka.sasl.jaas.config").contains("PlainLoginModule"))
    assert(sp("kafka.sasl.jaas.config").contains("""username="u""""))
  }

  test("auth OAUTHBEARER: selected iff oauth_url is set, like the reference validator") {
    val cfg = AuthKafkaConfig(username = Some("cid"), password = Some("sec"),
      oauthUrl = Some("https://idp/token"), oauthScope = Some("kafka"))
    assert(cfg.mechanisms == "OAUTHBEARER")
    assert(cfg.asClientDict("sasl.mechanisms") == "OAUTHBEARER")
    assert(cfg.asClientDict("sasl.oauthbearer.token.endpoint.url") == "https://idp/token")
    assert(!cfg.asClientDict.contains("sasl.username")) // creds go to the token POST
    assert(cfg.asSparkOptions("kafka.sasl.jaas.config").contains("OAuthBearerLoginModule"))
    // the token callback contract (config.py:25-37)
    assert(cfg.oauthTokenPayload == Map("grant_type" -> "client_credentials", "scope" -> "kafka"))
    val (tok, exp) = cfg.parseOauthToken("""{"access_token":"abc","expires_in":300}""", 1000.0)
    assert(tok == "abc" && exp == 1300.0)
    val (_, exp2) = cfg.parseOauthToken("""{"access_token":"abc","expires_in":"60"}""", 0.0)
    assert(exp2 == 60.0)
  }

  test("auth env resolution under FLUVII_AUTH_KAFKA_ prefix") {
    val cfg = AuthKafkaConfig.fromEnv(Map(
      "FLUVII_AUTH_KAFKA_USERNAME" -> "u2",
      "FLUVII_AUTH_KAFKA_PASSWORD" -> "p2"))
    assert(cfg.asClientDict("sasl.username") == "u2")
    assert(cfg.mechanisms == "PLAIN")
  }

  test("dotenv layer: env wins over dotenv, dotenv wins over defaults") {
    val f = java.nio.file.Files.createTempFile("graft", ".env")
    java.nio.file.Files.writeString(f, """
      |# comment line
      |FLUVII_CONSUMER_AUTO_OFFSET_RESET=earliest
      |export FLUVII_CONSUMER_TIMEOUT_MINUTES="9"
      |FLUVII_APP_NAME='dotenv_app'
      |""".stripMargin)
    val env = Map(
      "FLUVII_CONFIG_DOTENV" -> f.toString,
      "FLUVII_CONSUMER_TIMEOUT_MINUTES" -> "3") // process env beats dotenv
    val eff = Configs.effectiveEnv(env)
    val cons = ConsumerConfig.fromEnv(eff)
    assert(cons.autoOffsetReset == "earliest") // dotenv beats default
    assert(cons.timeoutMinutes == 3)           // env beats dotenv
    assert(AppConfig.fromEnv(eff).name == "dotenv_app") // quotes stripped
    assert(cons.sessionTimeoutMs == 120000)    // untouched default survives
    java.nio.file.Files.delete(f)
  }

  test("oauth refresher: fetch once, reuse until expiry, refresh at expiry (fake clock/transport)") {
    val cfg = AuthKafkaConfig(username = Some("cid"), password = Some("sec"),
      oauthUrl = Some("https://idp/token"), oauthScope = Some("kafka"))
    var now = 1000.0
    var posts = List.empty[(String, Map[String, String], (String, String))]
    var nextToken = "t1"
    val r = new OauthRefresher(cfg,
      transport = (url, payload, basic) => {
        posts :+= ((url, payload, basic))
        s"""{"access_token":"$nextToken","expires_in":300}"""
      },
      clock = () => now)

    assert(r.expiry.isEmpty)
    assert(r.token() == "t1")             // first call fetches
    assert(posts.size == 1)
    // the POST carries the reference's payload + basic auth (config.py:28-35)
    assert(posts.head == (("https://idp/token",
      Map("grant_type" -> "client_credentials", "scope" -> "kafka"), ("cid", "sec"))))
    assert(r.expiry.contains(1300.0))     // now + expires_in (config.py:37)

    now = 1299.0
    nextToken = "t2"
    assert(r.token() == "t1")             // still valid: no re-fetch
    assert(posts.size == 1)

    now = 1300.0                          // exactly at expiry: refresh
    assert(r.token() == "t2")
    assert(posts.size == 2)
    assert(r.expiry.contains(1600.0))

    // client dict re-derives with the CURRENT token (oauth_cb analog)
    now = 1700.0
    nextToken = "t3"
    val d = r.asClientDict()
    assert(posts.size == 3)
    assert(d("sasl.oauthbearer.token") == "t3")
    assert(d("sasl.mechanisms") == "OAUTHBEARER")
    assert(d("security.protocol") == "SASL_SSL")

    // margin: refresh early when within marginSeconds of expiry
    now = 1950.0                          // expiry 2000, margin 60 => refresh
    nextToken = "t4"
    assert(r.token(marginSeconds = 60.0) == "t4")
    assert(posts.size == 4)

    // PLAIN config (no oauth_url) cannot build a refresher
    intercept[IllegalArgumentException] {
      new OauthRefresher(AuthKafkaConfig(username = Some("u")),
        (_, _, _) => "{}", () => 0.0)
    }
  }

  test("logging parity: level resolution, pinned line format, no propagation (logging_utils.py)") {
    assert(Logging.loglevel(Map.empty) == "INFO")
    assert(Logging.loglevel(Map("FLUVII_LOGLEVEL" -> "DEBUG")) == "DEBUG")
    assert(Logging.toJul("WARNING") == java.util.logging.Level.WARNING)
    assert(Logging.pyLevelName(java.util.logging.Level.FINE) == "DEBUG")
    assert(Logging.pyLevelName(java.util.logging.Level.SEVERE) == "ERROR")
    // CRITICAL stays a distinct level (not collapsed into ERROR): the
    // rendered token must match the reference's logger.critical lines
    assert(Logging.toJul("CRITICAL") == Logging.Critical)
    assert(Logging.toJul("CRITICAL").intValue > java.util.logging.Level.SEVERE.intValue)
    assert(Logging.pyLevelName(Logging.Critical) == "CRITICAL")

    val logger = Logging.initLogger("graft.spec", Some("DEBUG"))
    assert(!logger.getUseParentHandlers)           // propagate = False
    assert(logger.getLevel == java.util.logging.Level.FINE)
    assert(logger.getHandlers.length == 1)
    Logging.initLogger("graft.spec", Some("DEBUG")) // re-init does not stack
    assert(java.util.logging.Logger.getLogger("graft.spec").getHandlers.length == 1)

    val rec = new java.util.logging.LogRecord(java.util.logging.Level.INFO, "hello {0}")
    rec.setLoggerName("graft.spec")
    rec.setParameters(Array[AnyRef]("world"))
    val line = new Logging.LineFormatter().format(rec)
    // "PID {process} - {asctime} - {name} - {levelname}: {message}"
    assert(line.matches(
      raw"PID \d+ - \d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2},\d{3} - graft\.spec - INFO: hello world\n"))
  }
}
