package graft.core

/** Live OAuth client-credentials refresh loop (SURVEY.md §1.4 auth), the
  * runtime half of [[Configs.AuthKafkaConfig]]'s token contract.
  *
  * The reference registers `_get_oauth_token` as the librdkafka `oauth_cb`
  * (reference: fluvii/components/auth/config.py:25-37, 47): every time the
  * client needs a token it POSTs the client-credentials form with basic
  * auth and returns (access_token, now + expires_in). This class is that
  * callback as a clock-injected, transport-injected object so the loop is
  * provable offline (no live SASL endpoint exists in this sandbox):
  *
  *   - `transport(url, formPayload, (user, pass))` performs the HTTP POST
  *     and returns the response body (production: any HTTP client; tests:
  *     a recording fake);
  *   - `clock()` supplies epoch seconds (production: System.currentTimeMillis
  *     based; tests: a settable fake);
  *   - [[token]] caches the (token, expiry) pair and re-fetches exactly
  *     when `now >= expiry - marginSeconds` — the "refresh at expiry"
  *     semantics of a callback the client invokes per connection;
  *   - [[asClientDict]] re-derives the full client dict with the CURRENT
  *     token, the JVM-shaped analog of the reference dict whose `oauth_cb`
  *     member re-runs on every invocation.
  */
class OauthRefresher(
    auth: Configs.AuthKafkaConfig,
    transport: (String, Map[String, String], (String, String)) => String,
    clock: () => Double) {

  require(auth.oauthUrl.isDefined,
    "OauthRefresher requires an oauth_url (else the mechanism is PLAIN and no refresh loop exists)")

  @volatile private var cached: Option[(String, Double)] = None

  /** One unconditional fetch — the body of the reference's oauth_cb:
    * POST grant_type=client_credentials (+scope) with (username, password)
    * basic auth, parse to (access_token, now + expires_in). */
  def fetchToken(): (String, Double) = {
    val json = transport(
      auth.oauthUrl.get,
      auth.oauthTokenPayload,
      (auth.username.getOrElse(""), auth.password.getOrElse("")))
    auth.parseOauthToken(json, clock())
  }

  /** Current valid token; refreshes iff the cached one is absent or within
    * `marginSeconds` of expiry at the injected clock's now. */
  def token(marginSeconds: Double = 0.0): String = synchronized {
    cached match {
      case Some((t, exp)) if clock() < exp - marginSeconds => t
      case _ =>
        val fresh = fetchToken()
        cached = Some(fresh)
        fresh._1
    }
  }

  /** Expiry (epoch seconds) of the cached token, if any — observable for
    * tests and metrics. */
  def expiry: Option[Double] = cached.map(_._2)

  /** The auth client dict re-derived at call time with a live token —
    * static SASL_SSL/OAUTHBEARER fields from the config, plus the current
    * (refreshed-if-expired) bearer token. */
  def asClientDict(marginSeconds: Double = 0.0): Map[String, String] =
    auth.asClientDict + ("sasl.oauthbearer.token" -> token(marginSeconds))
}
