package graft.avro

import org.apache.avro.Schema
import scala.collection.concurrent.TrieMap

/** Pluggable schema-registry client (SURVEY.md §1.2).
  *
  * The reference talks to a Confluent Schema Registry over HTTP
  * (reference: fluvii/components/schema_registry/schema_registry.py:22-50);
  * this interface captures exactly what the engine needs from it — id
  * allocation per (subject, schema) and id→schema lookup for the wire
  * format. The in-memory implementation serves tests and offline runs; an
  * HTTP implementation plugs in behind the same trait.
  *
  * Note the reference's monkey-patch (schema_registry.py:6-15): BARE-TYPE
  * schemas like {"type":"string"} must be accepted — the changelog topic
  * registers value schema "string" (fluvii/apps/fluvii_table_app.py:43).
  * Schema.Parser handles those natively here, and a test pins it.
  */
trait SchemaRegistryClient {
  def register(subject: String, schema: Schema): Int
  def getById(id: Int): Option[Schema]
  def latest(subject: String): Option[(Int, Schema)]
}

final class InMemorySchemaRegistry extends SchemaRegistryClient {
  private val byId = TrieMap.empty[Int, Schema]
  private val bySubject = TrieMap.empty[String, List[Int]]
  private val ids = new java.util.concurrent.atomic.AtomicInteger(0)

  override def register(subject: String, schema: Schema): Int = synchronized {
    val existing = bySubject.getOrElse(subject, Nil)
      .find(id => byId(id) == schema)
    existing.getOrElse {
      val id = ids.incrementAndGet()
      byId(id) = schema
      bySubject(subject) = id :: bySubject.getOrElse(subject, Nil)
      id
    }
  }

  override def getById(id: Int): Option[Schema] = byId.get(id)

  override def latest(subject: String): Option[(Int, Schema)] =
    bySubject.get(subject).flatMap(_.headOption).map(id => id -> byId(id))
}

object SchemaRegistryClient {
  /** Parse a schema from inline JSON — including bare types ("string",
    * {"type":"string"}) per the reference quirk, and with name validation
    * relaxed: the reference's README fixtures use space-bearing field names
    * ("Account Number"), which Python's lenient Avro stack accepts but
    * java-avro's strict validator rejects (FIXTURES.md §2.4 calls this out
    * as a required behavior). */
  def parse(json: String): Schema =
    new Schema.Parser(org.apache.avro.NameValidator.NO_VALIDATION).parse(json)
}

/** Registry connection config (reference: fluvii/components/schema_registry/
  * config.py — url + optional basic-auth credentials, env prefix
  * FLUVII_SCHEMA_REGISTRY_). URL normalization mirrors schema_registry.py:
  * 38-48: an explicit scheme is kept; otherwise https when credentials are
  * configured, http when not (credentials travel in the Authorization
  * header here rather than userinfo-in-URL — same wire bytes, no secret in
  * the URL). */
final case class SchemaRegistryConfig(
    url: String,
    username: Option[String] = None,
    password: Option[String] = None) {

  def normalizedUrl: String = {
    val base =
      if (url.contains("://")) url
      else (if (username.isDefined && password.isDefined) "https://" else "http://") + url
    base.stripSuffix("/")
  }

  def basicAuthHeader: Option[(String, String)] =
    for { u <- username; p <- password } yield
      "Authorization" -> ("Basic " + java.util.Base64.getEncoder
        .encodeToString(s"$u:$p".getBytes(java.nio.charset.StandardCharsets.UTF_8)))
}

object SchemaRegistryConfig {
  val EnvPrefix = "FLUVII_SCHEMA_REGISTRY_"
  def fromEnv(e: Map[String, String] = graft.core.Configs.effectiveEnv()): SchemaRegistryConfig =
    SchemaRegistryConfig(
      url = e.getOrElse(EnvPrefix + "URL", "http://localhost:8081"),
      username = e.get(EnvPrefix + "USERNAME"),
      password = e.get(EnvPrefix + "PASSWORD"))
}

/** Confluent Schema Registry over HTTP, behind the same
  * [[SchemaRegistryClient]] trait the in-memory registry implements
  * (reference: schema_registry.py:22-50 wraps the Confluent client; the
  * REST surface used is POST /subjects/{s}/versions, GET /schemas/ids/{id},
  * GET /subjects/{s}/versions/latest). The transport is a plain function so
  * offline tests stub it; the default is java.net.HttpURLConnection. */
final class HttpSchemaRegistry(
    cfg: SchemaRegistryConfig,
    transport: HttpSchemaRegistry.Transport = HttpSchemaRegistry.javaNetTransport)
    extends SchemaRegistryClient {
  import org.json4s._
  import org.json4s.jackson.JsonMethods

  private implicit val fmts: Formats = DefaultFormats

  private def headers: Map[String, String] =
    Map("Content-Type" -> "application/vnd.schemaregistry.v1+json") ++ cfg.basicAuthHeader

  private def call(method: String, path: String, body: Option[String]): JValue =
    JsonMethods.parse(transport(method, cfg.normalizedUrl + path, body, headers))

  override def register(subject: String, schema: Schema): Int = {
    val payload = JsonMethods.compact(
      JsonMethods.render(JObject("schema" -> JString(schema.toString))))
    (call("POST", s"/subjects/${enc(subject)}/versions", Some(payload)) \ "id").extract[Int]
  }

  override def getById(id: Int): Option[Schema] =
    scala.util.Try {
      val resp = call("GET", s"/schemas/ids/$id", None)
      SchemaRegistryClient.parse((resp \ "schema").extract[String])
    }.toOption

  override def latest(subject: String): Option[(Int, Schema)] =
    scala.util.Try {
      val resp = call("GET", s"/subjects/${enc(subject)}/versions/latest", None)
      ((resp \ "id").extract[Int],
        SchemaRegistryClient.parse((resp \ "schema").extract[String]))
    }.toOption

  private def enc(s: String): String =
    java.net.URLEncoder.encode(s, "UTF-8").replace("+", "%20")
}

object HttpSchemaRegistry {
  /** (method, url, body, headers) => response body; throws on HTTP errors. */
  type Transport = (String, String, Option[String], Map[String, String]) => String

  val javaNetTransport: Transport = (method, url, body, headers) => {
    val conn = new java.net.URI(url).toURL.openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
    try {
      conn.setRequestMethod(method)
      conn.setConnectTimeout(10000)
      conn.setReadTimeout(30000)
      headers.foreach { case (k, v) => conn.setRequestProperty(k, v) }
      body.foreach { b =>
        conn.setDoOutput(true)
        val out = conn.getOutputStream
        try out.write(b.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        finally out.close()
      }
      val code = conn.getResponseCode
      val stream = if (code >= 400) conn.getErrorStream else conn.getInputStream
      val resp = scala.io.Source.fromInputStream(stream, "UTF-8").mkString
      if (code >= 400)
        throw new java.io.IOException(s"schema registry HTTP $code: $resp")
      resp
    } finally conn.disconnect()
  }
}

/** Schema-spec resolution with the reference's fallback chain
  * (reference: fluvii/components/producer/producer.py:95-134,
  * schema_library_root at components/producer/config.py:18):
  *
  *   1. a spec ending in `.avro`/`.avsc`/`.json` is tried as a direct file
  *      path, then as a path under `schemaLibraryRoot`;
  *   2. otherwise, with a root configured, a DOTTED path `a.b.name` is
  *      tried as `root/a/b/name.{avsc,avro,json}` — the JVM analog of the
  *      reference's python-module attribute import (there is no module
  *      system to exec here, so the library is a directory tree of schema
  *      files addressed by the same dotted names);
  *   3. anything else parses as inline JSON (including bare types).
  *
  * Failures at each stage fall through silently to the next, exactly like
  * the reference's try/except chain. */
object SchemaResolver {
  private val FileExts = Seq(".avro", ".avsc", ".json")

  private def fromFile(p: java.nio.file.Path): Option[Schema] =
    if (java.nio.file.Files.isRegularFile(p))
      scala.util.Try(
        SchemaRegistryClient.parse(java.nio.file.Files.readString(p))).toOption
    else None

  def resolve(spec: String, schemaLibraryRoot: Option[String] = None): Schema = {
    import java.nio.file.Paths
    val s = spec.trim
    val asFile =
      if (FileExts.exists(s.endsWith)) {
        fromFile(Paths.get(s))
          .orElse(schemaLibraryRoot.flatMap(r => fromFile(Paths.get(r, s))))
      } else None
    val asDotted =
      if (asFile.isDefined || s.isEmpty || "{[\"".contains(s.head)) None
      else schemaLibraryRoot.flatMap { r =>
        val rel = s.split('.').mkString("/")
        FileExts.iterator.flatMap(e => fromFile(Paths.get(r, rel + e))).nextOption()
      }
    asFile.orElse(asDotted).getOrElse(SchemaRegistryClient.parse(s))
  }
}
