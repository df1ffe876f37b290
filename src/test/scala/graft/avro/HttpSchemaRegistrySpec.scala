package graft.avro

import org.scalatest.funsuite.AnyFunSuite

/** Request/response mapping of the HTTP registry client against a stubbed
  * transport (no network in this environment; the REST shapes are the
  * Confluent v1 API the reference's client speaks —
  * reference: fluvii/components/schema_registry/schema_registry.py:22-50). */
class HttpSchemaRegistrySpec extends AnyFunSuite {

  private val schema = SchemaRegistryClient.parse(
    """{"name":"Rec","type":"record","fields":[{"name":"a","type":"string"}]}""")

  private def client(respond: PartialFunction[(String, String), String],
      seen: scala.collection.mutable.ListBuffer[(String, String, Option[String], Map[String, String])] = scala.collection.mutable.ListBuffer()) =
    new HttpSchemaRegistry(
      SchemaRegistryConfig("registry.example.com", Some("user"), Some("pass")),
      (m, u, b, h) => { seen += ((m, u, b, h)); respond((m, u)) })

  test("register POSTs the escaped schema and parses the allocated id") {
    val seen = scala.collection.mutable.ListBuffer
      .empty[(String, String, Option[String], Map[String, String])]
    val c = client({ case ("POST", u) if u.endsWith("/subjects/orders-value/versions") =>
      """{"id": 7}""" }, seen)
    assert(c.register("orders-value", schema) == 7)
    val (m, url, body, headers) = seen.head
    assert(m == "POST")
    // creds configured and no scheme given -> https, like the reference
    assert(url == "https://registry.example.com/subjects/orders-value/versions")
    assert(body.get.startsWith("""{"schema":"{\"""") ) // schema is a JSON-escaped string
    assert(headers("Authorization").startsWith("Basic "))
    assert(headers("Content-Type") == "application/vnd.schemaregistry.v1+json")
  }

  test("getById GETs /schemas/ids/{id} and parses the schema") {
    val c = client({ case ("GET", u) if u.endsWith("/schemas/ids/7") =>
      s"""{"schema": ${org.json4s.jackson.JsonMethods.compact(
        org.json4s.jackson.JsonMethods.render(org.json4s.JString(schema.toString)))}}""" })
    assert(c.getById(7).contains(schema))
  }

  test("latest GETs versions/latest; HTTP failure maps to None") {
    val c = client({
      case ("GET", u) if u.endsWith("/subjects/orders-value/versions/latest") =>
        s"""{"id": 7, "version": 3, "schema": ${org.json4s.jackson.JsonMethods.compact(
          org.json4s.jackson.JsonMethods.render(org.json4s.JString(schema.toString)))}}"""
    })
    assert(c.latest("orders-value").contains((7, schema)))
    assert(c.latest("missing-subject").isEmpty) // stub throws MatchError -> None
    assert(c.getById(99).isEmpty)
  }

  test("url normalization: explicit scheme kept; no creds defaults to http") {
    assert(SchemaRegistryConfig("http://r:8081/", Some("u"), Some("p")).normalizedUrl
      == "http://r:8081")
    assert(SchemaRegistryConfig("r:8081").normalizedUrl == "http://r:8081")
    assert(SchemaRegistryConfig("r:8081", Some("u"), Some("p")).normalizedUrl
      == "https://r:8081")
    assert(SchemaRegistryConfig("r:8081").basicAuthHeader.isEmpty)
  }
}
