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
