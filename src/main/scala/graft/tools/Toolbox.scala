package graft.tools

import scala.collection.concurrent.TrieMap

/** Admin toolbox (SURVEY.md §2.10, D1–D6) — the declarative topic-management
  * surface of the reference (reference: fluvii/kafka_tools/fluvii_toolbox.py:
  * 60-195), behind a transport-agnostic trait. The in-memory implementation
  * drives tests and the CLI offline; a Kafka-backed implementation plugs the
  * kafka-clients AdminClient into the same trait on a real cluster (that jar
  * does not ship in this environment).
  */
final case class TopicSpec(
    partitions: Int,
    replicationFactor: Int = 1,
    configs: Map[String, String] = Map.empty)

trait AdminOps {
  /** D1 — list topics, internal ones filtered (reference: :60-70). */
  def listTopics(includeInternal: Boolean = false): Map[String, TopicSpec]
  /** D2 — create, ignoring existing (reference: :72-94). */
  def createTopics(topics: Map[String, TopicSpec]): Seq[String]
  /** D3 — diff-aware alter retaining configs (reference: :96-158). */
  def alterTopics(topics: Map[String, TopicSpec]): Seq[String]
  /** D4 — delete, ignoring missing (reference: :160-174). */
  def deleteTopics(names: Seq[String]): Seq[String]

  /** D5 — declarative sync: create missing, delete extra, alter changed
    * (reference: :176-195). */
  def syncTopics(desired: Map[String, TopicSpec],
      deleteExtra: Boolean = true): SyncResult = {
    val current = listTopics()
    val created = createTopics(desired.view.filterKeys(!current.contains(_)).toMap)
    val toAlter = desired.filter { case (n, spec) =>
      current.get(n).exists(_ != spec)
    }
    val altered = alterTopics(toAlter)
    val deleted =
      if (deleteExtra) deleteTopics((current.keySet -- desired.keySet).toSeq)
      else Nil
    SyncResult(created, altered, deleted)
  }
}

final case class SyncResult(created: Seq[String], altered: Seq[String], deleted: Seq[String])

final class InMemoryAdmin extends AdminOps {
  private val topics = TrieMap.empty[String, TopicSpec]
  private val InternalPrefix = "__" // e.g. __consumer_offsets

  override def listTopics(includeInternal: Boolean): Map[String, TopicSpec] =
    topics.toMap.filter { case (n, _) => includeInternal || !n.startsWith(InternalPrefix) }

  override def createTopics(specs: Map[String, TopicSpec]): Seq[String] = {
    val created = specs.filter { case (n, _) => !topics.contains(n) }
    created.foreach { case (n, s) => topics(n) = s }
    created.keys.toSeq.sorted
  }

  override def alterTopics(specs: Map[String, TopicSpec]): Seq[String] = {
    val altered = specs.filter { case (n, _) => topics.contains(n) }
    altered.foreach { case (n, s) =>
      // config-retaining merge, like the reference's diff-aware alter
      val merged = s.copy(configs = topics(n).configs ++ s.configs)
      topics(n) = merged
    }
    altered.keys.toSeq.sorted
  }

  override def deleteTopics(names: Seq[String]): Seq[String] = {
    val deleted = names.filter(topics.contains)
    deleted.foreach(topics.remove)
    deleted.sorted
  }
}

/** D6 — thin CLI over the toolbox (reference: fluvii/cli/commands/topics.py:
  * 16-111): `graft topics list|create|delete|sync ...`. */
object ToolboxCli {
  def run(args: Array[String], admin: AdminOps): String = args.toList match {
    case "topics" :: "list" :: _ =>
      admin.listTopics().toSeq.sortBy(_._1)
        .map { case (n, s) => s"$n partitions=${s.partitions}" }.mkString("\n")
    case "topics" :: "create" :: name :: parts :: _ =>
      admin.createTopics(Map(name -> TopicSpec(parts.toInt))).mkString(",")
    case "topics" :: "delete" :: name :: _ =>
      admin.deleteTopics(Seq(name)).mkString(",")
    case other =>
      s"usage: graft topics list|create <name> <partitions>|delete <name> (got: ${other.mkString(" ")})"
  }

  def main(args: Array[String]): Unit = println(run(args, new InMemoryAdmin))
}
