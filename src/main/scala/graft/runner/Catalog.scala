package graft.runner

import java.nio.file.{Files, Path, StandardCopyOption}

import org.json4s._
import org.json4s.jackson.{JsonMethods, Serialization}

/** Stream catalog with selection metadata (SURVEY §2.1 P2; reference
  * `internal.py:66-110` + runner `__init__.py:283-295`): discovery writes
  * a catalog artifact listing every stream with its schema and key
  * properties, all UNselected; the user (or a selection patch) flips
  * `selected: true` on the streams to sync; the runner then syncs only
  * selected streams. This file is the engine's analog of that config
  * surface — a user-editable JSON artifact round-tripped between runs.
  */
final case class CatalogEntry(
    system: String,
    stream: String,
    /** Spark DDL schema string (`StructType.toDDL`), empty if undeclared. */
    schema: String,
    /** Primary-key columns the upsert sink de-duplicates on. */
    keyProperties: Seq[String],
    /** The bookmark column, if the stream syncs incrementally. */
    replicationKey: Option[String],
    selected: Boolean)

final case class Catalog(entries: Seq[CatalogEntry]) {

  def isSelected(system: String, stream: String): Boolean =
    entries.exists(e =>
      e.system == system && e.stream == stream && e.selected)

  /** Selection patch (the `metadata.selected` edit of the reference):
    * returns a catalog with the named streams flipped to `selected`.
    * Unknown names are ignored, matching the reference's behavior of
    * syncing the intersection of catalog and selection. */
  def select(streams: Seq[(String, String)], selected: Boolean = true): Catalog =
    Catalog(entries.map { e =>
      if (streams.contains((e.system, e.stream))) e.copy(selected = selected)
      else e
    })

  def toJson: String = {
    implicit val fmts: Formats = DefaultFormats
    Serialization.writePretty(Map("streams" -> entries.map(e => Map(
      "system" -> e.system,
      "stream" -> e.stream,
      "schema" -> e.schema,
      "key_properties" -> e.keyProperties,
      "replication_key" -> e.replicationKey.orNull,
      "selected" -> e.selected))))
  }
}

object Catalog {

  /** Discovery: enumerate every stream the pipelines declare into an
    * unselected catalog (the reference's `--discover` mode — the user
    * selects streams afterwards; nothing syncs until they do). */
  def discover(pipelines: Seq[Orchestrator.Pipeline]): Catalog =
    Catalog(for { p <- pipelines; j <- p.jobs } yield CatalogEntry(
      p.system, j.name, j.schemaDdl.getOrElse(""), j.keyProperties,
      Some(j.tsCol), selected = false))

  def fromJson(json: String): Catalog = {
    val root = JsonMethods.parse(json)
    val entries = (root \ "streams") match {
      case JArray(items) => items.collect { case o: JObject =>
        def str(k: String) = (o \ k) match {
          case JString(s) => s; case _ => ""
        }
        CatalogEntry(
          system = str("system"),
          stream = str("stream"),
          schema = str("schema"),
          keyProperties = (o \ "key_properties") match {
            case JArray(ks) => ks.collect { case JString(s) => s }
            case _ => Seq.empty
          },
          replicationKey = (o \ "replication_key") match {
            case JString(s) => Some(s); case _ => None
          },
          selected = (o \ "selected") match {
            case JBool(b) => b; case _ => false
          })
      }
      case _ => Seq.empty
    }
    Catalog(entries)
  }

  def load(path: Path): Catalog = fromJson(Files.readString(path))

  /** Atomic persist (temp file + move), like Bookmarks. */
  def save(c: Catalog, path: Path): Unit = {
    Files.createDirectories(path.toAbsolutePath.getParent)
    val tmp = path.resolveSibling(path.getFileName.toString + ".tmp")
    Files.writeString(tmp, c.toJson)
    Files.move(tmp, path, StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
  }
}
