package graft.state

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.json4s._
import org.json4s.jackson.JsonMethods

/** Per-stream bookmark state (SURVEY §2.1 W3/O2): a `{stream -> ISO
  * timestamp}` high-watermark map, persisted as the Singer STATE envelope
  * `{"type": "STATE", "value": {...}}` the reference round-trips through
  * its pipe (wrike `runner/__init__.py:342-366`).
  *
  * Durability contract mirrors the reference: state is written only after
  * a successful batch (at-least-once + idempotent upsert sink), and the
  * write is atomic (temp file + move) so a crashed run never leaves a
  * half-written checkpoint.
  */
final case class Bookmarks(value: Map[String, String]) {
  def get(stream: String): Option[String] = value.get(stream)

  /** Merge sync results: newer entries win per stream (last write). */
  def merged(updates: Map[String, String]): Bookmarks =
    Bookmarks(value ++ updates)

  def toJson: String = {
    import org.json4s.jackson.Serialization
    implicit val fmts: Formats = DefaultFormats
    Serialization.write(Map("type" -> "STATE", "value" -> value))
  }
}

object Bookmarks {
  val empty: Bookmarks = Bookmarks(Map.empty)

  def fromJson(json: String): Bookmarks = {
    val root = JsonMethods.parse(json)
    val v = (root \ "value") match {
      case JObject(fields) =>
        fields.collect { case (k, JString(s)) => k -> s }.toMap
      case _ => Map.empty[String, String]
    }
    Bookmarks(v)
  }

  def load(path: Path): Bookmarks =
    if (Files.exists(path)) fromJson(Files.readString(path)) else empty

  def load(path: String): Bookmarks = load(Paths.get(path))

  /** Atomic persist: write temp then move into place. */
  def save(b: Bookmarks, path: Path): Unit = {
    Files.createDirectories(path.toAbsolutePath.getParent)
    val tmp = path.resolveSibling(path.getFileName.toString + ".tmp")
    Files.writeString(tmp, b.toJson)
    Files.move(tmp, path, StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
  }

  def save(b: Bookmarks, path: String): Unit = save(b, Paths.get(path))
}
