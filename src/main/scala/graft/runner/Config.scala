package graft.runner

import java.nio.file.{Files, Path, StandardCopyOption}

import org.json4s._
import org.json4s.jackson.{JsonMethods, Serialization}

/** Tap-config resolution with environment overrides (SURVEY §2.1;
  * reference `runner/__init__.py:207-245`): the reference builds each
  * tap's config by layering `config.yml` settings under environment-
  * variable overrides (an operator sets `WRIKE_ACCESS_TOKEN` at deploy
  * time and it beats the file value) and writes the merged
  * `config_<sys>.json` artifact for the tap process. The engine keeps
  * the same precedence contract — file base < environment < explicit
  * runtime overrides — as a pure resolution function plus the same
  * atomic JSON artifact round-trip the state layer uses.
  */
object Config {

  /** Environment variable name for setting `key` of `system`:
    * `<SYSTEM>_<KEY>` uppercased, with every non-alphanumeric run
    * collapsed to `_` (the `wrike` + `access-token` → `WRIKE_ACCESS_TOKEN`
    * convention). */
  def envKey(system: String, key: String): String =
    s"${system}_$key".toUpperCase.replaceAll("[^A-Z0-9]+", "_")

  /** Resolve a system's effective config. Precedence (low → high):
    * `base` (the config-file settings) → environment overrides (only
    * for keys DECLARED in base — a stray env var never injects an
    * unknown setting) → `explicit` runtime overrides. `env` is
    * injectable for tests; defaults to the process environment. */
  def resolve(system: String, base: Map[String, String],
              explicit: Map[String, String] = Map.empty,
              env: Map[String, String] = sys.env): Map[String, String] = {
    val fromEnv = base.keys
      .flatMap(k => env.get(envKey(system, k)).map(k -> _)).toMap
    base ++ fromEnv ++ explicit
  }

  /** Write the resolved config artifact atomically (temp file + move,
    * the Bookmarks discipline — a crashed run never leaves a torn
    * config for the next one to read). */
  def write(path: Path, config: Map[String, String]): Unit = {
    implicit val fmts: Formats = DefaultFormats
    Files.createDirectories(path.toAbsolutePath.getParent)
    val tmp = path.resolveSibling(path.getFileName.toString + ".tmp")
    Files.writeString(tmp, Serialization.writePretty(config))
    Files.move(tmp, path, StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
  }

  /** Read a config artifact back (string-valued JSON object). */
  def read(path: Path): Map[String, String] =
    JsonMethods.parse(Files.readString(path)) match {
      case JObject(fields) => fields.collect {
        case (k, JString(v)) => k -> v
        case (k, JInt(v)) => k -> v.toString
        case (k, JBool(v)) => k -> v.toString
      }.toMap
      case _ => Map.empty
    }
}
