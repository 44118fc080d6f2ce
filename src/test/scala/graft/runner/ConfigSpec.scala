package graft.runner

import org.scalatest.funsuite.AnyFunSuite

class ConfigSpec extends AnyFunSuite {

  test("env overrides beat file base; explicit beats both") {
    val base = Map("access_token" -> "from-file", "page_size" -> "100",
      "endpoint" -> "https://api.example.test")
    val env = Map("WRIKE_ACCESS_TOKEN" -> "from-env",
      "WRIKE_PAGE_SIZE" -> "500",
      "OTHER_ACCESS_TOKEN" -> "wrong-system")
    val out = Config.resolve("wrike", base,
      explicit = Map("page_size" -> "25"), env = env)
    assert(out("access_token") == "from-env")  // env beats file
    assert(out("page_size") == "25")           // explicit beats env
    assert(out("endpoint") == "https://api.example.test") // file survives
  }

  test("env vars never inject keys the config does not declare") {
    val out = Config.resolve("xero",
      Map("tenant_id" -> "t1"),
      env = Map("XERO_TENANT_ID" -> "t2", "XERO_EVIL_FLAG" -> "1"))
    assert(out == Map("tenant_id" -> "t2"))
  }

  test("envKey follows the <SYSTEM>_<KEY> uppercase convention") {
    assert(Config.envKey("wrike", "access-token") == "WRIKE_ACCESS_TOKEN")
    assert(Config.envKey("hubspot", "api.key") == "HUBSPOT_API_KEY")
  }

  test("config artifact round-trips atomically") {
    val dir = java.nio.file.Files.createTempDirectory("cfg")
    val p = dir.resolve("config_wrike.json")
    val cfg = Map("access_token" -> "tok", "page_size" -> "100")
    Config.write(p, cfg)
    assert(Config.read(p) == cfg)
    assert(!java.nio.file.Files.exists(
      p.resolveSibling("config_wrike.json.tmp")), "no torn temp file")
    // overwrite (a later run re-resolves and rewrites)
    Config.write(p, cfg + ("page_size" -> "200"))
    assert(Config.read(p)("page_size") == "200")
  }
}
