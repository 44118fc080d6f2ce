package graft.state

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

class BookmarksSpec extends AnyFunSuite {

  test("round-trips the Singer STATE envelope") {
    val b = Bookmarks(Map("wrike.tasks" -> "2024-01-15T00:00:00Z"))
    val parsed = Bookmarks.fromJson(b.toJson)
    assert(parsed == b)
    assert(b.toJson.contains("\"type\":\"STATE\""))
  }

  test("merged: newer entries win, others preserved") {
    val b = Bookmarks(Map("a" -> "1", "b" -> "2"))
      .merged(Map("b" -> "3", "c" -> "4"))
    assert(b.value == Map("a" -> "1", "b" -> "3", "c" -> "4"))
  }

  test("load of missing file yields empty; save/load round-trips") {
    val dir = Files.createTempDirectory("bk")
    val path = dir.resolve("state.json")
    assert(Bookmarks.load(path) == Bookmarks.empty)
    val b = Bookmarks(Map("s" -> "2024-02-01T00:00:00Z"))
    Bookmarks.save(b, path)
    assert(Bookmarks.load(path) == b)
    assert(!Files.exists(dir.resolve("state.json.tmp"))) // atomic move cleaned up
  }
}
