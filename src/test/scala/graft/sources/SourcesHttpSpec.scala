package graft.sources

import java.net.{InetAddress, InetSocketAddress}
import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.AtomicInteger

import scala.jdk.CollectionConverters._

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import graft.SparkSpec

/** The source-layer seams driven through a REAL socket: an in-process
  * `com.sun.net.httpserver` fixture serves cursor-paginated JSON with
  * injected 401/429/500 responses, and the full
  * `readPaginated(HttpPageFetcher(TokenCache, RateLimiter, retries))`
  * stack must drain it correctly — the `tap_wrike/utility.py:82-143` /
  * `tap_xero/__init__.py:48-136` request loop, observed from the
  * server side as a request timeline instead of asserted on injected
  * fakes. */
class SourcesHttpSpec extends SparkSpec {

  /** (nanoTime, cursor, authHeader) for every request the server saw. */
  private type Timeline = ConcurrentLinkedQueue[(Long, String, String)]

  private def withServer(handler: (HttpExchange, Timeline) => Unit)
                        (body: (String, Timeline) => Unit): Unit = {
    val server = HttpServer.create(
      new InetSocketAddress(InetAddress.getLoopbackAddress, 0), 0)
    val timeline = new Timeline
    server.createContext("/", (ex: HttpExchange) => handler(ex, timeline))
    server.start()
    try body(s"http://${InetAddress.getLoopbackAddress.getHostAddress}:" +
      s"${server.getAddress.getPort}", timeline)
    finally server.stop(0)
  }

  private def respond(ex: HttpExchange, status: Int, body: String,
                      headers: Map[String, String] = Map.empty): Unit = {
    headers.foreach { case (k, v) => ex.getResponseHeaders.set(k, v) }
    val bytes = body.getBytes("UTF-8")
    ex.sendResponseHeaders(status, if (bytes.isEmpty) -1 else bytes.length)
    if (bytes.nonEmpty) {
      val os = ex.getResponseBody
      try os.write(bytes) finally os.close()
    }
    ex.close()
  }

  private def cursorOf(ex: HttpExchange): String =
    Option(ex.getRequestURI.getQuery).getOrElse("")
      .split('&').map(_.split("=", 2))
      .collectFirst { case Array("cursor", v) => v }.getOrElse("0")

  test("readPaginated over live HTTP: pagination, 401 refresh, 429 " +
      "Retry-After, 500 retry, rate pacing — full stack, observed " +
      "server-side") {
    val nPages = 5
    val perPage = 3
    val tokenServes = new AtomicInteger(0)
    @volatile var expectedToken = "tok0"
    val failedOnce = ConcurrentHashMapSet()

    withServer { (ex, timeline) =>
      val path = ex.getRequestURI.getPath
      if (path == "/token") {
        // the OAuth refresh endpoint: serves the currently-valid token
        tokenServes.incrementAndGet()
        respond(ex, 200, s"""{"access_token":"$expectedToken"}""")
      } else {
        val cursor = cursorOf(ex)
        val auth = Option(ex.getRequestHeaders.getFirst("Authorization"))
          .getOrElse("")
        timeline.add((System.nanoTime(), cursor, auth))
        def failOnce(kind: String)(f: => Unit): Boolean =
          if (!failedOnce.contains(s"$kind-$cursor")) {
            failedOnce.add(s"$kind-$cursor"); f; true
          } else false
        if (cursor == "1" && failOnce("429") {
          respond(ex, 429, "slow down", Map("Retry-After" -> "0"))
        }) ()
        else if (cursor == "2" && failOnce("500") {
          respond(ex, 500, "transient server error")
        }) ()
        else if (cursor == "3" && failedOnce.add("rotate-3")) {
          // token rotation: the credential the client is carrying just
          // expired server-side — this request gets a 401, the client
          // must invalidate + refresh + retry with the new token
          expectedToken = "tok1"
          respond(ex, 401, "token expired")
        }
        else if (auth != s"Bearer $expectedToken") respond(ex, 401, "bad token")
        else {
          val c = cursor.toInt
          val recs = (0 until perPage)
            .map(i => s"""{"id":${c * perPage + i}}""").mkString(",")
          val next =
            if (c + 1 < nPages) s""","next":"${c + 1}"""" else ""
          respond(ex, 200, s"""{"items":[$recs]$next}""")
        }
      }
    } { (base, timeline) =>
      val cache = new Sources.TokenCache(refresh = () => {
        val resp = Sources.httpGet(s"$base/token")
        val tok = """"access_token":"([^"]+)"""".r
          .findFirstMatchIn(resp.body).get.group(1)
        (tok, System.currentTimeMillis() + 3600000)
      })
      val ratePerSec = 50.0 // 20 ms floor between attempts
      val fetcher = new Sources.HttpPageFetcher(
        buildUrl = tok => s"$base/items?cursor=${tok.getOrElse("0")}",
        parsePage = body => {
          val items = """\{"id":\d+\}""".r.findAllIn(body).toSeq
          val next = """"next":"(\d+)"""".r.findFirstMatchIn(body)
            .map(_.group(1))
          (items, next)
        },
        tokens = Some(cache),
        limiter = Some(new Sources.RateLimiter(ratePerSec)),
        backoffMs = 10, maxBackoffMs = 50)

      val df = Sources.readPaginated(spark, fetcher)
      // every record of every page arrived, exactly once
      val ids = df.select("id").collect().map(_.getLong(0)).sorted.toSeq
      assert(ids == (0L until (nPages * perPage).toLong))

      val seen = timeline.asScala.toSeq
      def hits(cursor: String) = seen.count(_._2 == cursor)
      // injected failures each cost exactly one extra attempt
      assert(hits("1") == 2, "429 then success")
      assert(hits("2") == 2, "500 then success")
      assert(hits("3") == 2, "401 then success")
      assert(hits("0") == 1 && hits("4") == 1)
      // the 401 retry carried the REFRESHED token
      val cursor3 = seen.filter(_._2 == "3").sortBy(_._1).map(_._3)
      assert(cursor3 == Seq("Bearer tok0", "Bearer tok1"))
      // the token endpoint served exactly twice: initial + post-401
      assert(tokenServes.get() == 2)
      // rate limiter paced EVERY attempt (retries included): with the
      // 20 ms token interval, 8 attempts span >= 7 * 20 ms; generous
      // slack (5 ms/gap) for sleep granularity
      val times = seen.map(_._1).sorted
      val spanMs = (times.last - times.head) / 1e6
      assert(spanMs >= (seen.size - 1) * 15.0,
        f"8 attempts spanned $spanMs%.1f ms — limiter not pacing")
    }
  }

  test("429 with a positive Retry-After serves the named wait ONCE — " +
      "no exponential backoff stacked on top") {
    val failedOnce = ConcurrentHashMapSet()
    withServer { (ex, timeline) =>
      timeline.add((System.nanoTime(), cursorOf(ex), ""))
      if (failedOnce.add("429"))
        respond(ex, 429, "slow down", Map("Retry-After" -> "1"))
      else respond(ex, 200, """{"items":[{"id":0}]}""")
    } { (base, timeline) =>
      val fetcher = new Sources.HttpPageFetcher(
        buildUrl = _ => s"$base/items",
        parsePage = body =>
          ("""\{"id":\d+\}""".r.findAllIn(body).toSeq, None),
        attempts = 3,
        backoffMs = 500, // would dominate the gap if (wrongly) stacked
        maxBackoffMs = 120) // caps the served Retry-After at 120 ms
      val (recs, next) = fetcher.fetch(None)
      assert(recs.size == 1 && next.isEmpty)
      val times = timeline.asScala.toSeq.map(_._1).sorted
      assert(times.size == 2, "429 then success")
      val gapMs = (times(1) - times(0)) / 1e6
      assert(gapMs >= 100.0, f"Retry-After not served: gap $gapMs%.1f ms")
      assert(gapMs < 400.0,
        f"exponential backoff stacked on Retry-After: gap $gapMs%.1f ms")
    }
  }

  test("HttpPageFetcher exhausts retries on a permanently failing " +
      "endpoint and surfaces the HTTP status") {
    withServer { (ex, timeline) =>
      timeline.add((System.nanoTime(), cursorOf(ex), ""))
      respond(ex, 503, "down for maintenance")
    } { (base, timeline) =>
      val fetcher = new Sources.HttpPageFetcher(
        buildUrl = _ => s"$base/items",
        parsePage = _ => (Seq.empty, None),
        attempts = 3, backoffMs = 1, maxBackoffMs = 2)
      val e = intercept[java.io.IOException](fetcher.fetch(None))
      assert(e.getMessage.contains("503"))
      assert(timeline.size == 3, "exactly `attempts` requests")
    }
  }

  /** Tiny concurrent set via ConcurrentHashMap.newKeySet. */
  private def ConcurrentHashMapSet() =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
}
