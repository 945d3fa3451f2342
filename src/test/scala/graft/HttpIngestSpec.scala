package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.BeforeAndAfterAll

import graft.ingest.Ingest

/** A1 exercised live-shaped (VERDICT r9 next-round #7): `Ingest.fetch`
  * against a loopback JDK HttpServer serving the KOFIC fixture — covering
  * the status check the reference performs (daily_csv_pipeline.py:63-64)
  * plus the retry/timeout behavior it delegates to Airflow. No network
  * egress: everything binds 127.0.0.1.
  */
class HttpIngestSpec extends SparkSpec with BeforeAndAfterAll {
  import spark.implicits._

  private val payload =
    """{"boxOfficeResult":{"boxofficeType":"일별 박스오피스",
      |"showRange":"20250113~20250113","dailyBoxOfficeList":[
      |{"rnum":"1","rank":"1","rankInten":"0","rankOldAndNew":"OLD",
      |"movieCd":"1001","movieNm":"MovieHttp","openDt":"2025-01-01",
      |"salesAmt":"1000","salesShare":"12.5","salesInten":"100",
      |"salesChange":"1.5","salesAcc":"10000","audiCnt":"100",
      |"audiInten":"10","audiChange":"0.5","audiAcc":"1000",
      |"scrnCnt":"500","showCnt":"2000"}]}}"""
      .stripMargin.replaceAll("\n", "")

  private var server: HttpServer = _
  private var base: String = _
  private val flakyHits = new AtomicInteger(0)
  private val redirectHits = new AtomicInteger(0)

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes(UTF_8)
    ex.sendResponseHeaders(code, bytes.length.toLong)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  override def beforeAll(): Unit = {
    super.beforeAll()
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/ok", (ex: HttpExchange) => respond(ex, 200, payload))
    // first hit 500, second 200 — the Airflow `retries: 1` shape
    server.createContext("/flaky", (ex: HttpExchange) =>
      if (flakyHits.incrementAndGet() == 1) respond(ex, 500, "boom")
      else respond(ex, 200, payload))
    server.createContext("/always500", (ex: HttpExchange) =>
      respond(ex, 500, "boom"))
    server.createContext("/forbidden", (ex: HttpExchange) =>
      respond(ex, 403, "bad key"))
    server.createContext("/slow", (ex: HttpExchange) => {
      Thread.sleep(2000); respond(ex, 200, payload)
    })
    // cross-protocol redirect shape: HttpURLConnection will NOT follow
    // http->https, so this must surface as a terminal error, not retries
    server.createContext("/moved", (ex: HttpExchange) => {
      ex.getResponseHeaders.add("Location", "https://127.0.0.1/ok")
      respond(ex, 301, "moved")
      redirectHits.incrementAndGet(); ()
    })
    server.createContext("/huge", (ex: HttpExchange) => {
      // 1 MiB body, streamed in chunks
      val chunk = new Array[Byte](64 * 1024)
      java.util.Arrays.fill(chunk, 'x'.toByte)
      ex.sendResponseHeaders(200, (chunk.length * 16).toLong)
      (0 until 16).foreach(_ => ex.getResponseBody.write(chunk))
      ex.close()
    })
    server.start()
    base = s"http://127.0.0.1:${server.getAddress.getPort}"
  }

  override def afterAll(): Unit = {
    if (server != null) server.stop(0)
    super.afterAll()
  }

  test("A1: fetch -> parse -> dailyTable runs end-to-end from a socket") {
    val text = Ingest.fetch(s"$base/ok")
    val flat = Ingest.parsePayload(Seq(text).toDS())
    val wide = Ingest.dailyTable(
      Ingest.requireNonEmpty(flat, "20250113"), "20250113")
    assert(wide.count() === 1)
    assert(wide.select("title").as[String].head() === "MovieHttp")
    assert(wide.select("20250113_sales").as[Long].head() === 1000L)
  }

  test("A1: a 500 is retried and the retry succeeds") {
    flakyHits.set(0)
    val text = Ingest.fetch(s"$base/flaky", retries = 2, backoffMs = 10)
    assert(text === payload)
    assert(flakyHits.get() === 2, "expected exactly one retry")
  }

  test("A1: persistent 5xx exhausts retries and surfaces the cause") {
    val e = intercept[java.io.IOException] {
      Ingest.fetch(s"$base/always500", retries = 2, backoffMs = 10)
    }
    assert(e.getMessage.contains("after 3 attempts"))
    assert(e.getCause.getMessage.contains("500"))
  }

  test("A1: 4xx fails fast without retrying (reference's status check)") {
    val e = intercept[IllegalStateException] {
      Ingest.fetch(s"$base/forbidden", retries = 5, backoffMs = 10)
    }
    assert(e.getMessage.contains("403"))
  }

  test("A1: 3xx fails fast with the Location surfaced, burning no " +
    "retries (r10 ADVICE)") {
    redirectHits.set(0)
    val e = intercept[IllegalStateException] {
      Ingest.fetch(s"$base/moved", retries = 5, backoffMs = 10)
    }
    assert(e.getMessage.contains("301"))
    assert(e.getMessage.contains("https://127.0.0.1/ok"),
      s"redirect target must be in the error: ${e.getMessage}")
    assert(redirectHits.get() === 1, "3xx must not be retried")
  }

  test("A1: oversize body trips the maxBytes cap loudly (r10 ADVICE)") {
    val e = intercept[IllegalStateException] {
      Ingest.fetch(s"$base/huge", maxBytes = 128 * 1024)
    }
    assert(e.getMessage.contains("exceeded"))
    // and the same endpoint succeeds when the cap accommodates it
    assert(Ingest.fetch(s"$base/huge", maxBytes = 2L * 1024 * 1024)
      .length === 16 * 64 * 1024)
  }

  test("A1: read timeout trips, retries, and fails visibly") {
    val t0 = System.nanoTime()
    val e = intercept[java.io.IOException] {
      Ingest.fetch(s"$base/slow", readTimeoutMs = 150, retries = 1,
        backoffMs = 10)
    }
    val sec = (System.nanoTime() - t0) / 1e9
    assert(e.getMessage.contains("after 2 attempts"))
    assert(sec < 2.0, s"timeout did not bound the wait (took ${sec}s)")
  }
}
