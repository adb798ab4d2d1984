package graft.api

import java.io.{ByteArrayOutputStream, PrintStream}
import java.net.InetSocketAddress

import com.sun.net.httpserver.{Headers, HttpContext, HttpExchange, HttpServer}
import org.scalatest.funsuite.AnyFunSuite

/** The shared ops mux's failure-visibility contract: routine client
  * disconnects stay silent, but a bug on the render/response path must
  * leave a trace (one stderr line) AND still close the exchange — a
  * swallowed-silent serialization bug in a metrics collector would
  * otherwise be invisible forever (the reference's instrumentation mux
  * surfaces handler panics through the Go HTTP server's logger the same
  * way).
  */
class OpsRoutesSpec extends AnyFunSuite {

  private def withStderr[A](body: => A): (A, String) = {
    val buf = new ByteArrayOutputStream()
    val old = System.err
    System.setErr(new PrintStream(buf, true, "UTF-8"))
    try {
      val a = body
      (a, buf.toString("UTF-8"))
    } finally System.setErr(old)
  }

  test("a throwing metrics render answers 500 with a stderr trace, and the " +
      "server keeps serving afterwards") {
    val server = HttpServer.create(new InetSocketAddress(0), 0)
    @volatile var healthy = false
    OpsRoutes.healthcheck(server)
    OpsRoutes.metrics(server) { () =>
      if (healthy) "# TYPE up gauge\nup 1\n"
      else throw new IllegalStateException("gauge collector bug")
    }
    server.start()
    try {
      val client = java.net.http.HttpClient.newHttpClient()
      def get(path: String): (Int, String) = {
        val resp = client.send(java.net.http.HttpRequest.newBuilder(
          java.net.URI.create(s"http://localhost:${server.getAddress.getPort}$path"))
          .GET().build(), java.net.http.HttpResponse.BodyHandlers.ofString())
        (resp.statusCode(), resp.body())
      }
      val ((status, _), err) = withStderr(get("/metrics"))
      assert(status == 500, "a render failure must answer, not drop the connection")
      assert(err.contains("metrics render failed") &&
        err.contains("gauge collector bug"), s"no trace of the render bug: '$err'")
      // the exchange closed and the mux still works: liveness unaffected,
      // and a healed render serves 200 again on the same context
      assert(get("/healthcheck") == ((200, "OK")))
      healthy = true
      val (ok, body) = get("/metrics")
      assert(ok == 200 && body.contains("up 1"))
    } finally server.stop(0)
  }

  test("answer logs non-I/O failures before containing them, stays silent on " +
      "client disconnects, and closes the exchange in every case") {
    final class FakeExchange(failWith: Throwable) extends HttpExchange {
      var closed = false
      private val respHeaders = new Headers
      override def getRequestHeaders: Headers = new Headers
      override def getResponseHeaders: Headers = respHeaders
      override def getRequestURI: java.net.URI = java.net.URI.create("/metrics")
      override def getRequestMethod: String = "GET"
      override def getHttpContext: HttpContext = null
      override def close(): Unit = closed = true
      override def getRequestBody: java.io.InputStream =
        new java.io.ByteArrayInputStream(Array.emptyByteArray)
      override def getResponseBody: java.io.OutputStream =
        new java.io.OutputStream { def write(b: Int): Unit = throw failWith }
      override def sendResponseHeaders(rCode: Int, responseLength: Long): Unit = ()
      override def getRemoteAddress: InetSocketAddress = new InetSocketAddress(0)
      override def getResponseCode: Int = 200
      override def getLocalAddress: InetSocketAddress = new InetSocketAddress(0)
      override def getProtocol: String = "HTTP/1.1"
      override def getAttribute(name: String): AnyRef = null
      override def setAttribute(name: String, value: AnyRef): Unit = ()
      override def setStreams(i: java.io.InputStream, o: java.io.OutputStream): Unit = ()
      override def getPrincipal: com.sun.net.httpserver.HttpPrincipal = null
    }

    // non-I/O failure on the write path: contained AND traced
    val buggy = new FakeExchange(new NullPointerException("response assembly bug"))
    val (_, err) = withStderr(OpsRoutes.answer(buggy, 200, "text/plain", "OK"))
    assert(buggy.closed, "the exchange must close even when the write throws")
    assert(err.contains("response assembly bug"), s"no trace of the bug: '$err'")

    // routine client disconnect: contained and SILENT
    val gone = new FakeExchange(new java.io.IOException("broken pipe"))
    val (_, quiet) = withStderr(OpsRoutes.answer(gone, 200, "text/plain", "OK"))
    assert(gone.closed)
    assert(quiet.isEmpty, s"a client disconnect must not spam stderr: '$quiet'")
  }
}
