package graft.core

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** The flod-curl analog ([[Http]] + [[Flow.readUrl]]/[[Flow.readUrls]])
  * against an in-process localhost fixture server: chunked streaming,
  * per-url partition layout, the reference's headline
  * `read(url).inflate.byLine` composition, and loud failure on non-2xx.
  */
class HttpFlowSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private implicit val be: org.apache.spark.sql.Encoder[Array[Byte]] =
    org.apache.spark.sql.Encoders.BINARY
  private implicit val se: org.apache.spark.sql.Encoder[String] =
    org.apache.spark.sql.Encoders.STRING

  private def withServer[A](routes: (String, Array[Byte])*)(
      body: Int => A): A = {
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    server.setExecutor(pool)
    routes.foreach { case (path, bytes) =>
      server.createContext(path,
        (ex: com.sun.net.httpserver.HttpExchange) => {
          ex.sendResponseHeaders(200, bytes.length.toLong)
          try ex.getResponseBody.write(bytes) finally ex.close()
        })
    }
    server.start()
    try body(server.getAddress.getPort)
    finally { server.stop(0); pool.shutdown() }
  }

  test("readUrl streams a body larger than chunkSize in order, byte-exact") {
    // 100_000 deterministic bytes over 1 KiB chunks: ≥98 reads, the
    // last chunk short — the multi-read path, not one lucky slurp.
    val payload = Array.tabulate[Byte](100000)(i => ((i * 31 + 7) % 251).toByte)
    withServer("/blob" -> payload) { port =>
      val chunks = Flow.readUrl(spark, s"http://127.0.0.1:$port/blob", 1024)
        .toArray
      assert(chunks.length == 98, "ceil(100000/1024) chunks")
      assert(chunks.init.forall(_.length == 1024))
      assert(chunks.last.length == 100000 % 1024)
      assert(java.util.Arrays.equals(chunks.flatten.toArray, payload))
    }
  }

  test("readUrls pins one url per partition in the given order") {
    val a = "alpha".getBytes("UTF-8")
    val b = "beta-longer".getBytes("UTF-8")
    withServer("/a" -> a, "/b" -> b) { port =>
      val flow = Flow.readUrls(spark,
        Seq(s"http://127.0.0.1:$port/a", s"http://127.0.0.1:$port/b"), 4)
      assert(flow.ds.rdd.getNumPartitions == 2)
      val perPart = flow.ds.rdd
        .mapPartitionsWithIndex((i, it) => Iterator((i, it.flatten.toSeq)))
        .collect().sortBy(_._1)
      assert(perPart(0)._2 == a.toSeq, "partition 0 carries url 0")
      assert(perPart(1)._2 == b.toSeq, "partition 1 carries url 1")
    }
  }

  test("the reference's headline composition: read(url).inflate.byLine") {
    val text = (1 to 50).map(i => s"line-$i").mkString("\n") + "\n"
    val gz = Codec.deflateChunk(text.getBytes("UTF-8"), Codec.Gzip)
    withServer("/corpus.gz" -> gz) { port =>
      val lines = Flow
        .readUrl(spark, s"http://127.0.0.1:$port/corpus.gz", 512)
        .inflate(Codec.Gzip)
        .decodeChars()
        .byLine()
        .toArray
      assert(lines == (1 to 50).map(i => s"line-$i"))
    }
  }

  test("non-2xx fails loudly with the url and status, never an empty stream") {
    withServer() { port =>
      val e = intercept[org.apache.spark.SparkException] {
        Flow.readUrl(spark, s"http://127.0.0.1:$port/missing").toArray
      }
      val msg = Option(e.getCause).map(_.getMessage).getOrElse(e.getMessage)
      assert(msg.contains("404") && msg.contains("/missing"))
    }
  }

  test("a zero-byte body yields an empty flow, not a phantom chunk") {
    withServer("/empty" -> Array.empty[Byte]) { port =>
      assert(Flow.readUrl(spark, s"http://127.0.0.1:$port/empty").toArray.isEmpty)
    }
  }

  // ---- flod-curl parity hardening (r14: redirects, transport coding,
  // connect retry, truncation) — raw handlers for the non-200 shapes.

  private def withHandlers[A](
      routes: (String, com.sun.net.httpserver.HttpHandler)*)(
      body: Int => A): A = {
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    server.setExecutor(pool)
    routes.foreach { case (path, h) => server.createContext(path, h) }
    server.start()
    try body(server.getAddress.getPort)
    finally { server.stop(0); pool.shutdown() }
  }

  private def bytesHandler(bytes: Array[Byte],
      headers: (String, String)* ): com.sun.net.httpserver.HttpHandler =
    (ex: com.sun.net.httpserver.HttpExchange) => {
      headers.foreach { case (k, v) => ex.getResponseHeaders.set(k, v) }
      ex.sendResponseHeaders(200, if (bytes.isEmpty) -1L else bytes.length.toLong)
      try ex.getResponseBody.write(bytes) finally ex.close()
    }

  private def redirectHandler(code: Int,
      location: String): com.sun.net.httpserver.HttpHandler =
    (ex: com.sun.net.httpserver.HttpExchange) => {
      ex.getResponseHeaders.set("Location", location)
      ex.sendResponseHeaders(code, -1L)
      ex.close()
    }

  test("3xx redirects are followed (relative and absolute Location), bounded") {
    val payload = "follow me".getBytes("UTF-8")
    withHandlers(
      "/blob" -> bytesHandler(payload),
      "/rel" -> redirectHandler(302, "/blob"),
    ) { port =>
      assert(Flow.readUrl(spark, s"http://127.0.0.1:$port/rel")
        .toArray.flatten.toArray.toSeq == payload.toSeq)
    }
    // absolute-Location hop (the cross-protocol code path: a fresh
    // connection is built from the resolved URI, not the JDK follower)
    withHandlers("/blob" -> bytesHandler(payload)) { targetPort =>
      withHandlers("/abs" -> redirectHandler(308,
          s"http://127.0.0.1:$targetPort/blob")) { port =>
        assert(Flow.readUrl(spark, s"http://127.0.0.1:$port/abs")
          .toArray.flatten.toArray.toSeq == payload.toSeq)
      }
    }
  }

  test("a redirect loop fails loudly at the hop bound, naming the url") {
    withHandlers("/loop" -> redirectHandler(302, "/loop")) { port =>
      val e = intercept[org.apache.spark.SparkException] {
        Flow.readUrl(spark, s"http://127.0.0.1:$port/loop").toArray
      }
      val msg = Option(e.getCause).map(_.getMessage).getOrElse(e.getMessage)
      assert(msg.contains("redirects") && msg.contains("/loop"))
    }
  }

  test("Content-Encoding: gzip transport coding is decoded transparently") {
    val text = (1 to 40).map(i => s"row-$i").mkString("\n")
    val gz = Codec.deflateChunk(text.getBytes("UTF-8"), Codec.Gzip)
    withHandlers("/enc" -> bytesHandler(gz, "Content-Encoding" -> "gzip")) {
      port =>
        val got = Flow.readUrl(spark, s"http://127.0.0.1:$port/enc", 512)
          .toArray.flatten.toArray
        assert(new String(got, "UTF-8") == text,
          "transport gzip is an HTTP wrapper — the flow sees plain bytes")
    }
  }

  test("Content-Encoding: deflate decodes BOTH zlib-wrapped and raw streams") {
    // curl parity (ADVICE r14): the token names the zlib wrapping but
    // real servers send raw deflate too; the sniff must accept both.
    val text = (1 to 60).map(i => s"deflated-$i").mkString("\n")
    def compress(nowrap: Boolean): Array[Byte] = {
      val d = new java.util.zip.Deflater(
        java.util.zip.Deflater.DEFAULT_COMPRESSION, nowrap)
      val out = new java.io.ByteArrayOutputStream()
      val s = new java.util.zip.DeflaterOutputStream(out, d)
      s.write(text.getBytes("UTF-8")); s.close()
      out.toByteArray
    }
    for (nowrap <- Seq(false, true)) {
      withHandlers("/defl" -> bytesHandler(compress(nowrap),
          "Content-Encoding" -> "deflate")) { port =>
        val got = Flow.readUrl(spark, s"http://127.0.0.1:$port/defl", 512)
          .toArray.flatten.toArray
        assert(new String(got, "UTF-8") == text,
          s"deflate (nowrap=$nowrap) must decode transparently")
      }
    }
  }

  test("an undecodable Content-Encoding fails loudly with the .inflate hint") {
    withHandlers("/br" ->
        bytesHandler("xx".getBytes, "Content-Encoding" -> "br")) { port =>
      val e = intercept[org.apache.spark.SparkException] {
        Flow.readUrl(spark, s"http://127.0.0.1:$port/br").toArray
      }
      val msg = Option(e.getCause).map(_.getMessage).getOrElse(e.getMessage)
      assert(msg.contains("Content-Encoding") && msg.contains("inflate"))
    }
  }

  test("connect-phase failure retries and succeeds once the server is up") {
    // Reserve a port, schedule the server to bind ~700ms later; the
    // first attempt gets connection-refused, the retry (250ms backoff
    // then reconnect loop) lands after the bind.
    val probe = new java.net.ServerSocket(0, 1,
      java.net.InetAddress.getByName("127.0.0.1"))
    val port = probe.getLocalPort
    probe.close()
    val payload = "late but present".getBytes("UTF-8")
    @volatile var server: com.sun.net.httpserver.HttpServer = null
    val binder = new Thread(() => {
      Thread.sleep(700)
      server = com.sun.net.httpserver.HttpServer.create(
        new java.net.InetSocketAddress("127.0.0.1", port), 0)
      server.createContext("/late", bytesHandler(payload))
      server.start()
    })
    binder.start()
    try {
      val got = Http.fetchChunks(s"http://127.0.0.1:$port/late",
        connectRetries = 6).flatten.toArray
      assert(got.toSeq == payload.toSeq)
    } finally {
      binder.join()
      if (server != null) server.stop(0)
    }
  }

  test("connect failure after the retry budget names the attempt count") {
    val probe = new java.net.ServerSocket(0, 1,
      java.net.InetAddress.getByName("127.0.0.1"))
    val port = probe.getLocalPort
    probe.close()
    val e = intercept[java.io.IOException] {
      Http.fetchChunks(s"http://127.0.0.1:$port/gone",
        connectRetries = 1).toArray
    }
    assert(e.getMessage.contains("connect failed after 2 attempt"))
  }

  test("a body shorter than Content-Length throws, never clean EOF") {
    // Raw socket server: declare 100 bytes, send 50, close. Depending
    // on JDK internals either our counting check ("truncated") or the
    // JDK's own premature-close detection fires — both are loud, which
    // is the contract under test.
    val server = new java.net.ServerSocket(0, 1,
      java.net.InetAddress.getByName("127.0.0.1"))
    val port = server.getLocalPort
    val t = new Thread(() => {
      val sock = server.accept()
      val out = sock.getOutputStream
      // drain the request head first so the client finishes writing
      val in = sock.getInputStream
      val buf = new Array[Byte](8192)
      var seen = new String("")
      while (!seen.contains("\r\n\r\n")) {
        val n = in.read(buf)
        if (n > 0) seen += new String(buf, 0, n, "ISO-8859-1") else seen += "\r\n\r\n"
      }
      out.write(("HTTP/1.1 200 OK\r\nContent-Length: 100\r\n" +
        "Connection: close\r\n\r\n").getBytes("ISO-8859-1"))
      out.write(new Array[Byte](50))
      out.flush()
      sock.close()
    })
    t.start()
    try {
      val e = intercept[java.io.IOException] {
        Http.fetchChunks(s"http://127.0.0.1:$port/short").foreach(_ => ())
      }
      val msg = e.getMessage.toLowerCase(java.util.Locale.ROOT)
      assert(msg.contains("truncated") || msg.contains("unexpected") ||
        msg.contains("premature"),
        s"expected a loud truncation error, got: ${e.getMessage}")
    } finally { t.join(); server.close() }
  }
}
