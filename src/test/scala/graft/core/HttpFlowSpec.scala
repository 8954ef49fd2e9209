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
}
