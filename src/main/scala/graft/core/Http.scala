package graft.core

/** Chunked HTTP(S) byte fetch — the engine's flod-curl analog (the
  * first external package the reference lists: `/root/reference/
  * README.md:58` "download files from the web using libcurl"). The
  * reference composes `read(url).inflate.byLine`; here the url source
  * yields the same `Flow[Array[Byte]]` contract as [[Flow.readBytes]],
  * so every downstream stage (inflate/untar/decodeChars/byLine)
  * composes unchanged — see [[Flow.readUrl]]/[[Flow.readUrls]] for the
  * distributed entry points (fetches run on EXECUTORS, one task per
  * url; nothing stages through the driver).
  *
  * Failure is loud: a non-2xx status throws with the url and code —
  * never an empty healthy-looking stream. Early abandonment (a `take`
  * above the fetch) releases the connection through the task-completion
  * hook (the Codec native-resource discipline, `Codec.onTaskEnd`).
  */
object Http {

  /** Lazily stream one url's body as `chunkSize`-byte chunks (the last
    * chunk may be short; a 0-byte body yields no chunks). */
  def fetchChunks(url: String, chunkSize: Int = 1 << 16,
                  connectTimeoutMs: Int = 30000,
                  readTimeoutMs: Int = 120000): Iterator[Array[Byte]] = {
    require(chunkSize > 0, s"chunkSize must be positive: $chunkSize")
    val conn = java.net.URI.create(url).toURL.openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
    conn.setRequestMethod("GET")
    conn.setConnectTimeout(connectTimeoutMs)
    conn.setReadTimeout(readTimeoutMs)
    val code = conn.getResponseCode
    if (code / 100 != 2) {
      conn.disconnect()
      throw new java.io.IOException(s"GET $url failed: HTTP $code")
    }
    val in = conn.getInputStream
    // Partial consumption (limit/take above the fetch) abandons the
    // iterator mid-stream: release the socket with the task, exactly
    // like Codec frees its native contexts. close() is idempotent, so
    // running after the exhaustion-path close is safe.
    val tc = org.apache.spark.TaskContext.get()
    if (tc != null) tc.addTaskCompletionListener[Unit] { _ =>
      try in.close() catch { case _: Exception => () }
    }
    new Iterator[Array[Byte]] {
      private var chunk: Array[Byte] = _
      private var done = false
      private def advance(): Unit = if (!done && chunk == null) {
        val buf = new Array[Byte](chunkSize)
        var off = 0
        var n = 0
        while (off < chunkSize &&
               { n = in.read(buf, off, chunkSize - off); n >= 0 }) off += n
        if (off == 0) { done = true; in.close() }
        else chunk = if (off == chunkSize) buf
          else java.util.Arrays.copyOf(buf, off)
      }
      def hasNext: Boolean = { advance(); chunk != null }
      def next(): Array[Byte] = {
        advance()
        if (chunk == null) throw new NoSuchElementException("exhausted")
        val c = chunk; chunk = null; c
      }
    }
  }
}
