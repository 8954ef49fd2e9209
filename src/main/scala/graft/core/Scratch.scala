package graft.core

/** Session-scoped scratch directories for substrate/fixture parquet
  * caches ([[graft.ops.Components]]' dup-MST and ε-slink substrates,
  * [[graft.multimodal.Multimodal]]'s media fixture): created once per
  * (JVM, cache key) and deleted recursively on JVM exit — the temp
  * dirs used to outlive the session (ADVICE r14). */
object Scratch {
  private val dirs =
    new java.util.concurrent.ConcurrentLinkedQueue[java.nio.file.Path]()

  // registered once, lazily, so JVMs that never build a substrate
  // never pay a shutdown hook
  private lazy val hookInstalled: Boolean = {
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      dirs.forEach(p =>
        try deleteRecursively(p) catch { case _: Exception => () })
    }, "graft-scratch-cleanup"))
    true
  }

  /** A fresh temp directory registered for recursive deletion on JVM
    * exit; returned as a plain path string (callers hand it to Spark
    * writers). */
  def tempDir(prefix: String): String = {
    require(hookInstalled)
    val p = java.nio.file.Files.createTempDirectory(prefix)
    dirs.add(p)
    p.toString
  }

  /** Normalized cache key for a corpus directory (ADVICE r16): the
    * substrate caches key on the dir STRING, so `dir` vs `dir/` vs a
    * relative spelling would silently double-build the substrate.
    * Local paths canonicalize via the filesystem; strings carrying a
    * URI scheme (e.g. an object-store path on a real cluster) skip
    * local-FS canonicalization (it would mangle them) but still drop
    * trailing slashes — `s3://b/corpus` vs `s3://b/corpus/` is the
    * exact aliasing this helper exists to fix, and it survives on the
    * cluster branch otherwise (ADVICE r17). */
  def corpusKey(dir: String): String =
    if (dir.contains("://")) {
      var k = dir
      while (k.length > 1 && k.endsWith("/")) k = k.stripSuffix("/")
      k
    }
    else try new java.io.File(dir).getCanonicalPath
    catch { case _: java.io.IOException => dir }

  private def deleteRecursively(p: java.nio.file.Path): Unit = {
    if (java.nio.file.Files.isDirectory(p,
        java.nio.file.LinkOption.NOFOLLOW_LINKS)) {
      val s = java.nio.file.Files.list(p)
      try s.forEach(c => deleteRecursively(c)) finally s.close()
    }
    java.nio.file.Files.deleteIfExists(p)
  }
}
