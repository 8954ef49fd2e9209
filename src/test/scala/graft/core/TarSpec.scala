package graft.core

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** USTAR archive stages: spec-exact writer vs incremental validating
  * parser, interop with GNU tar output conventions (checksum, padding,
  * zero-block termination), and the Flow composition. */
class TarSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def bytes(s: String) = s.getBytes("UTF-8")
  private val members = Seq(
    ("a.txt", bytes("alpha")),
    ("dir/b.bin", Array.tabulate[Byte](700)(_.toByte)), // crosses a block
    ("empty", Array.emptyByteArray),
    ("c.txt", bytes("gamma " * 100)))

  test("archive -> entries round-trips names and content exactly") {
    val got = Tar.entries(Iterator.single(Tar.archive(members))).toSeq
    assert(got.map(_._1) == members.map(_._1))
    got.zip(members).foreach { case ((_, g), (_, w)) => assert(g.sameElements(w)) }
  }

  test("entries survives adversarial chunk boundaries (mid-header, mid-content)") {
    val a = Tar.archive(members)
    for (split <- Seq(1, 7, 511, 513)) {
      val got = Tar.entries(a.grouped(split)).toSeq
      assert(got.map(_._1) == members.map(_._1), s"split=$split")
      got.zip(members).foreach { case ((_, g), (_, w)) =>
        assert(g.sameElements(w), s"split=$split") }
    }
  }

  test("concatenated archives parse through the zero-block seam") {
    val a = Tar.archive(members.take(2)) ++ Tar.archive(members.drop(2))
    val got = Tar.entries(Iterator.single(a)).toSeq
    assert(got.map(_._1) == members.map(_._1))
  }

  test("member sizes are 512-padded and the archive ends in two zero blocks") {
    val one = Tar.memberBytes("x", bytes("yz"))
    assert(one.length == 1024) // header + one padded content block
    val a = Tar.archive(Seq(("x", bytes("yz"))))
    assert(a.length == 2048)
    assert(a.takeRight(1024).forall(_ == 0))
  }

  test("parser validates header checksums — corruption fails loudly") {
    val a = Tar.archive(members)
    val bad = a.clone()
    bad(0) = (bad(0) + 1).toByte // damage the first name byte
    intercept[Exception](Tar.entries(Iterator.single(bad)).toSeq)
    intercept[Exception](Tar.entries(Iterator.single(a.dropRight(700))).toSeq)
  }

  test("we read system tar: GNU/PAX long names resolve, dirs and symlinks skip") {
    // externally-produced archives interleave metadata entries (dir,
    // symlink, GNU 'L' longname, PAX 'x' extended headers) that must
    // never surface as data members — and the >100-byte path must come
    // out through the longname/PAX override, not truncated.
    val dir = java.nio.file.Files.createTempDirectory("graft_tar_ext")
    val sub = dir.resolve("sub")
    java.nio.file.Files.createDirectories(sub)
    val longBase = "n" * 130 + ".txt" // sub/<130 chars> > 100-byte field
    java.nio.file.Files.write(sub.resolve(longBase), bytes("long-name payload"))
    java.nio.file.Files.write(dir.resolve("plain.txt"), bytes("plain payload"))
    java.nio.file.Files.createSymbolicLink(dir.resolve("link.txt"),
      java.nio.file.Paths.get("plain.txt"))
    for (format <- Seq("gnu", "pax")) {
      val f = dir.resolve(s"ext-$format.tar")
      val p = new ProcessBuilder("tar", "--format=" + format, "-cf", f.toString,
        "-C", dir.toString, "sub", "plain.txt", "link.txt")
        .redirectErrorStream(true).start()
      val out = new String(p.getInputStream.readAllBytes())
      assert(p.waitFor() == 0, s"tar -cf ($format) failed:\n$out")
      val got = Tar.entries(Iterator.single(java.nio.file.Files.readAllBytes(f)))
        .toSeq.map { case (n, c) => (n, new String(c, "UTF-8")) }.sortBy(_._1)
      assert(got == Seq(
        ("plain.txt", "plain payload"),
        (s"sub/$longBase", "long-name payload")), s"format=$format got=$got")
    }
  }

  test("system tar reads our archive (external interop)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_tar")
    val f = dir.resolve("t.tar")
    java.nio.file.Files.write(f, Tar.archive(members))
    val p = new ProcessBuilder("tar", "-tf", f.toString).redirectErrorStream(true).start()
    val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
    assert(p.waitFor() == 0, s"tar -tf failed:\n$out")
    assert(out.trim.linesIterator.toSeq == members.map(_._1))
  }

  test("writeShards: distributed tar sink round-trips through the untar read path") {
    import spark.implicits._
    val rows = (0 until 40).map(i => (s"m$i.txt", bytes(s"member $i " * (i % 5 + 1))))
    val cases: Seq[(Option[Codec.Format], String)] = Seq(
      (None, ".tar"), (Some(Codec.Gzip), ".tar.gz"),
      (Some(Codec.Zstd), ".tar.zst"), (Some(Codec.Lz4), ".tar.lz4"))
    for ((codec, suffix) <- cases) {
      val dir = java.nio.file.Files.createTempDirectory("graft_shards").toString
      Tar.writeShardsCompressed(spark.createDataset(rows).repartition(4), dir, codec)
      val files = new java.io.File(dir).listFiles.map(_.getName).sorted
      assert(files.nonEmpty && files.forall(_.endsWith(suffix)), s"$suffix names")
      val base = Flow.readBytes(spark, dir + "/*" + suffix)
      val flow = codec.fold(base)(f => base.inflate(f))
      val got = flow.untar.toArray.map { case (n, c) => (n, new String(c, "UTF-8")) }
      assert(got.sortBy(_._1).toSeq ==
        rows.map { case (n, c) => (n, new String(c, "UTF-8")) }.sortBy(_._1),
        s"$suffix round trip")
    }
  }

  test("Flow: readBytes(*.tar.gz).inflate.untar — the composed archive read path") {
    implicit val be: org.apache.spark.sql.Encoder[Array[Byte]] =
      org.apache.spark.sql.Encoders.BINARY
    implicit val pe: org.apache.spark.sql.Encoder[(String, Array[Byte])] =
      org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.STRING, org.apache.spark.sql.Encoders.BINARY)
    val dir = java.nio.file.Files.createTempDirectory("graft_tgz")
    for (k <- 0 until 3) {
      val arch = Tar.archive((0 until 4).map(i =>
        (s"part$k/doc$i.txt", bytes(s"archive $k doc $i " * (i + 1)))))
      java.nio.file.Files.write(dir.resolve(f"a$k%02d.tar.gz"),
        Codec.deflateChunk(arch, Codec.Gzip))
    }
    val got = Flow.readBytes(spark, dir.toString + "/*.tar.gz")
      .inflate(Codec.Gzip).untar.toArray
      .map { case (n, c) => (n, new String(c, "UTF-8")) }.sortBy(_._1)
    val want = (for (k <- 0 until 3; i <- 0 until 4)
      yield (s"part$k/doc$i.txt", s"archive $k doc $i " * (i + 1))).sortBy(_._1)
    assert(got.toSeq == want)
  }
}
