package graft.text

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** The distributed two-pass splitter must reproduce every single-stream
  * Splitter fixture (flod range.d:470-547) at >=2 partitions, including
  * separators spanning the partition boundary byte-wise and partitions
  * containing no separator at all. */
class DistributedSplitSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def viaCluster(text: String, sep: String, keep: Boolean,
                         chunkSize: Int, parts: Int): Vector[String] = {
    import spark.implicits._
    // parallelize slices contiguously, so partition index order IS the
    // stream order — the split() input contract
    val chunks = text.grouped(chunkSize).toSeq
    val rdd = spark.sparkContext.parallelize(chunks, math.max(1, parts))
    DistributedSplit.split(spark.createDataset(rdd), sep, keep).collect().toVector
  }

  private val fixtures = Seq(
    ("first\nsecond\nthird\n", "\n", false),
    ("first\nsecond\nthird", "\n", false),
    ("Foo\r\nBar\r\nBaz\r\r\n\r\n", "\r\n", false),
    ("Foo\r\nBar\r\nBaz\r\r\n\r\n", "\r\n", true),
    ("Zażółć gęślą jaźń", " ", true),
    ("Zażółć gęślą jaźń ", " ", true),
    ("여보세요 세계", " ", false),
    ("", "\n", false))

  for (((text, sep, keep), fi) <- fixtures.zipWithIndex; parts <- Seq(2, 3, 7)) {
    val label = text.take(12).replace("\r", "\\r").replace("\n", "\\n")
    test(s"fixture $fi '$label' sep=${sep.replace("\r", "\\r").replace("\n", "\\n")} keep=$keep parts=$parts") {
      for (chunkSize <- Seq(1, 2, 3, 5)) {
        assert(viaCluster(text, sep, keep, chunkSize, parts) ==
          Splitter.split(text, sep, keep), s"chunkSize=$chunkSize")
      }
    }
  }

  test("separator spanning the exact partition boundary is found") {
    import spark.implicits._
    // chunk 1 ends with '\r', chunk 2 begins with '\n' — the junction
    // re-split must discover the spanning separator
    val rdd = spark.sparkContext.parallelize(Seq("abc\r", "\ndef\r\nx"), 2)
    val got = DistributedSplit.split(spark.createDataset(rdd), "\r\n",
      keepSeparator = true).collect().toVector
    assert(got == Vector("abc\r\n", "def\r\n", "x"))
  }

  test("partition with no separator chains through the junction walk") {
    import spark.implicits._
    val rdd = spark.sparkContext.parallelize(Seq("aa", "bb", "cc|", "dd"), 4)
    val got = DistributedSplit.split(spark.createDataset(rdd), "|").collect().toVector
    assert(got == Vector("aabbcc", "dd"))
  }

  test("bordered separator re-phasing counterexample routes to the sequential path") {
    // found by the randomized suite: under sep="::" (border ":"), the
    // run "::::::" re-phases at partition boundaries and the shift
    // cascades — the distributed path would return [..., ":", ":>"]
    // instead of [..., "", ">"]
    assert(DistributedSplit.hasBorder("::"))
    assert(!DistributedSplit.hasBorder("\r\n") && !DistributedSplit.hasBorder("<|>") &&
      !DistributedSplit.hasBorder("\n") && !DistributedSplit.hasBorder(" "))
    val text = "::::::fooZażółć::x|::::>::"
    assert(viaCluster(text, "::", keep = false, chunkSize = 1, parts = 5) ==
      Splitter.split(text, "::", keepSeparator = false))
  }

  test("randomized: distributed split equals reference split (100 adversarial cases)") {
    // deterministic pseudo-random sweep over texts built FROM separator
    // fragments (maximizes partial-separator boundary events), chunk
    // sizes, partition counts, and keep flags — the property the junction
    // walk must uphold: distributed == single-stream reference, always
    val rnd = new scala.util.Random(20260812L)
    val seps = Vector("\n", "\r\n", "::", "<|>", " ")
    val atoms = Vector("", "x", "foo", "\r", ":", "<", "|", ">", "a b", "Zażółć")
    for (i <- 0 until 100) {
      val sep = seps(rnd.nextInt(seps.length))
      val nParts = 1 + rnd.nextInt(12)
      val text = (0 until nParts)
        .map(_ => if (rnd.nextBoolean()) atoms(rnd.nextInt(atoms.length)) else sep)
        .mkString
      val keep = rnd.nextBoolean()
      val chunkSize = 1 + rnd.nextInt(6)
      val parts = 1 + rnd.nextInt(5)
      val got = viaCluster(text, sep, keep, chunkSize, parts)
      val want = Splitter.split(text, sep, keep)
      assert(got == want,
        s"case $i sep=${sep.replace("\r", "\\r").replace("\n", "\\n")} keep=$keep " +
          s"chunk=$chunkSize parts=$parts text=${text.replace("\r", "\\r").replace("\n", "\\n")}")
    }
  }

  test("readSplit preserves multi-byte UTF-8 across every chunk boundary") {
    // 2- and 3-byte code points; chunkBytes from 1 up forces every
    // possible straddle of a code point across a byte-range boundary —
    // naive per-range decoding would shred them into U+FFFD
    val text = "Zażółć gęślą jaźń żółw 한국어 테스트 done"
    val f = java.io.File.createTempFile("dsplit_utf8", ".txt")
    f.deleteOnExit()
    java.nio.file.Files.write(f.toPath, text.getBytes("UTF-8"))
    for (cb <- Seq(1L, 2L, 3L, 5L, 7L)) {
      val got = DistributedSplit.readSplit(spark, f.getPath, " ",
        keepSeparator = false, chunkBytes = cb).collect().toVector
      assert(got == Splitter.split(text, " ", keepSeparator = false), s"chunkBytes=$cb")
      assert(!got.exists(_.contains('�')), s"chunkBytes=$cb produced replacement chars")
    }
  }

  test("readSplit over a staged multi-separator file at small chunk sizes") {
    val text = "alpha<|>beta<|>gamma<|><|>tail"
    val f = java.io.File.createTempFile("dsplit", ".txt")
    f.deleteOnExit()
    java.nio.file.Files.write(f.toPath, text.getBytes("UTF-8"))
    val got = DistributedSplit.readSplit(spark, f.getPath, "<|>",
      keepSeparator = false, chunkBytes = 4L).collect().toVector
    assert(got == Vector("alpha", "beta", "gamma", "", "tail"))
  }

  test("interior pass is streaming: consumes only emitted segments + lookahead") {
    // Pins the round-4 memory contract: a partition's segments are never
    // materialized as an array — the interior iterator pulls one segment
    // ahead of what it emits, so per-task memory is O(segment), however
    // large the partition. The counting source proves it: taking 10
    // interior segments reads at most 12 source segments (first + 10 +
    // one lookahead) of the 100,000 available.
    var consumed = 0
    val source = Iterator.tabulate(100000) { i => consumed += 1; s"seg$i|" }
    val it = DistributedSplit.interiorIter(0, source, "|")
    val got = it.take(10).toList
    assert(got.map(_.seg) == (1 to 10).map(i => s"seg$i|").toList)
    assert(consumed <= 12, s"lazy interior pass must not drain the source, consumed $consumed")

    // full-drain semantics unchanged: last segment interior iff terminated
    val term = DistributedSplit.interiorIter(0, Iterator("a|", "b|", "c|"), "|").toList
    assert(term.map(_.seg) == List("b|", "c|"))
    val unterm = DistributedSplit.interiorIter(0, Iterator("a|", "b|", "c"), "|").toList
    assert(unterm.map(_.seg) == List("b|"))
    assert(DistributedSplit.interiorIter(0, Iterator.empty, "|").isEmpty)
    assert(DistributedSplit.interiorIter(0, Iterator("only"), "|").isEmpty)
  }
}
