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

  test("readSplit over a staged multi-separator file at small chunk sizes") {
    val text = "alpha<|>beta<|>gamma<|><|>tail"
    val f = java.io.File.createTempFile("dsplit", ".txt")
    f.deleteOnExit()
    java.nio.file.Files.write(f.toPath, text.getBytes("UTF-8"))
    val got = DistributedSplit.readSplit(spark, f.getPath, "<|>",
      keepSeparator = false, chunkBytes = 4L).collect().toVector
    assert(got == Vector("alpha", "beta", "gamma", "", "tail"))
  }
}
