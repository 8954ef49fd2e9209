package graft.text

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}

/** Distributed separator-splitting with the full reference semantics
  * (flod `byLine`, reference `range.d:359-508` — keepSeparator, the
  * terminated-empty-segment rule, multi-char separators), correct across
  * partition boundaries.
  *
  * `Flow.byLine` is only correct when one partition holds the whole
  * ordered stream; the text-source `lineSep` path cannot keep
  * terminators or reproduce the terminated-empty-segment rule. This is
  * the missing distributed operator: a two-pass repair.
  *
  *  - Pass 1 (distributed): each partition splits its own chunk stream
  *    with [[Splitter.incremental]] (keepSeparator internally, so
  *    concatenation is lossless). Interior segments — those that both
  *    begin after a separator found in this partition and end with one —
  *    are provably correct locally and stay distributed.
  *  - Pass 2 (driver, O(partitions) data): only each partition's FIRST
  *    segment and unterminated TAIL are boundary-suspect (a separator
  *    can even span the junction byte-wise). These ≤2 small fragments
  *    per partition are walked in order, junctions re-split, and the
  *    repaired segments unioned back. A single segment spanning a whole
  *    multi-GB partition would chain through the driver — the inherent
  *    pathological case of any order-preserving split, documented here.
  *
  * Scale: shuffled data is ONLY the repaired boundary segments
  * (≤2·partitions rows); interior segments never leave their partition
  * until the final order-preserving sort (range partitioning).
  *
  * Contract: the distributed path requires a BORDER-FREE separator (no
  * proper prefix equal to a suffix — true of "\n", "\r\n", "<|>", " ",
  * every practical record separator). Self-overlapping separators
  * re-phase across partition boundaries and automatically fall back to
  * the sequential single-stream parse ([[hasBorder]]).
  */
object DistributedSplit {

  // non-private: encoder codegen instantiates these from generated code
  case class Seg(part: Int, slot: Int, idx: Long, seg: String)
  case class Boundary(part: Int, first: String, tail: String,
                      nSegs: Long, lastTerminated: Boolean)

  /** Split an ordered, partitioned chunk stream into segments, totally
    * ordered (by the returned Dataset's order), with exact Splitter
    * semantics. `chunks` must be an ordered stream whose partition index
    * order is the stream order (true for file reads and fromSeq).
    *
    * Costs two scans of the chunk stream (interior pass + boundary
    * pass) — the standard price of an order-preserving split without an
    * index; `persist()` the chunk Dataset upstream to trade memory for
    * the rescan. */
  /** True iff a proper nonempty prefix of `sep` equals a suffix — a
    * "bordered" separator can overlap itself (":::" under "::"), so the
    * left-to-right non-overlapping match PHASE depends on the parse
    * entry point and a partition-local parse cannot be trusted: a
    * boundary straddle can re-phase every match in the partition. For
    * border-free separators the junction re-split provably consumes
    * exactly to the first local boundary, so interior segments stand. */
  private[text] def hasBorder(sep: String): Boolean =
    (1 until sep.length).exists(k => sep.substring(0, k) == sep.substring(sep.length - k))

  /** Lazy interior-segment iterator: skips the boundary-suspect FIRST
    * segment, then emits each segment once a successor is known to exist
    * (one-element lookahead); the final segment is interior only when
    * terminated, otherwise it is the partition's tail and stays behind
    * for pass 2. Pure iterator plumbing — DistributedSplitSpec asserts
    * it consumes no more of the source than it emits (+lookahead). */
  private[text] def interiorIter(pi: Int, segs: Iterator[String], sep: String): Iterator[Seg] = {
    if (!segs.hasNext) Iterator.empty
    else {
      segs.next() // first segment: boundary-suspect, pass 2 repairs it
      new Iterator[Seg] {
        private var pending: String = if (segs.hasNext) segs.next() else null
        private var idx = 1L
        def hasNext: Boolean =
          pending != null && (segs.hasNext || pending.endsWith(sep))
        def next(): Seg = {
          val out = Seg(pi, 0, idx, pending)
          idx += 1
          pending = if (segs.hasNext) segs.next() else null
          out
        }
      }
    }
  }

  def split(chunks: Dataset[String], sep: String,
            keepSeparator: Boolean = false,
            ordered: Boolean = true): Dataset[String] = {
    require(sep.nonEmpty, "separator must be non-empty")
    if (hasBorder(sep)) {
      // self-overlapping separator: fall back to the correct-but-
      // sequential single-stream parse (discovered by the randomized
      // boundary suite: "::::::…" re-phases under "::" at partition
      // boundaries and the shift cascades arbitrarily far). Every
      // practical record separator ("\n", "\r\n", "<|>", " ") is
      // border-free and takes the distributed path.
      return chunks.coalesce(1)
        .mapPartitions(Splitter.incremental(sep, keepSeparator))(Encoders.STRING)
    }
    val spark = chunks.sparkSession

    // Pass 1 (distributed, STREAMING): local split with keepSeparator=
    // true for losslessness; interior segments are emitted lazily from
    // the partition iterator with a one-segment lookahead — per-task
    // memory is O(current segment), never the partition's whole segment
    // array (a few large chunks per partition would otherwise sit
    // entirely on-heap). slot -1 = repaired-junction segments (inserted
    // by pass 2), slot 0 = interior segments.
    val interior: Dataset[Seg] = spark.createDataset(
      chunks.rdd.mapPartitionsWithIndex { (pi, it) =>
        interiorIter(pi, Splitter.incremental(sep, keepSeparator = true)(it), sep)
      })(Encoders.product[Seg])

    // Pass 2 input (second scan, O(1) state per task): only first/last
    // segment, count and termination survive to the driver.
    val boundaries: Array[Boundary] = chunks.rdd
      .mapPartitionsWithIndex { (pi, it) =>
        val segs = Splitter.incremental(sep, keepSeparator = true)(it)
        var first = ""; var last = ""; var n = 0L
        while (segs.hasNext) {
          val s = segs.next(); if (n == 0L) first = s; last = s; n += 1
        }
        val lastTerm = n > 0 && last.endsWith(sep)
        Iterator.single(Boundary(pi, first,
          tail = if (n >= 2 && !lastTerm) last else "",
          nSegs = n, lastTerminated = lastTerm))
      }.collect().sortBy(_.part)

    // Pass 2: walk junctions in stream order.
    val repaired = Vector.newBuilder[Seg]
    var pending = ""
    for (b <- boundaries) {
      if (b.nSegs == 0L) {
        // empty partition: nothing to do
      } else if (b.nSegs == 1L) {
        val junction = pending + b.first
        if (b.lastTerminated) {
          // partition ends exactly on a separator: junction closes here
          Splitter.split(junction, sep, keepSeparator = true).zipWithIndex
            .foreach { case (s, j) => repaired += Seg(b.part, -1, j.toLong, s) }
          pending = ""
        } else pending = junction // separator-less partition: keep chaining
      } else {
        // first segment is terminated (>=2 segments): junction closes
        Splitter.split(pending + b.first, sep, keepSeparator = true).zipWithIndex
          .foreach { case (s, j) => repaired += Seg(b.part, -1, j.toLong, s) }
        pending = if (b.lastTerminated) "" else b.tail
      }
    }
    val lastPart = boundaries.lastOption.map(_.part + 1).getOrElse(0)
    // the pending chain can itself contain separators assembled across
    // separator-less fragments ("<" ++ "|>tail" for sep "<|>") — re-split
    // on final emission, exactly like a junction close
    if (pending.nonEmpty)
      Splitter.split(pending, sep, keepSeparator = true).zipWithIndex
        .foreach { case (s, j) => repaired += Seg(lastPart, -1, j.toLong, s) }

    val all = interior.unionByName(
      spark.createDataset(repaired.result())(Encoders.product[Seg]))
    // ordered=false skips the global range sort — right for order-
    // insensitive consumers (aggregation, dedup, set ops)
    val placed = if (ordered) all.orderBy("part", "slot", "idx") else all
    val segs = placed.map(_.seg)(Encoders.STRING)
    if (keepSeparator) segs
    else segs.map { s =>
      if (s.endsWith(sep)) s.substring(0, s.length - sep.length) else s
    }(Encoders.STRING)
  }

  /** Distributed file read + split: the scalable `byLine` with full
    * Splitter semantics over an arbitrary (multi-char) separator. Reads
    * the file as fixed-size chunks partitioned by byte ranges — each
    * task positioned-reads only its range (the splittable-scan pattern)
    * THROUGH THE HADOOP FILESYSTEM of the path, so the same code reads
    * local files in local mode and HDFS/S3/GCS on a cluster (a raw
    * java.io read would silently require every executor to share the
    * driver's mount). Assumes UTF-8 text whose separator bytes cannot
    * be a suffix/prefix mix inside a multi-byte code point (true for
    * ASCII separators over UTF-8). */
  def readSplit(spark: SparkSession, path: String, sep: String,
                keepSeparator: Boolean = false,
                chunkBytes: Long = 4L << 20, parallelism: Int = 0): Dataset[String] = {
    import spark.implicits._
    import org.apache.hadoop.fs.{Path => HPath}
    val hPath = new HPath(path)
    // Hadoop Configuration is not java-serializable; Spark's Writable
    // envelope ships it into tasks, so byte-range reads open the SAME
    // filesystem the driver resolved (not each executor's local disk)
    val serConf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val size = hPath.getFileSystem(serConf.value).getFileStatus(hPath).getLen
    val nChunks = math.max(1L, (size + chunkBytes - 1) / chunkBytes)
    val parts = if (parallelism > 0) parallelism
                else math.min(nChunks, spark.sparkContext.defaultParallelism.toLong).toInt
    val chunks = spark.range(0, nChunks, 1, parts.toInt).map { i =>
      val p = new HPath(path)
      val in = p.getFileSystem(serConf.value).open(p)
      try {
        val start = i * chunkBytes
        val rawEnd = math.min(start + chunkBytes, size)
        // UTF-8 boundary repair: decoding each byte range independently
        // would shred a multi-byte code point straddling the boundary
        // into U+FFFD on both sides. Rule: a chunk owns the code points
        // whose LEAD byte falls in [start, rawEnd) — skip leading
        // continuation bytes (they belong to the previous chunk's final
        // code point) and extend past trailing continuation bytes (≤3
        // by the UTF-8 spec). Every chunk applies the same rule, so
        // coverage is exact with no overlap.
        val len = (rawEnd - start).toInt
        val want = math.min(len + 3L, size - start).toInt
        val bytes = new Array[Byte](want)
        in.readFully(start, bytes, 0, want) // positioned read: seek + full range
        def isCont(b: Byte): Boolean = (b & 0xC0) == 0x80
        var from = 0
        if (start > 0) while (from < math.min(3, want) && isCont(bytes(from))) from += 1
        if (from >= math.min(len, want)) "" // chunk owns no lead byte (sub-code-point chunk)
        else {
          var to = math.min(len, want)
          while (to < want && isCont(bytes(to))) to += 1
          new String(bytes, from, to - from, java.nio.charset.StandardCharsets.UTF_8)
        }
      } finally in.close()
    }
    split(chunks, sep, keepSeparator)
  }
}
