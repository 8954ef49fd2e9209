package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark: times every declared query at the driver-chosen
  * scale factor and prints one JSON line. A warmup pass first absorbs
  * one-time JVM/codegen/parquet-footer costs so per-query numbers
  * reflect steady-state plan execution. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Sessions.configure(
        SparkSession.builder().master(s"local[$cpus]"), cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Warmup: touch every table (footer/schema caches) and exercise
    // codegen + shuffle machinery once.
    Seq("region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "documents", "embeddings")
      .foreach(t => spark.read.parquet(s"$sfDir/$t.parquet").count())
    Tables.events(spark, sfDir).count()
    spark.range(1000000).selectExpr("sum(id)").collect()
    // one-time Structured Streaming init (state-store provider classes,
    // checkpoint plumbing) so streaming queries measure steady state;
    // runBounded collects its input itself, so the DataFrame goes in as-is
    locally {
      import org.apache.spark.sql.functions.{col, count => cnt, current_timestamp, lit, window}
      stream.StreamOps.runBounded(spark,
        spark.range(8).select(current_timestamp().as("ts"), col("id")),
        df => df.groupBy(window(col("ts"), "5 minutes")).agg(cnt(lit(1))))
    }

    // A failed query must be VISIBLE in the bench line (time -1 + an
    // errors map), never a healthy-looking small wall-time.
    //
    // Median of 3 runs per query: single-iteration wall times on this
    // box are ±25% under contention (SCALE.md), which made per-query
    // regression signals unadjudicable; the median is robust to one
    // contended run and the spread map records the noise band observed.
    val iters = math.max(1, sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "3").toInt)
    // Dev loop: SPARK_GRAFT_BENCH_ONLY=q74,q27 times just those queries.
    // Entries match by NAME PREFIX ("q7" selects q70..q79); an entry
    // matching nothing is a hard error so a typo can't produce an
    // empty-but-healthy-looking benchmark run. The driver never sets
    // it, so per-round numbers stay complete.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .filter(_.nonEmpty) // a blank selector means "no restriction", not "nothing"
    only.foreach { o =>
      val dead = o.filterNot(p => SparkEntry.queries.keys.exists(_.startsWith(p)))
      require(dead.isEmpty, s"SPARK_GRAFT_BENCH_ONLY entries match no query: $dead")
    }
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(o => o.exists(n.startsWith)) }
    // Substrate builds (VERDICT r14 #2): the shared dup-MST and ε-slink
    // substrates are built ONCE per JVM and then read by their gates
    // (q348/q353 and q358/q359) — median-of-3 per-gate timing would
    // drop the one-off build from every committed number, so each build
    // is timed HERE, explicitly, charged exactly once in the total, and
    // reported under "substrates"; the consumer gates' per-query lines
    // are READOUT-ONLY by design. (q356's media parquet is fixture
    // ENCODING — test scaffolding, not the operator under test — and
    // stays uncharged, absorbed by the warmup convention as before.)
    val substrateDefs: Seq[(String, Seq[String], () => Unit)] = Seq(
      // dup_pairs MUST build before dup_mst: the MST election consumes
      // the persisted pair table, so ordering keeps each line charging
      // exactly its own work (r16 — VERDICT r15 #1: one verified-pair
      // build + one LPA run for the whole graph-gate family)
      ("dup_pairs", Seq("q74", "q84", "q85", "q90", "q98", "q111", "q112",
          "q119", "q129", "q130", "q147", "q176", "q209", "q259", "q266",
          "q313", "q348", "q353", "q370", "q371", "q372"),
        () => ops.Components.warmDupPairs(spark, sfDir)),
      ("dup_mst", Seq("q348", "q353"),
        () => ops.Components.warmDupMst(spark, sfDir)),
      // eps_pairs MUST build before the two slink elections: both
      // consume the persisted candidate table (r17 — one grid ε-join
      // for the whole family, the dup_pairs→dup_mst shape)
      ("eps_pairs", Seq("q358", "q359", "q360", "q362", "q363", "q364",
          "q373"),
        () => ops.Components.warmEpsPairs(spark, sfDir)),
      ("eps_slink", Seq("q358", "q359", "q362", "q363"),
        () => ops.Components.warmEpsSlink(spark, sfDir)),
      // the condensed TREE over the eps labels (r18 — VERDICT r17 #1):
      // q358/q359/q362 were each rebuilding it per gate; one build
      // persists cl/sel/att/dm/sela and the three gates are readouts
      ("eps_tree", Seq("q358", "q359", "q362"),
        () => ops.Components.warmCondTree(spark, sfDir, "eps")),
      ("mr_slink", Seq("q360", "q364", "q373"),
        () => ops.Components.warmMrSlink(spark, sfDir)),
      // the mr-metric condensed tree (r18): q360's selection readout
      // plus the published-form GLOSH/soft-membership pair
      ("mr_tree", Seq("q360", "q381", "q382"),
        () => ops.Components.warmCondTree(spark, sfDir, "mr")),
      // the global suffix-order ladder (r16): q374/q375 read one build
      ("global_sa", Seq("q374", "q375", "q377"),
        () => ops.TrainPrep.warmGlobalSa(spark, sfDir)),
      // the per-doc rank ladder (r17): q366/q367 read one build
      ("per_doc_sa", Seq("q366", "q367"),
        () => ops.TrainPrep.warmPerDocSa(spark, sfDir)),
      // the KNN-Shapley valuation (r17): q376 reports it, q379 selects
      // by it — one pair/rank/recursion pass feeds both
      ("shapley", Seq("q376", "q379"),
        () => ops.DataSelect.warmShapley(spark, sfDir)),
      // the span-removal rewrite (r18): q378 reports it, q380 packs it
      ("span_rm", Seq("q378", "q380"),
        () => ops.TrainPrep.warmSpanRemoval(spark, sfDir)))
    val substrates = substrateDefs.flatMap { case (sname, consumers, run) =>
      if (selected.exists { case (n, _) => consumers.exists(n.startsWith) }) {
        // drop the PREVIOUS build's debris before timing this one (r17:
        // the builds run back-to-back and the per-gate cleanup below
        // never runs between them — with seven builds in a row the
        // later lines were paying the earlier builds' pinned blocks as
        // storage eviction, mr_slink reading 2× its quiet-JVM cost).
        // INVARIANT this blanket unpersist relies on (ADVICE r17):
        // every substrate round-trips its artifacts through parquet
        // before returning — no build hands the next one a live
        // localCheckpoint'd frame (whose truncated lineage could not
        // be recomputed after the unpersist). A future substrate that
        // carries a checkpointed DataFrame across builds would fail
        // here with 'checkpoint block not found'; write it to scratch
        // parquet instead (the [[graft.core.Scratch]] contract).
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
        spark.sqlContext.clearCache()
        System.gc()
        val t0 = System.nanoTime()
        run()
        Some(sname -> (System.nanoTime() - t0) / 1e9)
      } else None
    }
    var gateIdx = 0
    val results = selected.map { case (name, fn) =>
      // fail fast: a deterministically-failing query reports after its
      // FIRST failure instead of re-failing iters times, and the spread
      // is computed over successful runs only (mixing fast-fail times
      // into it would make the noise-band signal garbage exactly for
      // the queries being debugged)
      val runs = scala.collection.mutable.ArrayBuffer.empty[(Double, Option[String])]
      var i = 0
      while (i < iters && runs.forall(_._2.isEmpty)) {
        val t0 = System.nanoTime()
        val err = try { fn(spark, sfDir).count(); None }
                  catch { case e: Throwable =>
                    Some(s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(120)}") }
        runs += (((System.nanoTime() - t0) / 1e9, err))
        i += 1
      }
      val err = runs.collectFirst { case (_, Some(e)) => e }
      // Drop THIS gate's debris before the next one runs: gates pin
      // intermediates via localCheckpoint (RDD blocks in the block
      // manager) and some register temp views/cached relations — across
      // 350+ gates in one JVM the accumulation turns the late
      // alphabetical tail into a storage-eviction storm (measured r13:
      // q312 at 60 s inside the full run vs 3-5 s solo, ALL iterations
      // slow — session debris, not scheduler noise). Cleanup is outside
      // the timed window and makes per-gate numbers mean what they say.
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      spark.sqlContext.clearCache()
      // ContextCleaner reclaims shuffle files and broadcasts via WEAK
      // REFERENCES — with a large heap the JVM may never GC across the
      // whole suite, so nothing is ever reclaimed and the debris of
      // 350 gates lands on the late alphabetical tail (measured r13:
      // q322 at 8-11 s inside the full run vs 0.3 s solo, even after
      // the unpersist above). An explicit GC keeps the cleaner live —
      // but a full-heap STW pause per gate measurably jitters the
      // iterative gates (also measured), so it runs every 25th gate:
      // debris stays bounded at a 25-gate window, pauses drop 25×.
      gateIdx += 1
      if (gateIdx % 25 == 0) System.gc()
      val raw = runs.collect { case (t, None) => t }.toSeq // run order
      val times = raw.sorted
      if (times.isEmpty) (name, -1.0, 0.0, err, raw)
      else (name, times(times.size / 2), times.last - times.head, err, raw)
    }
    val qs = results.map { case (k, v, _, err, _) =>
      "\"" + k + "\":" + (if (err.isDefined) "-1" else v.toString)
    }.mkString("{", ",", "}")
    val spreads = results.map { case (k, _, sp, _, _) =>
      "\"" + k + "\":" + sp.toString
    }.mkString("{", ",", "}")
    // Raw per-iteration times in RUN ORDER: medians hide storm windows
    // (a 9.95 s median with a 14.2 s spread is unadjudicable from the
    // record alone — VERDICT r9 "what's wrong" #3). With the raw array
    // a one-off contended iteration is visible mechanically.
    val itersRaw = results.map { case (k, _, _, _, raw) =>
      "\"" + k + "\":" + raw.map(t => f"$t%.3f").mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    // full JSON string escaping: Spark analysis errors routinely embed
    // newlines/plans in the first line of the message
    def jsonEscape(s: String): String = s.flatMap {
      case '\\' => "\\\\"
      case '"' => "\\\""
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
    val errs = results.collect { case (k, _, _, Some(e), _) =>
      "\"" + k + "\":\"" + jsonEscape(e) + "\""
    }.mkString("{", ",", "}")
    val subsJson = substrates.map { case (k, v) =>
      "\"" + k + "\":" + f"$v%.3f"
    }.mkString("{", ",", "}")
    // total = per-gate medians + each substrate build charged ONCE —
    // the builds are real work the per-gate numbers no longer contain
    val total = results.collect { case (_, v, _, None, _) => v }.sum +
      substrates.map(_._2).sum
    val nErr = results.count(_._4.isDefined)
    // The FULL record (spreads, raw iteration times, error detail) —
    // printed as a PRECEDING line and persisted to bench_full.json.
    val line = s"""{"metric":"total","queries":$qs,"iters":$iters,"spread":$spreads,"iters_raw":$itersRaw,"errors":$errs,"substrates":$subsJson,"unit":"sec","sf":"$sfDir","n_errors":$nErr,"value":$total}"""
    println(line)
    // VERDICT r18 #1: the full line above is ~40 KB and has exceeded
    // the driver's stdout-tail window since r15 (`BENCH_r15..r18.json`
    // all carry `parsed: null` — every per-query perf comparison has
    // been flying blind for four rounds). The FINAL stdout line is now
    // a COMPACT summary — same schema the driver contract names
    // (metric/queries/substrates/unit/sf/n_errors/value), medians at
    // millisecond precision, no spreads/iters_raw/errors maps — ~10 KB
    // for 381 gates (the query names themselves are the floor; the
    // contract forbids renaming). Queries stay FIRST so the summary
    // scalars at the END survive any tail truncation.
    def f3(v: Double): String = f"$v%.3f"
    val qsCompact = results.map { case (k, v, _, err, _) =>
      "\"" + k + "\":" + (if (err.isDefined) "-1" else f3(v))
    }.mkString("{", ",", "}")
    val compact = s"""{"metric":"total","queries":$qsCompact,"substrates":$subsJson,"unit":"sec","sf":"$sfDir","n_errors":$nErr,"value":${f3(total)}}"""
    // The driver's BENCH_rN.json keeps only a log tail (r7/r8 records
    // retained 51 of 134 per-query entries and no spreads — VERDICT r8
    // "what's wrong" #2, which forced solo re-benching to adjudicate
    // regressions). Persist the FULL line to a file so the record
    // survives intact; path overridable for dev runs.
    // A SUBSET run (dev loop) must never clobber the committed full
    // record — divert it to scratch unless an output was named.
    val out = args.headOption
      .orElse(sys.env.get("SPARK_GRAFT_BENCH_OUT"))
      .getOrElse(if (only.isDefined) "/tmp/bench_subset.json"
                 else "/root/repo/bench_full.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(out),
      (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case e: Exception =>
      System.err.println(s"bench: could not write $out: $e") }
    spark.stop()
    // after spark.stop() so no executor/cleaner WARN line can land
    // between the compact record and the end of stdout
    println(compact)
    if (nErr > 0) sys.exit(1)
  }
}
