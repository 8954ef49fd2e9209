package graft.ops

import graft.{Materialize, QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Vectors

/** Data-selection operators for training-corpus curation — the three
  * selection families a 100 TB pretraining pipeline runs between "raw
  * crawl" and "tokenized shards", each re-expressed as a declarative
  * Spark plan:
  *
  *  - '''SemDeDup''' (semantic dedup): k-means-cluster the embedding
  *    space with a sample-fitted coarse quantizer, then prune
  *    near-identical vectors WITHIN each cluster only — the cluster
  *    assignment bounds the pair join (Σ|cell|² ≪ n²), which is the
  *    whole trick that makes embedding dedup feasible at corpus scale.
  *  - '''DSIR''' (data selection via importance resampling): score
  *    every document by the log-likelihood ratio of a hashed-n-gram
  *    bag model of a target distribution vs the raw corpus, then keep
  *    the top-weighted slice. The feature space is a FIXED number of
  *    hash buckets, so the model is two bounded count vectors — a
  *    broadcast join, never a vocabulary-sized shuffle.
  *  - '''BPE merge training''': learn merge rules from corpus pair
  *    statistics — each round is one distributed pair-count aggregation
  *    plus a 1-row driver argmax (the merge table lives on the driver
  *    in every BPE trainer), and the merge application is a run-parity
  *    window pass, never a per-document loop.
  *
  * Reference scope note: flod's checked surface has no selection
  * operators (its `README.md:34-42` stops at byte/stream transforms);
  * these extend the engine along SURVEY §2's "training-data pipeline"
  * axis with literature semantics (SemDeDup, DSIR, BPE as published —
  * arXiv:2303.09540, arXiv:2302.03169, ACL 2016 subword units).
  */
object DataSelect {

  // ---------------------------------------------------------------- SemDeDup

  /** Within-cluster near-duplicate prune over an embedding table.
    *
    * Drop rule (deterministic): vector `v` is dropped iff some
    * lower-id vector in the SAME cell has cosine ≥ `tau` to it; the
    * surviving lowest id is the group representative. Cosine is
    * rounded to `roundDp` BEFORE thresholding so both engines compare
    * identical values (the q63 oracle-parity rule).
    *
    * Scale: the pair join keys on the cell id — cost Σ|cell|², bounded
    * by choosing k ∝ corpus size exactly as the SemDeDup paper does
    * (k≈100k at web scale); a hot cell is a hot JOIN partition, which
    * AQE's skew-join splits. The assignment pass is the same narrow
    * codegen'd argmin as IVF ([[Ann.cellCol]]); one materialization
    * pins it so the self-join's two sides share one computation. */
  def semDedup(emb: DataFrame, cents: Array[Array[Double]], tau: Double,
               roundDp: Int = 6,
               materialize: Materialize.Strategy = Materialize.local): DataFrame = {
    // Phase 0 — exact-duplicate collapse (always on, value-identical):
    // byte-identical vectors land in the same cell by construction, so
    // each exact-dup group enters the pair join as its lowest-id
    // representative ONLY. A vector mass-duplicated m times costs
    // O(m) here instead of O(m²) in the join — the same hot-key
    // discipline as Dedup's dfCap/star clustering. The residual pair
    // cost is Σ|distinct vectors per cell|², bounded by sizing k to
    // the corpus (SemDeDup's own k≈100k-at-web-scale rule) with AQE
    // skew-join splitting hot cells.
    val evg = materialize(
      emb.withColumn("cell", Ann.cellCol(col("v"), cents))
        .withColumn("nrm", Vectors.norm2(col("v")))
        .withColumn("rep",
          min(col("vec_id")).over(Window.partitionBy("cell", "v"))))
    val reps = evg.where(col("vec_id") === col("rep"))
    val a = reps.select(col("cell"), col("vec_id").as("id_a"),
      col("v").as("va"), col("nrm").as("na"))
    val b = reps.select(col("cell"), col("vec_id").as("id_b"),
      col("v").as("vb"), col("nrm").as("nb"))
    val cos = round(Vectors.dot(col("va"), col("vb")) / (col("na") * col("nb")), roundDp)
    val repPairs = a.join(b, "cell").where(col("id_a") < col("id_b"))
      .select(col("cell"), col("id_a"), col("id_b"), cos.as("cos"))
      .where(col("cos") >= tau)
      .groupBy("id_b")
      .agg(min(col("id_a")).as("min_rep"),
        min(col("cell")).cast("long").as("cellL"),
        max(col("cos")).as("rep_cos"))
    // Expansion reproduces the per-vector rule exactly: a non-rep
    // member's qualifying partners are its group-mates (cos = 1.0
    // after rounding — max possible) plus every member of any
    // qualifying lower-rep group, whose minimum id IS that group's
    // rep; a rep's qualifying partners are exactly the members of
    // lower-rep qualifying groups.
    val droppedReps = repPairs.select(col("id_b").as("vec_id"),
      col("min_rep").as("keeper_id"), col("cellL").as("cell"),
      col("rep_cos").as("best_cos"))
    val members = evg.where(col("vec_id") =!= col("rep"))
      .join(repPairs.select(col("id_b").as("rep"), col("min_rep")), Seq("rep"), "left")
      .select(col("vec_id"),
        coalesce(col("min_rep"), col("rep")).as("keeper_id"),
        col("cell").cast("long").as("cell"),
        lit(1.0).as("best_cos"))
    droppedReps.unionByName(members).orderBy("vec_id")
  }

  // ---------------------------------------------------------------- DSIR

  /** Hashed-n-gram importance weights: for every document, the summed
    * log-ratio of target vs raw bucket probabilities (+1 smoothing)
    * over its unigram+bigram features, each feature hashed to one of
    * `buckets` buckets via the md5-prefix hash both engines share.
    *
    * Scale: the "model" is one `buckets`-row table built in a single
    * conditional-aggregate pass over the exploded grams (target and
    * raw counts together — adding the target never adds a scan, the
    * q148 discipline); scoring joins that table back broadcast. No
    * vocabulary-sized state anywhere — that is DSIR's own point. */
  def dsirWeights(docs: DataFrame, isTarget: Column, buckets: Int,
                  roundDp: Int = 6): DataFrame = {
    val b = bucketsOf(docs, buckets)
    b.join(broadcast(dsirModel(docs, isTarget, buckets)), "bkt")
      .groupBy("doc_id")
      // per-bucket log-ratios rounded to 9 dp and summed in DECIMAL —
      // exact, order-independent (the q257 summation discipline), so
      // the batch shuffle sum and q331's streamed per-document fold
      // produce bit-identical weights
      .agg(round(sum(col("lr9")), roundDp).cast("double").as("w"))
  }

  /** The frozen bucket model: per hash bucket, the smoothed target-vs-
    * raw log-likelihood ratio as an exact DECIMAL(28,9). Both counts
    * come from ONE conditional-aggregate pass (adding the target never
    * adds a scan); the result is `buckets` rows — broadcastable, and
    * small enough to bake into a streaming projection ([[defs]] q331). */
  def dsirModel(docs: DataFrame, isTarget: Column, buckets: Int): DataFrame = {
    val cnts = bucketsOf(docs, buckets).groupBy("bkt").agg(
      sum(when(isTarget, 1L).otherwise(0L)).as("ct"),
      count(lit(1)).as("cr"))
    val tot = cnts.agg(sum(col("ct")).as("t"), sum(col("cr")).as("r"))
    cnts.crossJoin(broadcast(tot)).select(col("bkt"),
      round(log((col("ct") + 1.0) / (col("t") + buckets.toDouble)) -
        log((col("cr") + 1.0) / (col("r") + buckets.toDouble)), 9)
        .cast("decimal(28,9)").as("lr9"))
  }

  private def bucketsOf(docs: DataFrame, buckets: Int): DataFrame =
    gramsOf(docs, 1).unionByName(gramsOf(docs, 2)).withColumn("bkt",
      conv(substring(md5(col("g")), 1, 8), 16, 10).cast("long") % buckets)

  /** One definition of the (doc_id, lang, g) gram stream — the same
    * native `graft_ngrams` tokenization TrainPrep's decontamination
    * uses (short docs fall back to their whole text as one gram). */
  private def gramsOf(docs: DataFrame, n: Int): DataFrame =
    docs.select(col("doc_id"), col("lang"),
      explode(call_function("graft_ngrams", col("text"), lit(n), lit(false))).as("g"))

  private def gramsSql(n: Int): String =
    if (n == 1)
      """SELECT doc_id, lang, unnest(w) AS g
        |  FROM (SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents)""".stripMargin
    else {
      val terms = (1 to n).map(k => s"w[i+$k]").mkString(" || ' ' || ")
      s"""SELECT doc_id, lang, unnest(
         |    CASE WHEN len(w) >= $n
         |         THEN list_transform(range(len(w) - ${n - 1}), i -> $terms)
         |         ELSE [text] END) AS g
         |  FROM (SELECT doc_id, lang, text, string_split(text, ' ') AS w FROM documents)""".stripMargin
    }

  // ---------------------------------------------------------------- BPE

  /** Learn `rounds` BPE merges from corpus pair statistics and report,
    * per round, the merged pair, its count at merge time, and the
    * corpus token count after applying it.
    *
    * Each round: (1) pair counts via `lead` over (doc, pos) — one
    * shuffle keyed by doc; (2) argmax pair — a deterministic 1-row
    * collect (count desc, pair asc), the driver-resident merge table
    * every BPE trainer keeps; (3) merge application — greedy leftmost
    * non-overlapping, computed with run-parity window arithmetic
    * (position within a run of consecutive matches, merge at even
    * offsets) in the SAME window partition pass, then a renumber.
    * State is materialized per round (iterate-materialize, the
    * Components discipline).
    *
    * Scale: per round, two doc-partitioned window passes and one
    * pair-count aggregation — no driver data beyond the 1-row argmax.
    * A production trainer amortizes rounds by batching non-conflicting
    * merges per pass; the per-round plan here is that batch's unit. */
  def bpeTrain(docs: DataFrame, rounds: Int,
               materialize: Materialize.Strategy = Materialize.local): DataFrame =
    bpeLoop(docs, rounds, materialize)._1.reduce(_.unionByName(_)).orderBy("rnd")

  /** The corpus token stream AFTER applying the `rounds` learned
    * merges — (doc_id, pos, tok), the input a tokenizer-aware
    * downstream (compression audits, packing) consumes. */
  def bpeFinalState(docs: DataFrame, rounds: Int,
                    materialize: Materialize.Strategy = Materialize.local): DataFrame =
    bpeLoop(docs, rounds, materialize)._2

  private def bpeLoop(docs: DataFrame, rounds: Int,
                      materialize: Materialize.Strategy): (Seq[DataFrame], DataFrame) = {
    val wDoc = Window.partitionBy("doc_id").orderBy("pos")
    val wCum = wDoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    var state = materialize(
      docs.select(col("doc_id"), posexplode(split(col("text"), " ")))
        .select(col("doc_id"), (col("pos") + 1).cast("long").as("pos"),
          col("col").as("tok")))
    val rows = Seq.newBuilder[DataFrame]
    for (r <- 1 to rounds) {
      val pr = state.withColumn("nxt", lead(col("tok"), 1).over(wDoc))
      val best = pr.where(col("nxt").isNotNull)
        .groupBy("tok", "nxt").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("tok").asc, col("nxt").asc)
        .limit(1).collect()(0)
      val (t1, t2, cnt) = (best.getString(0), best.getString(1), best.getLong(2))
      val merged = pr
        .withColumn("m", coalesce(col("tok") === t1 && col("nxt") === t2, lit(false)))
        // run-parity: offset of a match within its run of consecutive
        // match positions; merge at even offsets (leftmost-first)
        .withColumn("rs", col("m") && !coalesce(lag(col("m"), 1).over(wDoc), lit(false)))
        .withColumn("rstart", max(when(col("rs"), col("pos"))).over(wCum))
        .withColumn("mg", col("m") && (col("pos") - col("rstart")) % 2 === 0)
        .withColumn("consumed", coalesce(lag(col("mg"), 1).over(wDoc), lit(false)))
        .where(!col("consumed"))
        .select(col("doc_id"), col("pos"),
          when(col("mg"), concat(col("tok"), col("nxt"))).otherwise(col("tok")).as("tok"))
        .withColumn("pos", row_number().over(wDoc).cast("long"))
      state = materialize(merged)
      rows += state.agg(count(lit(1)).as("tokens_after"))
        .select(lit(r).as("rnd"), lit(t1).as("t1"), lit(t2).as("t2"),
          lit(cnt).as("cnt"), col("tokens_after"))
    }
    (rows.result(), state)
  }

  /** Oracle twin of one [[bpeTrain]] round: state CTE `s{r}` →
    * `s{r+1}` plus the learned merge `bm{r}`, with the SAME
    * deterministic argmax and run-parity merge semantics. */
  private def bpeRoundSql(r: Int): String =
    s"""pr$r AS (
       |  SELECT doc_id, pos, tok,
       |    lead(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt
       |  FROM s$r),
       |bm$r AS (
       |  SELECT tok AS t1, nxt AS t2, COUNT(*) AS cnt FROM pr$r
       |  WHERE nxt IS NOT NULL GROUP BY 1, 2
       |  ORDER BY cnt DESC, t1 ASC, t2 ASC LIMIT 1),
       |mk$r AS (
       |  SELECT doc_id, pos, tok, nxt,
       |    COALESCE(tok = (SELECT t1 FROM bm$r)
       |         AND nxt = (SELECT t2 FROM bm$r), FALSE) AS m
       |  FROM pr$r),
       |mg$r AS (
       |  SELECT doc_id, pos FROM (
       |    SELECT doc_id, pos,
       |      ROW_NUMBER() OVER (PARTITION BY doc_id, grp ORDER BY pos) AS k
       |    FROM (SELECT doc_id, pos,
       |            pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
       |          FROM mk$r WHERE m) t) u
       |  WHERE k % 2 = 1),
       |s${r + 1} AS (
       |  SELECT doc_id, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS pos,
       |         CASE WHEN g.pos IS NOT NULL THEN mk$r.tok || mk$r.nxt
       |              ELSE mk$r.tok END AS tok
       |  FROM mk$r LEFT JOIN mg$r g USING (doc_id, pos)
       |  WHERE NOT EXISTS (SELECT 1 FROM mg$r g2
       |                    WHERE g2.doc_id = mk$r.doc_id AND g2.pos = mk$r.pos - 1))""".stripMargin

  /** The shared WITH body: tokenization CTE `s1` plus `rounds` merge
    * rounds, leaving `s{rounds+1}` as the final token stream. */
  private def bpeCtes(rounds: Int): String = {
    val body = (1 to rounds).map(bpeRoundSql).mkString(",\n")
    s"""s1 AS (
       |  SELECT doc_id, CAST(unnest(range(len(w))) + 1 AS BIGINT) AS pos,
       |         w[unnest(range(len(w))) + 1] AS tok
       |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)),
       |$body""".stripMargin
  }

  private def bpeSql(rounds: Int): String = {
    val out = (1 to rounds).map { r =>
      s"""SELECT $r AS rnd, t1, t2, CAST(cnt AS BIGINT) AS cnt,
         |  (SELECT CAST(COUNT(*) AS BIGINT) FROM s${r + 1}) AS tokens_after FROM bm$r""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH ${bpeCtes(rounds)}
       |SELECT rnd, t1, t2, cnt, tokens_after FROM ($out) z
       |ORDER BY rnd""".stripMargin
  }

  // ------------------------------------------------- hashed classifier

  /** Per-document scores of the q334 hashed-linear quality classifier:
    * tokens hash into D=1024 buckets, a broadcast 1024-row weight
    * table scores the bag via one map-side join, and the mean weight
    * rounds @6 into an exact DECIMAL. Weights are multiples of 2^-10
    * in [-1, 1) derived Knuth-multiplicatively from the bucket id, so
    * the per-doc sum is exact in double regardless of partitioning.
    * Shared by q334 (inference stats) and q339 (filter agreement). */
  private def classifierScores(s: SparkSession, d: String): DataFrame = {
    val D = 1024
    // w(b) = ((b * 2654435761) mod 2048 - 1024) / 1024  ∈ [-1, 1)
    val weights = broadcast(s.range(D.toLong).toDF("bucket")
      .select(col("bucket"),
        ((col("bucket") * 2654435761L) % 2048 - 1024)
          .cast("double").divide(1024.0).as("w")))
    val toks = Tables.documents(s, d)
      .select(col("doc_id"), col("source"),
        explode(split(col("text"), " ")).as("token"))
      .select(col("doc_id"), col("source"),
        (conv(substring(md5(concat(lit("q334|"), col("token"))), 1, 8), 16, 10)
          .cast("long") % D).as("bucket"))
    toks.join(weights, "bucket")
      .groupBy("doc_id", "source")
      .agg(count(lit(1)).as("n_tok"), sum(col("w")).as("raw"))
      .select(col("doc_id"), col("source"),
        round(col("raw") / col("n_tok"), 6).cast("decimal(12,6)").as("score"))
  }

  /** The q334 per-doc score pipeline as a DuckDB CTE (`sc`: doc_id,
    * source, score) — the SQL twin of [[classifierScores]]. */
  private val classifierSqlCte =
    """t AS (
      |  SELECT doc_id, source,
      |    ('0x' || substr(md5('q334|' || token), 1, 8))::BIGINT % 1024 AS bucket
      |  FROM (SELECT doc_id, source, unnest(string_split(text, ' ')) AS token
      |        FROM documents) u),
      |sc AS (
      |  SELECT doc_id, source,
      |    CAST(round(SUM(((bucket * 2654435761) % 2048 - 1024) / 1024.0)
      |               / COUNT(*), 6) AS DECIMAL(12,6)) AS score
      |  FROM t GROUP BY doc_id, source)""".stripMargin

  // ---------------------------------------------------------------- gates

  /** SemDeDup threshold: catches the injected exact re-crawl slice
    * (cos 1.0) and the perturbed slice (cos ≈ 0.98) while every
    * natural pair in the corpus stays far below (max ≈ 0.51). */
  private val semTau = 0.95
  private val dsirBuckets = 128

  val defs: Seq[QueryDef] = Seq(

    // SemDeDup over a deterministic re-crawl corpus: the %7 slice
    // re-lands byte-identical under new ids, the %11 slice re-lands
    // perturbed (+0.2 on dim 1 — cos ≈ 0.98 against its original).
    // Output: every dropped vector with its surviving representative.
    QueryDef("q328_semdedup",
      (s, d) => {
        val dim = AnnCentroids.fitted.head.length
        val e0 = Tables.embeddings(s, d)
          .select(col("vec_id"), Vectors.asDouble(col("embedding")).as("v"))
        val dupA = e0.where(col("vec_id") % 7 === 0)
          .withColumn("vec_id", col("vec_id") + 200000L)
        val dupB = e0.where(col("vec_id") % 11 === 0)
          .withColumn("vec_id", col("vec_id") + 300000L)
          .withColumn("v", transform(sequence(lit(1), lit(dim)),
            j => when(j === 1, element_at(col("v"), 1) + 0.2)
              .otherwise(element_at(col("v"), j))))
        semDedup(e0.unionByName(dupA).unionByName(dupB),
          AnnCentroids.fitted, semTau)
      },
      Some(s"""WITH cents AS (
              |${Ann.centroidsSqlCte(AnnCentroids.fitted)}),
              |e0 AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
              |e AS (
              |  SELECT vec_id, v FROM e0
              |  UNION ALL
              |  SELECT vec_id + 200000, v FROM e0 WHERE vec_id % 7 = 0
              |  UNION ALL
              |  SELECT vec_id + 300000,
              |    list_transform(range(1, ${AnnCentroids.fitted.head.length + 1}),
              |      j -> CASE WHEN j = 1 THEN v[1] + 0.2 ELSE v[j] END)
              |  FROM e0 WHERE vec_id % 11 = 0),
              |d AS (
              |  SELECT e.vec_id, cents.i,
              |    list_sum(list_transform(range(1, ${AnnCentroids.fitted.head.length + 1}),
              |      j -> (e.v[j] - cents.c[j]) * (e.v[j] - cents.c[j]))) AS d2
              |  FROM e CROSS JOIN cents),
              |asg AS (
              |  SELECT vec_id, i AS cell FROM (
              |    SELECT vec_id, i,
              |      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2 ASC, i ASC) AS rn
              |    FROM d) t WHERE rn = 1),
              |ev AS (SELECT e.vec_id, e.v, asg.cell FROM e JOIN asg USING (vec_id)),
              |pairs AS (
              |  SELECT a.vec_id AS id_a, b.vec_id AS id_b, b.cell,
              |    round(list_dot_product(a.v, b.v) /
              |      (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6) AS cos
              |  FROM ev a JOIN ev b ON a.cell = b.cell AND a.vec_id < b.vec_id)
              |SELECT id_b AS vec_id, CAST(MIN(id_a) AS BIGINT) AS keeper_id,
              |  CAST(MIN(cell) AS BIGINT) AS cell, MAX(cos) AS best_cos
              |FROM pairs WHERE cos >= $semTau
              |GROUP BY id_b ORDER BY vec_id""".stripMargin)),

    // DSIR toward an English-target distribution: the top-25 documents
    // by hashed-bigram-model importance weight. The rank window runs
    // over the 25 surviving rows only (k cut first — the q54 rule).
    QueryDef("q329_dsir_select",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val top = dsirWeights(docs, col("lang") === "en", dsirBuckets)
          .orderBy(col("w").desc, col("doc_id").asc).limit(25)
          // rank over the 25 surviving rows only (limit directly below
          // the window — the q54 shape the plan walker certifies)
          .withColumn("rank",
            row_number().over(Window.orderBy(col("w").desc, col("doc_id").asc))
              .cast("long"))
        broadcast(top).join(docs.select("doc_id", "lang"), "doc_id")
          .select("rank", "doc_id", "lang", "w")
          .orderBy("rank")
      },
      Some(s"""WITH gr AS (
              |${gramsSql(1)}
              |UNION ALL
              |${gramsSql(2)}),
              |b AS (SELECT doc_id, lang,
              |        ('0x' || substr(md5(g), 1, 8))::BIGINT % $dsirBuckets AS bkt
              |      FROM gr),
              |cnts AS (
              |  SELECT bkt,
              |    SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS ct,
              |    COUNT(*) AS cr
              |  FROM b GROUP BY bkt),
              |tot AS (SELECT SUM(ct) AS t, SUM(cr) AS r FROM cnts),
              |lw AS (
              |  SELECT bkt, ROUND(ln((ct + 1.0) / (t + $dsirBuckets.0)) -
              |              ln((cr + 1.0) / (r + $dsirBuckets.0)), 9)::DECIMAL(28,9) AS lr9
              |  FROM cnts CROSS JOIN tot),
              |dw AS (
              |  SELECT doc_id, CAST(ROUND(SUM(lr9), 6) AS DOUBLE) AS w
              |  FROM b JOIN lw USING (bkt) GROUP BY doc_id),
              |top AS (SELECT doc_id, w FROM dw
              |        ORDER BY w DESC, doc_id ASC LIMIT 25)
              |SELECT CAST(ROW_NUMBER() OVER (ORDER BY w DESC, doc_id ASC) AS BIGINT) AS rank,
              |       doc_id, d.lang, w
              |FROM top JOIN documents d USING (doc_id)
              |ORDER BY rank""".stripMargin)),

    // Three learned BPE merges over the word stream: pair, count at
    // merge time, and corpus tokens after each application.
    QueryDef("q330_bpe_train",
      (s, d) => bpeTrain(Tables.documents(s, d), rounds = 3),
      Some(bpeSql(3))),

    // Streamed DSIR scoring (✚): documents arrive as file-source
    // micro-batches and are scored against the FROZEN bucket model as
    // a pure projection — the model's 128 log-ratio rows are baked
    // into the plan as a map literal (the AnnCentroids shape, built
    // here by a k-bounded 128-row collect), so the streaming query is
    // STATELESS: append mode, no aggregation state, nothing to grow
    // with the corpus. The per-document weight is a DECIMAL fold over
    // the document's grams — exact and order-independent, so it
    // hash-matches q329's batch shuffle-sum oracle arithmetic.
    QueryDef("q331_stream_dsir",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val model = dsirModel(docs, col("lang") === "en", dsirBuckets).collect()
        val mm = map(model.toSeq.flatMap(r =>
          Seq(lit(r.getLong(0)), lit(r.getDecimal(1)).cast("decimal(28,9)"))): _*)
        val zero = lit(0).cast("decimal(28,9)")
        val score = (df: DataFrame) => {
          val toks = split(col("text"), " ")
          val bis = when(size(toks) >= 2,
            transform(sequence(lit(1), size(toks) - 1),
              i => concat(element_at(toks, i), lit(" "), element_at(toks, i + 1))))
            .otherwise(array(col("text")))
          val bkt = (g: Column) =>
            conv(substring(md5(g), 1, 8), 16, 10).cast("long") % dsirBuckets
          // a model miss cannot happen while the scored stream draws
          // from the model corpus; coalesce keeps a genuinely novel
          // bucket at weight 0 instead of nulling the document
          val w = aggregate(concat(toks, bis), zero,
            (acc, g) => (acc + coalesce(element_at(mm, bkt(g)), zero))
              .cast("decimal(28,9)"),
            acc => round(acc, 6).cast("double"))
          df.select(col("doc_id"), w.as("w"))
        }
        val input = docs.select("doc_id", "text")
        val rows = graft.stream.StreamOps.runBoundedFromPath(
          s, input, score, chunks = 3, outputMode = "append")
        s.createDataFrame(new java.util.ArrayList(java.util.Arrays.asList(rows: _*)),
            score(input).schema)
          .orderBy("doc_id")
      },
      Some(s"""WITH gr AS (
              |${gramsSql(1)}
              |UNION ALL
              |${gramsSql(2)}),
              |b AS (SELECT doc_id, lang,
              |        ('0x' || substr(md5(g), 1, 8))::BIGINT % $dsirBuckets AS bkt
              |      FROM gr),
              |cnts AS (
              |  SELECT bkt,
              |    SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS ct,
              |    COUNT(*) AS cr
              |  FROM b GROUP BY bkt),
              |tot AS (SELECT SUM(ct) AS t, SUM(cr) AS r FROM cnts),
              |lw AS (
              |  SELECT bkt, ROUND(ln((ct + 1.0) / (t + $dsirBuckets.0)) -
              |              ln((cr + 1.0) / (r + $dsirBuckets.0)), 9)::DECIMAL(28,9) AS lr9
              |  FROM cnts CROSS JOIN tot),
              |dw AS (
              |  SELECT doc_id, CAST(ROUND(SUM(lr9), 6) AS DOUBLE) AS w
              |  FROM b JOIN lw USING (bkt) GROUP BY doc_id)
              |SELECT doc_id, w FROM dw ORDER BY doc_id""".stripMargin)),

    // Seeded deterministic global shuffle → fixed-size training shards:
    // every document gets a pseudo-random position (md5 of seed+id — a
    // reproducible permutation, no RNG state), shards are contiguous
    // 100-document slices of the shuffled order. The rank is
    // Scale.globalRowNumber's two-phase machinery — range partitions +
    // driver prefix offsets, NEVER a single-task global window — so
    // the export scales with the cluster. Per-shard stats plus the
    // hash span witness the permutation is the one the seed implies.
    QueryDef("q332_shuffle_shards",
      (s, d) => {
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("n_chars"))
          .withColumn("h", md5(concat(lit("s7:"), col("doc_id").cast("string"))))
        Scale.globalRowNumber(docs, Seq(col("h"), col("doc_id")))
          .withColumn("shard", floor((col("rn") - 1) / 100).cast("long"))
          .groupBy("shard")
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_chars")).as("sum_chars"),
            min(col("h")).as("h_min"), max(col("h")).as("h_max"))
          .orderBy("shard")
      },
      Some("""WITH r AS (
             |  SELECT doc_id, n_chars, md5('s7:' || doc_id) AS h FROM documents),
             |rk AS (
             |  SELECT doc_id, n_chars, h,
             |    ROW_NUMBER() OVER (ORDER BY h, doc_id) AS rn
             |  FROM r)
             |SELECT CAST((rn - 1) // 100 AS BIGINT) AS shard,
             |  CAST(COUNT(*) AS BIGINT) AS n_docs,
             |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
             |  MIN(h) AS h_min, MAX(h) AS h_max
             |FROM rk GROUP BY 1 ORDER BY shard""".stripMargin)),

    // Tokenizer compression audit: apply the three corpus-learned BPE
    // merges, then per-language tokens-before vs tokens-after and the
    // compression in integer basis points (exact integer division —
    // small-integer ratios land on .5 rounding boundaries where
    // engines may disagree, the q136 rule).
    QueryDef("q333_bpe_compression",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val before = docs
          .select(col("lang"), size(split(col("text"), " ")).cast("long").as("n"))
          .groupBy("lang").agg(sum(col("n")).as("tokens_before"))
        val after = bpeFinalState(docs, rounds = 3)
          .join(docs.select("doc_id", "lang"), "doc_id")
          .groupBy("lang").agg(count(lit(1)).as("tokens_after"))
        before.join(after, "lang")
          .withColumn("bp", expr("tokens_after * 10000L div tokens_before"))
          .select("lang", "tokens_before", "tokens_after", "bp")
          .orderBy("lang")
      },
      Some(s"""WITH ${bpeCtes(3)},
              |bt AS (
              |  SELECT lang, SUM(len(string_split(text, ' '))) AS tokens_before
              |  FROM documents GROUP BY lang),
              |at AS (
              |  SELECT d.lang, COUNT(*) AS tokens_after
              |  FROM s4 JOIN documents d USING (doc_id) GROUP BY d.lang)
              |SELECT lang, CAST(tokens_before AS BIGINT) AS tokens_before,
              |  CAST(tokens_after AS BIGINT) AS tokens_after,
              |  CAST(tokens_after * 10000 // tokens_before AS BIGINT) AS bp
              |FROM bt JOIN at USING (lang) ORDER BY lang""".stripMargin)),

    // Hashed-linear quality-classifier INFERENCE (✚, the fastText/
    // DCLM-style model-based filter — the selection step modern
    // pipelines run after the heuristic filters q21/q22 cover): each
    // document's tokens hash into D=1024 feature buckets, a dense
    // D-vector of per-bucket weights scores the bag, and score > 0
    // keeps the doc. The Spark-first shape is classifier inference as
    // a BROADCAST HASH JOIN: explode tokens → map-side join against
    // the 1024-row weight table (never a shuffle of the corpus; the
    // only shuffle is the per-doc re-aggregation) → per-source keep
    // stats. At 100 TB the weight table is still 1024 rows — the
    // broadcast is free, and the scan prunes to (doc_id, source,
    // text). Weights here derive arithmetically from the bucket id (a
    // fixed Knuth-multiplicative table both engines rebuild exactly —
    // the gate pins the INFERENCE plumbing; a trained model would
    // arrive as just another 1024-row table). Determinism: every
    // weight is a multiple of 2^-10 in [-1, 1), so the per-doc sum is
    // EXACT in double (order-independent — integer multiples of 2^-10
    // far below the 2^53 mantissa); the one inexact op, raw/n_tok,
    // rounds @6 into DECIMAL(12,6) before the per-source DECIMAL sum,
    // which is again exact (the q118 discipline).
    QueryDef("q334_quality_classifier",
      (s, d) => {
        classifierScores(s, d).groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum(when(col("score") > 0, 1L).otherwise(0L)).as("n_keep"),
            round(sum(col("score")).cast("double") / count(lit(1)), 6).as("avg_score"))
          .orderBy("source")
      },
      Some(s"""WITH $classifierSqlCte
             |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
             |  CAST(SUM(CASE WHEN score > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
             |  round(CAST(SUM(score) AS DOUBLE) / COUNT(*), 6) AS avg_score
             |FROM sc GROUP BY source ORDER BY source""".stripMargin)),

    // Filter AGREEMENT audit (✚, the calibration question a pipeline
    // with several quality filters must answer before chaining them:
    // do the heuristic filter and the learned classifier agree beyond
    // chance?): Cohen's kappa per source between (A) the q21-family
    // length heuristic (300 ≤ n_chars ≤ 5000) and (B) the q334
    // classifier sign. kappa = (n·n_agree − Σ marginal products) /
    // (n² − Σ marginal products) — ALL-INTEGER numerator and
    // denominator from one conditional-aggregation pass over the
    // per-doc labels (the q148 discipline: adding an agreement cell
    // never adds a scan), one double division rounded @6 at the end.
    // Low kappa on a source = the filters disagree systematically
    // there — the audit that catches a classifier drifting from the
    // heuristic it was meant to replace.
    QueryDef("q339_filter_agreement",
      (s, d) => {
        val labeled = classifierScores(s, d)
          .join(Tables.documents(s, d).select("doc_id", "n_chars"), "doc_id")
          .select(col("source"),
            when(col("n_chars").between(300, 5000), 1L).otherwise(0L).as("a"),
            when(col("score") > 0, 1L).otherwise(0L).as("b"))
        labeled.groupBy("source")
          .agg(count(lit(1)).as("n"),
            sum(when(col("a") === col("b"), 1L).otherwise(0L)).as("n_agree"),
            sum(col("a")).as("na1"), sum(col("b")).as("nb1"))
          .withColumn("chance", col("na1") * col("nb1")
            + (col("n") - col("na1")) * (col("n") - col("nb1")))
          // den = 0 iff both labels are constant on the source: perfect
          // agreement if they are the SAME constant, else total miss
          .select(col("source"), col("n"), col("n_agree"),
            when(col("n") * col("n") === col("chance"),
                when(col("n_agree") === col("n"), 1.0).otherwise(-1.0))
              .otherwise(round(
                (col("n") * col("n_agree") - col("chance")).cast("double")
                  / (col("n") * col("n") - col("chance")), 6)).as("kappa"))
          .orderBy("source")
      },
      Some(s"""WITH $classifierSqlCte,
             |lab AS (
             |  SELECT sc.source,
             |    CASE WHEN d.n_chars BETWEEN 300 AND 5000 THEN 1 ELSE 0 END AS a,
             |    CASE WHEN sc.score > 0 THEN 1 ELSE 0 END AS b
             |  FROM sc JOIN documents d USING (doc_id)),
             |cells AS (
             |  SELECT source, COUNT(*) AS n,
             |    SUM(CASE WHEN a = b THEN 1 ELSE 0 END) AS n_agree,
             |    SUM(a) AS na1, SUM(b) AS nb1,
             |    na1 * nb1 + (n - na1) * (n - nb1) AS chance
             |  FROM lab GROUP BY source)
             |SELECT source, CAST(n AS BIGINT) AS n,
             |  CAST(n_agree AS BIGINT) AS n_agree,
             |  CASE WHEN n * n = chance THEN
             |    CASE WHEN n_agree = n THEN 1.0 ELSE -1.0 END
             |  ELSE round(CAST(n * n_agree - chance AS DOUBLE)
             |             / (n * n - chance), 6) END AS kappa
             |FROM cells ORDER BY source""".stripMargin)),

    // Streamed quality-classifier inference (✚, q334 THROUGH the
    // streaming engine — the always-on ingest filter: documents arrive
    // as file-source micro-batches, each is scored statelessly, and
    // per-source keep stats run as complete-mode streaming state).
    // Unlike q331's literal-map model, the frozen model here is pure
    // ARITHMETIC on the hash bucket — w(b) = ((b·2654435761) mod 2048
    // − 1024)/1024 folds inside the same higher-order aggregate, so
    // the stream needs no broadcast at all. Every per-doc sum is
    // exact (multiples of 2^-10), per-source sums are exact DECIMAL,
    // so arbitrary arrival order converges to the batch answer: the
    // final table must hash-match q334's own oracle (stream/batch
    // unification for the selection family).
    QueryDef("q340_stream_classifier",
      (s, d) => {
        val stats = (df: DataFrame) => {
          val toks = split(col("text"), " ")
          val wOf = (t: Column) => {
            val b = conv(substring(md5(concat(lit("q334|"), t)), 1, 8), 16, 10)
              .cast("long") % 1024
            ((b * 2654435761L) % 2048 - 1024).cast("double") / 1024.0
          }
          val score = round(
              aggregate(toks, lit(0.0), (acc, t) => acc + wOf(t)) / size(toks), 6)
            .cast("decimal(12,6)")
          df.select(col("source"), score.as("score"))
            .groupBy("source")
            .agg(count(lit(1)).as("n_docs"),
              sum(when(col("score") > 0, 1L).otherwise(0L)).as("n_keep"),
              sum(col("score")).as("sum_score"))
        }
        val input = Tables.documents(s, d).select("source", "text")
        val rows = graft.stream.StreamOps.runBoundedFromPath(
          s, input, stats, chunks = 3)
        s.createDataFrame(new java.util.ArrayList(java.util.Arrays.asList(rows: _*)),
            stats(input).schema)
          .select(col("source"), col("n_docs"), col("n_keep"),
            round(col("sum_score").cast("double") / col("n_docs"), 6).as("avg_score"))
          .orderBy("source")
      },
      // identical to q334's oracle — the streaming state must converge
      // to the batch classifier stats
      Some(s"""WITH $classifierSqlCte
             |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
             |  CAST(SUM(CASE WHEN score > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
             |  round(CAST(SUM(score) AS DOUBLE) / COUNT(*), 6) AS avg_score
             |FROM sc GROUP BY source ORDER BY source""".stripMargin)),

    // Filter FUNNEL audit (✚, pipeline observability — "we kept 38% of
    // the crawl: which stage dropped the rest, and does that differ by
    // source?"). Three CUMULATIVE stages — length band (300 ≤ n_chars
    // ≤ 5000), lexical density (distinct-token ratio ≥ 0.3, the q121
    // repetition proxy, compared as 10·distinct ≥ 3·n_tok — integer,
    // no 0.3 double boundary), classifier sign (q334) — evaluated in
    // ONE pass of conditional aggregation (the q148 discipline: adding
    // a stage never adds a scan; the only join is the per-doc score,
    // already one aggregate of the same corpus). Yield in integer
    // basis points (exact `div`, the q333 rule).
    QueryDef("q341_filter_funnel",
      (s, d) => {
        val toks = split(col("text"), " ")
        val flags = Tables.documents(s, d)
          .select(col("doc_id"), col("source"), col("n_chars"),
            size(toks).cast("long").as("n_tok"),
            size(array_distinct(toks)).cast("long").as("n_dis"))
          .join(classifierScores(s, d).select("doc_id", "score"), "doc_id")
          .select(col("source"),
            when(col("n_chars").between(300, 5000), 1L).otherwise(0L).as("f1"),
            when(col("n_dis") * 10 >= col("n_tok") * 3, 1L).otherwise(0L).as("f2"),
            when(col("score") > 0, 1L).otherwise(0L).as("f3"))
        flags.groupBy("source")
          .agg(count(lit(1)).as("n0"),
            sum(col("f1")).as("n1"),
            sum(col("f1") * col("f2")).as("n2"),
            sum(col("f1") * col("f2") * col("f3")).as("n3"))
          .withColumn("yield_bp", expr("n3 * 10000L div n0"))
          .orderBy("source")
      },
      Some(s"""WITH $classifierSqlCte,
             |fl AS (
             |  SELECT d.source,
             |    CASE WHEN d.n_chars BETWEEN 300 AND 5000 THEN 1 ELSE 0 END AS f1,
             |    CASE WHEN len(list_distinct(string_split(d.text, ' '))) * 10
             |           >= len(string_split(d.text, ' ')) * 3
             |         THEN 1 ELSE 0 END AS f2,
             |    CASE WHEN sc.score > 0 THEN 1 ELSE 0 END AS f3
             |  FROM documents d JOIN sc USING (doc_id))
             |SELECT source, CAST(COUNT(*) AS BIGINT) AS n0,
             |  CAST(SUM(f1) AS BIGINT) AS n1,
             |  CAST(SUM(f1 * f2) AS BIGINT) AS n2,
             |  CAST(SUM(f1 * f2 * f3) AS BIGINT) AS n3,
             |  CAST(SUM(f1 * f2 * f3) * 10000 // COUNT(*) AS BIGINT) AS yield_bp
             |FROM fl GROUP BY source ORDER BY source""".stripMargin)),

    // Classifier CALIBRATION table (✚, the eval that decides whether
    // q334's scores can gate by threshold: bucket the score range into
    // 10 equal bins, and per bin compare mean score ("confidence")
    // against the rate at which the independent length heuristic
    // agrees ("accuracy") — the reliability-diagram table whose
    // weighted |acc − conf| gap is ECE. All means are exact DECIMAL
    // sums divided once and rounded @6; the bin id is integer floor
    // arithmetic on the DECIMAL score (no double boundary); the
    // |classes|=10 bucket table is bounded at any corpus size, and the
    // ECE summary row (bucket = -1) aggregates that bounded table.
    QueryDef("q342_score_calibration",
      (s, d) => {
        val lab = classifierScores(s, d)
          .join(Tables.documents(s, d).select("doc_id", "n_chars"), "doc_id")
          .select(
            least(lit(9L), floor((col("score") + 1) * 5).cast("long")).as("bucket"),
            col("score"),
            when(col("n_chars").between(300, 5000), 1L).otherwise(0L).as("y"))
        val buckets = lab.groupBy("bucket")
          .agg(count(lit(1)).as("n"),
            sum(col("score")).as("ssum"), sum(col("y")).as("ysum"))
          .select(col("bucket"), col("n"),
            round(col("ssum").cast("double") / col("n"), 6).as("conf"),
            round(col("ysum").cast("double") / col("n"), 6).as("acc"))
          .localCheckpoint() // bounded (≤10 rows); feeds rows + the ECE fold
        val total = buckets
          .agg(sum(col("n")).as("nt"),
            sum(abs(round(col("acc") - col("conf"), 6)
              .cast("decimal(12,6)") * col("n"))).as("gapsum"))
          .select(lit(-1L).as("bucket"), col("nt").as("n"),
            lit(null).cast("double").as("conf"),
            round(col("gapsum").cast("double") / col("nt"), 6).as("acc"))
        buckets.unionByName(total).orderBy("bucket")
      },
      Some(s"""WITH $classifierSqlCte,
             |lab AS (
             |  SELECT LEAST(9, CAST(floor((sc.score + 1) * 5) AS BIGINT)) AS bucket,
             |    sc.score,
             |    CASE WHEN d.n_chars BETWEEN 300 AND 5000 THEN 1 ELSE 0 END AS y
             |  FROM sc JOIN documents d USING (doc_id)),
             |b AS (
             |  SELECT bucket, COUNT(*) AS n,
             |    round(CAST(SUM(score) AS DOUBLE) / COUNT(*), 6) AS conf,
             |    round(CAST(SUM(y) AS DOUBLE) / COUNT(*), 6) AS acc
             |  FROM lab GROUP BY bucket),
             |tt AS (
             |  SELECT CAST(-1 AS BIGINT) AS bucket,
             |    SUM(n) AS n, CAST(NULL AS DOUBLE) AS conf,
             |    round(CAST(SUM(abs(CAST(round(acc - conf, 6) AS DECIMAL(12,6))
             |      * n)) AS DOUBLE) / SUM(n), 6) AS acc
             |  FROM b)
             |SELECT CAST(bucket AS BIGINT) AS bucket, CAST(n AS BIGINT) AS n,
             |  conf, acc
             |FROM (SELECT * FROM b UNION ALL SELECT * FROM tt)
             |ORDER BY bucket""".stripMargin)),

    // Greedy k-center coreset selection (✚, the geometric-coverage
    // selection family — the complement of q328's SemDeDup (drop what
    // is redundant) and q329's DSIR (keep what matches a target):
    // pick the k points that MAXIMIZE coverage of the embedding
    // space, the Gonzalez 2-approximation every facility-location /
    // coreset pipeline starts from). Iteration i scans the corpus
    // for the point FARTHEST from the selected set (max of min
    // squared-L2, ties to the lower vec_id), adds it, repeats. The
    // output is the selection trace — step, chosen id, its distance
    // at selection (a decreasing sequence — each pick covers the
    // previous worst hole) — plus the final coverage radius, the
    // k-center objective itself.
    //
    // Scale: the canonical O(k·n) shape — per round ONE narrow
    // codegen'd scan (graft_l2sq against k literal centers, the q63
    // centroid-assignment plumbing; no joins, no shuffle) and a
    // 1-row TakeOrdered collect; centers live on the driver exactly
    // as every k-means/IVF trainer holds them (k-bounded, the
    // AnnCentroids precedent). k is a constant: at 100 TB the cost is
    // k corpus scans, embarrassingly parallel, zero shuffle bytes.
    // Determinism: each distance round@6 BEFORE the min (the q63
    // rule), so argmax ties resolve identically on both engines.
    QueryDef("q346_kcenter_coreset",
      (s, d) => {
        import s.implicits._
        val k = 6
        val pts = Tables.embeddings(s, d)
          .select(col("vec_id"), Vectors.asDouble(col("embedding")).as("v"))
          .localCheckpoint()
        val first = pts.orderBy("vec_id").limit(1)
          .select(col("vec_id"), col("v")).head
        var centers = Vector[(Long, Seq[Double], Double)](
          (first.getLong(0), first.getSeq[Double](1), 0.0))
        def mind: Column = centers.map { case (_, cv, _) =>
          round(Vectors.l2sq(col("v"), array(cv.map(lit): _*)), 6)
        }.reduce(least(_, _))
        while (centers.size < k) {
          val sel = pts.select(col("vec_id"), mind.as("m"))
            .orderBy(col("m").desc, col("vec_id").asc).limit(1).head
          val cv = pts.where(col("vec_id") === sel.getLong(0))
            .select("v").head.getSeq[Double](0)
          centers :+= ((sel.getLong(0), cv, sel.getDouble(1)))
        }
        val cover = pts.agg(max(mind)).head.getDouble(0)
        (centers.zipWithIndex.map { case ((id, _, m), i) =>
          ((i + 1).toLong, id, m)
        } :+ ((k + 1).toLong, -1L, cover))
          .toDF("step", "center_id", "sel_d2")
          .orderBy("step")
      },
      Some(kcenterSql(6))),

    // Greedy set-cover source selection (✚, the submodular-coverage
    // member of the selection family: q346 covers SPACE with k
    // points, this covers CONTENT with k sources — "which k corpora
    // do I license/ingest to see the most distinct phenomena?", the
    // classic budgeted-acquisition question, and greedy is its
    // (1−1/e) workhorse). Universe = distinct bigrams; round i scans
    // the NOT-yet-covered (source, bigram) table, picks the source
    // with the largest marginal gain (tie: source asc), removes every
    // bigram it covers, repeats. The output trace — source, marginal
    // gain, cumulative coverage — is the diminishing-returns curve a
    // curator actually reads.
    //
    // Scale: each round is ONE map-side-combined groupBy over the
    // REMAINING pair table (shrinks every round) + a 1-row argmax
    // collect + an anti-join on the covered bigram set (a
    // broadcast-able |universe|-bounded column) — k·O(pairs), the
    // same O(k·n) shape as q346, zero driver state beyond the k
    // picks. A short round (no sources left with new content) ends
    // the trace on BOTH engines — the arms go empty together.
    QueryDef("q347_source_cover",
      (s, d) => {
        val w = split(col("text"), " ")
        // <2-token docs yield NO bigrams (DuckDB's range(1, len) is
        // empty there; Spark's sequence would count DOWN — guard it)
        val bigrams = when(size(w) >= 2,
          transform(sequence(lit(1), size(w) - 1),
            i => concat(element_at(w, i), lit(" "), element_at(w, i + 1))))
          .otherwise(array().cast("array<string>"))
        val st = Tables.documents(s, d)
          .select(col("source"), explode(bigrams).as("g"))
          .distinct()
        sourceCover(s, st, 5)
      },
      Some(coverSql(5))),

    // Leave-one-source-out ablation of a linear probe (✚, data
    // VALUATION: q347 asks "which sources to acquire", this asks
    // "which source, if dropped, most changes a model" — the
    // poor-man's influence function a curator runs before paying for
    // re-training). Probe: the closed-form least-squares fit of
    // n_chars ~ b0 + b1·n_tok + b2·n_distinct_tok. The trick that
    // makes k ablations ONE corpus pass: linear regression's
    // sufficient statistics (the 10 moment sums n, Σx, Σxx', Σxy,
    // Σy²) are additive, so each leave-one-out model is solved in
    // closed form (3×3 Cramer) from GLOBAL − SOURCE sums — no
    // per-ablation scan, no gradient loop. Output: per ablation the
    // refit coefficients, its RMSE, and the shift vs the full fit.
    //
    // Scale: one map-side-combined groupBy(source) over per-row
    // integer features; everything after is |sources|-row arithmetic.
    // Determinism: the moment sums are exact BIGINTs; Cramer runs in
    // doubles from identical expression text in both engines (pure
    // IEEE *,−,+ on exactly-representable inputs — no libm), rounds
    // only at the output.
    QueryDef("q350_source_ablation",
      (s, d) => {
        val toks = split(col("text"), " ")
        sourceAblation(Tables.documents(s, d).select(col("source"),
          size(toks).cast("long").as("x1"),
          size(array_distinct(toks)).cast("long").as("x2"),
          col("n_chars").as("y")))
      },
      Some(ablationSql)),

    // Group-DRO / DoReMi-style domain reweighting (✚, the mixture-
    // weight learner of the selection family — algorithm notes at
    // [[groupDroWeights]]): exponentiated-gradient updates push
    // mixture weight toward domains whose mean loss EXCEEDS the
    // current α-weighted mixture average, with uniform smoothing —
    // DoReMi's reference-free Group-DRO step (arXiv:2302.03169-family;
    // Sagawa et al. 2020) over a per-doc loss proxy (chars-per-token,
    // the compression-rate stand-in q333 also reads; a production run
    // plugs per-doc model NLL into the same algebra). The oracle
    // unrolls the identical 5 rounds with scalar-subquery mixture
    // means, expression shape mirrored term for term.
    QueryDef("q365_doremi_weights",
      (s, d) => {
        val perDoc = Tables.documents(s, d).select(col("source"),
          expr("(1000 * n_chars) div size(split(text, ' '))").as("l"))
        val dm = perDoc.groupBy("source").agg(
          (sum(col("l")).cast("double") / count(lit(1)).cast("double") /
            lit(1000.0)).as("m"))
        groupDroWeights(dm, eta = 0.5, rounds = 5, smooth = 0.2)
      },
      Some(doremiSql(5)))
  ,

    // Hard-negative triplet mining (✚ — the contrastive-training data
    // op: for every anchor, its most-similar SAME-label neighbor is
    // the positive and its most-similar DIFFERENT-label neighbor the
    // hard negative; low margin = the pairs a contrastive fine-tune
    // learns most from). Candidates come from the SAME fitted IVF
    // cells as q328 (Σ|cell|² pair cost, never all-pairs — the scale
    // posture of the whole embedding family); cosine rounds @6 before
    // any comparison (the q63 parity rule) and the per-anchor argmax
    // is ONE map-side-combinable struct-max per polarity, tie-broken
    // (cos DESC, id ASC). Anchors lacking a polarity in their cell
    // emit NULLs — visible, not silently dropped.
    QueryDef("q369_triplet_mining",
      (s, d) => {
        val e = Tables.embeddings(s, d).select(col("vec_id"),
          Vectors.asDouble(col("embedding")).as("v"), col("label"))
        tripletMining(e, AnnCentroids.fitted)
      },
      Some(s"""WITH cents AS (
              |${Ann.centroidsSqlCte(AnnCentroids.fitted)}),
              |e AS (SELECT vec_id, embedding::DOUBLE[] AS v, label
              |      FROM embeddings),
              |d AS (
              |  SELECT e.vec_id, cents.i,
              |    list_sum(list_transform(range(1, ${AnnCentroids.fitted.head.length + 1}),
              |      j -> (e.v[j] - cents.c[j]) * (e.v[j] - cents.c[j]))) AS d2
              |  FROM e CROSS JOIN cents),
              |asg AS (
              |  SELECT vec_id, i AS cell FROM (
              |    SELECT vec_id, i,
              |      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2 ASC, i ASC) AS rn
              |    FROM d) t WHERE rn = 1),
              |ev AS (SELECT e.vec_id, e.v, e.label, asg.cell
              |       FROM e JOIN asg USING (vec_id)),
              |p AS (
              |  SELECT a.vec_id, a.label = b.label AS same, b.vec_id AS ib,
              |    round(list_dot_product(a.v, b.v) /
              |      (sqrt(list_dot_product(a.v, a.v)) *
              |       sqrt(list_dot_product(b.v, b.v))), 6) AS cos
              |  FROM ev a JOIN ev b ON a.cell = b.cell
              |    AND a.vec_id <> b.vec_id),
              |r AS (SELECT vec_id, same, ib, cos,
              |        ROW_NUMBER() OVER (PARTITION BY vec_id, same
              |          ORDER BY cos DESC, ib ASC) AS rn FROM p),
              |pos AS (SELECT vec_id, ib AS pos_id, cos AS pos_cos
              |        FROM r WHERE same AND rn = 1),
              |neg AS (SELECT vec_id, ib AS neg_id, cos AS neg_cos
              |        FROM r WHERE NOT same AND rn = 1),
              |al AS (SELECT DISTINCT vec_id FROM p)
              |SELECT al.vec_id, pos_id, pos_cos, neg_id, neg_cos,
              |  round(pos_cos - neg_cos, 6) AS margin
              |FROM al LEFT JOIN pos USING (vec_id) LEFT JOIN neg USING (vec_id)
              |ORDER BY al.vec_id""".stripMargin)),

    // Exact KNN-Shapley data valuation (✚ — algorithm notes at
    // [[knnShapley]]: the closed-form per-training-point value of Jia
    // et al. 2019, the selection family's principled "which documents
    // actually help on the eval set" signal beyond q334's classifier
    // scores and q350's per-source ablation). Oracle mirrors the
    // identical construction with plain windows — ranks, the lead
    // join, the exact-decimal reverse cumulative sum — over the same
    // rounded distances.
    QueryDef("q376_knn_shapley",
      // readout of the cached [[shapleyValues]] substrate (r17: q379
      // composes the same valuation into selection — one pair/rank/
      // recursion pass per (JVM, corpus) feeds both gates)
      (s, d) => shapleyValues(s, d).orderBy("vec_id"),
      Some(knnShapleySql(5, 32))),

    // Valuation composed into selection (✚ — VERDICT r16 #5: q376
    // values each training doc against the eval sample, q121 selects a
    // token-budget prefix; this closes the loop — the budget selector
    // ranked by SHAPLEY VALUE instead of lexical density, the
    // "select the data that provably helps on eval" pipeline of the
    // valuation literature). Algorithm notes at [[shapleyBudgetSelect]].
    // Oracle: the q376 CTE chain verbatim (the two gates cannot
    // disagree on a value) + the q121 flat-window selection, with the
    // cumulative value as an exact DECIMAL running sum.
    QueryDef("q379_value_select",
      (s, d) => shapleyBudgetSelectFrom(Tables.documents(s, d),
        shapleyValues(s, d)),
      Some(knnShapleyCtes(5, 32) +
        """,
          |sv AS (SELECT c.t_id AS vec_id,
          |         round(CAST(SUM(sn.s_n + c.rc) AS DOUBLE) / COUNT(*), 6)
          |           AS shapley
          |       FROM c JOIN sn USING (q_id) GROUP BY c.t_id),
          |sz AS (SELECT d.doc_id,
          |         CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tok,
          |         sv.shapley
          |       FROM documents d JOIN sv ON sv.vec_id = d.doc_id),
          |cw AS (SELECT doc_id, n_tok, shapley,
          |         SUM(n_tok) OVER (ORDER BY shapley DESC, doc_id
          |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
          |         SUM(CAST(shapley AS DECIMAL(38,6)))
          |           OVER (ORDER BY shapley DESC, doc_id
          |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumv
          |       FROM sz)
          |SELECT doc_id, n_tok, shapley, CAST(cum AS BIGINT) AS cum_tok,
          |  CAST(cumv AS DOUBLE) AS cum_value
          |FROM cw WHERE cum <= 20000 ORDER BY doc_id""".stripMargin)
  ))

  /** Token-budget selection ranked by KNN-Shapley value (q379's engine
    * — [[knnShapley]] composed into q121's greedy budget selector):
    * value every training document against the eval sample, order by
    * (value DESC, doc_id), keep the maximal prefix whose running token
    * total fits `budget`. Greedy-by-value IS optimal for the
    * "max total value under a token budget" relaxation the selection
    * literature uses at corpus scale (documents are small next to the
    * budget), and the running sums are the two-phase primitives — the
    * token prefix via [[Scale.globalRunningSum]], the value prefix via
    * [[TrainPrep.runningSumGlobal]] over exact DECIMALs (rounded@6
    * values summed exactly, so the cumulative value both engines
    * report is bit-identical) — never a single-task global window.
    * Docs without a valuation (the eval rows themselves) are not
    * selectable: training on eval is the q377 contamination defect. */
  def shapleyBudgetSelect(docs: DataFrame, embs: DataFrame,
      budget: Long = 20000L, k: Int = 5, nQueries: Int = 32,
      materialize: Materialize.Strategy = Materialize.local): DataFrame =
    shapleyBudgetSelectFrom(docs,
      knnShapley(embs, k, nQueries, materialize), budget, materialize)

  /** [[shapleyBudgetSelect]] over an ALREADY-COMPUTED valuation frame
    * — the readout half, split out so the cached [[shapleyValues]]
    * substrate can feed both q376 and q379 from one build. */
  private[ops] def shapleyBudgetSelectFrom(docs: DataFrame,
      values: DataFrame, budget: Long = 20000L,
      materialize: Materialize.Strategy = Materialize.local): DataFrame = {
    val sv = values.select(col("vec_id").as("doc_id"), col("shapley"))
    val sized = docs.select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tok"))
      .join(sv, "doc_id")
    val withCum = Scale.globalRunningSum(sized,
      Seq(col("shapley").desc, col("doc_id")), col("n_tok"), materialize)
    val withVal = TrainPrep.runningSumGlobal(
      withCum.withColumn("nshap", -col("shapley"))
        .withColumn("sdec", col("shapley").cast("decimal(38,6)")),
      Seq("nshap", "doc_id"), "sdec", "cumv", materialize)
    // the running sum is EXACT in decimal; the output casts it to
    // double (identical on both engines for the same decimal value)
    withVal.where(col("cum") <= budget)
      .select(col("doc_id"), col("n_tok"), col("shapley"),
        col("cum").as("cum_tok"),
        col("cumv").cast("double").as("cum_value"))
      .orderBy("doc_id")
  }

  /** Hard-negative triplet mining over IVF cells (q369's engine) — per
    * anchor the top same-label and top different-label cell-mates by
    * rounded cosine, with the triplet margin. One cell-keyed pair join
    * (Σ|cell|², the SemDeDup bound) + one struct-max aggregation:
    * max(struct(cos, −id)) elects (cos DESC, id ASC) map-side, so the
    * shuffle carries one partial row per (anchor, polarity). */
  def tripletMining(emb: DataFrame, cents: Array[Array[Double]],
      roundDp: Int = 6,
      materialize: Materialize.Strategy = Materialize.local): DataFrame = {
    val ev = materialize(emb
      .withColumn("cell", Ann.cellCol(col("v"), cents))
      .withColumn("nrm", Vectors.norm2(col("v"))))
    val a = ev.select(col("cell"), col("vec_id"), col("v").as("va"),
      col("nrm").as("na"), col("label").as("la"))
    val b = ev.select(col("cell"), col("vec_id").as("ib"),
      col("v").as("vb"), col("nrm").as("nb"), col("label").as("lb"))
    val cos = round(
      Vectors.dot(col("va"), col("vb")) / (col("na") * col("nb")), roundDp)
    val pairs = a.join(b, "cell").where(col("vec_id") =!= col("ib"))
      .select(col("vec_id"), (col("la") === col("lb")).as("same"),
        col("ib"), cos.as("cos"))
    val key = struct(col("cos"), (-col("ib")).as("nid"))
    pairs.groupBy("vec_id").agg(
        max(when(col("same"), key)).as("p"),
        max(when(!col("same"), key)).as("n"))
      .select(col("vec_id"),
        (-col("p.nid")).as("pos_id"), col("p.cos").as("pos_cos"),
        (-col("n.nid")).as("neg_id"), col("n.cos").as("neg_cos"),
        round(col("p.cos") - col("n.cos"), roundDp).as("margin"))
      .orderBy("vec_id")
  }

  /** Group-DRO exponentiated-gradient mixture weights (q365's engine)
    * over a `(source, m)` per-domain mean-loss frame: starting uniform,
    * each round sets
    *
    *   α'_k = α_k · exp(η · (m_k − Σ_j α_j m_j)),
    *   α_k  ← (1 − c) · α'_k / Σ α'  +  c / K
    *
    * — the hardest-domain-upweighting step of DoReMi's proxy loop,
    * with `smooth` = c the uniform-smoothing mass that keeps every
    * domain sampled. The per-doc loss is whatever the caller feeds in;
    * the algebra is loss-agnostic.
    *
    * Scale: the corpus appears ONLY in the caller's one map-side-
    * combined groupBy; the iteration runs on the K-row domain frame
    * (K = |sources|), pinned per round so the tiny lineage stays flat
    * — no per-round corpus pass, no driver-side model state at all.
    * Parity margin (the q111 rule): exp() may differ by 1 ulp between
    * libm implementations and the K-term mixture sums are unordered
    * doubles — O(rounds · K · ulp) ≈ 1e-15 drift, six orders below the
    * @6 output round. */
  def groupDroWeights(perDomain: DataFrame, eta: Double, rounds: Int,
      smooth: Double,
      materialize: Materialize.Strategy = Materialize.local): DataFrame = {
    val kk = perDomain.agg(count(lit(1)).cast("double").as("kk"))
    var w = materialize(perDomain.crossJoin(broadcast(kk))
      .select(col("source"), col("m"), col("kk"),
        (lit(1.0) / col("kk")).as("a")))
    for (_ <- 0 until rounds) {
      val mix = w.agg(sum(col("a") * col("m")).as("mix"))
      val x = w.crossJoin(broadcast(mix))
        .select(col("source"), col("m"), col("kk"),
          (col("a") * exp(lit(eta) * (col("m") - col("mix")))).as("u"))
      val sTot = x.agg(sum(col("u")).as("s"))
      w = materialize(x.crossJoin(broadcast(sTot))
        .select(col("source"), col("m"), col("kk"),
          (lit(1.0 - smooth) * col("u") / col("s") +
            lit(smooth) / col("kk")).as("a")))
    }
    w.select(col("source"), round(col("m"), 6).as("m_loss"),
      round(col("a"), 6).as("weight")).orderBy("source")
  }

  /** q365's oracle: the same 5 unrolled exponentiated-gradient rounds,
    * mixture means as scalar subqueries, every expression mirroring
    * [[groupDroWeights]] term for term (η=0.5, c=0.2 inlined as the
    * literals 0.5 / 0.8 / 0.2). */
  private def doremiSql(rounds: Int): String = {
    val roundCtes = (0 until rounds).map { r =>
      s"""x$r AS (SELECT source, m, kk,
             |  a * exp(0.5 * (m - (SELECT SUM(a * m) FROM w$r))) AS u
             |  FROM w$r),
             |w${r + 1} AS (SELECT source, m, kk,
             |  0.8 * u / (SELECT SUM(u) FROM x$r) + 0.2 / kk AS a
             |  FROM x$r)""".stripMargin
    }.mkString(",\n")
    s"""WITH f AS (
             |  SELECT source,
             |    (1000 * n_chars) // len(string_split(text, ' ')) AS l
             |  FROM documents),
             |dm AS (SELECT source,
             |    CAST(SUM(l) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) / 1000.0 AS m
             |  FROM f GROUP BY 1),
             |kkt AS (SELECT CAST(COUNT(*) AS DOUBLE) AS kk FROM dm),
             |w0 AS (SELECT source, m, kk, 1.0 / kk AS a FROM dm CROSS JOIN kkt),
             |$roundCtes
             |SELECT source, round(m, 6) AS m_loss, round(a, 6) AS weight
             |FROM w$rounds ORDER BY source""".stripMargin
  }

  /** Leave-one-source-out linear-probe ablation (q350's engine) over a
    * `(source, x1, x2, y)` features frame: additive moment sufficient
    * statistics make every leave-one-out refit a GLOBAL − SOURCE
    * subtraction solved in closed form (3×3 Cramer) — k ablations from
    * ONE corpus pass. Singular ablations (n=0 after dropping the only
    * source, or collinear x1/x2 ⇒ det=0) emit NULL coefficients/rmse
    * rather than silent NaN/Inf. */
  def sourceAblation(f: DataFrame): DataFrame = {
        val sums = Seq[(String, Column)](
          "n" -> count(lit(1)), "s1" -> sum(col("x1")), "s2" -> sum(col("x2")),
          "s11" -> sum(col("x1") * col("x1")), "s12" -> sum(col("x1") * col("x2")),
          "s22" -> sum(col("x2") * col("x2")), "sy" -> sum(col("y")),
          "s1y" -> sum(col("x1") * col("y")), "s2y" -> sum(col("x2") * col("y")),
          "syy" -> sum(col("y") * col("y")))
        val names = sums.map(_._1)
        val perSrc = f.groupBy("source")
          .agg(sums.head._2.as(names.head), sums.tail.map { case (n2, c) => c.as(n2) }: _*)
        val global = perSrc.agg(sum(col(names.head)).as(names.head),
          names.tail.map(n2 => sum(col(n2)).as(n2)): _*)
        val ablated = perSrc.as("s").crossJoin(broadcast(global).as("g"))
          .select(col("s.source").as("who") +:
            names.map(n2 => (col(s"g.$n2") - col(s"s.$n2")).as(n2)): _*)
          .unionByName(global.select(lit("_all").as("who") +:
            names.map(n2 => col(n2)): _*))
        // Cramer for [[a,b,c],[b,e12,e],[c,e,f2]]·θ = [p,q,r] — the
        // SAME expression text as the oracle, term for term
        val a = col("n").cast("double"); val b = col("s1").cast("double")
        val c2 = col("s2").cast("double"); val d2 = col("s11").cast("double")
        val e = col("s12").cast("double"); val f2 = col("s22").cast("double")
        val p = col("sy").cast("double"); val q = col("s1y").cast("double")
        val r = col("s2y").cast("double"); val yy = col("syy").cast("double")
        val det = a * (d2 * f2 - e * e) - b * (b * f2 - e * c2) +
          c2 * (b * e - d2 * c2)
        // Singularity guard: an ablation can leave n=0 (single-source
        // corpus) or collinear x1/x2 — det=0 would silently emit
        // NaN/Inf coefficients. Emit NULL instead (propagates through
        // rmse/rmse_shift identically in both engines).
        def solv(c: Column): Column = when(abs(det) > lit(0.0), c / det)
        val b0 = solv(p * (d2 * f2 - e * e) - b * (q * f2 - e * r) +
          c2 * (q * e - d2 * r))
        val b1 = solv(a * (q * f2 - e * r) - p * (b * f2 - e * c2) +
          c2 * (b * r - q * c2))
        val b2 = solv(a * (d2 * r - q * e) - b * (b * r - q * c2) +
          p * (b * e - d2 * c2))
        val mse = (yy - lit(2.0d) * (b0 * p + b1 * q + b2 * r) +
          (b0 * b0 * a + b1 * b1 * d2 + b2 * b2 * f2 +
            lit(2.0d) * b0 * b1 * b + lit(2.0d) * b0 * b2 * c2 +
            lit(2.0d) * b1 * b2 * e)) / a
        val fit = ablated.select(col("who"), col("n").as("n_used"),
          round(b0, 6).as("b0"), round(b1, 6).as("b1"), round(b2, 6).as("b2"),
          round(sqrt(mse), 6).as("rmse"))
        val base = fit.where(col("who") === "_all")
          .select(col("rmse").as("rmse_all"))
        fit.crossJoin(broadcast(base))
          .select(col("who"), col("n_used"), col("b0"), col("b1"), col("b2"),
            col("rmse"), round(col("rmse") - col("rmse_all"), 6).as("rmse_shift"))
          .orderBy("who")
  }

  /** Greedy set-cover source selection (q347's engine): k rounds of
    * argmax-marginal-gain over the remaining `(source, g)` pair table,
    * then an anti-join removes the pick's covered items. The remainder
    * is corpus-sized and consumed twice per round (argmax + anti-join
    * filter side), so each round PINS it through the injectable
    * `materialize` strategy — [[Materialize.local]] by default, and
    * [[Materialize.reliable]] on a real cluster so the k-round loop
    * survives executor loss instead of dying with `localCheckpoint`
    * blocks (the same contract as every other iterative operator:
    * Components, Dedup, TrainPrep). Driver state is the k picks only;
    * a round with no remaining sources ends the trace early. */
  def sourceCover(s: SparkSession, pairs: DataFrame, k: Int,
      materialize: Materialize.Strategy = Materialize.local): DataFrame = {
    import s.implicits._
    var remaining = materialize(pairs)
    var total = 0L
    val picks = scala.collection.mutable.ListBuffer[(Long, String, Long, Long)]()
    var i = 0
    while (i < k) {
      val top = remaining.groupBy("source").agg(count(lit(1)).as("gain"))
        .orderBy(col("gain").desc, col("source").asc).limit(1).collect()
      if (top.isEmpty) i = k
      else {
        val (src, gain) = (top(0).getString(0), top(0).getLong(1))
        total += gain
        picks += ((picks.size + 1L, src, gain, total))
        remaining = materialize(remaining
          .join(remaining.where(col("source") === src).select("g"),
            Seq("g"), "left_anti"))
        i += 1
      }
    }
    picks.toSeq.toDF("step", "source", "gain", "covered_total")
      .orderBy("step")
  }

  /** The q350 oracle: identical moment sums per source, GLOBAL − SOURCE
    * ablation arithmetic, and the verbatim Cramer/MSE expression text. */
  private def ablationSql: String = {
    val det = "a*(d*f - e*e) - b*(b*f - e*c) + c*(b*e - d*c)"
    // CASE = the singularity guard mirroring the Spark side: det=0
    // ablations emit NULL coefficients (and NULL propagates through
    // rmse/rmse_shift arithmetic in both engines).
    def solv(num: String) =
      s"CASE WHEN abs($det) > 0 THEN ($num) / ($det) END"
    val b0 = solv("p*(d*f - e*e) - b*(q*f - e*r) + c*(q*e - d*r)")
    val b1 = solv("a*(q*f - e*r) - p*(b*f - e*c) + c*(b*r - q*c)")
    val b2 = solv("a*(d*r - q*e) - b*(b*r - q*c) + p*(b*e - d*c)")
    s"""WITH f AS (
       |  SELECT source,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS x1,
       |    CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS x2,
       |    n_chars AS y
       |  FROM documents),
       |ps AS (
       |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
       |    CAST(SUM(x1) AS BIGINT) AS s1, CAST(SUM(x2) AS BIGINT) AS s2,
       |    CAST(SUM(x1*x1) AS BIGINT) AS s11, CAST(SUM(x1*x2) AS BIGINT) AS s12,
       |    CAST(SUM(x2*x2) AS BIGINT) AS s22, CAST(SUM(y) AS BIGINT) AS sy,
       |    CAST(SUM(x1*y) AS BIGINT) AS s1y, CAST(SUM(x2*y) AS BIGINT) AS s2y,
       |    CAST(SUM(y*y) AS BIGINT) AS syy
       |  FROM f GROUP BY 1),
       |g AS (
       |  SELECT CAST(SUM(n) AS BIGINT) AS n, CAST(SUM(s1) AS BIGINT) AS s1,
       |    CAST(SUM(s2) AS BIGINT) AS s2, CAST(SUM(s11) AS BIGINT) AS s11,
       |    CAST(SUM(s12) AS BIGINT) AS s12, CAST(SUM(s22) AS BIGINT) AS s22,
       |    CAST(SUM(sy) AS BIGINT) AS sy, CAST(SUM(s1y) AS BIGINT) AS s1y,
       |    CAST(SUM(s2y) AS BIGINT) AS s2y, CAST(SUM(syy) AS BIGINT) AS syy
       |  FROM ps),
       |ab AS (
       |  SELECT ps.source AS who, g.n - ps.n AS n, g.s1 - ps.s1 AS s1,
       |    g.s2 - ps.s2 AS s2, g.s11 - ps.s11 AS s11, g.s12 - ps.s12 AS s12,
       |    g.s22 - ps.s22 AS s22, g.sy - ps.sy AS sy, g.s1y - ps.s1y AS s1y,
       |    g.s2y - ps.s2y AS s2y, g.syy - ps.syy AS syy
       |  FROM ps, g
       |  UNION ALL
       |  SELECT '_all', n, s1, s2, s11, s12, s22, sy, s1y, s2y, syy FROM g),
       |dd AS (
       |  SELECT who, n, CAST(n AS DOUBLE) AS a, CAST(s1 AS DOUBLE) AS b,
       |    CAST(s2 AS DOUBLE) AS c, CAST(s11 AS DOUBLE) AS d,
       |    CAST(s12 AS DOUBLE) AS e, CAST(s22 AS DOUBLE) AS f,
       |    CAST(sy AS DOUBLE) AS p, CAST(s1y AS DOUBLE) AS q,
       |    CAST(s2y AS DOUBLE) AS r, CAST(syy AS DOUBLE) AS yy
       |  FROM ab),
       |th AS (SELECT who, n, a, b, c, d, e, f, p, q, r, yy,
       |    $b0 AS b0, $b1 AS b1, $b2 AS b2 FROM dd),
       |fit AS (
       |  SELECT who, n AS n_used, round(b0, 6) AS b0, round(b1, 6) AS b1,
       |    round(b2, 6) AS b2,
       |    round(sqrt((yy - CAST(2 AS DOUBLE)*(b0*p + b1*q + b2*r) +
       |      (b0*b0*a + b1*b1*d + b2*b2*f + CAST(2 AS DOUBLE)*b0*b1*b +
       |       CAST(2 AS DOUBLE)*b0*b2*c + CAST(2 AS DOUBLE)*b1*b2*e)) / a), 6)
       |      AS rmse
       |  FROM th)
       |SELECT who, n_used, b0, b1, b2, rmse,
       |  round(rmse - (SELECT rmse FROM fit WHERE who = '_all'), 6) AS rmse_shift
       |FROM fit ORDER BY who""".stripMargin
  }

  /** Unrolled greedy set-cover oracle: per round a MATERIALIZED
    * remaining-pairs level, an argmax-LIMIT-1 pick, and the next
    * level filtered by the pick's bigrams; cumulative coverage is a
    * running sum over the emitted arms. */
  private def coverSql(k: Int): String = {
    val sb = new StringBuilder
    sb ++= """WITH toks AS (SELECT source, string_split(text, ' ') AS w FROM documents),
             |r1 AS MATERIALIZED (SELECT DISTINCT source, g FROM (
             |  SELECT source, unnest(list_transform(range(1, len(w)),
             |    j -> w[j] || ' ' || w[j+1])) AS g
             |  FROM toks)),
             |""".stripMargin
    for (i <- 1 to k) {
      sb ++= s"p$i AS MATERIALIZED (SELECT source, COUNT(*) AS gain FROM r$i " +
        s"GROUP BY source ORDER BY gain DESC, source LIMIT 1),\n"
      if (i < k)
        sb ++= s"r${i + 1} AS MATERIALIZED (SELECT * FROM r$i WHERE g NOT IN (" +
          s"SELECT g FROM r$i WHERE source = (SELECT source FROM p$i))),\n"
    }
    sb.setLength(sb.length - 2) // drop trailing comma
    sb ++= "\n"
    sb ++= "SELECT step, source, gain,\n" +
      "  CAST(SUM(gain) OVER (ORDER BY step) AS BIGINT) AS covered_total\nFROM (\n"
    sb ++= (1 to k).map(i =>
      s"SELECT CAST($i AS BIGINT) AS step, source, CAST(gain AS BIGINT) AS gain FROM p$i")
      .mkString("\nUNION ALL\n")
    sb ++= ")\nORDER BY step"
    sb.toString
  }

  /** Unrolled Gonzalez k-center oracle: step i's farthest-point argmax
    * as an ORDER BY ... LIMIT 1 CTE, min-distances folded with LEAST
    * over the same round@6 per-center distances the Spark plan uses.
    * MATERIALIZED pins each level — c_i is referenced twice (next
    * level + output arm), and without it DuckDB's CTE inlining would
    * re-evaluate the whole chain per reference. */
  private def kcenterSql(k: Int, dim: Int = 64): String = {
    def dist(v: String, c: String) =
      s"round(list_sum(list_transform(range(1, ${dim + 1}), " +
        s"j -> ($v[j] - $c[j]) * ($v[j] - $c[j]))), 6)"
    val sb = new StringBuilder
    sb ++= "WITH e AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings),\n"
    sb ++= "c1 AS MATERIALIZED (SELECT id, v, CAST(0.0 AS DOUBLE) AS m FROM e ORDER BY id LIMIT 1),\n"
    sb ++= s"d1 AS MATERIALIZED (SELECT e.id, e.v, ${dist("e.v", "c.v")} AS m FROM e, c1 c),\n"
    for (i <- 2 to k) {
      sb ++= s"c$i AS MATERIALIZED (SELECT id, v, m FROM d${i - 1} ORDER BY m DESC, id LIMIT 1),\n"
      sb ++= s"d$i AS MATERIALIZED (SELECT d.id, d.v, " +
        s"LEAST(d.m, ${dist("d.v", "c.v")}) AS m FROM d${i - 1} d, c$i c),\n"
    }
    sb ++= s"cov AS (SELECT MAX(m) AS m FROM d$k)\n"
    sb ++= (1 to k).map(i =>
      s"SELECT CAST($i AS BIGINT) AS step, (SELECT id FROM c$i) AS center_id, " +
        s"(SELECT m FROM c$i) AS sel_d2").mkString("\nUNION ALL\n")
    sb ++= s"\nUNION ALL\nSELECT CAST(${k + 1} AS BIGINT), CAST(-1 AS BIGINT), (SELECT m FROM cov)"
    sb ++= "\nORDER BY step"
    sb.toString
  }

  /** Exact KNN-SHAPLEY data valuation (✚ — Jia et al. 2019's closed
    * form: for a K-NN surrogate model the Shapley value of every
    * training point is computable exactly in one pass over the
    * distance-sorted training set per test point,
    *   s_(N)  = 1[y_(N) = y] / N
    *   s_(i)  = s_(i+1) + (1[y_(i)=y] − 1[y_(i+1)=y]) / max(K, i),
    * points sorted ascending by distance to the test point). The per-
    * training-point value against a test SET is the mean over its
    * per-test values — the principled "does this document help the
    * eval set" selection signal.
    *
    * Relational form, no per-test-point sort task: the test set is a
    * FIXED-SIZE deterministic sample (vec_id % 37, first `nQueries` —
    * eval suites are bounded; the train × test pair frame is linear in
    * the corpus), per-test ranks come from ONE [[TrainPrep
    * .globalOrderIndex]] over (q_id, d2, t_id) minus each query's base
    * index, the recursion unrolls into a REVERSE CUMULATIVE SUM of
    * per-rank terms (computed by [[TrainPrep.runningSumGlobal]] in
    * (q_id, −rank) order, minus each query's earlier-queries offset —
    * an nQueries-row driver map), and s_(i) = s_(N) + that suffix sum.
    * Terms are rounded @12 into exact DECIMAL(38,12) before summation
    * (the q118 discipline), so the cumulative sums are order-
    * independent and bit-equal across engines; distances round @6 with
    * t_id tiebreak so the rank order is total. */
  def knnShapley(embs: DataFrame, k: Int = 5, nQueries: Int = 32,
      materialize: Materialize.Strategy = Materialize.local): DataFrame = {
    import embs.sparkSession.implicits._
    val e = embs.select(col("vec_id"), col("label"),
      Vectors.asDouble(col("embedding")).as("v"))
    val qs = broadcast(e.where(col("vec_id") % 37 === 0)
      .orderBy("vec_id").limit(nQueries)
      .select(col("vec_id").as("q_id"), col("label").as("q_lbl"),
        col("v").as("qv")))
    val t = e.where(col("vec_id") % 37 =!= 0)
      .select(col("vec_id").as("t_id"), col("label").as("t_lbl"),
        col("v").as("tv"))
    val pairs = t.crossJoin(qs)
      .select(col("q_id"), col("q_lbl"), col("t_id"), col("t_lbl"),
        round(Vectors.l2sq(col("tv"), col("qv")), 6).as("d2"))
    val gi = materialize(TrainPrep.globalOrderIndex(pairs,
      Seq("q_id", "d2", "t_id"), "gi", materialize))
    val base = gi.groupBy("q_id").agg(min(col("gi")).as("g0"),
      count(lit(1)).as("n"))
    val ranked = materialize(gi.join(broadcast(base), "q_id")
      .select(col("q_id"), col("t_id"),
        (col("gi") - col("g0") + 1L).as("rank"), col("n"),
        when(col("t_lbl") === col("q_lbl"), 1.0).otherwise(0.0).as("ym")))
    // row i's successor ym via an equi-join on (q_id, rank+1) — ranks
    // are dense per query, so this IS `lead` without the window
    val nxt = ranked.select(col("q_id"), (col("rank") - 1L).as("rank"),
      col("ym").as("ym_next"))
    val terms = materialize(ranked.join(nxt, Seq("q_id", "rank"), "left")
      .select(col("q_id"), col("t_id"), col("rank"), col("n"), col("ym"),
        round(when(col("rank") === col("n"), lit(0.0))
          .otherwise((col("ym") - col("ym_next")) /
            greatest(lit(k.toDouble), col("rank").cast("double"))), 12)
          .cast("decimal(38,12)").as("term")))
    val rs = TrainPrep.runningSumGlobal(
      terms.withColumn("nrank", -col("rank")),
      Seq("q_id", "nrank"), "term", "rcg", materialize)
    // earlier-queries offsets: ≤ nQueries rows, driver prefix sum
    val qTot = terms.groupBy("q_id").agg(sum(col("term")).as("qt"))
      .collect().map(r => (r.getLong(0),
        Option(r.getDecimal(1)).map(BigDecimal(_)).getOrElse(BigDecimal(0))))
      .sortBy(_._1)
    var accQ = BigDecimal(0)
    val qOffs = qTot.map { case (q, tot) =>
      val o = (q, accQ); accQ += tot; o
    }.toSeq
    val qOffDf = broadcast(qOffs.toDF("q_id", "qoff"))
    val sN = ranked.where(col("rank") === col("n"))
      .select(col("q_id"),
        round(col("ym") / col("n").cast("double"), 12)
          .cast("decimal(38,12)").as("s_n"))
    rs.join(qOffDf, "q_id").join(broadcast(sN), "q_id")
      .select(col("t_id"),
        (col("s_n") + col("rcg") - col("qoff").cast("decimal(38,12)"))
          .as("s_i"))
      .groupBy(col("t_id").as("vec_id"))
      .agg(count(lit(1)).as("n_queries"),
        round(sum(col("s_i")).cast("double") / count(lit(1)), 6)
          .as("shapley"))
      .orderBy("vec_id")
  }

  private val shapleyCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Build the KNN-SHAPLEY valuation substrate for `dir` UNCACHED into
    * fresh scratch parquet (r17): q376 reports the values, q379 ranks
    * the budget selection by them — one pair/rank/recursion pass per
    * (JVM, corpus) feeds both, charged once in bench with a cold/cold
    * law, the contract of every other substrate. Deterministic: ranks
    * come from the global order index over rounded distances and the
    * recursion is exact DECIMAL. */
  private[graft] def buildShapley(s: org.apache.spark.sql.SparkSession,
      dir: String): String = {
    val out = graft.core.Scratch.tempDir("graft-shapley")
    knnShapley(Tables.embeddings(s, dir))
      .write.mode("overwrite").parquet(out + "/shapley.parquet")
    out
  }

  /** Pre-build (idempotent) the q376/q379 substrate. */
  private[graft] def warmShapley(s: org.apache.spark.sql.SparkSession,
      dir: String): Unit = { shapleyBase(s, dir); () }

  private def shapleyBase(s: org.apache.spark.sql.SparkSession,
      dir: String): String = {
    val key = graft.core.Scratch.corpusKey(dir)
    val cached = shapleyCache.get(key)
    if (cached != null) cached else {
      val built = buildShapley(s, dir)
      Option(shapleyCache.putIfAbsent(key, built)).getOrElse(built)
    }
  }

  /** The cached per-training-point valuation frame (vec_id, n_queries,
    * shapley) — cache contract as the other substrates. */
  private def shapleyValues(s: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame =
    s.read.parquet(shapleyBase(s, dir) + "/shapley.parquet")

  /** q376's oracle: the identical construction with plain windows —
    * per-query ROW_NUMBER ranks over the same rounded distances, lead
    * for the successor label, exact-decimal terms, the reverse
    * cumulative window sum, and the same final mean. Split as
    * CTE chain + final select so q379's composition oracle can extend
    * the SAME valuation text with the selection step (the two gates
    * cannot disagree on what a value is). */
  private def knnShapleySql(k: Int, nQueries: Int): String =
    knnShapleyCtes(k, nQueries) + "\n" +
      """SELECT c.t_id AS vec_id, COUNT(*) AS n_queries,
        |  round(CAST(SUM(sn.s_n + c.rc) AS DOUBLE) / COUNT(*), 6)
        |    AS shapley
        |FROM c JOIN sn USING (q_id)
        |GROUP BY c.t_id ORDER BY vec_id""".stripMargin

  private def knnShapleyCtes(k: Int, nQueries: Int): String =
    s"""WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v
       |           FROM embeddings),
       |q AS (SELECT vec_id AS q_id, label AS q_lbl, v AS qv FROM e
       |      WHERE vec_id % 37 = 0 ORDER BY vec_id LIMIT $nQueries),
       |t AS (SELECT vec_id AS t_id, label AS t_lbl, v AS tv FROM e
       |      WHERE vec_id % 37 <> 0),
       |p AS (SELECT q_id, q_lbl, t_id, t_lbl,
       |        round(list_sum(list_transform(range(1, 65),
       |          j -> (tv[j]-qv[j])*(tv[j]-qv[j]))), 6) AS d2
       |      FROM t CROSS JOIN q),
       |r AS (SELECT q_id, t_id,
       |        ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY d2, t_id)
       |          AS rank,
       |        COUNT(*) OVER (PARTITION BY q_id) AS n,
       |        CASE WHEN t_lbl = q_lbl THEN 1.0 ELSE 0.0 END AS ym
       |      FROM p),
       |x AS (SELECT r.*, lead(ym) OVER (PARTITION BY q_id ORDER BY rank)
       |        AS ymn
       |      FROM r),
       |tm AS (SELECT q_id, t_id, rank, n, ym,
       |        CAST(round(CASE WHEN rank = n THEN 0.0
       |          ELSE (ym - ymn) / GREATEST(CAST($k AS DOUBLE),
       |                                     CAST(rank AS DOUBLE)) END, 12)
       |          AS DECIMAL(38,12)) AS term
       |      FROM x),
       |c AS (SELECT tm.*, SUM(term) OVER (PARTITION BY q_id
       |        ORDER BY rank DESC
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rc
       |      FROM tm),
       |sn AS (SELECT q_id,
       |        CAST(round(ym / CAST(n AS DOUBLE), 12) AS DECIMAL(38,12))
       |          AS s_n
       |       FROM r WHERE rank = n)""".stripMargin
}
