package graft.ops

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.Vectors

/** Random-hyperplane LSH for cosine ANN — the scale path when no natural
  * blocking column exists (q34 uses the label cell; this builds its own
  * buckets from the geometry).
  *
  * `nBits` hyperplanes with deterministic ±1 components (seeded) hash
  * each vector to a bucket id = sign bits of its projections; cosine-
  * similar vectors collide with probability (1 − θ/π) per bit. Search
  * joins query and corpus on the bucket id — an equality join, shuffling
  * O(N) fixed-width keys instead of the O(N·Q) cross join. Multi-probe
  * (flipping one bit) trades extra probes for recall.
  */
object Ann {

  /** Deterministic ±1 hyperplane components: plane p, dimension j. */
  private[ops] def planeComponent(seed: Long, p: Int, j: Int): Double = {
    var h = seed ^ (p.toLong * 0x9e3779b97f4a7c15L) ^ (j.toLong * 0xc2b2ae3d27d4eb4fL)
    h = (h ^ (h >>> 33)) * 0xff51afd7ed558ccdL
    h = (h ^ (h >>> 33)) * 0xc4ceb9fe1a85ec53L
    h ^= (h >>> 33)
    if ((h & 1L) == 0L) 1.0 else -1.0
  }

  /** Bucket-id column: sign bits of projections onto `nBits` planes.
    * Built from codegen'd higher-order functions over the vector column —
    * no UDF; planes are literal arrays baked into the plan. */
  def bucketCol(v: Column, dim: Int, nBits: Int = 8, seed: Long = 42L): Column =
    Seq.tabulate(nBits) { p =>
      val plane = array(Seq.tabulate(dim)(j => lit(planeComponent(seed, p, j))): _*)
      when(Vectors.dot(v, plane) >= 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)

  // ---- learned IVF: k-means coarse quantizer ----

  /** Per-centroid (squared-L2 distance, index) structs — the shared
    * core of assignment and probing: centroids baked in as literal
    * arrays, distance via zip_with + aggregate (codegen'd, no UDF).
    *
    * Oracle-parity note (q63/q66): the ASSIGNMENT argmin compares raw
    * double sums whose accumulation order may differ between engines;
    * unlike the cosine output (rounded to 5 dp because ranking
    * boundaries are dense), assignment is left unrounded — it flips
    * only if two centroid distances (or a hyperplane projection and
    * zero) sit within float-summation error of each other, which a
    * non-degenerate corpus/quantizer pair does not produce (fitted
    * centroids are cell means; projections of real vectors are bounded
    * away from 0 at any realistic dim). Rounding before argmin would
    * not reduce the straddle probability — it only converts exact ties
    * into the deterministic index tiebreak, and exact cross-centroid
    * ties cannot arise from a k-means fit on distinct data. */
  private def centroidEntries(v: Column, cents: Array[Array[Double]]): Column =
    array(cents.zipWithIndex.map { case (c, i) =>
      // native fused squared-L2 (graft_l2sq): k distances per row make
      // this THE assignment hot loop; bit-identical to the composed
      // zip_with/aggregate fold, so the baked oracles are unaffected
      val d2 = Vectors.l2sq(v, array(c.map(lit).toSeq: _*))
      struct(d2.as("d"), lit(i).as("i"))
    }.toSeq: _*)

  /** Nearest-centroid cell id: argmin via array_min over the entries
    * (struct ordering compares the distance first). A narrow
    * projection — no shuffle — even at 100 TB. */
  def cellCol(v: Column, cents: Array[Array[Double]]): Column =
    array_min(centroidEntries(v, cents)).getField("i")

  /** The query-side probe list: the `nprobe` nearest cells in ascending
    * centroid distance (array_sort on the same entries). */
  def probeCells(v: Column, cents: Array[Array[Double]], nprobe: Int): Column =
    slice(transform(array_sort(centroidEntries(v, cents)), e => e.getField("i")),
      1, nprobe)

  /** Lloyd's k-means over a DataFrame of (vec_id, v: array<double>) —
    * the learned coarse quantizer q34's label-cell stand-in lacks.
    * Deterministic: init = the k lowest-id vectors; each iteration is
    * one distributed assignment pass (cellCol — narrow, codegen'd) plus
    * a per-dimension mean (groupBy cell,pos — k·dim result rows to the
    * driver, trivially small for any real k/dim). Empty cells keep their
    * previous centroid. At 100 TB you fit on a sample; assignment cost
    * is the same narrow pass either way. */
  def kmeansCentroids(emb: DataFrame, k: Int, iters: Int = 5): Array[Array[Double]] = {
    var cents = emb.orderBy("vec_id").limit(k).select("v")
      .collect().map(_.getSeq[Double](0).toArray)
    for (_ <- 0 until iters) {
      val sums = emb.withColumn("cell", cellCol(col("v"), cents))
        .select(col("cell"), posexplode(col("v")))
        .groupBy("cell", "pos").agg(avg(col("col")).as("m"))
        .collect()
      val next = cents.map(_.clone())
      sums.foreach(r => next(r.getInt(0))(r.getInt(1)) = r.getDouble(2))
      cents = next
    }
    cents
  }

  /** IVF search with a learned quantizer: corpus vectors live in their
    * nearest cell; each query probes its `nprobe` nearest cells — an
    * equality join on the cell id (the same scale shape as q34, but the
    * cells adapt to the data instead of borrowing a label column).
    *
    * No broadcast hint on the query side: its size is nprobe× whatever
    * `queryFilter` selects, which the caller controls, not this method —
    * AQE broadcasts it when it actually fits and shuffle-joins otherwise.
    * `roundDp ≥ 0` rounds cosine BEFORE ranking (oracle hash parity —
    * both engines must rank the same values). */
  def ivfSearch(embeddings: DataFrame, queryFilter: Column, k: Int,
                cents: Array[Array[Double]], nprobe: Int = 1,
                roundDp: Int = -1): DataFrame = {
    // materialize the assignment once: the corpus side and the query
    // side both consume it, and ReuseExchange does not fire across
    // AQE's broadcast conversion (same measured diamond as Dedup)
    val e = embeddings
      .withColumn("cell", cellCol(col("v"), cents))
      .withColumn("nrm", Vectors.norm2(col("v")))
      .localCheckpoint()
    val q = e.where(queryFilter)
      .select(explode(probeCells(col("v"), cents, nprobe)).as("cell"),
        col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"))
    val rawCos = Vectors.dot(col("qv"), col("v")) / (col("qn") * col("nrm"))
    val scored = e.join(q, "cell")
      .where(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("n_id"),
        (if (roundDp >= 0) round(rawCos, roundDp) else rawCos).as("cos"))
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("n_id").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select("q_id", "rank", "n_id", "cos")
  }

  /** Top-k per query among same-bucket candidates. `embeddings` needs
    * (vec_id, v: array<double>). `multiProbe` additionally probes every
    * bucket at Hamming distance 1 from the query's bucket (nBits extra
    * probes — the standard recall/cost dial: each flipped bit rescues
    * neighbors that fell on the other side of one hyperplane). */
  def search(embeddings: DataFrame, queryFilter: Column, k: Int,
             dim: Int, nBits: Int = 8, seed: Long = 42L,
             multiProbe: Boolean = false, roundDp: Int = -1): DataFrame = {
    val e = embeddings
      .withColumn("bucket", bucketCol(col("v"), dim, nBits, seed))
      .withColumn("nrm", Vectors.norm2(col("v")))
    val probes: Column => Column = b =>
      if (!multiProbe) array(b)
      else array(b +: Seq.tabulate(nBits)(p => b.bitwiseXOR(lit(1L << p))): _*)
    val q = e.where(queryFilter)
      .select(explode(probes(col("bucket"))).as("bucket"),
        col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"))
    // no broadcast hint: the probe side is (nBits+1)× the filtered query
    // count — AQE broadcasts when it fits, shuffles when it does not
    val rawCos = Vectors.dot(col("qv"), col("v")) / (col("qn") * col("nrm"))
    val scored = e.join(q, "bucket")
      .where(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("n_id"),
        (if (roundDp >= 0) round(rawCos, roundDp) else rawCos).as("cos"))
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("n_id").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select("q_id", "rank", "n_id", "cos")
  }

  /** Bucket-assignment table (vec_id, v, bucket, nrm) over a prepared
    * embedding frame — q69's pre-materialization lineage, exposed as a
    * named builder so PlanSpec's anti-pattern audit can see the subtree
    * that localCheckpoint truncates out of the declared query's plan. */
  def bucketTable(embeddings: DataFrame, dim: Int,
                  nBits: Int = 8, seed: Long = 42L): DataFrame =
    embeddings
      .withColumn("bucket", bucketCol(col("v"), dim, nBits, seed))
      .withColumn("nrm", Vectors.norm2(col("v")))

  /** The centroid constants as a SQL CTE body (one row per centroid) —
    * the SAME doubles as the Spark plan's literals, so both engines
    * assign cells from identical inputs. */
  private[ops] def centroidsSqlCte(cents: Array[Array[Double]]): String =
    cents.zipWithIndex.map { case (c, i) =>
      s"SELECT $i AS i, ${c.mkString("[", ", ", "]")}::DOUBLE[] AS c"
    }.mkString("\nUNION ALL\n")

  /** The hyperplane constants as a SQL CTE body — generated from the
    * SAME planeComponent values the Spark plan bakes in. */
  private def planesSqlCte(dim: Int, nBits: Int, seed: Long): String =
    (0 until nBits).map { p =>
      val c = (0 until dim).map(j => planeComponent(seed, p, j))
      s"SELECT $p AS p, ${c.mkString("[", ", ", "]")}::DOUBLE[] AS c"
    }.mkString("\nUNION ALL\n")

  /** Gate query for the learned-IVF path: assignment (cellCol), probe
    * selection (probeCells) and the cell-equality search join, with the
    * quantizer's fitted centroids baked as literals on BOTH engines
    * (see [[AnnCentroids]]). The oracle mirrors every stage: per-vector
    * argmin cell over the centroid list, top-nprobe probe cells, cosine
    * scoring rounded to 5 dp before ranking. */
  val defs: Seq[QueryDef] = Seq(
    QueryDef("q63_ann_learned_ivf",
      (s, d) => {
        val e = Tables.embeddings(s, d)
          .select(col("vec_id"), Vectors.asDouble(col("embedding")).as("v"))
        ivfSearch(e, col("vec_id") < 5, k = 3, AnnCentroids.fitted,
            nprobe = 4, roundDp = 5)
          .orderBy("q_id", "rank")
      },
      Some(s"""WITH cents AS (
              |${centroidsSqlCte(AnnCentroids.fitted)}),
              |e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
              |d AS (
              |  SELECT e.vec_id, cents.i,
              |    list_sum(list_transform(range(1, ${AnnCentroids.fitted.head.length + 1}),
              |      j -> (e.v[j] - cents.c[j]) * (e.v[j] - cents.c[j]))) AS d2
              |  FROM e CROSS JOIN cents),
              |rnk AS (
              |  SELECT vec_id, i,
              |    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2 ASC, i ASC) AS rn
              |  FROM d),
              |corpus AS (
              |  SELECT e.vec_id, e.v, r.i AS cell
              |  FROM e JOIN rnk r ON r.vec_id = e.vec_id AND r.rn = 1),
              |probes AS (
              |  SELECT e.vec_id AS q_id, e.v AS qv, r.i AS cell
              |  FROM e JOIN rnk r ON r.vec_id = e.vec_id AND r.rn <= 4
              |  WHERE e.vec_id < 5),
              |scored AS (
              |  SELECT p.q_id, c.vec_id AS n_id,
              |    round(list_dot_product(p.qv, c.v) /
              |      (sqrt(list_dot_product(p.qv, p.qv)) * sqrt(list_dot_product(c.v, c.v))), 5) AS cos
              |  FROM probes p JOIN corpus c ON c.cell = p.cell AND c.vec_id <> p.q_id)
              |SELECT q_id, rank, n_id, cos FROM (
              |  SELECT q_id, n_id, cos,
              |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id ASC) AS rank
              |  FROM scored) t
              |WHERE rank <= 3
              |ORDER BY q_id, rank""".stripMargin)),

    // Multi-probe hyperplane LSH — the OTHER learned-free ANN scale
    // path: bucket = sign bits of 8 seeded ±1-plane projections, search
    // probes the query's bucket plus every Hamming-1 neighbor (the
    // recall dial AnnSpec measures). The oracle bakes the identical
    // plane constants and mirrors bucket assignment, probe expansion
    // (xor per bit) and ranked cosine scoring. A corpus vector sits in
    // exactly ONE bucket and the 9 probe values are distinct, so no
    // DISTINCT is needed on either engine.
    QueryDef("q66_ann_lsh_multiprobe",
      (s, d) => {
        val e = Tables.embeddings(s, d)
          .select(col("vec_id"), Vectors.asDouble(col("embedding")).as("v"))
        search(e, col("vec_id") < 5, k = 3, dim = 64, nBits = 8, seed = 42L,
            multiProbe = true, roundDp = 5)
          .orderBy("q_id", "rank")
      },
      Some(s"""WITH planes AS (
              |${planesSqlCte(64, 8, 42L)}),
              |e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
              |bk AS (
              |  SELECT e.vec_id,
              |    CAST(SUM(CASE WHEN list_dot_product(e.v, planes.c) >= 0
              |                  THEN (1::BIGINT << planes.p) ELSE 0 END) AS BIGINT) AS bucket
              |  FROM e CROSS JOIN planes GROUP BY e.vec_id),
              |eb AS (SELECT e.vec_id, e.v, bk.bucket
              |       FROM e JOIN bk ON bk.vec_id = e.vec_id),
              |probes AS (
              |  SELECT q.vec_id AS q_id, q.v AS qv,
              |    unnest([q.bucket, xor(q.bucket, 1), xor(q.bucket, 2), xor(q.bucket, 4),
              |            xor(q.bucket, 8), xor(q.bucket, 16), xor(q.bucket, 32),
              |            xor(q.bucket, 64), xor(q.bucket, 128)]) AS bucket
              |  FROM eb q WHERE q.vec_id < 5),
              |scored AS (
              |  SELECT p.q_id, c.vec_id AS n_id,
              |    round(list_dot_product(p.qv, c.v) /
              |      (sqrt(list_dot_product(p.qv, p.qv)) * sqrt(list_dot_product(c.v, c.v))), 5) AS cos
              |  FROM probes p JOIN eb c ON c.bucket = p.bucket AND c.vec_id <> p.q_id)
              |SELECT q_id, rank, n_id, cos FROM (
              |  SELECT q_id, n_id, cos,
              |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id ASC) AS rank
              |  FROM scored) t
              |WHERE rank <= 3
              |ORDER BY q_id, rank""".stripMargin)),

    // Embedding near-dup WITHOUT a label column — the production
    // answer q30 cannot give when no natural blocking key exists: block
    // on the hyperplane-LSH bucket (geometry-derived, 8 bits → ~256
    // balanced cells), all-pairs cosine only within a bucket. The
    // bucket table is materialized once (both self-join sides — the
    // measured ReuseExchange diamond); a mass-duplicate bucket is a hot
    // JOIN partition (AQE-splittable), never a driver-side array.
    QueryDef("q69_cosine_neardup_lsh",
      (s, d) => {
        val e = bucketTable(
          Tables.embeddings(s, d)
            .select(col("vec_id"), Vectors.asDouble(col("embedding")).as("v")),
          dim = 64, nBits = 8, seed = 42L)
          .localCheckpoint()
        val a = e.select(col("bucket"), col("vec_id").as("id_a"),
          col("v").as("va"), col("nrm").as("na"))
        val b = e.select(col("bucket"), col("vec_id").as("id_b"),
          col("v").as("vb"), col("nrm").as("nb"))
        a.join(b, "bucket").where(col("id_a") < col("id_b"))
          .select(col("id_a"), col("id_b"),
            round(Vectors.dot(col("va"), col("vb")) / (col("na") * col("nb")), 5).as("cos"))
          .where(col("cos") > 0.4)
          .orderBy("id_a", "id_b")
      },
      Some(s"""WITH planes AS (
              |${planesSqlCte(64, 8, 42L)}),
              |e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
              |bk AS (
              |  SELECT e.vec_id,
              |    CAST(SUM(CASE WHEN list_dot_product(e.v, planes.c) >= 0
              |                  THEN (1::BIGINT << planes.p) ELSE 0 END) AS BIGINT) AS bucket
              |  FROM e CROSS JOIN planes GROUP BY e.vec_id),
              |eb AS (SELECT e.vec_id, e.v, bk.bucket
              |       FROM e JOIN bk ON bk.vec_id = e.vec_id),
              |scored AS (
              |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
              |    round(list_dot_product(a.v, b.v) /
              |      (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 5) AS cos
              |  FROM eb a JOIN eb b ON a.bucket = b.bucket AND a.vec_id < b.vec_id)
              |SELECT id_a, id_b, cos FROM scored WHERE cos > 0.4
              |ORDER BY id_a, id_b""".stripMargin))
  )
}
