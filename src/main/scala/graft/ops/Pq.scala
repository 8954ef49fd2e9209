package graft.ops

import graft.{QueryDef, Tables}
import graft.functions.Vectors
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Product-quantization ANN (Jégou et al., TPAMI 2011 — the FAISS
  * IVF-PQ shape): corpus vectors are encoded to `m` small codes (one
  * per contiguous subspace, argmin over a per-subspace codebook) and
  * searched by Asymmetric Distance Computation — the query builds an
  * m×k lookup table of subspace distances ONCE, then every candidate
  * scores with m table lookups instead of a dim-length dot product.
  *
  * Why this is the 100 TB vector path: the search never touches the
  * raw corpus vectors. The index table it scans is (id, cell, m codes)
  * ≈ 20 bytes/vector vs 256+ for the floats — a 10×+ I/O reduction —
  * and candidate pruning comes from the SAME learned-IVF cell equality
  * join as q63 (AnnCentroids), so there is no cross join anywhere.
  * Full vectors are fetched ONLY for the top-`cand` rerank candidates
  * per query, a candidates-sized join back to the vector store (the
  * standard refetch-and-rerank contract).
  *
  * Everything is codegen'd Column algebra — codebooks ride the plan as
  * literals ([[PqCodebooks]]), encode/table/ADC are zip_with/aggregate
  * folds in fixed index order, so the DuckDB oracle ([[booksSqlCte]]
  * mirrored into ordered `list()` aggregates) sums in the identical
  * IEEE order. */
object Pq {

  private def books = PqCodebooks.books
  private def m = books.length
  private def dsub = books(0)(0).length

  /** Squared L2 between a vector column and a literal centroid — the
    * native fused loop (graft_l2sq), left fold in index order so the
    * oracle parity argument of q63 carries over bit-for-bit. */
  private def d2(sub: Column, cent: Array[Double]): Column =
    Vectors.l2sq(sub, array(cent.map(lit).toSeq: _*))

  /** Subspace `s` of a vector: dims s·dsub+1 … (s+1)·dsub (1-based). */
  private def sub(v: Column, s: Int): Column = slice(v, s * dsub + 1, dsub)

  /** Argmin code of subspace `s` — struct-ordering argmin, distance
    * first then index, exactly [[Ann.cellCol]]'s tiebreak. */
  private def subCode(v: Column, s: Int): Column =
    array_min(array(books(s).zipWithIndex.map { case (c, i) =>
      struct(d2(sub(v, s), c).as("d"), lit(i).as("i"))
    }.toSeq: _*)).getField("i")

  /** The m-code PQ encoding of a vector (m bytes in a real store). */
  def codesCol(v: Column): Column =
    array((0 until m).map(subCode(v, _)): _*)

  /** ADC lookup tables for a QUERY vector: tabs[s][i] = d2 between the
    * query's subspace s and codebook centroid i. m·k entries computed
    * once per query row. */
  def adcTabCol(v: Column): Column =
    array((0 until m).map { s =>
      array(books(s).map(c => d2(sub(v, s), c)).toSeq: _*)
    }: _*)

  /** Asymmetric distance: ordered fold over subspaces of the table
    * entry the candidate's code selects — m lookups per pair, fused
    * into one native loop ([[graft.functions.AdcDistance]]; the
    * composed zip_with/aggregate form evaluated two interpreted
    * lambdas per candidate PAIR on the index-scan side of the cell
    * join — the hottest expression of the search). */
  def adcDist(tabs: Column, codes: Column): Column =
    call_function("graft_adc", tabs, codes)

  /** IVF-PQ search: candidates from the learned-IVF cell join (query
    * probes its `nprobe` nearest cells), scored by ADC over the code
    * index, top-`cand` per query refetched and exactly reranked by
    * cosine. Output matches q63's (q_id, rank, n_id, cos).
    *
    * Both ranking stages round to `roundDp` BEFORE ranking with an
    * n_id tiebreak — both engines must rank identical values. */
  def pqSearch(embeddings: DataFrame, queryFilter: Column, k: Int,
               cents: Array[Array[Double]], nprobe: Int = 4,
               cand: Int = 50, roundDp: Int = 5): DataFrame = {
    // the scan side of the search: ~20 bytes/vector, no floats
    val idx = embeddings.select(col("vec_id").as("n_id"),
      Ann.cellCol(col("v"), cents).as("cell"),
      codesCol(col("v")).as("codes"))
    val q = embeddings.where(queryFilter)
      .select(col("vec_id").as("q_id"),
        explode(Ann.probeCells(col("v"), cents, nprobe)).as("cell"),
        adcTabCol(col("v")).as("tabs"))
    // a corpus vector lives in exactly one cell and probe cells are
    // distinct, so each (q, n) pair scores at most once — no DISTINCT
    val scored = idx.join(q, "cell").where(col("n_id") =!= col("q_id"))
      .select(col("q_id"), col("n_id"),
        round(adcDist(col("tabs"), col("codes")), roundDp).as("adist"))
    val wa = Window.partitionBy("q_id").orderBy(col("adist").asc, col("n_id").asc)
    val cands = scored.withColumn("arn", row_number().over(wa))
      .where(col("arn") <= cand)
      .select("q_id", "n_id")
    // rerank refetch: candidates-sized joins against the vector store
    val store = embeddings.select(col("vec_id").as("n_id"),
      col("v").as("nv"), Vectors.norm2(col("v")).as("nn"))
    val qv = embeddings.where(queryFilter).select(col("vec_id").as("q_id"),
      col("v").as("qv"), Vectors.norm2(col("v")).as("qn"))
    val rr = cands.join(store, "n_id").join(qv, "q_id")
      .select(col("q_id"), col("n_id"),
        round(Vectors.dot(col("qv"), col("nv")) / (col("qn") * col("nn")),
          roundDp).as("cos"))
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("n_id").asc)
    rr.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select("q_id", "rank", "n_id", "cos")
  }

  /** The codebook constants as a SQL CTE body: (s, i, c DOUBLE[]) —
    * the SAME doubles the Spark plan bakes in. */
  private[ops] def booksSqlCte: String =
    books.zipWithIndex.flatMap { case (b, s) =>
      b.zipWithIndex.map { case (c, i) =>
        s"SELECT $s AS s, $i AS i, ${c.mkString("[", ", ", "]")}::DOUBLE[] AS c"
      }
    }.mkString("\nUNION ALL\n")

  /** Gate: IVF-PQ over the embeddings corpus, queries vec_id < 5,
    * nprobe 4, 50 ADC candidates reranked to top 3 — the oracle
    * mirrors every stage (cell argmin, per-subspace code argmin, the
    * ordered ADC fold via nested ordered `list()` aggregates, both
    * rounded rankings). CTEs that feed several consumers are
    * MATERIALIZED: DuckDB inlines plain CTEs and would re-execute the
    * shared stages per reference (see SCALE.md's q90 note). */
  val defs: Seq[QueryDef] = Seq(
    QueryDef("q95_ann_pq_adc",
      (s, d) => {
        val e = Tables.embeddings(s, d)
          .select(col("vec_id"), Vectors.asDouble(col("embedding")).as("v"))
        pqSearch(e, col("vec_id") < 5, k = 3, AnnCentroids.fitted,
            nprobe = 4, cand = 50, roundDp = 5)
          .orderBy("q_id", "rank")
      },
      Some(s"""WITH books AS MATERIALIZED (
              |$booksSqlCte),
              |cents AS MATERIALIZED (
              |${Ann.centroidsSqlCte(AnnCentroids.fitted)}),
              |e AS MATERIALIZED (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
              |cd AS (
              |  SELECT e.vec_id, cents.i,
              |    list_sum(list_transform(range(1, ${AnnCentroids.fitted.head.length + 1}),
              |      j -> (e.v[j] - cents.c[j]) * (e.v[j] - cents.c[j]))) AS d2
              |  FROM e CROSS JOIN cents),
              |crnk AS MATERIALIZED (
              |  SELECT vec_id, i,
              |    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2 ASC, i ASC) AS rn
              |  FROM cd),
              |sub AS MATERIALIZED (
              |  SELECT e.vec_id, b.s, b.i,
              |    list_sum(list_transform(range(1, ${dsub + 1}),
              |      j -> (e.v[b.s * $dsub + j] - b.c[j]) * (e.v[b.s * $dsub + j] - b.c[j]))) AS d2
              |  FROM e CROSS JOIN books b),
              |codes AS MATERIALIZED (
              |  SELECT vec_id, list(code ORDER BY s) AS codes FROM (
              |    SELECT vec_id, s, i AS code FROM (
              |      SELECT vec_id, s, i,
              |        ROW_NUMBER() OVER (PARTITION BY vec_id, s ORDER BY d2 ASC, i ASC) AS rn
              |      FROM sub) t
              |    WHERE rn = 1) c
              |  GROUP BY vec_id),
              |tabs AS MATERIALIZED (
              |  SELECT vec_id, list(tab ORDER BY s) AS tabs FROM (
              |    SELECT vec_id, s, list(d2 ORDER BY i) AS tab
              |    FROM sub GROUP BY vec_id, s) t
              |  GROUP BY vec_id),
              |corpus AS (
              |  SELECT c.vec_id, r.i AS cell, c.codes
              |  FROM codes c JOIN crnk r ON r.vec_id = c.vec_id AND r.rn = 1),
              |probes AS (
              |  SELECT e.vec_id AS q_id, r.i AS cell, t.tabs
              |  FROM e
              |  JOIN crnk r ON r.vec_id = e.vec_id AND r.rn <= 4
              |  JOIN tabs t ON t.vec_id = e.vec_id
              |  WHERE e.vec_id < 5),
              |scored AS (
              |  SELECT p.q_id, c.vec_id AS n_id,
              |    round(list_sum(list_transform(range(1, ${m + 1}),
              |      s -> p.tabs[s][c.codes[s] + 1])), 5) AS adist
              |  FROM probes p JOIN corpus c ON c.cell = p.cell AND c.vec_id <> p.q_id),
              |cand AS (
              |  SELECT q_id, n_id FROM (
              |    SELECT q_id, n_id,
              |      ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY adist ASC, n_id ASC) AS arn
              |    FROM scored) t
              |  WHERE arn <= 50),
              |rr AS (
              |  SELECT cand.q_id, cand.n_id,
              |    round(list_dot_product(qe.v, ne.v) /
              |      (sqrt(list_dot_product(qe.v, qe.v)) * sqrt(list_dot_product(ne.v, ne.v))), 5) AS cos
              |  FROM cand
              |  JOIN e qe ON qe.vec_id = cand.q_id
              |  JOIN e ne ON ne.vec_id = cand.n_id)
              |SELECT q_id, rank, n_id, cos FROM (
              |  SELECT q_id, n_id, cos,
              |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id ASC) AS rank
              |  FROM rr) t
              |WHERE rank <= 3
              |ORDER BY q_id, rank""".stripMargin))
  )
}
