package graft.ops

import graft.functions.VectorFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Similarity search over embedding columns (SURVEY §2 D3).
  *
  * Brute force is the exact baseline: broadcast the (small) query set, fuse
  * cosine into the probe-side scan with a codegen'd expression, and take
  * per-query top-k through a rank filter — Spark ≥3.5 rewrites that into
  * WindowGroupLimit, i.e. per-partition top-k before the shuffle, so the
  * shuffle carries k rows per (query, partition), not the full N×Q cross
  * product.
  *
  * The scale path is SRP-LSH: 16 sign bits from hash-derived hyperplanes
  * bucket the corpus; queries probe their own bucket plus all 1-bit-flip
  * neighbors (multiprobe), turning a 100 TB scan per query into a bucketed
  * join that touches ~ (P+1)/2^P of the corpus.
  */
object Similarity {

  /** Exact top-k cosine neighbors for each query row. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val q = broadcast(queries.select(col("vec_id").as("qid"), col("embedding").as("qemb")))
    val scored = corpus
      .join(q, col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("nid"), vec_cosine(col("qemb"), col("embedding")).as("sim"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("nid").asc)
    // long rn: DuckDB ROW_NUMBER() is BIGINT; keep the oracle dtype-exact
    scored
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
  }

  /** Oracle-shaped output: (qid, rn, simr) — neighbor ids excluded so a rank
    * swap between float-identical sims cannot change the result set.
    */
  def bruteForceTopKRounded(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame =
    bruteForceTopK(corpus, queries, k)
      .select(col("qid"), col("rn"), round(col("sim"), 5).as("simr"))
      .orderBy(col("qid"), col("rn"))

  def bruteForceSql(maxQid: Long, k: Int): String =
    s"""WITH exploded AS (
       |  SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS e,
       |         generate_subscripts(embedding, 1) AS i
       |  FROM embeddings
       |), norms AS (
       |  SELECT vec_id, SUM(e * e) AS nn FROM exploded GROUP BY vec_id
       |), dots AS (
       |  SELECT q.vec_id AS qid, d.vec_id AS nid, SUM(q.e * d.e) AS dot
       |  FROM exploded q JOIN exploded d ON q.i = d.i AND q.vec_id < 10 AND d.vec_id <> q.vec_id
       |  GROUP BY 1, 2
       |), sims AS (
       |  SELECT qid, nid,
       |    CASE WHEN nq.nn = 0 OR nd.nn = 0 THEN 0.0
       |         ELSE dot / (sqrt(nq.nn) * sqrt(nd.nn)) END AS sim
       |  FROM dots JOIN norms nq ON qid = nq.vec_id JOIN norms nd ON nid = nd.vec_id
       |)
       |SELECT qid, rn, round(sim, 5) AS simr FROM (
       |  SELECT qid, sim, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, nid ASC) AS rn
       |  FROM sims) t
       |WHERE rn <= $k ORDER BY qid, rn""".stripMargin

  /** D2 embedding flavor: near-duplicate pairs by cosine >= threshold.
    * Exact all-pairs here (oracle-checkable); at corpus scale route the pair
    * generation through [[srpPostings]] buckets first — same filter, LSH-
    * bounded candidate set.
    */
  def embeddingDupPairs(emb: DataFrame, threshold: Double): DataFrame = {
    // precompute norms once per vector: the pair loop then does one dot
    // instead of dot+two norms (1/3 of the flops of a fused cosine per pair)
    val normed = emb.select(
      col("vec_id"),
      col("embedding"),
      sqrt(vec_dot(col("embedding"), col("embedding"))).as("nrm")
    )
    val a = normed.select(col("vec_id").as("d1"), col("embedding").as("e1"), col("nrm").as("n1"))
    val b = normed.select(col("vec_id").as("d2"), col("embedding").as("e2"), col("nrm").as("n2"))
    a.join(b, col("d1") < col("d2"))
      .select(
        col("d1"),
        col("d2"),
        round(
          when(col("n1") === 0.0 || col("n2") === 0.0, 0.0)
            .otherwise(vec_dot(col("e1"), col("e2")) / (col("n1") * col("n2"))),
          5
        ).as("simr")
      )
      .filter(col("simr") >= threshold)
  }

  /** Scale-shaped near-dup pairs: SRP-LSH bucket candidates (id-only postings
    * join — embeddings rejoin only for the surviving candidates), exact
    * cosine verification, identical output to [[embeddingDupPairs]] when the
    * (bits, tables) family catches every true pair (deterministic planes ⇒
    * reproducible recall; asserted against the all-pairs formulation in
    * OpsSpec and by the DuckDB oracle).
    *
    * Regime note, measured: at τ=0.4 over dense 64-dim embeddings the bit
    * agreement probability of a THRESHOLD pair (1 - arccos(.4)/π ≈ .63) is
    * barely above a random pair's (.5), so no (bits, tables) both prunes
    * hard and keeps recall — the operator is intrinsically near-quadratic at
    * this τ; bits=2/tables=20 holds recall 1.0 at sf0.001-0.1. What the
    * bucketed shape buys at 100 TB is the PLAN: an equality join on
    * (table, bucket) — shuffle-partitionable, AQE-skew-splittable, no
    * driver-side broadcast of the corpus — where the BNLJ cartesian pins the
    * whole corpus through one broadcast. At dedup-realistic thresholds
    * (τ ≥ 0.8, p_bit ≈ .8) the same operator prunes ~40x per table.
    */
  def embeddingDupPairsViaLsh(emb: DataFrame, threshold: Double, dim: Int,
                              bits: Int = 2, tables: Int = 20): DataFrame = {
    val cands = embeddingLshCandidates(emb, dim, bits, tables)
    val normed = emb.select(
      col("vec_id"),
      col("embedding"),
      sqrt(vec_dot(col("embedding"), col("embedding"))).as("nrm")
    )
    cands
      .join(normed.select(col("vec_id").as("d1"), col("embedding").as("e1"), col("nrm").as("n1")), "d1")
      .join(normed.select(col("vec_id").as("d2"), col("embedding").as("e2"), col("nrm").as("n2")), "d2")
      .select(
        col("d1"),
        col("d2"),
        round(
          when(col("n1") === 0.0 || col("n2") === 0.0, 0.0)
            .otherwise(vec_dot(col("e1"), col("e2")) / (col("n1") * col("n2"))),
          5
        ).as("simr")
      )
      .filter(col("simr") >= threshold)
  }

  /** Corpus ∪ a deterministically perturbed copy of itself: each vector gets a
    * twin at `vec_id + idOffset` with per-dimension multiplicative noise
    * `1 + ((vec_id*31 + j) % 7 - 3)/1000` (±0.3%), computed in double and
    * rounded through float exactly like stored embeddings. Twin pairs land at
    * cosine ≈ 0.99998 while every cross pair keeps its original sim (≤ 0.61
    * on this corpus) — a planted ground truth for the tight-τ dedup regime,
    * replayable in DuckDB with the same integer arithmetic.
    */
  /** Twin-id offset that can never collide with a real vec_id: max + 1.
    * Computed from the data (one tiny agg) so the construction stays valid
    * at any corpus size — a fixed constant would alias twins onto real rows
    * once the corpus passes it. The SQL mirror is the same scalar subquery.
    */
  def plantedOffset(emb: DataFrame): Long =
    emb.agg(max(col("vec_id"))).head().getLong(0) + 1L

  def withPlantedDups(emb: DataFrame, idOffset: Long): DataFrame = {
    // Bind the noise pattern to the ORIGINAL vec_id under a distinct name:
    // with `(vec_id + offset).as("vec_id")` in the same select, Spark's
    // lateral-column-alias resolution silently rebinds col("vec_id") inside
    // the transform to the NEW offset id, desyncing the noise from the SQL
    // mirror (which perturbs by the original id). Twin-pair cosines hid the
    // desync below the 5-dp rounding; argmax-shaped consumers (SemDeDup
    // cluster assignment) exposed it.
    val src = emb.select(col("vec_id").as("src_id"), col("embedding"))
    val perturbed = src.select(
      (col("src_id") + lit(idOffset)).as("vec_id"),
      transform(
        col("embedding"),
        (x, j) =>
          (x.cast(DoubleType) *
            (lit(1.0) + ((col("src_id") * 31 + j) % 7 - 3).cast(DoubleType) * lit(0.001)))
            .cast(FloatType)
      ).as("embedding"))
    emb.select(col("vec_id"), col("embedding")).unionByName(perturbed)
  }

  /** DuckDB mirror of [[withPlantedDups]] + [[embeddingDupPairsSql]]: the
    * all-pairs formulation over the planted corpus at threshold τ.
    */
  def plantedDupPairsSql(threshold: Double): String =
    s"""WITH base AS (
       |  SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v,
       |         generate_subscripts(embedding, 1) AS i
       |  FROM embeddings
       |), pert AS (
       |  SELECT vec_id + (SELECT MAX(vec_id) + 1 FROM embeddings) AS vec_id,
       |         CAST(CAST(v * (1 + ((vec_id * 31 + (i - 1)) % 7 - 3) * 0.001) AS FLOAT) AS DOUBLE) AS v,
       |         i
       |  FROM base
       |), e AS (SELECT * FROM base UNION ALL SELECT * FROM pert),
       |n AS (SELECT vec_id, SUM(v*v) AS nn FROM e GROUP BY 1),
       |d AS (
       |  SELECT a.vec_id AS d1, b.vec_id AS d2, SUM(a.v*b.v) AS dot
       |  FROM e a JOIN e b ON a.i = b.i AND a.vec_id < b.vec_id GROUP BY 1, 2
       |)
       |SELECT d1, d2, round(dot / (sqrt(n1.nn) * sqrt(n2.nn)), 5) AS simr
       |FROM d JOIN n n1 ON d1 = n1.vec_id JOIN n n2 ON d2 = n2.vec_id
       |WHERE round(dot / (sqrt(n1.nn) * sqrt(n2.nn)), 5) >= $threshold""".stripMargin

  /** The SRP-bucket candidate pair set (pre-verification) — exposed so the
    * suite can assert the pruning regime directly: at dedup-realistic
    * thresholds (τ ≥ 0.8, bits=8) candidate count must be ≪ N²/2.
    */
  def embeddingLshCandidates(emb: DataFrame, dim: Int, bits: Int, tables: Int): DataFrame = {
    val posts = srpPostings(emb, "id", "emb", dim, bits, tables)
      .select(col("tbl"), col("bucket"), col("id"))
    posts.as("x")
      .join(posts.as("y"),
        col("x.tbl") === col("y.tbl") && col("x.bucket") === col("y.bucket") && col("x.id") < col("y.id"))
      .select(col("x.id").as("d1"), col("y.id").as("d2"))
      .distinct()
  }

  def embeddingDupPairsSql(threshold: Double, sampleCap: Long = Long.MaxValue): String =
    s"""WITH e AS (
       |  SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v,
       |         generate_subscripts(embedding, 1) AS i
       |  FROM embeddings${if (sampleCap != Long.MaxValue) s" WHERE vec_id < $sampleCap" else ""}
       |), n AS (SELECT vec_id, SUM(v*v) AS nn FROM e GROUP BY 1),
       |d AS (
       |  SELECT a.vec_id AS d1, b.vec_id AS d2, SUM(a.v*b.v) AS dot
       |  FROM e a JOIN e b ON a.i = b.i AND a.vec_id < b.vec_id GROUP BY 1, 2
       |)
       |SELECT d1, d2, round(dot / (sqrt(n1.nn) * sqrt(n2.nn)), 5) AS simr
       |FROM d JOIN n n1 ON d1 = n1.vec_id JOIN n n2 ON d2 = n2.vec_id
       |WHERE round(dot / (sqrt(n1.nn) * sqrt(n2.nn)), 5) >= $threshold""".stripMargin

  // --------------------------------------------------------------------- IVF

  /** IVF (inverted-file) index: k-means-style centroids trained with a few
    * Lloyd iterations entirely in DataFrames — no MLlib, no driver-side data
    * beyond the k×dim centroid table (which is broadcast, exactly what IVF
    * needs anyway). Deterministic: initial centroids are the first k vectors
    * by id.
    *
    * At corpus scale this is the classic ANN layout: one shuffle per Lloyd
    * iteration (groupBy cluster), then search probes only `nprobe` of the k
    * cells — a 100 TB corpus scan becomes nprobe/k of the data per query.
    */
  def ivfCentroids(corpus: DataFrame, k: Int, iters: Int = 3): DataFrame = {
    val spark = corpus.sparkSession
    val (cids, m, dim) = trainCentroids(corpus, k, iters)
    val rows = cids.indices.map { i =>
      org.apache.spark.sql.Row(cids(i), (0 until dim).map(j => m(i * dim + j).toFloat))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(
        StructField("cid", IntegerType, nullable = false),
        StructField("centroid", ArrayType(FloatType, containsNull = false), nullable = false))))
  }

  /** Lloyd training with the centroid state held on the DRIVER (k×dim
    * doubles — the data IVF keeps driver-side by design): each iteration is
    * exactly ONE Spark job — a map-only [[graft.functions.NearestCentroidExpr]]
    * assignment fused into a partial-aggregated (cid, i) mean, collecting
    * k×dim rows. No checkpoints, no window re-id, no per-iteration shuffle
    * beyond the k×dim aggregate. Means are rounded through float like the
    * previous DataFrame formulation (`cast("float")`) so trained centroids
    * are bit-identical to it.
    */
  private[graft] def trainCentroids(corpus: DataFrame, k: Int, iters: Int): (Array[Int], Array[Double], Int) = {
    import graft.functions.VectorFunctions.nearest_centroid
    val first = corpus.orderBy(col("vec_id")).limit(k).select(col("embedding")).collect()
    require(first.nonEmpty, "empty corpus")
    val dim = first.head.getSeq[Float](0).length
    var cids = Array.range(0, first.length)
    var m = new Array[Double](first.length * dim)
    for (i <- first.indices) {
      val v = first(i).getSeq[Float](0)
      var j = 0
      while (j < math.min(v.length, dim)) { m(i * dim + j) = v(j).toDouble; j += 1 }
    }
    // One fused pass per iteration (the classic k-means partial-agg loop):
    // each partition folds its rows into (count, sum-vector) per cell with
    // primitive-array arithmetic, partials merge on the DRIVER in partition-
    // index order — deterministic, unlike shuffle-fetch-ordered agg merges.
    // k×dim partials per partition is the map-side-combine shape that holds
    // at 1000 executors.
    val spark = corpus.sparkSession
    import spark.implicits._
    val vecs = corpus.select(col("embedding")).as[Array[Float]]
    for (_ <- 0 until iters) {
      val curCids = cids
      val curM = m
      val k2 = curCids.length
      val partials = vecs.mapPartitions { it =>
        val counts = new Array[Long](k2)
        val sums = new Array[Double](k2 * dim)
        while (it.hasNext) {
          val v = it.next()
          // ragged vectors would silently skew the per-cell mean (the divisor
          // is the row count, not a per-dimension count) — reject them here
          if (v.length != dim)
            throw new IllegalArgumentException(
              s"embedding length ${v.length} != $dim: ragged embeddings are not supported")
          val n = dim
          // argmax cosine, ties to first (lowest cid) — NearestCentroidExpr semantics
          var best = Double.NegativeInfinity
          var bi = -1
          var c = 0
          while (c < k2) {
            val base = c * dim
            var dot = 0.0; var na = 0.0; var nb = 0.0
            var j = 0
            while (j < n) {
              val x = v(j).toDouble; val y = curM(base + j)
              dot += x * y; na += x * x; nb += y * y
              j += 1
            }
            val sim = if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
            if (sim > best) { best = sim; bi = c }
            c += 1
          }
          // all-NaN sims (a NaN embedding element) leave bi at -1: EXCLUDE
          // the row from training — folding NaN components into a cell's sum
          // would poison that centroid to all-NaN and silently evict every
          // real vector from it. At index time NearestCentroidExpr still
          // assigns such rows to the lowest cell.
          if (bi >= 0) {
            counts(bi) += 1
            var j = 0
            while (j < n) { sums(bi * dim + j) += v(j).toDouble; j += 1 }
          }
        }
        Iterator.single((counts, sums))
      }.collect()
      val counts = new Array[Long](k2)
      val sums = new Array[Double](k2 * dim)
      partials.foreach { case (pc, ps) =>
        var i = 0
        while (i < k2) { counts(i) += pc(i); i += 1 }
        i = 0
        while (i < k2 * dim) { sums(i) += ps(i); i += 1 }
      }
      val live = (0 until k2).filter(counts(_) > 0)
      val nm = new Array[Double](live.length * dim)
      for ((ci, idx) <- live.zipWithIndex) {
        var j = 0
        // float round-trip mirrors the old `cast("float")` centroid column
        while (j < dim) {
          nm(idx * dim + j) = (sums(ci * dim + j) / counts(ci)).toFloat.toDouble
          j += 1
        }
      }
      cids = live.map(curCids).toArray
      m = nm
    }
    (cids, m, dim)
  }

  /** Collect the (tiny) centroid table to a driver-side matrix, cids sorted
    * ascending so the expression's strict-`>` tie-break mirrors the old
    * `csim desc, cid asc` window ordering.
    */
  private def collectCentroids(centroids: DataFrame): (Array[Int], Array[Double], Int) = {
    val rows = centroids
      .select(col("cid").cast("int"), col("centroid"))
      .orderBy(col("cid"))
      .collect()
    require(rows.nonEmpty, "empty centroid table")
    val dim = rows.head.getSeq[Float](1).length
    val cids = new Array[Int](rows.length)
    val m = new Array[Double](rows.length * dim)
    var i = 0
    while (i < rows.length) {
      cids(i) = rows(i).getInt(0)
      val v = rows(i).getSeq[Float](1)
      var j = 0
      while (j < math.min(v.length, dim)) { m(i * dim + j) = v(j).toDouble; j += 1 }
      i += 1
    }
    (cids, m, dim)
  }

  /** Nearest centroid per corpus row — map-only: one fused codegen argmax
    * over the driver-collected k×dim matrix, no join, no window, no
    * exchange (PlanShapeSpec pins this). The k×dim collect per Lloyd
    * iteration is the data IVF keeps driver-side by design.
    */
  private[graft] def assignToCentroid(corpus: DataFrame, centroids: DataFrame): DataFrame = {
    val (cids, m, dim) = collectCentroids(centroids)
    corpus.select(
      col("vec_id"),
      col("embedding"),
      graft.functions.VectorFunctions.nearest_centroid(col("embedding"), cids, m, dim).as("cid"))
  }

  /** IVF approximate top-k: probe the `nprobe` closest cells per query.
    * Both assignment sides are map-only codegen over the driver-side
    * centroid matrix — corpus rows get one cell id
    * ([[graft.functions.NearestCentroidExpr]]), query rows explode into
    * their `nprobe` cells ([[graft.functions.TopCentroidsExpr]]) — so the
    * only joins left are the broadcast probe-to-cell equality join and the
    * final top-k, with no cross product anywhere (PlanShapeSpec pins this).
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int, nCells: Int,
              nprobe: Int, iters: Int = 3): DataFrame = {
    import graft.functions.VectorFunctions.top_centroids
    val (cids, m, dim) = trainCentroids(corpus, nCells, iters)
    val cells = corpus.select(
      col("vec_id").as("nid"),
      col("embedding").as("nemb"),
      graft.functions.VectorFunctions.nearest_centroid(col("embedding"), cids, m, dim).as("cid"))
    val probes = queries.select(
      col("vec_id").as("qid"),
      col("embedding").as("qemb"),
      explode(top_centroids(col("embedding"), cids, m, dim, nprobe)).as("cid"))
    // no distinct: every corpus vector lives in exactly ONE cell and probe
    // cells are distinct per query, so (qid, nid) pairs are already unique —
    // unlike multi-table LSH, where the same pair collides repeatedly
    val scored = broadcast(probes)
      .join(cells, Seq("cid"))
      .filter(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"), vec_cosine(col("qemb"), col("nemb")).as("sim"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("nid").asc)
    scored.withColumn("rn", row_number().over(w).cast("long")).filter(col("rn") <= k)
  }

  /** Per-cluster corpus profile over seed-medoid cells (the `iters=0`
    * exactly-SQL-replayable regime shared with [[semanticDedup]]): assign
    * every vector map-only, then report (cid, n_vecs, Σ sim-to-centroid,
    * mean) with each similarity quantized to integer micro-units BEFORE the
    * sum — the established determinism pattern. The unsupervised
    * cluster-quality report a corpus curation run reads before deciding k /
    * τ for semantic dedup. Map-only assignment + one k-row aggregate.
    */
  def clusterProfile(corpus: DataFrame, k: Int): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val (cids, m, dim) = trainCentroids(corpus, k, iters = 0)
    val cents = cids.indices.map { i =>
      (cids(i), (0 until dim).map(j => m(i * dim + j).toFloat))
    }.toDF("cid", "cvec")
    corpus
      .select(col("vec_id"),
        col("embedding"),
        graft.functions.VectorFunctions.nearest_centroid(col("embedding"), cids, m, dim).as("cid"))
      .join(broadcast(cents), Seq("cid"))
      .select(col("cid"),
        round(lit(1e6) * vec_cosine(col("embedding"), col("cvec"))).cast("long").as("sim_micro"))
      .groupBy(col("cid"))
      .agg(count(lit(1)).as("n_vecs"), sum(col("sim_micro")).as("sum_sim_micro"))
      .select(col("cid"), col("n_vecs"), col("sum_sim_micro"),
        round(col("sum_sim_micro").cast(DoubleType) / col("n_vecs")).cast("long").as("mean_sim_micro"))
      .orderBy(col("cid"))
  }

  /** DuckDB mirror of [[clusterProfile]] (k seed-medoid cells over the raw
    * embeddings table).
    */
  def clusterProfileSql(k: Int): String =
    s"""WITH e AS (
       |  SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v,
       |         generate_subscripts(embedding, 1) AS i
       |  FROM embeddings
       |), seeds AS (
       |  SELECT vec_id, CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cid
       |  FROM (SELECT DISTINCT vec_id FROM e) t ORDER BY vec_id LIMIT $k
       |),
       |cent AS (SELECT s.cid, e.v, e.i FROM e JOIN seeds s ON e.vec_id = s.vec_id),
       |n AS (SELECT vec_id, SUM(v*v) AS nn FROM e GROUP BY 1),
       |cn AS (SELECT cid, SUM(v*v) AS cnn FROM cent GROUP BY 1),
       |cd AS (
       |  SELECT x.vec_id, c.cid, SUM(x.v * c.v) AS dot
       |  FROM e x JOIN cent c ON x.i = c.i GROUP BY 1, 2
       |),
       |sims AS (
       |  SELECT cd.vec_id, cd.cid,
       |    CASE WHEN n.nn = 0 OR cn.cnn = 0 THEN 0.0
       |         ELSE cd.dot / (sqrt(n.nn) * sqrt(cn.cnn)) END AS sim
       |  FROM cd JOIN n ON cd.vec_id = n.vec_id JOIN cn ON cd.cid = cn.cid
       |),
       |asg AS (
       |  SELECT vec_id, cid, sim FROM (
       |    SELECT vec_id, cid, sim,
       |      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sim DESC, cid ASC) AS rn
       |    FROM sims) t
       |  WHERE rn = 1
       |)
       |SELECT cid, COUNT(*) AS n_vecs,
       |  CAST(SUM(CAST(round(1e6 * sim) AS BIGINT)) AS BIGINT) AS sum_sim_micro,
       |  CAST(round(CAST(SUM(CAST(round(1e6 * sim) AS BIGINT)) AS DOUBLE) / COUNT(*)) AS BIGINT) AS mean_sim_micro
       |FROM asg GROUP BY cid ORDER BY cid""".stripMargin

  /** Hard-negative mining for contrastive training: for each query vector,
    * the top-k most-similar corpus vectors with a DIFFERENT label — the
    * near-but-wrong examples an embedding model trains against. Same
    * broadcast-probe scan as brute force plus the label guard; at corpus
    * scale route candidate generation through [[annTopK]]'s buckets or the
    * PQ scan and post-filter labels — semantics identical.
    */
  def hardNegatives(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val q = broadcast(queries.select(
      col("vec_id").as("qid"), col("embedding").as("qemb"), col("label").as("qlabel")))
    val scored = corpus
      .join(q, col("vec_id") =!= col("qid") && col("label") =!= col("qlabel"))
      .select(col("qid"), col("vec_id").as("nid"),
        vec_cosine(col("qemb"), col("embedding")).as("sim"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("nid").asc)
    scored.withColumn("rn", row_number().over(w).cast("long")).filter(col("rn") <= k)
  }

  def hardNegativesSql(maxQid: Long, k: Int): String =
    s"""WITH exploded AS (
       |  SELECT vec_id, label, CAST(unnest(embedding) AS DOUBLE) AS e,
       |         generate_subscripts(embedding, 1) AS i
       |  FROM embeddings
       |), norms AS (
       |  SELECT vec_id, SUM(e * e) AS nn FROM exploded GROUP BY vec_id
       |), dots AS (
       |  SELECT q.vec_id AS qid, d.vec_id AS nid, SUM(q.e * d.e) AS dot
       |  FROM exploded q JOIN exploded d
       |    ON q.i = d.i AND q.vec_id < $maxQid AND d.vec_id <> q.vec_id
       |    AND d.label <> q.label
       |  GROUP BY 1, 2
       |), sims AS (
       |  SELECT qid, nid,
       |    CASE WHEN nq.nn = 0 OR nd.nn = 0 THEN 0.0
       |         ELSE dot / (sqrt(nq.nn) * sqrt(nd.nn)) END AS sim
       |  FROM dots JOIN norms nq ON qid = nq.vec_id JOIN norms nd ON nid = nd.vec_id
       |)
       |SELECT qid, rn, round(sim, 5) AS simr FROM (
       |  SELECT qid, sim, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, nid ASC) AS rn
       |  FROM sims) t
       |WHERE rn <= $k ORDER BY qid, rn""".stripMargin

  // ------------------------------------------------------------------ PQ-ADC

  /** Per-subspace product-quantization codebooks: split the `dim`-dim space
    * into `mSub` contiguous subspaces and train `ks` spherical-k-means
    * centroids in each (same deterministic Lloyd pass as IVF —
    * [[trainCentroids]]; spherical because the engine's similarity is
    * cosine, the "spherical PQ" variant of Jégou et al. 2011's L2 recipe).
    * Returns one (cellIds, flatMatrix) pair per subspace; empty cells are
    * dropped, so per-subspace codebook sizes may differ — callers index
    * globally via running offsets.
    */
  private[graft] def pqCodebooks(corpus: DataFrame, dim: Int, mSub: Int, ks: Int,
                                 iters: Int): Seq[(Array[Int], Array[Double])] = {
    require(dim % mSub == 0, s"dim=$dim must divide into mSub=$mSub subspaces")
    val dsub = dim / mSub
    val spark = corpus.sparkSession
    import spark.implicits._
    // FUSED training: one seed collect + ONE corpus pass per Lloyd iteration
    // updating every subspace codebook simultaneously. A per-subspace
    // trainCentroids composition launches mSub·(1+iters) sequential Spark
    // jobs (128 at mSub=32, iters=3 — measured 9.3 s of mostly job overhead
    // on a 2000-vector fixture, and 32 redundant corpus scans per iteration
    // at corpus scale). The math below is value-identical to running
    // [[trainCentroids]] on each slice: same seed rows, same argmax-cosine
    // assignment (ties to first, zero-norm → 0.0, all-NaN rows excluded),
    // partials merged in partition-index order, per-cell means
    // float-round-tripped, empty cells dropped per subspace per iteration —
    // PqSpec asserts codebook equality against the sliced formulation.
    val first = corpus.orderBy(col("vec_id")).limit(ks).select(col("embedding")).collect()
    require(first.nonEmpty, "empty corpus")
    var books: Array[Array[Double]] = Array.tabulate(mSub) { s =>
      val m = new Array[Double](first.length * dsub)
      for (c <- first.indices) {
        val v = first(c).getSeq[Float](0)
        var j = 0
        while (j < dsub) { m(c * dsub + j) = v(s * dsub + j).toDouble; j += 1 }
      }
      m
    }
    val vecs = corpus.select(col("embedding")).as[Array[Float]]
    for (_ <- 0 until iters) {
      val curBooks = books
      val ksEff = curBooks.map(_.length / dsub)
      val offsets = ksEff.scanLeft(0)(_ + _)
      val kTot = offsets.last
      val partials = vecs.mapPartitions { it =>
        val counts = new Array[Long](kTot)
        val sums = new Array[Double](kTot * dsub)
        while (it.hasNext) {
          val v = it.next()
          if (v.length != dim)
            throw new IllegalArgumentException(
              s"embedding length ${v.length} != $dim: ragged embeddings are not supported")
          var s = 0
          while (s < mSub) {
            val m = curBooks(s)
            val k2 = m.length / dsub
            var best = Double.NegativeInfinity
            var bi = -1
            var c = 0
            while (c < k2) {
              val base = c * dsub
              var dot = 0.0; var na = 0.0; var nb = 0.0
              var j = 0
              while (j < dsub) {
                val x = v(s * dsub + j).toDouble; val y = m(base + j)
                dot += x * y; na += x * x; nb += y * y
                j += 1
              }
              val sim = if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
              if (sim > best) { best = sim; bi = c }
              c += 1
            }
            if (bi >= 0) {
              val g = offsets(s) + bi
              counts(g) += 1
              var j = 0
              while (j < dsub) { sums(g * dsub + j) += v(s * dsub + j).toDouble; j += 1 }
            }
            s += 1
          }
        }
        Iterator.single((counts, sums))
      }.collect()
      val counts = new Array[Long](kTot)
      val sums = new Array[Double](kTot * dsub)
      partials.foreach { case (pc, ps) =>
        var i = 0
        while (i < kTot) { counts(i) += pc(i); i += 1 }
        i = 0
        while (i < kTot * dsub) { sums(i) += ps(i); i += 1 }
      }
      books = Array.tabulate(mSub) { s =>
        val live = (0 until ksEff(s)).filter(c => counts(offsets(s) + c) > 0)
        val nm = new Array[Double](live.length * dsub)
        for ((ci, idx) <- live.zipWithIndex) {
          val g = offsets(s) + ci
          var j = 0
          while (j < dsub) {
            nm(idx * dsub + j) = (sums(g * dsub + j) / counts(g)).toFloat.toDouble
            j += 1
          }
        }
        nm
      }
    }
    books.toSeq.map(m => (Array.tabulate(m.length / dsub)(identity), m))
  }

  /** Product-quantization ADC top-k (Jégou et al. 2011, "Product
    * Quantization for Nearest Neighbor Search"): encode every corpus vector
    * as `mSub` small codebook indices, scan the CODES with per-query
    * asymmetric-distance lookup tables, then exactly re-rank the top
    * `nCand` candidates so the emitted top-`k` is exact whenever the true
    * neighbors survive candidate generation (tuned and asserted on the
    * fixture — the brute-force SQL is the oracle, same contract as IVF/LSH).
    *
    * Why this is THE 100 TB shape: the scan that touches every corpus row
    * reads `mSub` sub-centroid indices (4 bits each at ks=16 — a 16-byte
    * packed code vs the 256-byte dim-64 float embedding) + one precomputed
    * norm, and scores each candidate with `mSub` table lookups instead of
    * `dim` multiplies. Every stage stays inside whole-stage codegen:
    *   - encode: ONE fused [[graft.functions.PqEncodeExpr]] pass — map-only,
    *     no shuffle, run once and persistable (a per-subspace slice +
    *     nearest_centroid composition was measured blowing the 64 KB codegen
    *     method limit past 16 subspaces and falling back to interpreted);
    *   - reconstruction norm ||x̂||² = Σ_s ||c_{s,code_s}||² (additive under
    *     concatenation) folds over a literal norm table — map-only;
    *   - per-query LUT: one fused [[graft.functions.PqLutExpr]] pass, one
    *     row per QUERY (amortized across the corpus);
    *   - ADC scan: `aggregate` over the code array, `element_at` into the
    *     broadcast LUT — O(mSub) per pair;
    *   - exact re-rank touches only nCand·|queries| full embeddings.
    */
  def pqTopK(corpus: DataFrame, queries: DataFrame, k: Int, dim: Int,
             mSub: Int, ks: Int, nCand: Int, iters: Int = 3): DataFrame = {
    val dsub = dim / mSub
    val books = pqCodebooks(corpus, dim, mSub, ks, iters)
    val ksEff = books.map(_._1.length)
    val offsets = ksEff.scanLeft(0)(_ + _).toArray
    // flat codebook: row g spans doubles [g*dsub, (g+1)*dsub)
    val flat = new Array[Double](offsets.last * dsub)
    books.zipWithIndex.foreach { case ((_, m), s) =>
      System.arraycopy(m, 0, flat, offsets(s) * dsub, m.length)
    }
    val normsSq: Seq[Double] = (0 until offsets.last).map { g =>
      var nn = 0.0
      var j = 0
      while (j < dsub) { val v = flat(g * dsub + j); nn += v * v; j += 1 }
      nn
    }
    // encode: all mSub global code indices in ONE fused pass — map-only
    val codes = corpus.select(col("vec_id").as("nid"),
        graft.functions.VectorFunctions.pq_encode(col("embedding"), flat, offsets, dsub).as("code"))
      .withColumn("nrm2_hat",
        aggregate(col("code"), lit(0.0), (acc, g) => acc + element_at(typedlit(normsSq), g + 1)))
    // per-query ADC lookup table: lut[g] = dot(q_s, c_g) for row g's subspace s
    val probes = queries.select(col("vec_id").as("qid"),
      graft.functions.VectorFunctions.pq_lut(col("embedding"), flat, offsets, dsub).as("lut"))
    // ADC scan: approx cosine rank key = Σ_s lut[code_s] / ||x̂|| (the query
    // norm is constant per qid and cannot change the per-query ranking)
    val scored = codes.join(broadcast(probes), col("nid") =!= col("qid"))
      .select(col("qid"), col("nid"),
        (aggregate(col("code"), lit(0.0), (acc, g) => acc + element_at(col("lut"), g + 1)) /
          when(col("nrm2_hat") > 0, sqrt(col("nrm2_hat"))).otherwise(lit(1.0))).as("approx"))
    val wc = Window.partitionBy(col("qid")).orderBy(col("approx").desc, col("nid").asc)
    val cands = scored.withColumn("cr", row_number().over(wc)).filter(col("cr") <= nCand)
      .select(col("qid"), col("nid"))
    // exact re-rank of nCand·|queries| candidates
    val qemb = queries.select(col("vec_id").as("qid"), col("embedding").as("qemb"))
    val rescored = broadcast(cands)
      .join(corpus.select(col("vec_id").as("nid"), col("embedding").as("nemb")), Seq("nid"))
      .join(broadcast(qemb), Seq("qid"))
      .select(col("qid"), col("nid"), vec_cosine(col("qemb"), col("nemb")).as("sim"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("nid").asc)
    rescored.withColumn("rn", row_number().over(w).cast("long")).filter(col("rn") <= k)
  }

  /** IVF + PQ — the FAISS-style production ANN shape (IVFPQ, Jégou et al.
    * 2011 §V): the inverted file bounds WHICH corpus rows each query
    * touches (nprobe cells out of nCells), and product quantization bounds
    * WHAT each touched row costs (an `mSub`-lookup ADC score over a 16-byte
    * packed code instead of a `dim`-float dot product). Candidate
    * generation is a broadcast EQUALITY join on the cell id — unlike the
    * flat-PQ scan there is no nested-loop join anywhere, so at corpus scale
    * the probed fraction (~nprobe/nCells) of the code table is all that is
    * ever read per query batch. Exact re-rank of the top `nCand` keeps the
    * emitted top-k brute-force-exact at tuned fixture parameters (same
    * oracle contract as IVF / LSH / PQ).
    *
    * The corpus side (cid, code, nrm2_hat) is the persistable compressed
    * index: one map-only pass built from two broadcast codebook tables,
    * re-usable across query batches.
    */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, k: Int, dim: Int,
                nCells: Int, nprobe: Int, mSub: Int, ks: Int, nCand: Int,
                iters: Int = 3): DataFrame = {
    import graft.functions.VectorFunctions.{top_centroids, nearest_centroid, pq_encode, pq_lut}
    val dsub = dim / mSub
    val (cellIds, cellM, _) = trainCentroids(corpus, nCells, iters)
    val books = pqCodebooks(corpus, dim, mSub, ks, iters)
    val offsets = books.map(_._1.length).scanLeft(0)(_ + _).toArray
    val flat = new Array[Double](offsets.last * dsub)
    books.zipWithIndex.foreach { case ((_, m), s) =>
      System.arraycopy(m, 0, flat, offsets(s) * dsub, m.length)
    }
    val normsSq: Seq[Double] = (0 until offsets.last).map { g =>
      var nn = 0.0
      var j = 0
      while (j < dsub) { val v = flat(g * dsub + j); nn += v * v; j += 1 }
      nn
    }
    val cells = corpus.select(
      col("vec_id").as("nid"),
      nearest_centroid(col("embedding"), cellIds, cellM, dim).as("cid"),
      pq_encode(col("embedding"), flat, offsets, dsub).as("code"))
      .withColumn("nrm2_hat",
        aggregate(col("code"), lit(0.0), (acc, g) => acc + element_at(typedlit(normsSq), g + 1)))
    // probe cells and the per-query LUT broadcast SEPARATELY: exploding the
    // LUT into the (qid, cid) rows would replicate the K-double table
    // nprobe× per query in the broadcast — at a production batch of 10^6
    // queries × 64 probes that is the difference between a 4 GB and a
    // 256 GB build side. The LUT re-attaches per candidate via a second
    // broadcast hash join on qid and is projected away before any exchange.
    val probeCells = queries.select(
      col("vec_id").as("qid"),
      explode(top_centroids(col("embedding"), cellIds, cellM, dim, nprobe)).as("cid"))
    val luts = queries.select(
      col("vec_id").as("qid"),
      pq_lut(col("embedding"), flat, offsets, dsub).as("lut"))
    // every corpus vector lives in exactly ONE cell and probe cells are
    // distinct per query -> (qid, nid) already unique, no distinct needed
    val scored = broadcast(probeCells)
      .join(cells, Seq("cid"))
      .join(broadcast(luts), Seq("qid"))
      .filter(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"),
        (aggregate(col("code"), lit(0.0), (acc, g) => acc + element_at(col("lut"), g + 1)) /
          when(col("nrm2_hat") > 0, sqrt(col("nrm2_hat"))).otherwise(lit(1.0))).as("approx"))
    val wc = Window.partitionBy(col("qid")).orderBy(col("approx").desc, col("nid").asc)
    val cands = scored.withColumn("cr", row_number().over(wc)).filter(col("cr") <= nCand)
      .select(col("qid"), col("nid"))
    val qemb = queries.select(col("vec_id").as("qid"), col("embedding").as("qemb"))
    val rescored = broadcast(cands)
      .join(corpus.select(col("vec_id").as("nid"), col("embedding").as("nemb")), Seq("nid"))
      .join(broadcast(qemb), Seq("qid"))
      .select(col("qid"), col("nid"), vec_cosine(col("qemb"), col("nemb")).as("sim"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("nid").asc)
    rescored.withColumn("rn", row_number().over(w).cast("long")).filter(col("rn") <= k)
  }

  // ----------------------------------------------------------------- SRP-LSH

  /** Deterministic pseudo-random hyperplane component in [-1, 1): derived
    * from xxhash64(table, plane, dim) evaluated ON THE DRIVER (exact Spark
    * XxHash64 semantics), so every executor receives an identical
    * tables×bits×dim matrix as a codegen reference object with no
    * re-hashing per row.
    */
  def planeMatrix(dim: Int, bits: Int, tables: Int): Array[Double] = {
    import org.apache.spark.sql.catalyst.expressions.{Literal, XxHash64}
    val planes = new Array[Double](tables * bits * dim)
    var i = 0
    for (t <- 0 until tables; p <- 0 until bits; j <- 0 until dim) {
      val h = XxHash64(Seq(Literal(t), Literal(p), Literal(j)), 42L).eval(null).asInstanceOf[Long]
      val m = ((h % 2000001L) + 2000001L) % 2000001L // pmod
      planes(i) = m.toDouble / 1000000.0 - 1.0
      i += 1
    }
    planes
  }

  /** All (table, bucket) postings for a vector — standard multi-table LSH:
    * a true near pair escapes ALL tables with probability (1-p^bits)^tables,
    * so recall is tuned by adding tables (more shuffle volume) or dropping
    * bits (bigger buckets). The join shuffles on (table, bucket) — bounded
    * bucket sizes keep it skew-free at corpus scale. All signatures per row
    * come from ONE fused codegen pass ([[graft.functions.SrpSignaturesExpr]]).
    */
  def srpPostings(df: DataFrame, idAs: String, embAs: String, dim: Int, bits: Int, tables: Int): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
    val sigs = column(graft.functions.SrpSignaturesExpr(
      expression(col("embedding")), planeMatrix(dim, bits, tables), bits, tables, dim))
    df.select(col("vec_id").as(idAs), col("embedding").as(embAs), posexplode(sigs).as(Seq("tbl", "bucket")))
  }

  /** Approximate top-k via multi-table SRP-LSH bucket join. */
  def annTopK(corpus: DataFrame, queries: DataFrame, k: Int, dim: Int,
              bits: Int = 12, tables: Int = 8): DataFrame = {
    val cp = srpPostings(corpus, "nid", "nemb", dim, bits, tables)
    val qp = srpPostings(queries, "qid", "qemb", dim, bits, tables)
    val scored = broadcast(qp)
      .join(cp, Seq("tbl", "bucket"))
      .filter(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"), col("qemb"), col("nemb"))
      .distinct() // a pair can collide in several tables — score once
      .select(col("qid"), col("nid"), vec_cosine(col("qemb"), col("nemb")).as("sim"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("nid").asc)
    scored.withColumn("rn", row_number().over(w).cast("long")).filter(col("rn") <= k)
  }

  // ---------------------------------------------------------------- SemDeDup

  /** SemDeDup-style semantic dedup (SemDeDup, Abbas et al. 2023,
    * arXiv:2303.09540): cluster the embedding space, then look for
    * near-duplicate pairs ONLY within a cluster and drop the higher-id
    * member of every qualifying pair. This is the published cluster-then-
    * prune recipe used on web-scale corpora (LAION / CommonCrawl): with k
    * clusters the pairwise work drops from N²/2 to Σᵢ|cᵢ|²/2 ≈ N²/2k, and at
    * production scale k is chosen so clusters hold ~10³ docs, making the
    * within-cluster stage linear-ish in N.
    *
    * Plan shape (the part that must survive 100 TB): centroid assignment is
    * MAP-ONLY — the k×dim centroid table rides into [[graft.functions.NearestCentroidExpr]]
    * as a codegen reference object, exactly the IVF layout; no join, no
    * shuffle. The within-cluster pair stage is an EQUALITY self-join on the
    * cluster id (shuffle-partitionable, AQE-skew-splittable), with norms
    * precomputed once per row so each candidate pair costs one dot product.
    *
    * `iters = 0` pins centroids to the k lowest-vec_id seed vectors —
    * deterministic and exactly replayable in SQL, which is what the oracle
    * row uses. At corpus scale pass `iters > 0` for true Lloyd centroids
    * ([[trainCentroids]] — deterministic partial-agg k-means, one shuffle-free
    * fused pass per iteration); the operator's semantics and plan shape are
    * identical, only the centroid table changes.
    *
    * Output: one row per corpus vector — (vec_id, cid, removed) where
    * `removed` marks the vectors SemDeDup would delete.
    */
  /** The assignment stage of [[semanticDedup]], exposed pre-checkpoint so
    * specs can pin its map-only shape (a `nearest_centroid` Project straight
    * over the scan — no join, no shuffle).
    */
  def semanticAssign(corpus: DataFrame, k: Int, iters: Int): DataFrame = {
    import graft.functions.VectorFunctions.nearest_centroid
    val (cids, m, dim) = trainCentroids(corpus, k, iters)
    corpus.select(
      col("vec_id"),
      col("embedding"),
      nearest_centroid(col("embedding"), cids, m, dim).as("cid"))
  }

  def semanticDedup(corpus: DataFrame, k: Int, tau: Double, iters: Int = 0): DataFrame = {
    // localCheckpoint the assignment: it feeds BOTH sides of the cid
    // self-join AND the final survivor join, and Catalyst plans the three
    // consumers as three independent N·k assignment scans (no exchange to
    // reuse — the assignment is map-only by design). At stress scale the
    // assignment dominates, so recomputing it 3x triples the op.
    val assignPlan = semanticAssign(corpus, k, iters)
    val assigned = assignPlan.localCheckpoint(true, Dedup.ckptLevel(assignPlan))
    val normed = assigned.select(
      col("cid"), col("vec_id"), col("embedding"),
      sqrt(vec_dot(col("embedding"), col("embedding"))).as("nrm"))
    val lo = normed.select(col("cid"), col("vec_id").as("d1"),
      col("embedding").as("e1"), col("nrm").as("n1"))
    val hi = normed.select(col("cid"), col("vec_id").as("d2"),
      col("embedding").as("e2"), col("nrm").as("n2"))
    val removed = lo.join(hi, Seq("cid"))
      .filter(col("d1") < col("d2"))
      .filter(
        round(
          when(col("n1") === 0.0 || col("n2") === 0.0, 0.0)
            .otherwise(vec_dot(col("e1"), col("e2")) / (col("n1") * col("n2"))),
          5) >= tau)
      .select(col("d2").as("vec_id"))
      .distinct()
    assigned.select(col("vec_id"), col("cid"))
      .join(removed.withColumn("removed", lit(true)), Seq("vec_id"), "left_outer")
      .select(col("vec_id"), col("cid"), coalesce(col("removed"), lit(false)).as("removed"))
  }

  /** DuckDB mirror of [[withPlantedDups]] + [[semanticDedup]] with
    * `iters = 0`: seed centroids are the k lowest vec_ids (cell id = seed
    * rank, matching [[trainCentroids]]'s Array.range cell ids), assignment is
    * argmax cosine with ties to the lower cell id (ROW_NUMBER ORDER BY sim
    * DESC, cid ASC = the expression's strict `>` scan in ascending cid
    * order), and a vector is removed when some same-cluster vector with a
    * lower id sits at round(cosine, 5) ≥ τ.
    */
  def semanticDedupSql(k: Int, tau: Double): String =
    s"""WITH base AS (
       |  SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v,
       |         generate_subscripts(embedding, 1) AS i
       |  FROM embeddings
       |), pert AS (
       |  SELECT vec_id + (SELECT MAX(vec_id) + 1 FROM embeddings) AS vec_id,
       |         CAST(CAST(v * (1 + ((vec_id * 31 + (i - 1)) % 7 - 3) * 0.001) AS FLOAT) AS DOUBLE) AS v,
       |         i
       |  FROM base
       |), e AS (SELECT * FROM base UNION ALL SELECT * FROM pert),
       |seeds AS (
       |  SELECT vec_id, CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cid
       |  FROM (SELECT DISTINCT vec_id FROM e) t ORDER BY vec_id LIMIT $k
       |),
       |cent AS (SELECT s.cid, e.v, e.i FROM e JOIN seeds s ON e.vec_id = s.vec_id),
       |n AS (SELECT vec_id, SUM(v*v) AS nn FROM e GROUP BY 1),
       |cn AS (SELECT cid, SUM(v*v) AS cnn FROM cent GROUP BY 1),
       |cd AS (
       |  SELECT x.vec_id, c.cid, SUM(x.v * c.v) AS dot
       |  FROM e x JOIN cent c ON x.i = c.i GROUP BY 1, 2
       |),
       |asg AS (
       |  SELECT vec_id, cid FROM (
       |    SELECT cd.vec_id, cd.cid,
       |      ROW_NUMBER() OVER (PARTITION BY cd.vec_id ORDER BY
       |        CASE WHEN n.nn = 0 OR cn.cnn = 0 THEN 0.0
       |             ELSE cd.dot / (sqrt(n.nn) * sqrt(cn.cnn)) END DESC,
       |        cd.cid ASC) AS rn
       |    FROM cd JOIN n ON cd.vec_id = n.vec_id JOIN cn ON cd.cid = cn.cid) t
       |  WHERE rn = 1
       |),
       |pd AS (
       |  SELECT aa.vec_id AS d1, bb.vec_id AS d2, SUM(aa.v * bb.v) AS dot
       |  FROM e aa JOIN e bb ON aa.i = bb.i AND aa.vec_id < bb.vec_id
       |  JOIN asg a1 ON a1.vec_id = aa.vec_id
       |  JOIN asg a2 ON a2.vec_id = bb.vec_id AND a2.cid = a1.cid
       |  GROUP BY 1, 2
       |),
       |rm AS (
       |  SELECT DISTINCT d2 FROM pd
       |  JOIN n n1 ON d1 = n1.vec_id JOIN n n2 ON d2 = n2.vec_id
       |  WHERE round(CASE WHEN n1.nn = 0 OR n2.nn = 0 THEN 0.0
       |                   ELSE dot / (sqrt(n1.nn) * sqrt(n2.nn)) END, 5) >= $tau
       |)
       |SELECT a.vec_id, a.cid, (rm.d2 IS NOT NULL) AS removed
       |FROM asg a LEFT JOIN rm ON a.vec_id = rm.d2
       |ORDER BY a.vec_id""".stripMargin
}
