package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Product-quantization ANN: encode correctness against an independent
  * re-derivation, fixture recall of the ADC candidate stage, and layout
  * invariance.
  */
class PqSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]").appName("pq-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"
  private def emb = spark.read.parquet(s"$sf/embeddings.parquet")

  private val (dim, mSub, ks, dsub) = (64, 32, 16, 2)

  test("fused codebook training equals the per-subspace sliced formulation exactly") {
    val fused = Similarity.pqCodebooks(emb, dim, mSub, ks, iters = 3)
    for (s <- 0 until mSub) {
      val sub = emb.select(col("vec_id"),
        slice(col("embedding"), s * dsub + 1, dsub).as("embedding"))
      val (_, m, _) = Similarity.trainCentroids(sub, ks, iters = 3)
      assert(java.util.Arrays.equals(fused(s)._2, m),
        s"fused codebook for subspace $s diverged from the sliced trainCentroids run")
    }
  }

  test("pq_encode matches an independent argmax-cosine re-derivation; nrm2_hat is additive") {
    val books = Similarity.pqCodebooks(emb, dim, mSub, ks, iters = 3)
    val offsets = books.map(_._1.length).scanLeft(0)(_ + _).toArray
    val flat = new Array[Double](offsets.last * dsub)
    books.zipWithIndex.foreach { case ((_, m), s) =>
      System.arraycopy(m, 0, flat, offsets(s) * dsub, m.length)
    }
    val got = emb.orderBy(col("vec_id")).limit(20)
      .select(col("vec_id"), col("embedding"),
        graft.functions.VectorFunctions.pq_encode(col("embedding"), flat, offsets, dsub).as("code"))
      .collect()
    got.foreach { r =>
      val v = r.getSeq[Float](1).toArray
      val code = r.getSeq[Int](2)
      assert(code.length == mSub)
      for (s <- 0 until mSub) {
        // re-derive the argmax-cosine sub-assignment from scratch
        var best = Double.NegativeInfinity
        var bestG = offsets(s)
        for (g <- offsets(s) until offsets(s + 1)) {
          var dot = 0.0; var na = 0.0; var nb = 0.0
          for (j <- 0 until dsub) {
            val x = v(s * dsub + j).toDouble
            val y = flat(g * dsub + j)
            dot += x * y; na += x * x; nb += y * y
          }
          val sim = if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
          if (sim > best) { best = sim; bestG = g }
        }
        assert(code(s) == bestG, s"vec ${r.getLong(0)} subspace $s")
      }
    }
  }

  test("ragged embeddings fail loudly in pq_encode and pq_lut instead of reading garbage") {
    import spark.implicits._
    val books = Similarity.pqCodebooks(emb, dim, mSub, ks, iters = 1)
    val offsets = books.map(_._1.length).scanLeft(0)(_ + _).toArray
    val flat = new Array[Double](offsets.last * dsub)
    books.zipWithIndex.foreach { case ((_, m), s) =>
      System.arraycopy(m, 0, flat, offsets(s) * dsub, m.length)
    }
    val short = Seq(Array.fill(dim - 3)(0.5f)).toDF("embedding")
    val encErr = intercept[Exception] {
      short.select(
        graft.functions.VectorFunctions.pq_encode(col("embedding"), flat, offsets, dsub)).collect()
    }
    assert(encErr.getMessage.contains("ragged embeddings"), encErr.getMessage)
    val lutErr = intercept[Exception] {
      short.select(
        graft.functions.VectorFunctions.pq_lut(col("embedding"), flat, offsets, dsub)).collect()
    }
    assert(lutErr.getMessage.contains("ragged embeddings"), lutErr.getMessage)
  }

  test("ADC candidates at nCand=128 recall the exact top-5 on every fixture corpus") {
    // sweep both fixture corpus sizes the driver/bench will run (500 / 2000
    // vectors); the emitted top-k must EQUAL brute force — that is the
    // oracle contract of ann_pq
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.1")) {
      val e = spark.read.parquet(s"$dir/embeddings.parquet")
      val q = e.filter(col("vec_id") < 10)
      val truth = Similarity.bruteForceTopK(e, q, 5)
        .select(col("qid"), col("nid")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val got = Similarity.pqTopK(e, q, 5, dim, mSub, ks, nCand = 128)
        .select(col("qid"), col("nid")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == truth, s"PQ top-5 diverged from brute force on $dir")
    }
  }

  test("ivfPqTopK: probe-bounded + compressed candidates still recall the exact top-5") {
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.1")) {
      val e = spark.read.parquet(s"$dir/embeddings.parquet")
      val q = e.filter(col("vec_id") < 10)
      val truth = Similarity.bruteForceTopK(e, q, 5)
        .select(col("qid"), col("nid")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val got = Similarity.ivfPqTopK(e, q, 5, dim, nCells = 16, nprobe = 14,
          mSub, ks, nCand = 128)
        .select(col("qid"), col("nid")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == truth, s"IVFPQ top-5 diverged from brute force on $dir")
    }
    // candidate generation must be an equality join on the cell id — the
    // whole point over flat PQ: no nested-loop join anywhere in the plan
    val e = emb
    val plan = Similarity.ivfPqTopK(e, e.filter(col("vec_id") < 10), 5, dim,
        16, 14, mSub, ks, 128).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "IVFPQ candidate generation must not plan a nested-loop join")
    assert(plan.contains("pq_encode") && plan.contains("pq_lut") &&
      plan.contains("nearest_centroid"))
  }

  test("pqTopK is partition-invariant and its encode stage plans map-only") {
    val e = emb
    val q = e.filter(col("vec_id") < 10)
    val a = Similarity.pqTopK(e, q, 5, dim, mSub, ks, 128).collect().map(_.toString).sorted
    val b = Similarity.pqTopK(e.repartition(7), q, 5, dim, mSub, ks, 128)
      .collect().map(_.toString).sorted
    assert(a.sameElements(b))
    val plan = Similarity.pqTopK(e, q, 5, dim, mSub, ks, 128)
      .queryExecution.executedPlan.toString
    assert(plan.contains("pq_encode"), "fused encode expression must appear in the plan")
    assert(plan.contains("pq_lut"), "fused LUT expression must appear in the plan")
  }
}
