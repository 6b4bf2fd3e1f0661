package graft

import org.apache.spark.sql.functions._
import graft.operators.VectorOps

class VectorOpsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f)),
    (1L, Array(0.0f, 1.0f, 0.0f)),
    (2L, Array(2.0f, 0.0f, 0.0f)),   // colinear with 0
    (3L, Array(1.0f, 1.0f, 0.0f)))
    .toDF("id", "vec")

  test("cosine: colinear = 1, orthogonal = 0, 45° = √2/2") {
    val sims = vecs.as("a").crossJoin(vecs.as("b"))
      .select($"a.id".as("i"), $"b.id".as("j"),
        round(VectorOps.cosine($"a.vec", $"b.vec"), 6).as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(sims((0L, 2L)) == 1.0)
    assert(sims((0L, 1L)) == 0.0)
    assert(math.abs(sims((0L, 3L)) - 0.707107) < 1e-6)
  }

  test("bruteForceKnn ranks by similarity, excludes self") {
    val knn = VectorOps.bruteForceKnn(vecs.filter($"id" === 0L), vecs, 3)
      .orderBy($"rank").collect()
    assert(knn.map(_.getAs[Long]("cid")).toSeq == Seq(2L, 3L, 1L))
    assert(!knn.exists(_.getAs[Long]("cid") == 0L))
  }

  test("ivfAssign puts colinear vectors in the same cell") {
    val cents = vecs.filter($"id" < 2L).select($"id".as("cent_id"), $"vec".as("cvec"))
    val cells = VectorOps.ivfAssign(vecs, cents).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Long]("cell")).toMap
    assert(cells(0L) == 0L && cells(2L) == 0L && cells(1L) == 1L)
  }

  test("sign-LSH buckets: colinear vectors collide, opposite vectors differ") {
    val planes = VectorOps.randomPlanes(16, 3)
    val vs = Seq(
      (0L, Array(1.0f, 2.0f, 3.0f)),
      (1L, Array(2.0f, 4.0f, 6.0f)),      // colinear with 0
      (2L, Array(-1.0f, -2.0f, -3.0f)))   // opposite of 0
      .toDF("id", "vec")
    val b = vs.select($"id", VectorOps.lshBucket($"vec", planes).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(b(0L) == b(1L))
    assert(b(0L) != b(2L)) // all 16 sign bits flip for the negated vector
    assert((b(0L) ^ b(2L)) == 0xffffL)
  }

  test("cosineDupPairs finds a planted near-duplicate, nothing else") {
    val planes = VectorOps.randomPlanes(16, 4)
    val base = Array(0.3f, -1.2f, 0.8f, 2.0f)
    val nearDup = base.map(x => x * 1.001f + 0.0005f) // ~same direction
    val vs = Seq(
      (0L, base), (1L, nearDup),
      (2L, Array(-2.0f, 0.5f, 1.5f, -0.3f)),
      (3L, Array(1.0f, 1.0f, -1.0f, 0.1f)))
      .toDF("id", "vec")
    val pairs = VectorOps.cosineDupPairs(vs, planes, threshold = 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((0L, 1L)))
  }

  test("dedup_embedding_cosine on testdata: exactly the planted copies, no false positives") {
    // the gate plants exact copies of every 100th vector (id + 1000000);
    // natural fixture pairs all sit below the 0.7 threshold, so the result
    // must be precisely the planted (original, copy) pairs at sim 1.0
    val got = Queries.all("dedup_embedding_cosine")(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val nVecs = graft.sources.Tables.embeddings(spark, sf001).count()
    val expected = (0L until nVecs by 100L).map(i => (i, i + 1000000L, 1.0)).toSet
    assert(got == expected, s"got $got")
  }

  test("semanticDedup drops the higher-id ε-duplicate, keeps everything else") {
    // two centroids (x-axis, y-axis); ids 0 and 2 are colinear (cos = 1,
    // same cell) so 2 must drop; 3 shares 0's cell at 45° (cos ≈ 0.707
    // < τ) and must survive; 1 is alone in its cell.
    val cents = vecs.filter($"id" < 2L).select($"id".as("cent_id"), $"vec".as("cvec"))
    val verdicts = VectorOps.semanticDedup(vecs, cents, 0.95).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Boolean]("kept")).toMap
    assert(verdicts === Map(0L -> true, 1L -> true, 2L -> false, 3L -> true))
  }

  test("kmeans recovers well-separated clusters from a one-per-cluster init") {
    // two angular clusters: near the x axis (ids 0,2,4) and near the y
    // axis (ids 1,3,5); init = ids 0 and 1, one seed per true cluster
    val data = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)), (2L, Array(0.9f, 0.1f, 0.0f)),
      (4L, Array(1.0f, 0.2f, 0.0f)),
      (1L, Array(0.0f, 1.0f, 0.0f)), (3L, Array(0.1f, 0.9f, 0.0f)),
      (5L, Array(0.2f, 1.0f, 0.0f))).toDF("id", "vec")
    val init = data.filter($"id" < 2).select($"id".as("cent_id"), $"vec".as("cvec"))
    val trained = VectorOps.kmeans(data, init, iters = 2)
    val cents = trained.collect().map(r =>
      r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(cents.keySet == Set(0L, 1L))
    // centroid 0 points x-ward (mean of the x cluster), 1 points y-ward
    assert(cents(0L)(0) > cents(0L)(1) && cents(1L)(1) > cents(1L)(0))
    // every member assigns to its own cluster's centroid after training
    val assign = VectorOps.ivfAssign(data, trained)
      .select($"id", $"cell").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(assign.filterKeys(Set(0L, 2L, 4L)).values.toSet == Set(0L))
    assert(assign.filterKeys(Set(1L, 3L, 5L)).values.toSet == Set(1L))
    // and the trained centroid IS the 6-dp-rounded cluster mean
    assert(cents(0L)(0) == math.rint((1.0f + 0.9f + 1.0f) / 3 * 1e6) / 1e6)
  }

  test("kmeansTrained surfaces the surviving centroid count when a cell dies") {
    // every vector is exactly centroid 0's direction, so cell 1 captures
    // nothing in round 1 and vanishes — K must be read from the result
    val data = (0L to 9L).map(i => (i, Array(1.0f, 0.0f, 0.0f))).toDF("id", "vec")
    val init = Seq((0L, Array(1.0, 0.0, 0.0)), (1L, Array(0.8, 0.6, 0.0)))
      .toDF("cent_id", "cvec")
    val (cents, k) = VectorOps.kmeansTrained(data, init, iters = 2)
    assert(k == 1L)
    assert(cents.select($"cent_id").as[Long].collect().toSeq == Seq(0L))
  }

  test("kmeans-trained centroids compose with ivfKnn (and report recall vs init)") {
    val c = graft.sources.Tables.embeddings(spark, sf001)
      .select($"vec_id".as("id"), $"embedding".as("vec"))
    val init = c.filter($"id" < 8).select($"id".as("cent_id"), $"vec".as("cvec"))
    val trained = VectorOps.kmeans(c, init, iters = 2)
    assert(trained.count() == 8, "no cell may vanish on this corpus")
    val isQuery = $"id" % 50 === 0
    val bf = VectorOps.bruteForceKnn(c.filter(isQuery), c, 5)
      .select($"qid", $"cid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def hits(cents: org.apache.spark.sql.DataFrame): Int =
      (VectorOps.ivfKnn(c, cents, isQuery, 5, nProbe = 2)
        .select($"qid", $"cid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet intersect bf).size
    val (hInit, hTrained) = (hits(init), hits(trained))
    info(s"recall@5 hits at nProbe=2 — init: $hInit, kmeans-trained: $hTrained of ${bf.size}")
    // trained centroids must remain a WORKING quantizer (the win over
    // arbitrary init is corpus-dependent; on this fixture it must at
    // least stay in the same recall class, not collapse)
    assert(hTrained > 0)
    assert(hTrained * 2 >= hInit, s"training collapsed recall: $hInit -> $hTrained")
  }

  test("ivf knn is a valid approximation: never beats exact, ranks well-formed") {
    val brute = Queries.all("knn_bruteforce")(spark, sf001)
      .filter($"rank" === 1).collect()
      .map(r => r.getAs[Long]("qid") -> r.getAs[Double]("sim")).toMap
    val ivf = Queries.all("knn_ivf")(spark, sf001).collect()
    assert(ivf.nonEmpty)
    // approximate top-1 sim can never exceed the exact top-1 sim
    ivf.filter(_.getAs[Long]("rank") == 1L).foreach { r =>
      val q = r.getAs[Long]("qid")
      assert(r.getAs[Double]("sim") <= brute(q) + 1e-9,
        s"IVF sim beat exact brute force for query $q")
    }
    // ranks are 1..n dense per query
    ivf.groupBy(_.getAs[Long]("qid")).foreach { case (_, rows) =>
      val ranks = rows.map(_.getAs[Long]("rank")).sorted
      assert(ranks.toSeq == (1L to ranks.length).toSeq)
    }
  }

  test("multi-probe IVF: candidates superset, recall monotone, gate booleans true") {
    val c = graft.sources.Tables.embeddings(spark, sf001)
      .select($"vec_id".as("id"), $"embedding".as("vec"))
    val cents = c.filter($"id" < 8)
      .select($"id".as("cent_id"), $"vec".as("cvec"))
    val isQuery = $"id" % 50 === 0
    def pairs(nProbe: Int) =
      VectorOps.ivfKnn(c, cents, isQuery, 5, nProbe)
        .select($"qid", $"cid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val bf = VectorOps.bruteForceKnn(c.filter(isQuery), c, 5)
      .select($"qid", $"cid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val (p1, p2) = (pairs(1), pairs(2))
    // per-query recall against the exact top-5 can only grow with nProbe
    def recall(p: Set[(Long, Long)]) = (bf intersect p).size
    assert(recall(p2) >= recall(p1))
    assert(recall(p2) > 0, "2-probe IVF found no true neighbors at all")
    // gate booleans hold on the fixture
    val gate = Queries.all("knn_ivf_recall")(spark, sf001).collect()
    assert(gate.nonEmpty)
    assert(gate.forall(_.getAs[Boolean]("monotone_ok")))
    assert(gate.forall(_.getAs[Boolean]("avg_recall_ok")))
  }

  test("PQ: codebook shape, identical vectors get identical codes, ADC recovers a planted dup") {
    // 4-dim vectors, 2 subspaces × 2 dims, 2 codes per subspace
    val c = Seq(
      (0L, Array(1.0f, 0.1f, 0.0f, 0.9f)),
      (1L, Array(0.0f, 0.9f, 1.0f, 0.1f)),
      (2L, Array(0.9f, 0.2f, 0.1f, 1.0f)),   // near 0
      (3L, Array(0.1f, 1.0f, 0.9f, 0.0f)),   // near 1
      (10L, Array(1.0f, 0.1f, 0.0f, 0.9f)))  // exact copy of 0
      .toDF("id", "vec")
    val cb = VectorOps.pqTrain(c, m = 2, subDim = 2, ksub = 2, iters = 1)
    val gs = cb.select($"g").distinct().as[Long].collect().sorted
    assert(gs.sameElements(Array(0L, 1L)), s"expected 2 subspaces, got ${gs.toSeq}")
    val codes = VectorOps.pqEncode(c, cb, m = 2, subDim = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // an exact copy must encode identically in every subspace
    assert(codes((0L, 0L)) == codes((10L, 0L)) && codes((0L, 1L)) == codes((10L, 1L)))
    // ADC search from vector 0 must recover its exact copy in the top-2
    // (near-dup 2 may share the same codes → an ADC tie, broken by cid)
    val coarse = c.filter($"id" < 1).select($"id".as("cent_id"), $"vec".as("cvec"))
    val top = VectorOps.ivfPqKnn(c, coarse, cb, $"id" === 0L, k = 2,
        nProbe = 1, m = 2, subDim = 2)
      .select($"cid").as[Long].collect()
    assert(top.contains(10L), s"expected planted dup in top-2, got ${top.toSeq}")
    // gate booleans hold on the fixture
    val gate = Queries.all("knn_ivfpq_recall")(spark, sf001).collect()
    assert(gate.nonEmpty)
    assert(gate.forall(_.getAs[Long]("hits_pq") >= 2),
      "both planted copies must be recovered for every query")
    assert(gate.forall(_.getAs[Boolean]("avg_recall_ok")))
  }
}
