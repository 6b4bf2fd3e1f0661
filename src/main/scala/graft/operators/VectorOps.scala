package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`array<float>`) — the
  * north-star ANN surface: brute-force cosine top-k as the exactness
  * baseline, IVF (inverted-file) cell probing as the scale path.
  *
  * All arithmetic is `zip_with`/`aggregate` over double-cast arrays —
  * codegen'd Catalyst expressions evaluated in array-index order, which
  * keeps floating-point summation deterministic and engine-portable.
  *
  * Scale design (100 TB): brute force is a broadcast of the (small) query
  * set against a partitioned corpus scan — linear, no shuffle of the
  * corpus itself. IVF turns that into (a) one broadcast join against K
  * centroids to assign cells, then (b) a cell-bucketed equi-join, pruning
  * the scan to matching cells only; the cell column is the natural
  * partition/bucket key for a materialized index table.
  */
object VectorOps {

  /** Dot product of two equal-length vector columns (double precision) —
    * a native codegen'd expression (graft.functions.DotProduct), not the
    * `aggregate(zip_with(...))` composition: HOF lambdas evaluate
    * interpreted and allocate an intermediate array per pair, which is
    * the hot path of every O(pairs·dim) similarity join. */
  def dot(a: Column, b: Column): Column = graft.functions.VectorExprs.dot(a, b)

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity. For similarity JOINS, don't call this per pair —
    * it recomputes both norms each time; project `norm(vec)` on each side
    * before the join (what every operator below does) so per-vector work
    * is linear, not quadratic. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact top-k cosine neighbors of each query vector (brute force).
    * `queries` and `corpus`: (id, vec). Output: (qid, cid, sim, rank) with
    * rank 1..k, self-matches excluded, 6-dp rounded sim, id tiebreak. */
  def bruteForceKnn(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    // norms computed once per side (linear), never per pair (quadratic)
    val q = broadcast(queries.select(col("id").as("qid"), col("vec").as("qvec"),
      norm(col("vec")).as("qn")))
    val c = corpus.select(col("id").as("cid"), col("vec").as("cvec"),
      norm(col("vec")).as("cn"))
    val sims = c.join(q, col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"),
        round(dot(col("qvec"), col("cvec")) / (col("qn") * col("cn")), 6).as("sim"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("sim").desc, col("cid"))
    sims.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** Deterministic random hyperplanes for sign-LSH: integer weights in
    * [-1000, 1000] from a fixed seed. The SAME matrix is inlined into the
    * Spark plan and the SQL oracle, so bucketing is engine-portable by
    * construction. */
  def randomPlanes(nPlanes: Int, dim: Int, seed: Long = 42L): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(nPlanes)(Array.fill(dim)((rnd.nextInt(2001) - 1000).toDouble))
  }

  /** Sign-LSH bucket id: bit p set iff dot(vec, plane_p) > 0 (dot rounded
    * to 6 dp so float summation order can't flip a near-zero sign across
    * engines). Cosine-similar vectors collide with high probability —
    * the candidate generator for ANN at scale: bucket once (linear pass),
    * then search within buckets only. */
  def lshBucket(vec: Column, planes: Array[Array[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      when(round(dot(vec, typedlit(p.toSeq)), 6) > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Embedding-cosine near-duplicate pairs, LSH-bucketed: candidates are
    * pairs sharing a sign-LSH bucket (never the all-pairs product), then
    * verified by exact cosine ≥ threshold. The scalable embedding-dedup
    * shape: one linear bucketing pass + a bucket-local self-join. */
  def cosineDupPairs(corpus: DataFrame, planes: Array[Array[Double]],
                     threshold: Double): DataFrame = {
    val bucketed = corpus.select(col("id"), col("vec"),
      norm(col("vec")).as("nrm"),
      lshBucket(col("vec"), planes).as("bucket"))
    val a = bucketed.select(col("bucket"), col("id").as("d1"),
      col("vec").as("v1"), col("nrm").as("n1"))
    val b = bucketed.select(col("bucket"), col("id").as("d2"),
      col("vec").as("v2"), col("nrm").as("n2"))
    a.join(b, Seq("bucket"))
      .filter(col("d1") < col("d2"))
      .select(col("d1"), col("d2"),
        round(dot(col("v1"), col("v2")) / (col("n1") * col("n2")), 6).as("sim"))
      .filter(col("sim") >= threshold)
      .distinct()
  }

  /** IVF assignment generalized to the `n` nearest centroids by cosine
    * (max sim, centroid-id tiebreak): (id, vec, cell, probe_rank 1..n).
    * n = 1 is plain cell assignment; n > 1 is the query side of
    * multi-probe. `centroids`: (cent_id, cvec). */
  /** (sim, id)-argmax packed into ONE long so the per-group argmax is a
    * plain `max(long)` — a HashAggregate with map-side partial aggregation
    * (optimization guide §2.3 "aggregate before you shuffle": the
    * broadcast join emits K consecutive candidate rows per group, and the
    * partial max collapses them to one row before the exchange — K× fewer
    * shuffled rows, no sort). A struct-max carries the same rule but its
    * array payload forces SortAggregate (measured: wash vs the window);
    * the long-max keeps the whole path codegen'd.
    *
    * Encoding: (round(csim·1e6) + 1e6) · 2^42 + (2^42 − 1 − cent_id).
    * csim is already 6-dp rounded and |csim| ≤ 1, so the biased first
    * term is an exact integer in [0, 2e6] and the product stays below
    * 2^63; max picks max csim, then (complement) MIN cent_id — exactly
    * the window's (csim DESC, cent_id ASC) rule. Requires
    * cent_id ∈ [0, 2^42) — ids are corpus vec_ids (≤ ~1e10 at the 1000×
    * decade) plus plant offsets ≤ 2e6, orders of magnitude under the
    * bound. The same encoding the DuckDB oracles' packExpr uses. */
  private val ArgmaxPackBase = 1L << 42
  private def packSimId(csim: Column, centId: Column): Column =
    (round(csim * 1e6).cast("long") + 1000000L) * ArgmaxPackBase +
      (lit(ArgmaxPackBase - 1) - centId)
  private def unpackId(packed: Column): Column =
    lit(ArgmaxPackBase - 1) - (packed % ArgmaxPackBase)

  /** Candidate (group, csim, cent_id) rows for assignment: corpus ×
    * broadcast centroids with the 6-dp-rounded cosine. */
  private def assignSims(corpus: DataFrame, centroids: DataFrame): DataFrame =
    corpus.withColumn("nrm", norm(col("vec")))
      .crossJoin(broadcast(centroids.withColumn("cnrm", norm(col("cvec")))))
      .withColumn("csim",
        round(dot(col("vec"), col("cvec")) / (col("nrm") * col("cnrm")), 6))

  def ivfAssignN(corpus: DataFrame, centroids: DataFrame, n: Int): DataFrame = {
    val sims = assignSims(corpus, centroids)
    if (n == 1) {
      // `vec` rides in the GROUP KEY (ids are unique per corpus row, so
      // (id, vec) groups ≡ id groups) — keeping the buffer a mutable
      // long, which is what keeps this a HashAggregate.
      sims.groupBy(col("id"), col("vec"))
        .agg(max(packSimId(col("csim"), col("cent_id"))).as("p"))
        .select(col("id"), col("vec"), unpackId(col("p")).as("cell"),
          lit(1).as("probe_rank"))
    } else {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("id"))
        .orderBy(col("csim").desc, col("cent_id"))
      sims.withColumn("probe_rank", row_number().over(w))
        .filter(col("probe_rank") <= n)
        .select(col("id"), col("vec"), col("cent_id").as("cell"), col("probe_rank"))
    }
  }

  /** `ivfAssign` without the vector payload: (id, cell) only — the shape
    * index/probe consumers that never touch `vec` again should use (no
    * array in the group key or the shuffle at all). */
  def ivfAssignCell(corpus: DataFrame, centroids: DataFrame): DataFrame =
    assignSims(corpus, centroids)
      .groupBy(col("id"))
      .agg(max(packSimId(col("csim"), col("cent_id"))).as("p"))
      .select(col("id"), unpackId(col("p")).as("cell"))

  /** IVF cell assignment: nearest centroid by cosine (max sim, centroid-id
    * tiebreak). `centroids`: (cent_id, cvec). Output: corpus + `cell`. */
  def ivfAssign(corpus: DataFrame, centroids: DataFrame): DataFrame =
    ivfAssignN(corpus, centroids, 1)
      .select(col("id"), col("vec"), col("cell"))

  /** Lloyd's spherical k-means over `corpus` (id, vec) — the missing
    * training step for IVF: `ivfKnn` quantizes against whatever centroid
    * table it is given, and trained centroids tighten cells (higher
    * recall at the same nProbe) vs the pick-first-K baseline.
    *
    * Each of the `iters` rounds is (a) cosine assignment against the
    * BROADCAST centroid table (one linear corpus pass — `ivfAssign`, the
    * exact operator the index build would run), then (b) per-cell
    * elementwise mean via posexplode + groupBy(cell, pos) with map-side
    * partial aggregation: shuffle volume per round is ≤ tasks × K × dim
    * partial rows, never the corpus. Centroids are localCheckpoint'ed
    * per round (ContextCleaner-released; reliable `checkpoint` on a real
    * cluster) so plans stay O(1) deep across rounds.
    *
    * Determinism/engine-portability: assignment uses the 6-dp-rounded
    * cosine with centroid-id tiebreak (the `ivfAssign` contract), and
    * each new centroid coordinate is rounded to 6 dp — so the whole
    * iteration is reproducible in the SQL oracle. Spherical variant:
    * cosine assignment needs no mean renormalization (the norm divides
    * out). A cell that captures no vectors disappears (both engines drop
    * it identically); K stays ≥ 1 because every vector lands somewhere.
    * Consequently the returned centroid count can be < the initial K —
    * callers comparing against a fixed NCentroids (e.g. recall gates over
    * a trained index) must read K from the RESULT (`cents.count()` /
    * distinct cent_id), not from the init table. */
  def kmeans(corpus: DataFrame, initCentroids: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1, "kmeans needs at least one iteration")
    var cents = initCentroids.select(col("cent_id"), col("cvec"))
    var i = 0
    while (i < iters) {
      val assigned = ivfAssign(corpus, cents) // (id, vec, cell)
      cents = assigned
        .select(col("cell").as("cent_id"), posexplode(col("vec")))
        .groupBy(col("cent_id"), col("pos"))
        .agg(round(avg(col("col").cast("double")), 6).as("m"))
        .groupBy(col("cent_id"))
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
          s => s.getField("m")).as("cvec"))
        .localCheckpoint()
      i += 1
    }
    cents
  }

  /** `kmeans` plus the SURVIVING centroid count: empty cells vanish
    * during training (see the `kmeans` scaladoc), so consumers that size
    * probe plans or assert index shape must read K from the RESULT — this
    * surfaces it instead of leaving every caller to re-derive it. The
    * returned centroids are localCheckpoint'ed by training, so the count
    * is a cheap cached action, not a recompute. */
  def kmeansTrained(corpus: DataFrame, initCentroids: DataFrame,
                    iters: Int): (DataFrame, Long) = {
    val cents = kmeans(corpus, initCentroids, iters)
    (cents, cents.count())
  }

  /** SemDeDup-style semantic dedup (Abbas et al., 2023) over TRAINED
    * coarse cells: candidate pairs come from within-cell joins only (the
    * cells bound the quadratic term — at corpus scale K is sized
    * ∝ n / target-cell-size so cells stay O(100–1000)), an exact cosine
    * ≥ `threshold` (6-dp rounded, engine-portable) marks an ε-duplicate,
    * and the keep rule is deterministic with no transitive closure, per
    * the published method: a vector is dropped iff a LOWER-id member of
    * its cell is within ε. Output: one row per corpus vector
    * (id, cell, kept) — the keep/drop verdict a pipeline consumes.
    *
    * Complements `cosineDupPairs` (sign-LSH buckets, fixed hyperplanes):
    * trained cells adapt to the corpus distribution, and the verdict is
    * per-vector rather than per-pair. */
  def semanticDedup(corpus: DataFrame, centroids: DataFrame,
                    threshold: Double): DataFrame = {
    val cells = ivfAssign(corpus, centroids)
      .withColumn("nrm", norm(col("vec")))
    val a = cells.select(col("cell"), col("id").as("d1"),
      col("vec").as("v1"), col("nrm").as("n1"))
    val b = cells.select(col("cell"), col("id").as("d2"),
      col("vec").as("v2"), col("nrm").as("n2"))
    // one hash-shuffle on cell; the a/b subplans dedup via exchange reuse
    val drops = a.join(b, Seq("cell"))
      .filter(col("d1") < col("d2"))
      .filter(round(dot(col("v1"), col("v2")) / (col("n1") * col("n2")), 6)
        >= threshold)
      .select(col("d2").as("id")).distinct()
    cells.join(drops.withColumn("_sd_drop", lit(true)), Seq("id"), "left")
      .select(col("id"), col("cell").cast("long").as("cell"),
        col("_sd_drop").isNull.as("kept"))
  }

  /** Product-quantization codebooks: the corpus is sliced into `m`
    * contiguous subvectors of `subDim` dims each, and an independent
    * codebook of (at most) `ksub` codewords is trained per subspace by
    * REUSING `kmeans` on the slices (same 6-dp spherical contract, so
    * codebook training is oracle-replayable). Output:
    * (g, code, csub: array<double>) — subspace g ∈ [0, m), codeword id,
    * centroid slice. Init: the slices of the first `ksub` vector ids —
    * deterministic, mirroring the IVF gates' init convention.
    *
    * This is the 100 TB ANN memory story: a dim-D float corpus row
    * (4·D bytes) is represented by `m` small codes, compressing the
    * resident index ~(4·D)/(m·bytes-per-code) ≈ 16–32×, while search
    * scores candidates from an m-entry lookup table per query instead
    * of a D-dim dot product. */
  /** (g, id, vec-slice) fan-out of the corpus into its `m` subspaces —
    * ONE row-local pass (explode of an m-element slice array), feeding
    * the grouped training/encode below so the corpus is read once, not
    * once per subspace. */
  private def pqSlices(corpus: DataFrame, m: Int, subDim: Int): DataFrame =
    corpus.select(col("id"), posexplode(expr(
        s"transform(sequence(0, ${m - 1}), g -> slice(vec, g * $subDim + 1, $subDim))")))
      .select(col("pos").cast("long").as("g"), col("id"), col("col").as("vec"))

  /** Grouped codeword assignment: nearest centroid WITHIN each row's
    * subspace g — the `ivfAssign` cosine/round/tiebreak contract, with
    * the broadcast join keyed on g so every subspace is assigned in the
    * same single corpus pass. */
  private def pqAssignSims(slices: DataFrame, codebooks: DataFrame): DataFrame =
    slices.withColumn("nrm", norm(col("vec")))
      .join(broadcast(codebooks.withColumn("cnrm", norm(col("cvec")))), Seq("g"))
      .withColumn("csim",
        round(dot(col("vec"), col("cvec")) / (col("nrm") * col("cnrm")), 6))

  /** Packed-long argmax per (g, id) — the `ivfAssignN` n == 1 rationale:
    * ksub× fewer shuffled rows (map-side partial max over the ksub
    * consecutive codeword rows the broadcast join emits per slice), no
    * per-partition sort, HashAggregate throughout. Same (csim DESC,
    * cent_id ASC) selection rule via the packed encoding. */
  private def pqAssign(slices: DataFrame, codebooks: DataFrame): DataFrame =
    pqAssignSims(slices, codebooks)
      .groupBy(col("g"), col("id"), col("vec"))
      .agg(max(packSimId(col("csim"), col("cent_id"))).as("p"))
      .select(col("g"), col("id"), col("vec"), unpackId(col("p")).as("code"))

  /** `pqAssign` minus the slice payload: (id, g, code) — the encode shape
    * (the search path never needs the raw slice again). */
  private def pqAssignCode(slices: DataFrame, codebooks: DataFrame): DataFrame =
    pqAssignSims(slices, codebooks)
      .groupBy(col("g"), col("id"))
      .agg(max(packSimId(col("csim"), col("cent_id"))).as("p"))
      .select(col("g"), col("id"), unpackId(col("p")).as("code"))

  def pqTrain(corpus: DataFrame, m: Int, subDim: Int, ksub: Int,
              iters: Int): DataFrame = {
    require(m >= 1 && subDim >= 1 && ksub >= 1, "pq shape must be positive")
    require(iters >= 1, "pq training needs at least one iteration")
    val slices = pqSlices(corpus, m, subDim)
    // per-subspace Lloyd's rounds exactly as m independent `kmeans` calls
    // would compute them (same init, 6-dp assignment + 6-dp means, same
    // tiebreaks — the g-keyed join restricts each argmax to its own
    // codebook), but every round is ONE assign pass + ONE mean shuffle
    // over all subspaces instead of m sequential trainings. Measured 2×
    // on the gate (4.25 → 2.10 s — job barriers and per-training
    // checkpoints dominated); at cluster scale it is also the right
    // shape: m× fewer corpus scans.
    var cents = slices.filter(col("id") < ksub)
      .select(col("g"), col("id").as("cent_id"), col("vec").as("cvec"))
    var i = 0
    while (i < iters) {
      cents = pqAssign(slices, cents)
        .select(col("g"), col("code").as("cent_id"), posexplode(col("vec")))
        .groupBy(col("g"), col("cent_id"), col("pos"))
        .agg(round(avg(col("col").cast("double")), 6).as("m"))
        .groupBy(col("g"), col("cent_id"))
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
          s => s.getField("m")).as("cvec"))
        .localCheckpoint()
      i += 1
    }
    cents.select(col("g"), col("cent_id").as("code"), col("cvec").as("csub"))
  }

  /** Encode the corpus against trained PQ codebooks: each vector's
    * subspace-g slice is assigned to its nearest codeword (the
    * `ivfAssign` cosine/tiebreak contract), all subspaces in one pass.
    * Output: (id, g, code) — the relational form of the per-vector code
    * array, and the ONLY per-vector state the search below touches. */
  def pqEncode(corpus: DataFrame, codebooks: DataFrame, m: Int,
               subDim: Int): DataFrame =
    pqAssignCode(pqSlices(corpus, m, subDim),
        codebooks.select(col("g"), col("code").as("cent_id"), col("csub").as("cvec")))
      .select(col("id"), col("g"), col("code"))

  /** IVF-PQ approximate top-k: coarse IVF cells prune the corpus to the
    * query's `nProbe` probed cells, then candidates are scored by
    * ASYMMETRIC DISTANCE — the query keeps its exact vector, each
    * candidate is represented only by its PQ codes, and
    *   cos(q, x) ≈ Σ_g dot(q_g, cb[g, code_g(x)])
    *               / (‖q‖ · √(Σ_g ‖cb[g, code_g(x)]‖²)).
    * Per query the Σ terms come from an m×ksub ADC LOOKUP TABLE
    * (6-dp-rounded partial dots), built once by a broadcast join of the
    * query slices against the (tiny) codebook — scoring a candidate is
    * m table rows, never a dim-D dot product, and the only per-vector
    * state is (id, g, code): the compressed index.
    *
    * Scale shape: codebooks and the ADC table broadcast (m·ksub rows per
    * query); the candidate join shuffles codes ∝ candidates × m; the
    * score aggregate is map-side combinable on (qid, cid). Exactly the
    * plan an IVF-PQ index serves at corpus scale. */
  def ivfPqKnn(corpus: DataFrame, coarseCentroids: DataFrame,
               codebooks: DataFrame, queryFilter: Column, k: Int,
               nProbe: Int, m: Int, subDim: Int): DataFrame = {
    val cells = ivfAssignCell(corpus, coarseCentroids)
      .select(col("id").as("cid"), col("cell"))
    val qcells = ivfAssignN(corpus.filter(queryFilter), coarseCentroids, nProbe)
      .select(col("id").as("qid"), col("cell"))
    val codes = pqEncode(corpus, codebooks, m, subDim)
      .select(col("id").as("cid"), col("g"), col("code"))
    val queries = corpus.filter(queryFilter)
    // one row-local posexplode pass (the pqSlices shape) instead of an
    // m-branch unionByName — the union re-scanned the query relation m
    // times (m=8 ⇒ 24 of knn_ivfpq_recall's 216 baseline parquet scans)
    // and added m plan branches to every downstream stage
    val qslices = pqSlices(queries, m, subDim)
      .select(col("id").as("qid"), col("g"), col("vec").as("qsub"))
    val cb = codebooks.withColumn("cnorm2", round(dot(col("csub"), col("csub")), 6))
    val adc = qslices.join(broadcast(cb), Seq("g"))
      .select(col("qid"), col("g"), col("code"),
        round(dot(col("qsub"), col("csub")), 6).as("pdot"), col("cnorm2"))
    val qn = queries.select(col("id").as("qid"), norm(col("vec")).as("qn"))
    // corpus side has one cell per vector, so a (qid, cid) candidate
    // arises at most once even under multi-probe — no dedup needed
    val cand = qcells.join(cells, Seq("cell"))
      .filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"))
    val scored = cand.join(codes, Seq("cid"))
      .join(broadcast(adc), Seq("qid", "g", "code"))
      .groupBy(col("qid"), col("cid"))
      .agg(sum(col("pdot")).as("num"), sum(col("cnorm2")).as("rn2"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("sim").desc, col("cid"))
    scored.join(broadcast(qn), Seq("qid"))
      .select(col("qid"), col("cid"),
        round(col("num") / (col("qn") * sqrt(col("rn2"))), 6).as("sim"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** Approximate top-k: each query probes its `nProbe` nearest IVF cells
    * (corpus vectors live in exactly one). nProbe = 1 is classic IVF;
    * higher nProbe is THE standard recall lever — quantization error
    * parks true neighbors in adjacent cells, and probing the next-nearest
    * cells recovers them at nProbe× scan cost (still a ~K/nProbe prune of
    * the corpus). A (qid, cid) pair arises at most once because the
    * corpus side has one cell per vector — no post-join dedup needed. */
  def ivfKnn(corpus: DataFrame, centroids: DataFrame,
             queryFilter: Column, k: Int, nProbe: Int = 1): DataFrame = {
    val assigned = ivfAssign(corpus, centroids)
    val q = broadcast(
      ivfAssignN(corpus.filter(queryFilter), centroids, nProbe)
        .select(col("id").as("qid"), col("vec").as("qvec"),
          norm(col("vec")).as("qn"), col("cell")))
    val sims = assigned.select(col("id").as("cid"), col("vec").as("cvec"),
        norm(col("vec")).as("cn"), col("cell"))
      .join(q, Seq("cell"))
      .filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"),
        round(dot(col("qvec"), col("cvec")) / (col("qn") * col("cn")), 6).as("sim"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("sim").desc, col("cid"))
    sims.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }
}
