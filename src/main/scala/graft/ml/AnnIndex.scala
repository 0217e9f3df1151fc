package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF-style approximate nearest neighbour search over an embedding
  * column — the 100 TB scale path next to the brute-force baseline
  * (queries q54): a coarse quantizer partitions vectors into `nLists`
  * inverted lists; a query probes only its `nProbe` nearest centroids,
  * so the scored candidate set is ~nProbe/nLists of the corpus instead
  * of all of it.
  *
  * Scale design (the FAISS IVF recipe): the quantizer is trained with
  * seeded Lloyd's iterations on a bounded SAMPLE collected to the
  * driver — quantizer quality needs only a representative sample, never
  * the corpus — then the centroids broadcast and every vector is
  * assigned its nearest list in ONE distributed pass. No iterative
  * distributed jobs touch the corpus (MLlib KMeans ran k-means|| init +
  * per-iteration jobs over all rows — wasted work for a coarse
  * quantizer). With the corpus written partitioned/bucketed by
  * `list_id`, a probe reads only its lists' partitions.
  */
object AnnIndex {

  final case class Index(centroids: Array[(Int, Array[Double])], assigned: DataFrame)

  /** Train the coarse quantizer on a seeded sample (Lloyd's, euclidean,
    * deterministic: seeded init, fixed iteration order) and assign a
    * `list_id` per corpus vector in one pass. `trainSample` bounds the
    * driver-side training set regardless of corpus size. */
  def build(embeddings: DataFrame, nLists: Int = 16, seed: Long = 42L,
      maxIter: Int = 20, trainSample: Int = 65536): Index = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val vecs = embeddings.select(col("embedding").cast("array<double>"))
      .as[Array[Double]]
    // deterministic bounded sample: sort-free limit is fine for training
    // (any representative subset works; seeded fraction keeps it stable)
    val n = embeddings.count()
    val sample: Array[Array[Double]] =
      if (n <= trainSample) vecs.collect()
      else vecs.sample(withReplacement = false,
        math.min(1.0, trainSample * 1.2 / n), seed).limit(trainSample).collect()

    // closure-captured (not an explicit Broadcast): task binaries are
    // broadcast + cleaned up by Spark itself, and the centroid table is
    // a few KB — no per-call Broadcast object left pinned on executors.
    val centroids = lloyd(sample, nLists, seed, maxIter)
    val assignUdf = udf { (e: Seq[Double]) =>
      val cs = centroids
      var best = 0; var bestD = Double.MaxValue
      var i = 0
      while (i < cs.length) {
        val c = cs(i)
        var d = 0.0; var j = 0
        while (j < c.length) { val t = e(j) - c(j); d += t * t; j += 1 }
        if (d < bestD) { bestD = d; best = i }
        i += 1
      }
      best
    }
    val assigned = embeddings.withColumn("list_id",
      assignUdf(col("embedding").cast("array<double>")))
    Index(centroids.zipWithIndex.map { case (c, i) => (i, c) }, assigned)
  }

  /** Seeded Lloyd's k-means on the driver: init = k distinct sample
    * points chosen by a seeded RNG; ties in assignment break to the
    * lowest centroid id (stable across runs). */
  private[ml] def lloyd(sample: Array[Array[Double]], k: Int, seed: Long,
      maxIter: Int): Array[Array[Double]] = {
    require(sample.nonEmpty, "empty quantizer training sample")
    val dim = sample.head.length
    val rng = new scala.util.Random(seed)
    val init = rng.shuffle(sample.indices.toVector).take(k)
    // pad with DISTINCT zero arrays if sample < k (padTo would alias one)
    val cents = (init.map(i => sample(i).clone()) ++
      Vector.fill(math.max(0, k - init.size))(new Array[Double](dim))).toArray
    def d2(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var j = 0
      while (j < dim) { val t = a(j) - b(j); d += t * t; j += 1 }
      d
    }
    var iter = 0
    while (iter < maxIter) {
      val sums = Array.fill(k)(new Array[Double](dim))
      val counts = new Array[Long](k)
      sample.foreach { v =>
        var best = 0; var bestD = Double.MaxValue
        var i = 0
        while (i < k) {
          val dd = d2(v, cents(i))
          if (dd < bestD) { bestD = dd; best = i }
          i += 1
        }
        counts(best) += 1
        var j = 0
        while (j < dim) { sums(best)(j) += v(j); j += 1 }
      }
      var i = 0
      while (i < k) {
        if (counts(i) > 0) {
          var j = 0
          while (j < dim) { cents(i)(j) = sums(i)(j) / counts(i); j += 1 }
        } // empty list keeps its previous centroid (deterministic)
        i += 1
      }
      iter += 1
    }
    cents
  }

  /** Approximate near-dup CANDIDATE pairs from multi-probed IVF lists:
    * each vector is assigned to its `nProbe` nearest centroids
    * (multi-assignment, the spill-tree trick), and candidates are the
    * distinct pairs sharing at least one probed list. Work is bounded
    * by the per-list populations — no all-pairs join — and recall is a
    * dial: nProbe=1 is cheapest, nProbe=nLists degenerates to
    * all-pairs (full recall by construction). On the near-orthogonal
    * testdata the 0.45-cosine pairs straddle lists (53–63° apart), so
    * partial probing misses pairs there — which is why the ORACLED
    * exact operator (q86) is a block-nested-loop join instead, and
    * this path is the explicitly-approximate scale dial for corpora
    * whose near-dups are tight (cosine ≥ 0.8, the common LLM-dedup
    * case). Both properties — ≥0.95 recall at nProbe=2 on a tight
    * corpus, monotone recall in nProbe with 1.0 at nProbe=nLists —
    * are asserted in AnnAndLoopSpec ("candidatePairs recall"). */
  def candidatePairs(index: Index, nProbe: Int = 2): DataFrame = {
    // centroids ride the task closure (k·dim doubles, a few KB for a
    // coarse quantizer) — Spark broadcasts task binaries internally and
    // cleans them up, so no explicit Broadcast lifecycle to leak.
    val cents: Array[(Int, Array[Double])] = index.centroids
    val k = cents.length
    val np = math.min(nProbe, k)
    val probeUdf = udf { (e: Seq[Double]) =>
      val v = e.toArray
      // partial top-np selection (O(k·np)), not a full O(k log k) sort —
      // nLists is ~sqrt(corpus) at scale, so this is the per-row hot loop.
      // Ties break to the lowest list id (stable across runs).
      val bestIds = new Array[Int](np)
      val bestDs = Array.fill(np)(Double.MaxValue)
      var i = 0
      while (i < k) {
        val c = cents(i)._2
        var d = 0.0; var j = 0
        while (j < c.length) { val t = v(j) - c(j); d += t * t; j += 1 }
        val id = cents(i)._1
        // insert into the sorted (d, id) top-np buffer
        var p = np - 1
        if (d < bestDs(p) || (d == bestDs(p) && id < bestIds(p))) {
          while (p > 0 && (d < bestDs(p - 1) ||
              (d == bestDs(p - 1) && id < bestIds(p - 1)))) {
            bestDs(p) = bestDs(p - 1); bestIds(p) = bestIds(p - 1); p -= 1
          }
          bestDs(p) = d; bestIds(p) = id
        }
        i += 1
      }
      bestIds.toSeq
    }
    // persist: `probed` feeds BOTH sides of the self-join; without it the
    // probe UDF (k centroid distances per row) runs twice over the corpus
    val probed = index.assigned
      .select(col("vec_id"),
        explode(probeUdf(col("embedding").cast("array<double>"))).as("list_id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pairs = probed.as("x").join(probed.as("y"),
        col("x.list_id") === col("y.list_id") && col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("va"), col("y.vec_id").as("vb")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // materialize the (small) pair set, then release the corpus-sized
    // probe cache — otherwise every call pins rows×nProbe for the
    // session's lifetime. The returned frame is served from its own
    // cache; callers may unpersist it when done.
    pairs.count()
    probed.unpersist()
    pairs
  }

  /** Persist the index: corpus partitioned by `list_id` (so a probe's
    * `where(list_id IN ...)` prunes to its lists' directories at the
    * parquet source — the on-disk layout the scale story depends on)
    * plus a tiny centroids table. */
  def save(index: Index, path: String): Unit = {
    index.assigned.write.mode("overwrite")
      .partitionBy("list_id").parquet(s"$path/corpus")
    val spark = index.assigned.sparkSession
    import spark.implicits._
    index.centroids.toSeq.toDF("list_id", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/centroids")
  }

  /** Load a saved index. The corpus DataFrame is the partitioned scan —
    * queries against it keep the partition-pruning property. */
  def load(spark: org.apache.spark.sql.SparkSession, path: String): Index = {
    import spark.implicits._
    val cents = spark.read.parquet(s"$path/centroids")
      .select(col("list_id").cast("int"), col("centroid"))
      .as[(Int, Array[Double])].collect().sortBy(_._1)
    Index(cents, spark.read.parquet(s"$path/corpus"))
  }

  /** Query: for each query vector, probe the nProbe nearest lists and
    * rank candidates by exact cosine within them. Norms are hoisted to
    * the single-side scans (qn once per query, en once per corpus
    * vector) — the per-pair work is just the dot product, a native
    * codegen expression (functions/VectorExprs) folding left-to-right
    * exactly like the aggregate/zip_with SQL it replaces. */
  def query(index: Index, queries: DataFrame, k: Int = 5, nProbe: Int = 4): DataFrame = {
    import graft.functions.VectorExprs.{dotF64, l2normF64}
    val spark = queries.sparkSession
    import spark.implicits._
    val cents = index.centroids.toSeq
      .map { case (id, c) => (id, c) }.toDF("list_id", "centroid")
    // query × centroid similarity → top nProbe lists per query
    val probed = queries
      .select(col("vec_id").as("qid"), col("embedding").cast("array<double>").as("qe"))
      .withColumn("qn", l2normF64(col("qe")))
      .crossJoin(broadcast(cents))
      .withColumn("csim",
        dotF64(col("qe"), col("centroid")) / (col("qn") * l2normF64(col("centroid"))))
      .withColumn("crn", row_number().over(
        Window.partitionBy(col("qid")).orderBy(desc("csim"), col("list_id"))))
      .where(col("crn") <= nProbe)
      .select(col("qid"), col("qe"), col("qn"), col("list_id"))
    // score only candidates in the probed lists; same float path as the
    // brute-force baseline (dot / (qn * en), rounded) so full probing is
    // bit-identical to it
    val cands = broadcast(probed).join(
        index.assigned
          .withColumn("ed", col("embedding").cast("array<double>"))
          .withColumn("en", l2normF64(col("ed"))), Seq("list_id"))
      .where(col("qid") =!= col("vec_id"))
      .withColumn("cosine", round(dotF64(col("qe"), col("ed")) / (col("qn") * col("en")), 6))
    cands.withColumn("rn", row_number().over(
        Window.partitionBy(col("qid")).orderBy(desc("cosine"), col("vec_id"))))
      .where(col("rn") <= k)
      .select(col("qid"), col("vec_id"), col("cosine"), col("rn"))
  }
}
