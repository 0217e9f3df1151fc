package graft.ml

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.ml.linalg.Vector
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF-style approximate nearest neighbour search over an embedding
  * column — the 100 TB scale path next to the brute-force baseline
  * (queries q54): a coarse quantizer (seeded MLlib KMeans) partitions
  * vectors into `nLists` inverted lists; a query probes only its
  * `nProbe` nearest centroids, so the scored candidate set is
  * ~nProbe/nLists of the corpus instead of all of it.
  *
  * Scale design: centroids are a tiny broadcast dim; the corpus is
  * scanned once at index build and joined by `list_id` at query time —
  * with the corpus bucketed/partitioned by list_id on disk, a probe
  * reads only its lists' partitions.
  */
object AnnIndex {

  final case class Index(centroids: Array[(Int, Array[Double])], assigned: DataFrame)

  /** Build: k-means the embeddings (seeded ⇒ deterministic), assign a
    * list_id per vector. */
  def build(embeddings: DataFrame, nLists: Int = 16, seed: Long = 42L,
      maxIter: Int = 20): Index = {
    val withVec = embeddings.withColumn("features",
      array_to_vector(col("embedding").cast("array<double>")))
    val km = new KMeans().setK(nLists).setSeed(seed).setMaxIter(maxIter)
      .setFeaturesCol("features").setPredictionCol("list_id")
    val model = km.fit(withVec)
    val assigned = model.transform(withVec).drop("features")
    val centroids = model.clusterCenters.zipWithIndex
      .map { case (c, i) => (i, c.toArray) }
    Index(centroids, assigned)
  }

  private def cosineExpr(a: String, b: String) = expr(
    s"""aggregate(zip_with($a, $b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)
       | / (sqrt(aggregate(transform($a, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v))
       |    * sqrt(aggregate(transform($b, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)))"""
      .stripMargin)

  /** Query: for each query vector, probe the nProbe nearest lists and
    * rank candidates by exact cosine within them. */
  def query(index: Index, queries: DataFrame, k: Int = 5, nProbe: Int = 4): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    val cents = index.centroids.toSeq
      .map { case (id, c) => (id, c) }.toDF("list_id", "centroid")
    // query × centroid similarity → top nProbe lists per query
    val probed = queries.select(col("vec_id").as("qid"), col("embedding").as("qe"))
      .crossJoin(broadcast(cents))
      .withColumn("csim", cosineExpr("qe", "centroid"))
      .withColumn("crn", row_number().over(
        Window.partitionBy(col("qid")).orderBy(desc("csim"), col("list_id"))))
      .where(col("crn") <= nProbe)
      .select(col("qid"), col("qe"), col("list_id"))
    // score only candidates in the probed lists
    val cands = probed.join(index.assigned, Seq("list_id"))
      .where(col("qid") =!= col("vec_id"))
      .withColumn("cosine", round(cosineExpr("qe", "embedding"), 6))
    cands.withColumn("rn", row_number().over(
        Window.partitionBy(col("qid")).orderBy(desc("cosine"), col("vec_id"))))
      .where(col("rn") <= k)
      .select(col("qid"), col("vec_id"), col("cosine"), col("rn"))
  }
}
