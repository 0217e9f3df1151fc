package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The DEPLOYMENT arms of the expensive corpus queries.
  *
  * q127/q135/q137/q139/q143's oracle arms re-derive the near-dup pair
  * graph / k-means partition from base tables on every invocation
  * because an oracle row must be self-contained — ~13 s of the sf0.1
  * bench is that honesty tax, not the cost a deployment pays. A real
  * pipeline materializes those artifacts ONCE (the pair table, the
  * cluster table, the contamination table, the per-doc decision table,
  * the k-means assignment) and every downstream read pays only the
  * final joins. These `qNNNs` serve arms read exactly those persisted
  * artifacts ([[ServeArtifacts]] writes them once per sf-dir) and
  * produce BIT-IDENTICAL output to their oracle-arm siblings — each
  * serve query is hash-gated against the SAME DuckDB oracle SQL, so
  * the cheap path is proven correct, not assumed. The bench times both
  * arms; the delta IS the artifact-reuse win.
  */
object ServeQueries extends QueryModule {

  private val stop = Seq("the", "a", "of", "and", "to", "in", "is")
  private val stopSql = stop.map(s => s"'$s'").mkString(", ")

  /** SemDeDup's serve body over a persisted assignment table: vectors
    * re-read from the embeddings base (same cast/norm arithmetic as the
    * gate arm), only the in-cluster pairing + keeper rule run. Shared
    * by the fixed-k (q139s) and balanced-k (q214s) twins. */
  private def semdedupServe(s: SparkSession, dir: String,
      table: String): DataFrame = {
    import graft.functions.VectorExprs.{dotF64, l2normF64}
    import s.implicits._
    val art = ServeArtifacts.ensure(s, dir)
    val vecs = graft.Tables.load(s, dir, "embeddings")
      .select($"vec_id", $"embedding".cast("array<double>").as("ed"))
      .withColumn("nrm", l2normF64($"ed"))
    val asg = s.read.parquet(s"$art/$table")
      .join(vecs, "vec_id")
      .select($"vec_id", $"cluster", $"ed", $"nrm")
    val a = asg.select($"cluster", $"vec_id".as("va"), $"ed".as("ea"),
      $"nrm".as("na"))
    val b = asg.select($"cluster", $"vec_id".as("vb"), $"ed".as("eb"),
      $"nrm".as("nb"))
    val pruned = a.join(b, "cluster")
      .where($"va" < $"vb" &&
        round(dotF64($"ea", $"eb") / ($"na" * $"nb"), 6) >= 0.45)
      .select($"vb".as("vec_id")).distinct()
    asg.select($"vec_id", $"cluster")
      .join(pruned.withColumn("p", lit(true)), Seq("vec_id"), "left")
      .select($"vec_id", $"cluster", coalesce($"p", lit(false)).as("pruned"))
  }

  override def queries: Map[String, QFn] = Map(
    // q127's taxonomy with the two expensive inputs (near-dup clusters,
    // contamination) read from the artifact store; the per-row signals
    // (exact-dup canon, stop/punct/quality) recompute in-line — they
    // are one cheap pass each and a deployment often recomputes them
    // too (they version with the gate config, not with the corpus).
    "q127s_corpus_filter_serve" -> ((s, dir) => {
      import s.implicits._
      val art = ServeArtifacts.ensure(s, dir)
      val docs = graft.Tables.load(s, dir, "documents")
      val canon = docs.groupBy($"text").agg(min($"doc_id").as("canon_id"))
      val exact = docs.join(canon, "text")
        .select($"doc_id", ($"doc_id" =!= $"canon_id").as("is_exact_dup"))
      val clusters = s.read.parquet(s"$art/clusters.parquet")
        .withColumnRenamed("cluster_id", "cid")
      val lq = docs.select($"doc_id", $"text", split($"text", " ").as("t"))
        .select($"doc_id",
          (expr(s"size(filter(t, x -> x IN ($stopSql)))").cast("double") /
            expr("size(t)")).as("stop_ratio"),
          (regexp_count($"text", lit("[^a-z0-9 ]")).cast("double") /
            length($"text")).as("punct_ratio"),
          expr("size(t)").as("n_tokens"))
        .withColumn("quality",
          lit(0.4) * least($"n_tokens".cast("double") / 100.0, lit(1.0)) +
            lit(0.3) * (lit(1.0) - $"punct_ratio") +
            lit(0.3) * least($"stop_ratio" * 10.0, lit(1.0)))
      val contam = s.read.parquet(s"$art/contam.parquet")
        .select($"doc_id", $"contaminated")
      docs.select($"doc_id")
        .join(exact, Seq("doc_id"))
        .join(clusters, Seq("doc_id"), "left")
        .join(lq.select($"doc_id", $"stop_ratio", $"quality"), Seq("doc_id"))
        .join(contam, Seq("doc_id"), "left")
        .withColumn("reason",
          when($"doc_id" % 11 === 0, "benchmark")
            .when($"is_exact_dup", "exact_dup")
            .when($"cid".isNotNull && $"cid" =!= $"doc_id", "near_dup")
            .when(coalesce($"contaminated", lit(false)), "contaminated")
            .when($"stop_ratio" < 0.05, "lang")
            .when($"quality" < 0.5, "low_quality")
            .otherwise("keep"))
        .select($"doc_id", ($"reason" === "keep").as("keep"), $"reason")
    }),

    // q135 with the pair graph read from the persisted pair table —
    // the incremental-shard filter is all that executes.
    "q135s_incremental_dedup_serve" -> ((s, dir) => {
      import s.implicits._
      val art = ServeArtifacts.ensure(s, dir)
      s.read.parquet(s"$art/pairs.parquet")
        .where(($"da" % 10 === 7) =!= ($"db" % 10 === 7))
        .select(
          when($"da" % 10 === 7, $"da").otherwise($"db").as("new_doc"),
          when($"da" % 10 === 7, $"db").otherwise($"da").as("old_doc"),
          $"jaccard")
    }),

    // q137 reading the persisted per-doc decision table: one join +
    // one dims-sized aggregate — the cost the monitoring page pays.
    "q137s_source_report_serve" -> ((s, dir) => {
      import s.implicits._
      val art = ServeArtifacts.ensure(s, dir)
      val decisions = s.read.parquet(s"$art/decisions.parquet")
      val src = graft.Tables.load(s, dir, "documents")
        .select($"doc_id", $"source")
      decisions.join(src, "doc_id")
        .groupBy($"source", $"reason").agg(count(lit(1)).as("n"))
    }),

    // q139 with the k-means partition read from the persisted
    // assignment table (vectors re-read from the embeddings base table,
    // same cast/norm arithmetic): only the in-cluster pairing runs.
    "q139s_semdedup_serve" -> ((s, dir) =>
      semdedupServe(s, dir, "kmeans.parquet")),

    // q214 over the persisted BALANCED (k ≈ √n) assignment — the same
    // serve accounting for the posture a production corpus would run:
    // the Lloyd fit is artifact build-time, only the (smaller, since
    // clusters are √n-sized) in-cluster pairing runs at serve.
    "q214s_semdedup_balanced_serve" -> ((s, dir) =>
      semdedupServe(s, dir, "kmeans_balanced.parquet")),

    // q143 over the persisted assignment: one join + a dims-sized
    // contingency table with its windows.
    // q191 with the BPE segmentation read from the persisted vocab
    // table — the 12 training rounds (the dominant cost) are artifact
    // build-time; the serve path is one broadcast join + one agg.
    "q191s_bpe_tokens_serve" -> ((s, dir) => {
      import s.implicits._
      val art = ServeArtifacts.ensure(s, dir)
      val docs = graft.Tables.load(s, dir, "documents")
      val seg = s.read.parquet(s"$art/bpe_seg.parquet")
      val pd = docs.select($"doc_id", explode(split($"text", " ")).as("word"))
        .where($"word" =!= "")
        .join(broadcast(seg), "word")
        .groupBy($"doc_id")
        .agg(count(lit(1)).as("nw"), sum($"n_syms").as("ns"))
      docs.select($"doc_id")
        .join(pd, Seq("doc_id"), "left")
        .select($"doc_id",
          coalesce($"nw", lit(0L)).as("n_words"),
          coalesce($"ns", lit(0L)).as("n_subword"),
          when($"nw" > 0, $"ns".cast("double") / $"nw").as("subword_ratio"))
    }),

    "q143s_cluster_mix_serve" -> ((s, dir) => {
      import s.implicits._
      val art = ServeArtifacts.ensure(s, dir)
      val emb = graft.Tables.load(s, dir, "embeddings")
      val asg = s.read.parquet(s"$art/kmeans.parquet")
      val cells = asg.join(emb.select($"vec_id", $"label"), "vec_id")
        .groupBy($"cluster", $"label").agg(count(lit(1)).as("n"))
      val w = Window.partitionBy($"cluster")
      cells
        .withColumn("cl_n", sum($"n").over(w))
        .withColumn("max_n", max($"n").over(w))
        .select($"cluster", $"label", $"n",
          ($"max_n".cast("double") / $"cl_n").as("purity"))
    })
  )

  // Each serve arm answers to the SAME oracle as its oracle-arm
  // sibling: identical results from a different (cheaper) plan.
  override def oracles: Map[String, String] = Map(
    "q127s_corpus_filter_serve" ->
      DedupTextQueries.oracles("q127_corpus_filter"),
    "q135s_incremental_dedup_serve" ->
      DedupTextQueries.oracles("q135_incremental_dedup"),
    "q137s_source_report_serve" ->
      DedupTextQueries.oracles("q137_source_report"),
    "q139s_semdedup_serve" ->
      CorpusQueries.oracles("q139_semdedup"),
    "q214s_semdedup_balanced_serve" ->
      CorpusQueries.oracles("q214_semdedup_balanced"),
    "q143s_cluster_mix_serve" ->
      CorpusQueries.oracles("q143_cluster_mix"),
    "q191s_bpe_tokens_serve" ->
      CorpusQueries.oracles("q191_bpe_tokens")
  )
}

/** One-time materialization of the pipeline artifacts the serve arms
  * read: pair table (q90), cluster table (q95), contamination (q125),
  * per-doc decisions (q127), k-means assignment (q138's fit). Keyed by
  * sf-dir path + a per-file CONTENT fingerprint (length + mtime + first
  * and last 4 KB — the parquet footer with its row-group stats lives in
  * the tail), so a regenerated corpus rebuilds even when its mtime is
  * unchanged, at O(8 KB) per file regardless of table size. */
object ServeArtifacts {

  private def fingerprint(f: java.io.File): String = {
    if (!f.exists) return "absent"
    val md = java.security.MessageDigest.getInstance("MD5")
    val raf = new java.io.RandomAccessFile(f, "r")
    try {
      val n = raf.length
      md.update(java.nio.ByteBuffer.allocate(16)
        .putLong(n).putLong(f.lastModified).array)
      val head = new Array[Byte](math.min(4096L, n).toInt)
      raf.readFully(head); md.update(head)
      if (n > 4096) {
        raf.seek(n - 4096)
        val tail = new Array[Byte](4096)
        raf.readFully(tail); md.update(tail)
      }
    } finally raf.close()
    md.digest().map("%02x".format(_)).mkString
  }

  /** Bump when any artifact-PRODUCING semantic changes (a stale artifact
    * built by older code would otherwise serve values the current gate
    * oracle no longer matches — the key fingerprints the DATA, this
    * fingerprints the CODE). v2: grid-exact ExactKMeans distances.
    * v3: + BPE segmentation table (q191s).
    * v4: + balanced-k k-means assignment (q214s). */
  private val artifactVersion = "v4"

  private[queries] def key(dir: String): String = {
    val prints = Seq("documents.parquet", "embeddings.parquet")
      .map(t => fingerprint(new java.io.File(dir, t)))
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(
      s"$artifactVersion:$dir:${prints.mkString(",")}".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    hex.take(12)
  }

  /** Build the artifact set for `dir` if absent; returns its root. */
  def ensure(s: SparkSession, dir: String): String = synchronized {
    // pid-scoped (graft.queries.Scratch): a second JVM seeing `_done`
    // absent would otherwise build INTO a root this one is mid-build on
    // (the `synchronized` + `_done` handshake protects one JVM only).
    // Costs cross-JVM artifact reuse, which only ever helped local
    // back-to-back runs — the driver's bench starts cold regardless.
    val root = new java.io.File(Scratch.dir(s"serve_${key(dir)}"))
    val done = new java.io.File(root, "_done")
    if (!done.exists) {
      import org.apache.spark.storage.StorageLevel
      val pairs = DedupTextQueries.queries("q90_neardup_lsh_verify")(s, dir)
        .persist(StorageLevel.MEMORY_AND_DISK)
      pairs.write.mode("overwrite").parquet(s"$root/pairs.parquet")
      graft.operators.ConnectedComponents.run(pairs, "da", "db")
        .select(col("node").as("doc_id"), col("component").as("cluster_id"))
        .write.mode("overwrite").parquet(s"$root/clusters.parquet")
      pairs.unpersist()
      DedupTextQueries.queries("q125_contamination")(s, dir)
        .write.mode("overwrite").parquet(s"$root/contam.parquet")
      DedupTextQueries.queries("q127_corpus_filter")(s, dir)
        .write.mode("overwrite").parquet(s"$root/decisions.parquet")
      val emb = graft.Tables.load(s, dir, "embeddings")
      graft.ml.ExactKMeans.run(emb, k = 8, updates = 2)
        .select(col("vec_id"), col("cluster"))
        .write.mode("overwrite").parquet(s"$root/kmeans.parquet")
      graft.ml.ExactKMeans
        .run(emb, k = graft.ml.SemDeDup.balancedK(emb.count()), updates = 2)
        .select(col("vec_id"), col("cluster"))
        .write.mode("overwrite").parquet(s"$root/kmeans_balanced.parquet")
      graft.ml.BpeTrainer.trainedSegmentation(s, dir, rounds = 12)
        .select(col("word"), col("n_syms"))
        .write.mode("overwrite").parquet(s"$root/bpe_seg.parquet")
      done.createNewFile(): Unit
    }
    root.toString
  }
}
