package graft

import scala.util.{Failure, Success, Try}

import org.apache.spark.sql.types.TimestampNTZType
import org.scalatest.funsuite.AnyFunSuite

/** Schema-drift alarm. The driver's testdata parquet has drifted twice
  * (TIMESTAMP(NANOS) → long shim; TIMESTAMP(MICROS, isAdjustedToUTC=false)
  * → TIMESTAMP_NTZ), each time surfacing as a confusing downstream failure
  * (an `unix_micros` AnalysisException inside a window query, a
  * `LocalDateTime cannot be cast to Timestamp` in a split collect). This
  * spec pins the canonical post-normalization schema of every testdata
  * table and analyzes every registered query, so the THIRD drift is named
  * as what it is: the table, the column, and the type that moved.
  */
class SchemaGuardSpec extends AnyFunSuite with TestSpark {

  private val dir = "/root/testdata/sf0.001"

  // canonical Spark types AFTER Tables.load normalization: naive parquet
  // timestamps must surface as TIMESTAMP (not TIMESTAMP_NTZ), nanos as a
  // shimmed TIMESTAMP — never as raw long
  private val canonical: Map[String, Seq[(String, String)]] = Map(
    "region" -> Seq("r_regionkey" -> "int", "r_name" -> "string"),
    "nation" -> Seq("n_nationkey" -> "int", "n_name" -> "string",
      "n_regionkey" -> "int"),
    "customer" -> Seq("c_custkey" -> "bigint", "c_name" -> "string",
      "c_nationkey" -> "int", "c_acctbal" -> "double",
      "c_mktsegment" -> "string"),
    "supplier" -> Seq("s_suppkey" -> "bigint", "s_name" -> "string",
      "s_nationkey" -> "int", "s_acctbal" -> "double"),
    "part" -> Seq("p_partkey" -> "bigint", "p_name" -> "string",
      "p_brand" -> "string", "p_type" -> "string", "p_size" -> "int",
      "p_retailprice" -> "double"),
    "orders" -> Seq("o_orderkey" -> "bigint", "o_custkey" -> "bigint",
      "o_orderstatus" -> "string", "o_totalprice" -> "double",
      "o_orderdate" -> "timestamp", "o_orderpriority" -> "string"),
    "lineitem" -> Seq("l_orderkey" -> "bigint", "l_partkey" -> "bigint",
      "l_suppkey" -> "bigint", "l_linenumber" -> "int",
      "l_quantity" -> "double", "l_extendedprice" -> "double",
      "l_discount" -> "double", "l_tax" -> "double",
      "l_returnflag" -> "string", "l_linestatus" -> "string",
      "l_shipdate" -> "timestamp"),
    "events" -> Seq("event_id" -> "bigint", "ts" -> "timestamp",
      "user_id" -> "bigint", "event_type" -> "string", "value" -> "double",
      "props" -> "string"),
    "documents" -> Seq("doc_id" -> "bigint", "text" -> "string",
      "lang" -> "string", "source" -> "string", "n_chars" -> "bigint"),
    "embeddings" -> Seq("vec_id" -> "bigint", "embedding" -> "array<float>",
      "label" -> "int")
  )

  test("every testdata table loads with its canonical normalized schema") {
    val s = spark
    val drift = Tables.all.flatMap { name =>
      val df = Tables.load(s, dir, name)
      val got = df.schema.fields.toSeq.map(f => f.name -> f.dataType.simpleString)
      val ntz = df.schema.fields.filter(_.dataType == TimestampNTZType)
        .map(f => s"$name.${f.name}: TIMESTAMP_NTZ leaked through Tables.load")
      val mismatch =
        if (got == canonical(name)) Nil
        else Seq(s"$name schema drifted:\n  expected ${canonical(name)}\n  got      $got")
      ntz ++ mismatch
    }
    assert(drift.isEmpty, drift.mkString("\n"))
  }

  test("every registered query constructs and analyzes against real parquet") {
    val s = spark
    // construction + analysis only (no execution): a failure here names
    // the query and the underlying type error instead of surfacing as a
    // windows-audit casualty or a silent verify skip
    val broken = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        Try(fn(s, dir).queryExecution.analyzed) match {
          case Success(_) => Nil
          case Failure(e) =>
            Seq(s"$name: ${e.getClass.getSimpleName}: ${e.getMessage.take(300)}")
        }
    }
    assert(broken.isEmpty, broken.mkString("\n"))
  }

  test("events table SHAPE: ~30-day span, bounded per-user cardinality") {
    // q207/q210 cut the span at exact integer percents, q208 sizes its
    // recursive-walk oracle from sessions-per-user, and the funnel
    // operators assume users (not the time axis) scale with SF. If a
    // driver testdata regeneration changes that shape, this test names
    // the drift BEFORE a gate infers it from a hash mismatch.
    val s = spark
    import org.apache.spark.sql.functions._
    val r = Tables.load(s, dir, "events").agg(
      (unix_micros(max(col("ts"))) - unix_micros(min(col("ts")))).as("spanUs"),
      (count(lit(1)) / countDistinct(col("user_id"))).as("perUser")).head()
    val spanDays = r.getLong(0) / 86400000000.0
    assert(spanDays >= 25 && spanDays <= 35,
      s"events span drifted: $spanDays days (expected ~30)")
    assert(r.getDouble(1) >= 30 && r.getDouble(1) <= 150,
      s"events per user drifted: ${r.getDouble(1)} (expected ~66)")
    val maxPerUser = Tables.load(s, dir, "events")
      .groupBy(col("user_id")).count().agg(max(col("count"))).head().getLong(0)
    assert(maxPerUser <= 400,
      s"max events/user drifted: $maxPerUser (expected ≤ ~100)")
  }

  test("embeddings table GEOMETRY: unit-norm, near-isotropic, faint label signal") {
    // Cosine-gated operators' OUTPUT volume (q86/q133/q139-pruning) is a
    // function of the corpus's cosine geometry, not just its row count:
    // r15's scale sweep briefly generated strong clusters (center >>
    // noise) and q133's 10x output inflated from 33 rows to 190M with
    // zero code change. The driver family is unit-norm vectors whose
    // label signal is FAINT (center norm ~0.07 vs per-dim noise std
    // ~0.125; in-cluster cosine>=0.45 rate ~5e-4). Pin that geometry so
    // a driver regeneration — or an unfaithful scale generator — is
    // named here before any gate infers it from a hash mismatch.
    val s = spark
    val rows = Tables.load(s, dir, "embeddings")
      .selectExpr("cast(embedding as array<double>) AS e", "label")
      .collect()
      .map(r => (r.getSeq[Double](0).toArray, r.getInt(1)))
    assertEmbeddingGeometry(rows)
  }

  test("scale-sweep embedding generator matches the pinned geometry") {
    // the sweep is only scale EVIDENCE if its generated family matches
    // the driver family the base measurements run on — same pin, same
    // assertions, so the two can never drift apart silently again
    val rows = graft.tools.ScaleSweep.genEmbeddings(spark, 2000)
      .selectExpr("cast(embedding as array<double>) AS e", "label")
      .collect()
      .map(r => (r.getSeq[Double](0).toArray, r.getInt(1)))
    assertEmbeddingGeometry(rows)
  }

  private def assertEmbeddingGeometry(
      rows: Array[(Array[Double], Int)]): Unit = {
    assert(rows.length <= 5000, "pin assumes a bounded embeddings table")
    def norm(v: Array[Double]) = math.sqrt(v.map(x => x * x).sum)
    val norms = rows.map(r => norm(r._1))
    assert(norms.forall(n => math.abs(n - 1.0) < 0.02),
      s"embeddings no longer unit-norm: norms in [${norms.min}, ${norms.max}]")
    val byLabel = rows.groupBy(_._2)
    val centerNorms = byLabel.values.map { vs =>
      val c = vs.map(_._1).transpose.map(ds => ds.sum / ds.length).toArray
      norm(c)
    }
    assert(centerNorms.forall(_ <= 0.2),
      s"label centers too strong: max center norm ${centerNorms.max} " +
        "(faint-signal family has ~0.07)")
    // bounded in-cluster cosine sample: stride pairs inside each label
    var pass = 0L; var tot = 0L
    byLabel.values.foreach { vs =>
      val a = vs.map(_._1)
      var i = 0
      while (i + 1 < a.length && tot < 200000) {
        val (x, y) = (a(i), a(i + 1))
        val cos = x.zip(y).map(p => p._1 * p._2).sum / (norm(x) * norm(y))
        if (cos >= 0.45) pass += 1
        tot += 1
        i += 1
      }
    }
    assert(tot > 100 && pass.toDouble / tot <= 0.02,
      s"in-cluster cosine>=0.45 rate drifted: $pass/$tot " +
        "(faint-signal family is ~5e-4)")
  }
}
