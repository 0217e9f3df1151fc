package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.util.QueryExecutionListener

/** Dev probe: dump the REAL executed plan of every eager action inside
  * one distributed ConnectedComponents.run (localFinishEdges = 0 forces
  * the distributed rounds) — the per-round propagation plan is otherwise
  * invisible (the returned frame is a checkpoint scan). Evidence
  * instrument for the r20 co-partitioning change: the committed
  * before/after files are the round-k executions' formatted plans,
  * Exchange nodes counted from exactly what ran.
  *
  * Usage: runMain graft.tools.CcRoundPlan <outDir>
  */
object CcRoundPlan {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/tmp/cc_round_plans")
    new java.io.File(out).mkdirs()
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val n = new java.util.concurrent.atomic.AtomicInteger
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution,
          durationNs: Long): Unit = {
        val i = n.incrementAndGet()
        val w = new java.io.PrintWriter(
          new java.io.File(out, f"exec_$i%02d_$funcName.txt"))
        try w.write(qe.explainString(FormattedMode)) finally w.close()
      }
      override def onFailure(funcName: String, qe: QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    // big enough that the symmetrized cache exceeds the broadcast
    // threshold (the soak's join is sort-merge; a kilobyte probe graph
    // broadcasts instead and shows the wrong plan shape), small enough
    // for a ~15 s run: ~820k edges, 8 propagation rounds
    val edges = graft.operators.ConnectedComponents
      .soakEdges(spark, clusters = 150000L, chains = 10000L, chainLen = 8L)
    graft.operators.ConnectedComponents.run(edges, localFinishEdges = 0L)
      .write.format("noop").mode("overwrite").save()
    Thread.sleep(1000) // QueryExecutionListener delivery is async
    println(s"[ccroundplan] ${n.get()} executions dumped to $out")
    spark.stop()
  }
}
