package graft.sources

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Pins the r16 flake mechanism in `VersionedTable.commit` and its fix.
  *
  * Mechanism (observed ~1-in-3 full-suite runs in the "checkpoints
  * during concurrent disjoint writers" test): arbitration is by
  * exclusive entry-file create, but with create(false)+write+close the
  * winner's CONTENT landed only at close() — a winner descheduled
  * between the two (full-suite JVM load: 32 executor threads + GC)
  * left the entry file visible-but-torn longer than the loser's
  * bounded 1 s poll, and the loser's conservative
  * ConcurrentModificationException failed the test even though both
  * merges touched disjoint partitions.
  *
  * Fix (publishEntry): on the local FS the entry bytes are fully
  * written to a hidden temp file and HARD-LINKED into place — link(2)
  * is atomic and fails if the destination exists, so "entry file
  * exists" now implies "entry fully readable" and the torn window is
  * structurally impossible, independent of scheduler timing.
  *
  * The pin: hammer the commit primitive from several threads (no Spark
  * jobs in the loop, so create races are orders of magnitude more
  * frequent than any upsert workload can produce) while a tight reader
  * asserts every log entry it ever lists is COMPLETE at first read.
  * Under the pre-fix protocol this reader catches 0-byte/partial
  * entries readily; under publishEntry it can never see one.
  */
class VersionedTableStressSpec extends AnyFunSuite with TestSpark {

  private def commitOf(t: VersionedTable): t.Entry => Long = {
    val m = classOf[VersionedTable].getDeclaredMethods
      .find(_.getName.endsWith("commit")).get
    m.setAccessible(true)
    e =>
      try m.invoke(t, e).asInstanceOf[Long]
      catch {
        case ite: java.lang.reflect.InvocationTargetException => throw ite.getCause
      }
  }

  test("commit publish is atomic under contention: no reader ever sees a torn entry, no disjoint merge ever conflicts") {
    val root = Files.createTempDirectory("graft_vt_stress").toString + "/t"
    val t = new VersionedTable(spark, root, partitionCol = "m")
    val commit = commitOf(t)
    val logDir = Paths.get(root, "_graft_log")

    val nThreads = 3
    val nPer = 200
    import java.util.concurrent.{CountDownLatch, Executors}
    import java.util.concurrent.atomic.AtomicBoolean
    val pool = Executors.newFixedThreadPool(nThreads + 1)
    val gate = new CountDownLatch(1)
    val writersDone = new AtomicBoolean(false)

    // tight reader: every *.json entry file must decode-shape-complete
    // the FIRST time it is visible (nonempty, closes its JSON object)
    val torn = scala.collection.concurrent.TrieMap.empty[String, Int]
    val reader = pool.submit(new java.util.concurrent.Callable[Int] {
      def call(): Int = {
        gate.await()
        val seen = scala.collection.mutable.Set.empty[String]
        var polls = 0
        while (!writersDone.get()) {
          if (Files.exists(logDir)) {
            Files.list(logDir).iterator().asScala
              .map(_.getFileName.toString)
              .filter(n => n.endsWith(".json") && !n.startsWith(".") &&
                !n.endsWith(".checkpoint.json") && !seen(n))
              .toSeq.foreach { n =>
                seen += n
                val b = Files.readAllBytes(logDir.resolve(n))
                if (b.isEmpty || b.head != '{' || b.last != '}')
                  torn.put(n, b.length): Unit
              }
          }
          polls += 1
        }
        polls
      }
    })

    def writer(tid: Int) = pool.submit(new java.util.concurrent.Callable[Unit] {
      def call(): Unit = {
        gate.await()
        (1 to nPer).foreach { i =>
          commit(t.Entry(t.latestVersion + 1, f"st$tid%02d$i%04d", i.toLong,
            "merge", Seq(t.Add(s"data/m=$tid/st$tid-$i.parquet", s"$tid")),
            Seq.empty, 1L, 0L)): Unit
        }
      }
    })

    val ws = (1 to nThreads).map(writer)
    gate.countDown()
    // disjoint partitions: every commit must land via rebase, never CME
    ws.foreach(_.get())
    writersDone.set(true)
    val polls = reader.get()
    pool.shutdown()

    assert(torn.isEmpty, s"reader observed torn entries: $torn")
    assert(polls > 0)
    assert(t.latestVersion === (nThreads * nPer).toLong)
    // every commit landed exactly one decodable version — none skipped,
    // none lost, and the log replays completely
    assert(t.history().map(_.version) === (1L to (nThreads * nPer).toLong))
  }
}
