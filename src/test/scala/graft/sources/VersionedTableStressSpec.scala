package graft.sources

import java.nio.file.{Files, Paths, StandardOpenOption}

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** A scheme≠"file" filesystem over local disk, so a spec can drive
  * `VersionedTable`'s non-local publish dispatch (the HDFS branch)
  * without HDFS: behavior is RawLocalFileSystem's, but `getScheme`
  * reports "graftfake", every exclusive-create and rename is counted
  * (with the created paths recorded), and `rename` enforces the HDFS
  * contract — it FAILS onto an existing destination instead of
  * POSIX-replacing it — so publishViaRename's arbitration is exercised
  * under the semantics of the filesystem class it is written for.
  * (The exists+rename here is check-then-act, fine for the sequential
  * fixture; on real HDFS the no-overwrite rename is itself atomic.) */
class GraftFakeSchemeFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = "graftfake"
  override def getUri: java.net.URI = java.net.URI.create("graftfake:///")
  override def create(f: org.apache.hadoop.fs.Path, overwrite: Boolean,
      bufferSize: Int, replication: Short, blockSize: Long,
      progress: org.apache.hadoop.util.Progressable)
      : org.apache.hadoop.fs.FSDataOutputStream = {
    GraftFakeSchemeFs.creates.incrementAndGet(): Unit
    GraftFakeSchemeFs.createdNames.add(f.getName): Unit
    super.create(f, overwrite, bufferSize, replication, blockSize, progress)
  }
  override def rename(src: org.apache.hadoop.fs.Path,
      dst: org.apache.hadoop.fs.Path): Boolean = {
    GraftFakeSchemeFs.renames.incrementAndGet(): Unit
    if (exists(dst)) false else super.rename(src, dst)
  }
}
object GraftFakeSchemeFs {
  val creates = new java.util.concurrent.atomic.AtomicInteger(0)
  val renames = new java.util.concurrent.atomic.AtomicInteger(0)
  val createdNames = new java.util.concurrent.ConcurrentLinkedQueue[String]
}

/** Like [[GraftFakeSchemeFs]] but rename surfaces the no-overwrite
  * conflict as a THROWN FileAlreadyExistsException instead of a false —
  * the Options.Rename contract shape several non-HDFS Hadoop
  * filesystems expose. Pins that publishViaRename maps the throw to the
  * same lost-race rebase as the boolean form. */
class GraftThrowRenameFs extends GraftFakeSchemeFs {
  override def getScheme: String = "graftthrow"
  override def getUri: java.net.URI = java.net.URI.create("graftthrow:///")
  override def rename(src: org.apache.hadoop.fs.Path,
      dst: org.apache.hadoop.fs.Path): Boolean = {
    if (exists(dst))
      throw new org.apache.hadoop.fs.FileAlreadyExistsException(dst.toString)
    super.rename(src, dst)
  }
}

/** Like [[GraftFakeSchemeFs]] but any stream opened on a LIVE entry name
  * (non-hidden *.json) throws on the first write — the ENOSPC /
  * died-pipeline shape AFTER a successful exclusive create. Pins that
  * publishViaCreate treats a write failure on a destination it OWNS as
  * a propagating I/O error (plus remnant cleanup), never as the
  * lost-race false that sends commit() into a misleading conflict. */
class GraftBoomWriteFs extends GraftFakeSchemeFs {
  override def getScheme: String = "graftboom"
  override def getUri: java.net.URI = java.net.URI.create("graftboom:///")
  override def create(f: org.apache.hadoop.fs.Path, overwrite: Boolean,
      bufferSize: Int, replication: Short, blockSize: Long,
      progress: org.apache.hadoop.util.Progressable)
      : org.apache.hadoop.fs.FSDataOutputStream = {
    val out =
      super.create(f, overwrite, bufferSize, replication, blockSize, progress)
    if (!f.getName.startsWith(".") && f.getName.endsWith(".json"))
      new org.apache.hadoop.fs.FSDataOutputStream(new java.io.OutputStream {
        override def write(b: Int): Unit =
          throw new java.io.IOException("simulated mid-write failure")
        override def close(): Unit = out.close()
      }, null)
    else out
  }
}

/** Pins the r16 flake mechanism in `VersionedTable.commit` and its fix —
  * BOTH sides, plus the non-local publish branch.
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
  * Fix (publishViaLink): on the local FS the entry bytes are fully
  * written to a hidden temp file and HARD-LINKED into place — link(2)
  * is atomic and fails if the destination exists, so "entry file
  * exists" now implies "entry fully readable" and the torn window is
  * structurally impossible, independent of scheduler timing.
  *
  * The pin: hammer the commit primitive from several threads (no Spark
  * jobs in the loop, so create races are orders of magnitude more
  * frequent than any upsert workload can produce) while a tight reader
  * asserts every log entry it ever lists is COMPLETE at first read.
  * The NEGATIVE CONTROL (committed, not a local-only demonstration)
  * re-installs the pre-fix create→window→write shape through the
  * `publishOverride` seam and asserts the same reader DOES catch torn
  * entries — so the green atomic run is evidence the reader would have
  * caught a regression, not a vacuous pass. */
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

  /** `nThreads` writers × `nPer` disjoint-partition merges against the
    * bare commit primitive, with a tight reader polling the log dir:
    * every *.json entry file must decode-shape-complete (nonempty,
    * closes its JSON object) the FIRST time it is visible. Returns the
    * torn-entry map (name → observed byte length) and the poll count. */
  private def hammer(t: VersionedTable, root: String,
      nThreads: Int, nPer: Int): (Map[String, Int], Int) = {
    val commit = commitOf(t)
    val logDir = Paths.get(root, "_graft_log")
    import java.util.concurrent.{CountDownLatch, Executors}
    import java.util.concurrent.atomic.AtomicBoolean
    val pool = Executors.newFixedThreadPool(nThreads + 1)
    val gate = new CountDownLatch(1)
    val writersDone = new AtomicBoolean(false)

    val torn = scala.collection.concurrent.TrieMap.empty[String, Int]
    val reader = pool.submit(new java.util.concurrent.Callable[Int] {
      def call(): Int = {
        gate.await()
        val seen = scala.collection.mutable.Set.empty[String]
        var polls = 0
        while (!writersDone.get()) {
          if (Files.exists(logDir)) {
            // close the directory stream every poll — a leaked stream
            // per iteration exhausts file descriptors over a long run
            val st = Files.list(logDir)
            val names =
              try st.iterator().asScala.map(_.getFileName.toString).toList
              finally st.close()
            names.filter(n => n.endsWith(".json") && !n.startsWith(".") &&
              !n.endsWith(".checkpoint.json") && !seen(n))
              .foreach { n =>
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
    (torn.toMap, polls)
  }

  test("commit publish is atomic under contention: no reader ever sees a torn entry, no disjoint merge ever conflicts") {
    val root = Files.createTempDirectory("graft_vt_stress").toString + "/t"
    val t = new VersionedTable(spark, root, partitionCol = "m")
    val (nThreads, nPer) = (3, 200)
    val (torn, polls) = hammer(t, root, nThreads, nPer)

    assert(torn.isEmpty, s"reader observed torn entries: $torn")
    assert(polls > 0)
    assert(t.latestVersion === (nThreads * nPer).toLong)
    // every commit landed exactly one decodable version — none skipped,
    // none lost, and the log replays completely
    assert(t.history().map(_.version) === (1L to (nThreads * nPer).toLong))
  }

  test("NEGATIVE CONTROL: under the pre-fix create→window→write publish shape the same reader catches torn entries") {
    val root = Files.createTempDirectory("graft_vt_negctl").toString + "/t"
    val t = new VersionedTable(spark, root, partitionCol = "m")
    // the r16 mechanism, made deterministic: the entry becomes VISIBLE
    // (exclusive create) before its content lands, with the descheduled-
    // winner gap widened from scheduler luck to a fixed 2 ms. ONE writer
    // only: the control pins the READER's torn-entry detection, and
    // re-adding writer contention would re-import the pre-fix CME flake
    // itself (a loser's bounded poll expiring while the winner sleeps in
    // the widened window) — the very nondeterminism the r17 fix killed.
    t.publishOverride = Some { (p, bytes) =>
      val np = Paths.get(p.toUri.getPath)
      try {
        Files.createDirectories(np.getParent)
        Files.write(np, Array.emptyByteArray, StandardOpenOption.CREATE_NEW)
        Thread.sleep(2)
        Files.write(np, bytes)
        true
      } catch { case _: java.nio.file.FileAlreadyExistsException => false }
    }
    val (nThreads, nPer) = (1, 60)
    val (torn, polls) = hammer(t, root, nThreads, nPer)

    assert(polls > 0)
    // identical commit workload — everything lands...
    assert(t.latestVersion === (nThreads * nPer).toLong)
    assert(t.history().map(_.version) === (1L to (nThreads * nPer).toLong))
    // ...but the reader DOES observe visible-before-complete entries:
    // the detector is sharp, so the atomic test's green is evidence
    assert(torn.nonEmpty,
      "the tight reader failed to catch the pre-fix torn window — the atomic test would be vacuous")
  }

  test("scheme != file dispatches to the temp+rename publish path: commits are torn-window-free by construction and collisions rebase") {
    val conf = spark.sparkContext.hadoopConfiguration
    conf.set("fs.graftfake.impl", classOf[GraftFakeSchemeFs].getName)
    val local = Files.createTempDirectory("graft_vt_fake").toString + "/t"
    val root = s"graftfake://$local"
    val t = new VersionedTable(spark, root, partitionCol = "m")
    val commit = commitOf(t)
    GraftFakeSchemeFs.createdNames.clear()
    val (beforeC, beforeR) =
      (GraftFakeSchemeFs.creates.get(), GraftFakeSchemeFs.renames.get())

    // sequential interleaved writers (the fake's no-overwrite rename is
    // check-then-act, not atomic — racing it would test the fake FS,
    // not VersionedTable; HDFS's no-overwrite rename IS atomic)
    (1 to 20).foreach { i =>
      val tid = i % 2
      commit(t.Entry(t.latestVersion + 1, f"fb$tid%02d$i%04d", i.toLong,
        "merge", Seq(t.Add(s"data/m=$tid/fb$tid-$i.parquet", s"$tid")),
        Seq.empty, 1L, 0L)): Unit
    }
    assert(t.latestVersion === 20L)
    assert(t.history().map(_.version) === (1L to 20L))
    // a deliberate collision: pre-claim version 21, then commit — the
    // loser's rename must fail onto the taken destination (the HDFS
    // contract the fake enforces) and rebase past it
    val claimed = t.Entry(21L, "squatter", 0L, "merge",
      Seq(t.Add("data/m=9/squat.parquet", "9")), Seq.empty, 1L, 0L)
    assert(commit(claimed) === 21L)
    val rebased = commit(t.Entry(21L, "loser", 0L, "merge",
      Seq(t.Add("data/m=8/loser.parquet", "8")), Seq.empty, 1L, 0L))
    assert(rebased === 22L, "collision on a taken version must rebase, not fail")
    // every commit = one temp create + one rename into place
    assert(GraftFakeSchemeFs.renames.get() - beforeR >= 23,
      "scheme != file must publish via the rename branch")
    assert(GraftFakeSchemeFs.creates.get() - beforeC >= 23)
    // the torn-window-free pin: no fs.create EVER targeted a live entry
    // name — bytes only ever land in hidden `.pre_` temps, so an entry
    // file that exists is complete from its first visible instant (the
    // negative control above proves the tight reader would catch the
    // alternative)
    val entryCreates = GraftFakeSchemeFs.createdNames.toArray
      .map(_.toString).filterNot(_.startsWith("."))
    assert(entryCreates.isEmpty,
      s"publish created live entry names in place (torn window): ${entryCreates.mkString(",")}")
  }

  test("memoized last resort: with rename unsupported, scheme != file commits land via exclusive create and still rebase on collision") {
    val conf = spark.sparkContext.hadoopConfiguration
    conf.set("fs.graftfake.impl", classOf[GraftFakeSchemeFs].getName)
    val local = Files.createTempDirectory("graft_vt_fake_lr").toString + "/t"
    val t = new VersionedTable(spark, s"graftfake://$local", partitionCol = "m")
    t.renameSupported = false
    val commit = commitOf(t)
    GraftFakeSchemeFs.createdNames.clear()
    val beforeR = GraftFakeSchemeFs.renames.get()

    (1 to 10).foreach { i =>
      commit(t.Entry(t.latestVersion + 1, f"lr00$i%04d", i.toLong,
        "merge", Seq(t.Add(s"data/m=${i % 2}/lr-$i.parquet", s"${i % 2}")),
        Seq.empty, 1L, 0L)): Unit
    }
    assert(t.history().map(_.version) === (1L to 10L))
    // collision through the create path: publishViaCreate must map the
    // EEXIST family to a lost-race false (rebase), not propagate
    assert(commit(t.Entry(11L, "squat", 0L, "merge",
      Seq(t.Add("data/m=9/s.parquet", "9")), Seq.empty, 1L, 0L)) === 11L)
    assert(commit(t.Entry(11L, "loser", 0L, "merge",
      Seq(t.Add("data/m=8/l.parquet", "8")), Seq.empty, 1L, 0L)) === 12L)
    assert(GraftFakeSchemeFs.renames.get() === beforeR,
      "rename-unsupported table must not touch the rename branch")
    // entries were created IN PLACE (the last resort's documented torn
    // window — commit()'s bounded poll is the mitigation there)
    assert(GraftFakeSchemeFs.createdNames.toArray.map(_.toString)
      .exists(n => n.endsWith(".json") && !n.startsWith(".")))
  }

  test("rename path: a thrown FileAlreadyExistsException is the same lost-race signal as a false — collisions rebase, never crash") {
    val conf = spark.sparkContext.hadoopConfiguration
    conf.set("fs.graftthrow.impl", classOf[GraftThrowRenameFs].getName)
    val local = Files.createTempDirectory("graft_vt_thr").toString + "/t"
    val t = new VersionedTable(spark, s"graftthrow://$local", partitionCol = "m")
    val commit = commitOf(t)
    assert(commit(t.Entry(1L, "squat", 0L, "merge",
      Seq(t.Add("data/m=9/s.parquet", "9")), Seq.empty, 1L, 0L)) === 1L)
    // the loser's rename THROWS onto the taken destination; the commit
    // must rebase past it exactly as on the boolean-false contract
    assert(commit(t.Entry(1L, "loser", 0L, "merge",
      Seq(t.Add("data/m=8/l.parquet", "8")), Seq.empty, 1L, 0L)) === 2L)
    assert(t.history().map(_.version) === Seq(1L, 2L))
  }

  test("create path: a write failure on an owned destination propagates the real I/O error and deletes the remnant — never a fake lost race") {
    val conf = spark.sparkContext.hadoopConfiguration
    conf.set("fs.graftboom.impl", classOf[GraftBoomWriteFs].getName)
    val local = Files.createTempDirectory("graft_vt_boom").toString + "/t"
    val t = new VersionedTable(spark, s"graftboom://$local", partitionCol = "m")
    t.renameSupported = false // force the exclusive-create last resort
    val commit = commitOf(t)
    val e = intercept[java.io.IOException] {
      commit(t.Entry(1L, "w", 0L, "merge",
        Seq(t.Add("data/m=1/w.parquet", "1")), Seq.empty, 1L, 0L))
    }
    // the ORIGINAL error surfaces (not a ConcurrentModificationException
    // or a retry-budget exhaustion from polling our own torn file)...
    assert(e.getMessage.contains("simulated mid-write failure"))
    // ...fast — no 50-attempt rebase loop ever ran (one create, one boom)
    // and the torn remnant was deleted, so the version is not poisoned
    val logDir = Paths.get(local, "_graft_log")
    val leftover =
      if (!Files.exists(logDir)) Seq.empty
      else {
        val st = Files.list(logDir)
        try st.iterator().asScala.map(_.getFileName.toString)
          .filter(n => n.endsWith(".json") && !n.startsWith(".")).toList
        finally st.close()
      }
    assert(leftover.isEmpty, s"torn remnant left behind: $leftover")
    assert(t.latestVersion === 0L)
  }

  test("link probe: succeeds and memoizes on a linking mount; a preset memo short-circuits") {
    val root = Files.createTempDirectory("graft_vt_probe").toString + "/t"
    val t = new VersionedTable(spark, root, partitionCol = "m")
    assert(t.linkProbe.isEmpty)
    // tmp dirs link fine: an unclassified (e.g. localized) createLink
    // FileSystemException on this mount would therefore PROPAGATE
    assert(t.linkProbeSucceeds())
    assert(t.linkProbe === Some(true))
    // the memo is authoritative once set — no re-probe per commit
    t.linkProbe = Some(false)
    assert(!t.linkProbeSucceeds())
  }

  test("linkUnsupported classifies only the no-link errno family as degradable; real I/O failures propagate") {
    val root = Files.createTempDirectory("graft_vt_cls").toString + "/t"
    val t = new VersionedTable(spark, root, partitionCol = "m")
    def fse(reason: String) =
      new java.nio.file.FileSystemException("f", null, reason)
    // degradable: the mount genuinely cannot hard-link
    assert(t.linkUnsupported(new UnsupportedOperationException("links")))
    assert(t.linkUnsupported(fse("Operation not permitted")))
    assert(t.linkUnsupported(fse("Operation not supported")))
    assert(t.linkUnsupported(fse("Function not implemented")))
    assert(t.linkUnsupported(fse("Invalid cross-device link")))
    // NOT degradable: genuine persistent I/O failures that the old
    // blanket FileSystemException catch laundered into a lost-race
    // false (ADVICE r18) — these must propagate to the caller
    assert(!t.linkUnsupported(
      new java.nio.file.AccessDeniedException("f")))
    assert(!t.linkUnsupported(fse("Disk quota exceeded")))
    assert(!t.linkUnsupported(fse("No space left on device")))
    assert(!t.linkUnsupported(fse(null)))
    assert(!t.linkUnsupported(new java.io.IOException("generic")))
  }
}
