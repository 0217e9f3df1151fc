package graft.sources

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class VersionedTableSpec extends AnyFunSuite with TestSpark {

  private def mkTable(tag: String) = {
    val dir = Files.createTempDirectory(s"graft_vt_$tag").toString + "/t"
    (dir, new VersionedTable(spark, dir, partitionCol = "m"))
  }

  test("append + merge: snapshot reads, time travel, untouched files survive") {
    val s = spark; import s.implicits._
    val (dir, t) = mkTable("base")
    val v1 = t.append(Seq(
      ("AAPL", 1L, 10.0, 1, 1L), ("AAPL", 2L, 11.0, 1, 1L),
      ("MSFT", 1L, 20.0, 2, 1L)).toDF("ticker", "seq", "price", "m", "v"))
    assert(v1 === 1L && t.read().count() === 3)

    // merge updates AAPL seq=2 and inserts seq=3 (m=1); m=2 untouched
    val m2FilesBefore = Files.list(Paths.get(dir, "data", "m=2")).count()
    val st = t.upsert(
      Seq(("AAPL", 2L, 99.0, 1, 2L), ("AAPL", 2L, 55.0, 1, 1L), ("AAPL", 3L, 12.0, 1, 2L))
        .toDF("ticker", "seq", "price", "m", "v"),
      keyCols = Seq("ticker", "seq"), versionCol = Some("v"))
    assert(st.version === 2L && st.inserted === 1 && st.updated === 1)

    val now = t.read().select("ticker", "seq", "price").as[(String, Long, Double)]
      .collect().toSet
    assert(now === Set(
      ("AAPL", 1L, 10.0), ("AAPL", 2L, 99.0), ("AAPL", 3L, 12.0), ("MSFT", 1L, 20.0)))
    // time travel: version 1 still shows the pre-merge rows
    val then_ = t.readAt(1).select("ticker", "seq", "price").as[(String, Long, Double)]
      .collect().toSet
    assert(then_ === Set(("AAPL", 1L, 10.0), ("AAPL", 2L, 11.0), ("MSFT", 1L, 20.0)))
    // untouched partition kept its physical files
    assert(Files.list(Paths.get(dir, "data", "m=2")).count() === m2FilesBefore)
    assert(t.history().map(_.op) === Seq("append", "merge"))
  }

  test("upsert matches the file log in fragment space (escaped + null partitions)") {
    val s = spark; import s.implicits._
    val dir = Files.createTempDirectory("graft_vt_esc").toString + "/t"
    val t = new VersionedTable(spark, dir, partitionCol = "d")
    t.append(Seq(
      ("AAPL", 1L, 10.0, "a:b"), ("AAPL", 2L, 11.0, "a:b"),
      ("MSFT", 1L, 20.0, null))
      .toDF("ticker", "seq", "price", "d"))

    // Pre-fix, the census's raw "a:b" / null never equalled the log's
    // escaped fragments ("a%3Ab", the Hive null sentinel): touchedFiles
    // came back empty, existing rows were neither merged nor removed,
    // and the stale file stayed live NEXT TO the new one — duplicate
    // keys (two AAPL seq=2 rows) and stats reading inserted=2/updated=0.
    val st = t.upsert(
      Seq(("AAPL", 2L, 99.0, "a:b"), ("MSFT", 1L, 88.0, null))
        .toDF("ticker", "seq", "price", "d"),
      keyCols = Seq("ticker", "seq"))
    assert(st.inserted === 0 && st.updated === 2)
    val after = t.read().select("ticker", "seq", "price").as[(String, Long, Double)]
      .collect().toSet
    assert(after === Set(
      ("AAPL", 1L, 10.0), ("AAPL", 2L, 99.0), ("MSFT", 1L, 88.0)))
  }

  test("in-flight writers are invisible until the log entry lands") {
    val s = spark; import s.implicits._
    val (dir, t) = mkTable("iso")
    t.append(Seq(("AAPL", 1L, 10.0, 1)).toDF("ticker", "seq", "price", "m"))
    // simulate a writer that staged AND absorbed files but died before commit
    Seq(("GHOST", 9L, 0.0, 1)).toDF("ticker", "seq", "price", "m")
      .write.mode("append").parquet(s"$dir/data_ghost")
    val ghost = Files.list(Paths.get(dir, "data_ghost")).iterator()
    // copy a ghost parquet into the live partition dir (uncommitted file)
    var copied = false
    while (ghost.hasNext && !copied) {
      val f = ghost.next()
      if (f.getFileName.toString.endsWith(".parquet")) {
        Files.copy(f, Paths.get(dir, "data", "m=1", "deadbeef_" + f.getFileName.toString))
        copied = true
      }
    }
    assert(copied)
    // snapshot readers resolve the LOG, not the directory: ghost invisible
    assert(t.read().count() === 1)
    assert(!t.read().select("ticker").as[String].collect().contains("GHOST"))
  }

  test("merge conflict on the same partitions throws; appends rebase past it") {
    val s = spark; import s.implicits._
    val (_, t) = mkTable("occ")
    t.append(Seq(("AAPL", 1L, 10.0, 1)).toDF("ticker", "seq", "price", "m"))
    // a competitor merge lands at version 2 over partition m=1
    t.upsert(Seq(("AAPL", 1L, 66.0, 1)).toDF("ticker", "seq", "price", "m"),
      keyCols = Seq("ticker", "seq"))
    assert(t.latestVersion === 2L)
    // a stale writer whose snapshot predates the competitor tries to
    // commit a merge at the same version over the same partition: it must
    // throw rather than silently drop the competitor's rewrite
    intercept[java.util.ConcurrentModificationException] {
      new StaleMerge(t).run()
    }
    // an append also colliding on version 2 just rebases and succeeds
    val vA = t.append(Seq(("TSLA", 1L, 1.0, 1)).toDF("ticker", "seq", "price", "m"))
    assert(vA === 3L && t.latestVersion === 3L)
    assert(t.read().where($"ticker" === "TSLA").count() === 1)
  }

  test("real concurrent writers: disjoint-partition merges both land; every version is consistent") {
    val s = spark; import s.implicits._
    val (_, t) = mkTable("thr")
    t.append(Seq(("AAPL", 1L, 10.0, 1), ("MSFT", 1L, 20.0, 2))
      .toDF("ticker", "seq", "price", "m"))
    // two threads merge into DIFFERENT partitions at the same time: the
    // commit race resolves by rebase, both survive, no rows lost
    import java.util.concurrent.{CountDownLatch, Executors}
    val pool = Executors.newFixedThreadPool(2)
    val gate = new CountDownLatch(1)
    def mergeTask(ticker: String, part: Int, price: Double) =
      pool.submit(new java.util.concurrent.Callable[Unit] {
        def call(): Unit = {
          gate.await()
          t.upsert(Seq((ticker, 1L, price, part)).toDF("ticker", "seq", "price", "m"),
            keyCols = Seq("ticker", "seq"))
        }
      })
    val f1 = mergeTask("AAPL", 1, 11.0)
    val f2 = mergeTask("MSFT", 2, 21.0)
    gate.countDown()
    f1.get(); f2.get()
    pool.shutdown()
    assert(t.latestVersion === 3L)
    val now = t.read().select("ticker", "price").as[(String, Double)].collect().toSet
    assert(now === Set(("AAPL", 11.0), ("MSFT", 21.0)))
    // every intermediate snapshot is internally consistent (2 rows each)
    (1L to 3L).foreach(v => assert(t.readAt(v).count() === 2, s"v$v"))
  }

  test("compact rewrites fragmented partitions into one file without changing content") {
    val s = spark; import s.implicits._
    val (_, t) = mkTable("cmp")
    // four blind APPENDS into the same partition -> four file fragments.
    // (Upserts no longer fragment within a partition: the staged merge
    // write is repartitioned to one file per touched partition per
    // commit — appends are the remaining small-files source, one new
    // file per partition per micro-batch.)
    (1 to 4).foreach { i =>
      t.append(Seq(("AAPL", i.toLong, i * 1.0, 1)).toDF("ticker", "seq", "price", "m"))
    }
    val before = t.read().select("ticker", "seq", "price").as[(String, Long, Double)]
      .collect().toSet
    assert(t.read().inputFiles.length >= 4)
    val vPre = t.latestVersion

    val vC = t.compact()
    assert(vC === vPre + 1)
    assert(t.read().inputFiles.length === 1) // one live file now
    val after = t.read().select("ticker", "seq", "price").as[(String, Long, Double)]
      .collect().toSet
    assert(after === before) // layout changed, content identical
    // pre-compaction snapshot still readable until vacuum
    assert(t.readAt(vPre).count() === 4)
    assert(t.history().last.op === "compact")
    // nothing left to compact: version unchanged
    assert(t.compact() === vC)
    // vacuum reclaims the fragments; latest still reads
    assert(t.vacuum(keepLast = 0).nonEmpty)
    assert(t.read().count() === 4)
  }

  test("vacuum deletes files only old snapshots reference; latest read still works") {
    val s = spark; import s.implicits._
    val (dir, t) = mkTable("vac")
    t.append(Seq(("AAPL", 1L, 10.0, 1)).toDF("ticker", "seq", "price", "m"))
    t.upsert(Seq(("AAPL", 1L, 11.0, 1)).toDF("ticker", "seq", "price", "m"),
      keyCols = Seq("ticker", "seq"))
    t.upsert(Seq(("AAPL", 1L, 12.0, 1)).toDF("ticker", "seq", "price", "m"),
      keyCols = Seq("ticker", "seq"))
    val doomed = t.vacuum(keepLast = 0)
    assert(doomed.nonEmpty)
    doomed.foreach(p => assert(!Files.exists(Paths.get(dir, p))))
    assert(t.read().select("price").as[Double].collect().toSeq === Seq(12.0))
    assert(t.history().length === 3) // log keeps full history
  }

  test("overwrite losing a commit race still replaces the winner's rows (full-snapshot invariant)") {
    val s = spark; import s.implicits._
    val (dir, t) = mkTable("ovw")
    t.append(Seq(("AAPL", 1L, 10.0, 1)).toDF("ticker", "seq", "price", "m"))
    val staleRemoves = t.history().head.adds.map(_.path) // snapshot at v1
    // winner: a concurrent append lands at v2 in a DISJOINT partition —
    // the partition-disjointness must NOT let the overwrite rebase with
    // its stale remove list (that would leave TSLA alive after a
    // "replace everything")
    t.append(Seq(("TSLA", 1L, 30.0, 2)).toDF("ticker", "seq", "price", "m"))
    assert(t.latestVersion === 2L)

    // stage the overwrite's file by hand (mimics absorbStaging output)
    val tmp = Files.createTempDirectory("graft_ovw_stage").toString + "/out"
    Seq(("NEW", 9L, 1.0)).toDF("ticker", "seq", "price").coalesce(1).write.parquet(tmp)
    val part = Files.list(Paths.get(tmp)).iterator().asScala
      .find(_.getFileName.toString.endsWith(".parquet")).get
    Files.createDirectories(Paths.get(dir, "data", "m=1"))
    Files.copy(part, Paths.get(dir, "data", "m=1", "ovrw0001_part.parquet"))

    // loser: an overwrite computed against v1 tries to commit at v2
    val m = classOf[VersionedTable].getDeclaredMethods
      .find(_.getName.endsWith("commit")).get
    m.setAccessible(true)
    val e = t.Entry(2L, "ovrw0001", 456L, "overwrite",
      Seq(t.Add("data/m=1/ovrw0001_part.parquet", "1")), staleRemoves, 1L, 0L)
    m.invoke(t, e)

    assert(t.latestVersion === 3L)
    // the committed overwrite is a TRUE snapshot replace: only its rows
    val now = t.read().select("ticker").as[String].collect().toSet
    assert(now === Set("NEW"))
    // the winner's snapshot is still time-travelable
    assert(t.readAt(2).select("ticker").as[String].collect().toSet === Set("AAPL", "TSLA"))
  }

  test("vacuum keeps fresh uncommitted staging dirs; reclaims them only past the TTL") {
    val s = spark; import s.implicits._
    val (dir, t) = mkTable("ttl")
    t.append(Seq(("AAPL", 1L, 10.0, 1)).toDF("ticker", "seq", "price", "m"))
    // a live writer between its staging write and its commit
    Files.createDirectories(Paths.get(dir, ".tx_inflight"))
    t.vacuum(keepLast = 0) // default 24h TTL: must survive
    assert(Files.exists(Paths.get(dir, ".tx_inflight")))
    Thread.sleep(20)
    t.vacuum(keepLast = 0, stagingTtlMs = 1L) // aged out: reclaimed
    assert(!Files.exists(Paths.get(dir, ".tx_inflight")))
  }

  test("importFrom migrates a MergeSink table in one commit, then merges land on top") {
    val s = spark; import s.implicits._
    // a populated MergeSink-layout table
    val sinkDir = Files.createTempDirectory("graft_vt_imp").toString + "/bars"
    val sink = new MergeSink(spark, sinkDir, keyCols = Seq("ticker", "seq"), partitionCol = "m")
    sink.upsert(Seq(("AAPL", 1L, 10.0, 1), ("AAPL", 2L, 11.0, 1), ("MSFT", 1L, 20.0, 2))
      .toDF("ticker", "seq", "price", "m"))

    val root = Files.createTempDirectory("graft_vt_imp_t").toString + "/t"
    val t = new VersionedTable(spark, root, partitionCol = "m")
    assert(t.importFrom(sinkDir) === 1L)
    assert(t.history().map(_.op) === Seq("append"))
    assert(t.history().head.inserted === 3L)
    val got = t.read().select("ticker", "seq", "price").as[(String, Long, Double)]
      .collect().toSet
    assert(got === Set(("AAPL", 1L, 10.0), ("AAPL", 2L, 11.0), ("MSFT", 1L, 20.0)))
    // source live dirs were MOVED, not copied
    assert(!Files.exists(Paths.get(sinkDir, "m=1")))
    // normal versioned operation continues on top of the import
    val st = t.upsert(Seq(("AAPL", 2L, 99.0, 1)).toDF("ticker", "seq", "price", "m"),
      keyCols = Seq("ticker", "seq"))
    assert(st.version === 2L && st.updated === 1L)
    assert(t.read().where($"seq" === 2L).select("price").as[Double].collect().toSeq === Seq(99.0))
    // a second import must refuse (table no longer empty)
    intercept[IllegalArgumentException](t.importFrom(sinkDir))
  }

  test("importFrom resumes after a crash: files a dead run already moved still land in the commit") {
    val s = spark; import s.implicits._
    val sinkDir = Files.createTempDirectory("graft_vt_res").toString + "/bars"
    val sink = new MergeSink(spark, sinkDir, keyCols = Seq("ticker", "seq"), partitionCol = "m")
    sink.upsert(Seq(("AAPL", 1L, 10.0, 1), ("MSFT", 1L, 20.0, 2))
      .toDF("ticker", "seq", "price", "m"))
    val root = Files.createTempDirectory("graft_vt_res_t").toString + "/t"
    val t = new VersionedTable(spark, root, partitionCol = "m")
    // simulate a previous import that moved m=1 into data/ and DIED
    // before committing (no log entry exists)
    Files.createDirectories(Paths.get(root, "data", "m=1"))
    val src1 = Paths.get(sinkDir, "m=1")
    Files.list(src1).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".parquet"))
      .foreach(f => Files.move(f,
        Paths.get(root, "data", "m=1", "dead0000_" + f.getFileName.toString)))
    // re-run imports the REMAINING source AND sweeps up the orphans
    assert(t.importFrom(sinkDir) === 1L)
    assert(t.history().head.inserted === 2L)
    val got = t.read().select("ticker", "price").as[(String, Double)].collect().toSet
    assert(got === Set(("AAPL", 10.0), ("MSFT", 20.0)))
  }

  test("checkpoint refuses while a torn in-flight entry exists below the head (no frozen skip)") {
    val s = spark; import s.implicits._
    val (dir, t) = mkTable("torn")
    t.append(Seq(("AAPL", 1L, 10.0, 1)).toDF("ticker", "seq", "price", "m")) // v1
    // a concurrent writer's entry at v2, caught mid-write (undecodable);
    // a blind append then leapfrogs it to v3 — the freeze shape
    Files.writeString(Paths.get(dir, "_graft_log", f"${2L}%020d.json"), """{"version":2,"txi""")
    t.append(Seq(("MSFT", 1L, 20.0, 2)).toDF("ticker", "seq", "price", "m")) // v3
    assert(t.latestVersion === 3L)
    assert(t.checkpoint() === 0L) // refused: a post-checkpoint resolve would never replay v2
    assert(!Files.exists(Paths.get(dir, "_graft_log", f"${3L}%020d.checkpoint.json")))
    // the in-flight writer finishes (or its entry is cleaned up) → works
    Files.delete(Paths.get(dir, "_graft_log", f"${2L}%020d.json"))
    assert(t.checkpoint() === 3L)
    assert(t.read().count() === 2)
    // a torn entry ABOVE the head is harmless: checkpoint lands at the
    // last decodable version and the tail replays once it completes
    Files.writeString(Paths.get(dir, "_graft_log", f"${4L}%020d.json"), """{"version":4,"txi""")
    assert(t.checkpoint() === 3L)
  }

  test("log checkpoint: snapshots resolve across it, time travel before it still works") {
    val s = spark; import s.implicits._
    val (_, t) = mkTable("ckp")
    t.append(Seq(("AAPL", 1L, 10.0, 1)).toDF("ticker", "seq", "price", "m"))        // v1
    t.upsert(Seq(("AAPL", 1L, 11.0, 1)).toDF("ticker", "seq", "price", "m"),
      keyCols = Seq("ticker", "seq"))                                                // v2
    t.append(Seq(("MSFT", 1L, 20.0, 2)).toDF("ticker", "seq", "price", "m"))        // v3
    assert(t.checkpoint() === 3L)
    // commits continue past the checkpoint
    t.upsert(Seq(("MSFT", 1L, 21.0, 2)).toDF("ticker", "seq", "price", "m"),
      keyCols = Seq("ticker", "seq"))                                                // v4
    assert(t.latestVersion === 4L)
    // latest snapshot resolves from checkpoint + 1 entry
    val now = t.read().select("ticker", "price").as[(String, Double)].collect().toSet
    assert(now === Set(("AAPL", 11.0), ("MSFT", 21.0)))
    // snapshot AT the checkpoint and BEFORE it (pure entry fold) both work
    assert(t.readAt(3).select("ticker", "price").as[(String, Double)].collect().toSet
      === Set(("AAPL", 11.0), ("MSFT", 20.0)))
    assert(t.readAt(1).select("price").as[Double].collect().toSeq === Seq(10.0))
    // history is untouched by checkpointing
    assert(t.history().map(_.version) === Seq(1L, 2L, 3L, 4L))
    // a second checkpoint at the new head; reads unchanged
    assert(t.checkpoint() === 4L)
    assert(t.read().count() === 2)
    // vacuum still reclaims pre-checkpoint fragments and keeps the head
    t.vacuum(keepLast = 0)
    assert(t.read().select("ticker", "price").as[(String, Double)].collect().toSet === now)
  }

  test("checkpoints during concurrent disjoint writers never lose rows") {
    val s = spark; import s.implicits._
    val (dir, t) = mkTable("ckh")
    t.append(Seq(("AAPL", 0L, 0.0, 1), ("MSFT", 0L, 0.0, 2))
      .toDF("ticker", "seq", "price", "m"))
    import java.util.concurrent.Executors
    val pool = Executors.newFixedThreadPool(3)
    val nPer = 6
    def writer(ticker: String, part: Int) =
      pool.submit(new java.util.concurrent.Callable[Unit] {
        def call(): Unit = (1 to nPer).foreach { i =>
          t.upsert(Seq((ticker, 0L, i.toDouble, part)).toDF("ticker", "seq", "price", "m"),
            keyCols = Seq("ticker", "seq"))
        }
      })
    val ckpts = pool.submit(new java.util.concurrent.Callable[Int] {
      def call(): Int = {
        var done = 0
        (1 to 10).foreach { _ =>
          if (t.checkpoint() > 0L) done += 1
          Thread.sleep(50)
        }
        done
      }
    })
    val f1 = writer("AAPL", 1); val f2 = writer("MSFT", 2)
    f1.get(); f2.get(); ckpts.get()
    pool.shutdown()
    assert(t.latestVersion === (1 + 2 * nPer).toLong)
    // final state: each ticker converged to its last write
    val now = t.read().select("ticker", "price").as[(String, Double)].collect().toSet
    assert(now === Set(("AAPL", nPer.toDouble), ("MSFT", nPer.toDouble)))
    // every snapshot version is internally consistent despite the
    // concurrently-advancing checkpoints
    (1L to t.latestVersion).foreach(v => assert(t.readAt(v).count() === 2, s"v$v"))
    // vacuum keeps at most the newest checkpoint file
    t.vacuum(keepLast = 0)
    val ckptFiles = Files.list(Paths.get(dir, "_graft_log")).iterator().asScala
      .count(_.getFileName.toString.endsWith(".checkpoint.json"))
    assert(ckptFiles <= 1)
    assert(t.read().count() === 2)
  }

  test("upsert unpersists its caches (no storage growth across micro-batches)") {
    val s = spark; import s.implicits._
    val (_, t) = mkTable("leak")
    t.append(Seq(("AAPL", 1L, 10.0, 1)).toDF("ticker", "seq", "price", "m"))
    val before = spark.sparkContext.getPersistentRDDs.size
    (1 to 5).foreach { i =>
      t.upsert(Seq(("AAPL", 1L, i * 1.0, 1)).toDF("ticker", "seq", "price", "m"),
        keyCols = Seq("ticker", "seq"))
    }
    val after = spark.sparkContext.getPersistentRDDs.size
    // pre-fix each upsert leaked one cached `existing` (+5 here); allow
    // slack for concurrent suites sharing the session
    assert(after - before < 5, s"persistent RDDs grew $before -> $after")
  }

  test("comma-valued partitions round-trip the log: removes parse whole, merged partitions never read duplicates, vacuum reclaims the comma path") {
    val s = spark; import s.implicits._
    val (dir, t) = mkTable("comma")
    t.append(Seq(("AAPL", 1L, 10.0, "us,eu"), ("MSFT", 1L, 20.0, "ap"))
      .toDF("ticker", "seq", "price", "m")): Unit
    // rewrite the comma partition: its remove path "data/m=us,eu/..."
    // must survive the log round-trip as ONE string, or the stale file
    // stays live next to its replacement and every read duplicates
    t.upsert(Seq(("AAPL", 1L, 99.0, "us,eu")).toDF("ticker", "seq", "price", "m"),
      keyCols = Seq("ticker", "seq")): Unit
    val rows = t.read().select("ticker", "seq", "price", "m")
      .as[(String, Long, Double, String)].collect().toSet
    assert(rows === Set(("AAPL", 1L, 99.0, "us,eu"), ("MSFT", 1L, 20.0, "ap")))
    // the replaced file is reclaimable — proof the remove matched it
    val doomed = t.vacuum(keepLast = 0)
    assert(doomed.exists(p => p.contains("m=us,eu")),
      s"vacuum missed the comma-partition remove: $doomed")
    assert(rows === t.read().select("ticker", "seq", "price", "m")
      .as[(String, Long, Double, String)].collect().toSet)
  }

  test("a merge that loses to a conflicting winner leaves NO orphan files: absorbed adds are cleaned before the conflict propagates") {
    val s = spark; import s.implicits._
    val (dir, t) = mkTable("orphan")
    t.append(Seq(("AAPL", 1L, 10.0, 1)).toDF("ticker", "seq", "price", "m")): Unit
    val dataDir = Paths.get(dir, "data", "m=1")
    val filesBefore = Files.list(dataDir).iterator().asScala
      .map(_.getFileName.toString).toSet
    // inject a conflicting winner at publish time: the overridden publish
    // plants a committed "merge" entry over OUR partition at the version
    // we try to claim, then reports the lost race — commit() must then
    // throw ConcurrentModificationException, and the files the upsert
    // already absorbed into data/ must NOT be left behind (they are in no
    // log entry, so vacuum's everAdded-minus-live set can never see them)
    t.publishOverride = Some { (p, _) =>
      val np = Paths.get(p.toUri.getPath)
      Files.createDirectories(np.getParent)
      val v = np.getFileName.toString.stripSuffix(".json").toLong
      Files.write(np,
        (s"""{"version":$v,"txid":"squat","ts":1,"op":"merge",""" +
          s""""adds":[{"path":"data/m=1/squat.parquet","part":"1"}],""" +
          """"removes":[],"inserted":1,"updated":0}""").getBytes("UTF-8")): Unit
      false
    }
    intercept[java.util.ConcurrentModificationException] {
      t.upsert(Seq(("AAPL", 1L, 99.0, 1)).toDF("ticker", "seq", "price", "m"),
        keyCols = Seq("ticker", "seq"))
    }
    val filesAfter = Files.list(dataDir).iterator().asScala
      .map(_.getFileName.toString).toSet
    assert(filesAfter === filesBefore,
      s"conflicted merge orphaned files: ${filesAfter -- filesBefore}")
  }

  /** Drives commit() at an already-taken version over the same
    * partition — the entry-create race a stale-snapshot merge loses
    * (the public API re-resolves latest, so the race itself can only be
    * reproduced by calling the commit primitive directly). */
  private final class StaleMerge(t: VersionedTable) {
    def run(): Unit = {
      val m = classOf[VersionedTable].getDeclaredMethods
        .find(_.getName.endsWith("commit")).get
      m.setAccessible(true)
      val taken = t.latestVersion // occupied by the competitor's merge
      val e = t.Entry(taken, "stale001", 123L, "merge",
        Seq(t.Add("data/m=1/stale001_x.parquet", "1")),
        Seq("data/m=1/whatever.parquet"), 1L, 0L)
      try m.invoke(t, e)
      catch {
        case ite: java.lang.reflect.InvocationTargetException => throw ite.getCause
      }
    }
  }
}
