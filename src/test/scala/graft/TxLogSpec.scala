package graft

import java.io.File
import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.store.{MergeWriter, TxEntry, TxLog}

/** Transaction-log table format: atomicity, optimistic concurrency
  * (concurrent writers never lose updates), crash-safety (orphans and
  * torn commits never corrupt reads), replace-commit conflict handling,
  * and the loud-failure contract for corrupt stores (round-2 verdict
  * items #1 and #2).
  */
class TxLogSpec extends SparkSpecBase {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("append commits merge and version monotonically; read is last-writer-wins") {
    val spark2 = spark
    import spark2.implicits._
    val dir = tmp("txlog-basic")
    val w = new MergeWriter(spark, dir, Seq("k"))
    assert(!w.exists())
    w.upsert(Seq(("a", 1), ("b", 2)).toDF("k", "v"), batchId = 1)
    w.upsert(Seq(("b", 3)).toDF("k", "v"), batchId = 2)
    assert(w.txLog.currentVersion() == 1L) // versions 0 and 1
    assert(w.read().collect().map(r => (r.getString(0), r.getInt(1))).toSet ==
      Set(("a", 1), ("b", 3)))
  }

  test("concurrent upserts from multiple threads: no lost updates, every version distinct") {
    val spark2 = spark
    import spark2.implicits._
    val dir = tmp("txlog-conc")
    val w = new MergeWriter(spark, dir, Seq("k"))
    val nThreads = 4
    val perThread = 5
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = (0 until nThreads).map { t =>
      new Thread(() => {
        try {
          (0 until perThread).foreach { i =>
            val batch = t * perThread + i + 1
            w.upsert(Seq((s"k$t-$i", batch)).toDF("k", "v"), batchId = batch.toLong)
          }
        } catch { case e: Throwable => errors.add(e); () }
      })
    }
    threads.foreach(_.start())
    threads.foreach(_.join())
    assert(errors.isEmpty, s"writer errors: ${errors.toArray.mkString(", ")}")
    // every commit landed: one entry per batch, one row per key
    val snap = w.txLog.snapshot()
    assert(snap.entries.size == nThreads * perThread,
      s"lost commits: ${snap.entries.size} of ${nThreads * perThread}")
    assert(snap.version == nThreads * perThread - 1L)
    assert(w.read().count() == nThreads * perThread)
  }

  test("compaction races a concurrent writer safely (replace commit aborts on conflict)") {
    val spark2 = spark
    import spark2.implicits._
    val dir = tmp("txlog-race")
    val w = new MergeWriter(spark, dir, Seq("k"))
    (1 to 4).foreach(b => w.upsert(Seq((s"k$b", b)).toDF("k", "v"), b.toLong))
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val writer = new Thread(() => {
      try (5 to 10).foreach { b =>
        w.upsert(Seq((s"k$b", b)).toDF("k", "v"), b.toLong)
      } catch { case e: Throwable => errors.add(e); () }
    })
    val compactor = new Thread(() => {
      try (0 until 3).foreach { _ => w.compact(vacuumGraceMs = 60000L) }
      catch { case e: Throwable => errors.add(e); () }
    })
    writer.start(); compactor.start()
    writer.join(); compactor.join()
    assert(errors.isEmpty, s"errors: ${errors.toArray.mkString(", ")}")
    // no write was lost regardless of which compactions won their CAS
    assert(w.read().collect().map(r => (r.getString(0), r.getInt(1))).toSet ==
      (1 to 10).map(b => (s"k$b", b)).toSet)
  }

  test("crash artifacts are invisible: orphan data dir + torn manifest tmp never corrupt reads") {
    val spark2 = spark
    import spark2.implicits._
    val dir = tmp("txlog-crash")
    val w = new MergeWriter(spark, dir, Seq("k"))
    w.upsert(Seq(("a", 1)).toDF("k", "v"), batchId = 1)
    val before = w.read().collect().map(r => (r.getString(0), r.getInt(1))).toSet

    // crash between data write and commit: orphan data directory
    val orphan = w.txLog.newDataDir()
    Seq(("ghost", 99)).toDF("k", "v").withColumn("_batch", lit(99L))
      .write.parquet(orphan.getPath)
    // crash mid-manifest-write: torn temp file in the log dir
    val torn = new File(s"$dir/table/_log/.tmp-torn")
    Files.write(torn.toPath, """{"version":7,"op":"appe""".getBytes("UTF-8"))

    assert(w.read().collect().map(r => (r.getString(0), r.getInt(1))).toSet == before,
      "uncommitted data must be invisible")
    // vacuum with zero grace reclaims both artifacts
    w.txLog.vacuum(keepVersions = 1, orphanGraceMs = 0L)
    assert(!orphan.exists(), "orphan data dir survives vacuum")
    assert(!torn.exists(), "torn manifest tmp survives vacuum")
    assert(w.read().collect().map(r => (r.getString(0), r.getInt(1))).toSet == before)
  }

  test("vacuum orphan age is the tree's newest mtime: an in-flight staged write past the grace window survives") {
    val spark2 = spark
    import spark2.implicits._
    val dir = tmp("txlog-stagedage")
    val w = new MergeWriter(spark, dir, Seq("k"))
    w.upsert(Seq(("a", 1)).toDF("k", "v"), batchId = 1)

    // simulate a long-running Spark stage: the job writes only under
    // _temporary/ until job commit, so every path the OS timestamps at
    // write time is DEEP in the tree — the top-level dir mtime froze at
    // job start, which here is backdated past the grace window
    val staged = w.txLog.newDataDir()
    val taskDir = new File(staged, "_temporary/0/_temporary/attempt_1/")
    assert(taskDir.mkdirs())
    Files.write(new File(taskDir, "part-00000.parquet").toPath,
      Array[Byte](1, 2, 3)) // fresh mtime: the stage is actively writing
    val old = System.currentTimeMillis() - 3600L * 1000
    assert(staged.setLastModified(old))
    assert(new File(staged, "_temporary").setLastModified(old))
    assert(new File(staged, "_temporary/0").setLastModified(old))

    w.txLog.vacuum(keepVersions = 1, orphanGraceMs = 60000L)
    assert(staged.exists(),
      "vacuum deleted a staged directory whose stage is still writing " +
        "(top-level mtime is stale during a long Spark write)")

    // the converse: once the WHOLE tree is older than the grace window
    // it is a genuine crash orphan and is reclaimed
    def backdate(f: File): Unit = {
      if (f.isDirectory)
        Option(f.listFiles()).getOrElse(Array.empty).foreach(backdate)
      f.setLastModified(old): Unit
    }
    backdate(staged)
    w.txLog.vacuum(keepVersions = 1, orphanGraceMs = 60000L)
    assert(!staged.exists(), "all-old crash orphan survived vacuum")
  }

  test("retried upsert of the latest batch after compaction does not wipe the table") {
    val spark2 = spark
    import spark2.implicits._
    val dir = tmp("txlog-retrycompact")
    val w = new MergeWriter(spark, dir, Seq("k"))
    w.upsert(Seq(("k1", 1)).toDF("k", "v"), batchId = 1)
    w.upsert(Seq(("k2", 2)).toDF("k", "v"), batchId = 2)
    w.compact(vacuumGraceMs = 0L)
    // batch 2 is re-delivered after a crash: replaceBatch must drop only
    // batch 2's own entry — the compacted all-history entry carries a
    // reserved tag precisely so this retry can't wipe k1
    w.upsert(Seq(("k2", 2)).toDF("k", "v"), batchId = 2)
    assert(w.read().collect().map(r => (r.getString(0), r.getInt(1))).toSet ==
      Set(("k1", 1), ("k2", 2)),
      "retry of the compacted max batch wiped other keys")
    intercept[IllegalArgumentException] {
      w.upsert(Seq(("x", 0)).toDF("k", "v"), graft.store.MergeWriter.CompactedEntryTag)
    }
  }

  test("replace commit with a stale expected version fails and changes nothing") {
    val spark2 = spark
    import spark2.implicits._
    val dir = tmp("txlog-stale")
    val w = new MergeWriter(spark, dir, Seq("k"))
    w.upsert(Seq(("a", 1)).toDF("k", "v"), batchId = 1)
    val staleVersion = w.txLog.currentVersion()
    w.upsert(Seq(("b", 2)).toDF("k", "v"), batchId = 2)
    val d = w.txLog.newDataDir()
    Seq(("x", 0)).toDF("k", "v").withColumn("_batch", lit(9L)).write.parquet(d.getPath)
    assert(!w.txLog.commitReplace(
      Seq(TxEntry(w.txLog.relativize(d), 9L)), staleVersion),
      "stale replace must lose the CAS")
    assert(w.read().collect().map(r => (r.getString(0), r.getInt(1))).toSet ==
      Set(("a", 1), ("b", 2)))
  }

  test("vacuum retention: keepVersions=2 preserves the previous snapshot's files") {
    val spark2 = spark
    import spark2.implicits._
    val dir = tmp("txlog-retain")
    val w = new MergeWriter(spark, dir, Seq("k"))
    w.upsert(Seq(("a", 1)).toDF("k", "v"), batchId = 1)
    val oldSnap = w.txLog.snapshot()
    w.upsert(Seq(("b", 2)).toDF("k", "v"), batchId = 2)
    w.txLog.vacuum(keepVersions = 2, orphanGraceMs = 0L)
    // the previous version's manifest AND data remain readable (snapshot
    // isolation for a long-running reader)
    val oldDf = w.txLog.readSnapshot(spark, w.txLog.snapshotAt(oldSnap.version))
    assert(oldDf.select("k").as[String].collect().toSet == Set("a"))
    // but keepVersions=1 expires it
    w.txLog.vacuum(keepVersions = 1, orphanGraceMs = 0L)
    assert(!new File(s"$dir/table/_log/v${"%012d".format(oldSnap.version)}.json").exists())
  }

  test("time travel: readAsOf reconstructs every retained version exactly") {
    val spark2 = spark
    import spark2.implicits._
    val dir = tmp("txlog-travel")
    val w = new MergeWriter(spark, dir, Seq("k"))
    w.upsert(Seq(("a", 1), ("b", 2)).toDF("k", "v"), batchId = 1)
    val v0 = w.txLog.currentVersion()
    w.upsert(Seq(("b", 3), ("c", 4)).toDF("k", "v"), batchId = 2)
    val v1 = w.txLog.currentVersion()
    w.upsert(Seq(("a", 9)).toDF("k", "v"), batchId = 3)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getInt(1))).toSet
    assert(rows(w.readAsOf(v0)) == Set(("a", 1), ("b", 2)))
    assert(rows(w.readAsOf(v1)) == Set(("a", 1), ("b", 3), ("c", 4)))
    assert(rows(w.read()) == Set(("a", 9), ("b", 3), ("c", 4)))
    // a vacuumed-past version fails loudly, current state unaffected
    w.txLog.vacuum(keepVersions = 1, orphanGraceMs = 0L)
    intercept[Exception] { w.readAsOf(v0).collect() }
    assert(rows(w.read()) == Set(("a", 9), ("b", 3), ("c", 4)))
  }

  test("corrupt data file FAILS the read loudly (never classified as empty store)") {
    val spark2 = spark
    import spark2.implicits._
    val dir = tmp("txlog-corrupt")
    val w = new MergeWriter(spark, dir, Seq("k"))
    w.upsert(Seq(("a", 1), ("b", 2)).toDF("k", "v"), batchId = 1)
    // truncate every parquet part file in the live data dir (torn disk)
    val snap = w.txLog.snapshot()
    val live = new File(s"$dir/table", snap.entries.head.path)
    val parts = live.listFiles().filter(_.getName.endsWith(".parquet"))
    assert(parts.nonEmpty)
    parts.foreach(p => Files.write(p.toPath, Array[Byte](1, 2, 3)))
    val ex = intercept[Exception] { w.read().collect() }
    assert(ex != null)
    // and the log-level read() reports Some(corrupt) -> throws, not None
    intercept[Exception] {
      w.txLog.read(spark).get.collect()
    }
  }

  test("CheckpointStore: corrupt checkpoint table fails loudly instead of reading empty") {
    val dir = tmp("ckpt-corrupt")
    val store = new graft.pipeline.CheckpointStore(spark, dir)
    assert(store.read().count() == 0) // never-written table IS empty
    store.record("stage", "tag", Seq((0, 10L)), 1L)
    assert(store.completedBuckets("stage", "tag") == Set(0))
    // corrupt the single committed data file
    val log = new TxLog(s"$dir/checkpoints")
    val live = new File(s"$dir/checkpoints", log.snapshot().entries.head.path)
    live.listFiles().filter(_.getName.endsWith(".parquet"))
      .foreach(p => Files.write(p.toPath, Array[Byte](0)))
    intercept[Exception] { store.read().collect() }
    intercept[Exception] { store.completedBuckets("stage", "tag") }
  }

  test("compaction + retried upsert of maxBatch: retry wins deterministically (commit-order tiebreak)") {
    val spark2 = spark
    import spark2.implicits._
    val dir = tmp("txlog-tiebreak")
    val w = new MergeWriter(spark, dir, Seq("k"))
    w.upsert(Seq(("a", 1), ("b", 1)).toDF("k", "v"), batchId = 1)
    w.upsert(Seq(("b", 2), ("c", 2)).toDF("k", "v"), batchId = 2)
    w.compact(vacuumGraceMs = 60000L) // rows now stamped _batch = 2
    // a redelivered batch 2 with DIFFERENT values: same _batch as the
    // compacted rows, but its manifest entry is later -> it must win
    w.upsert(Seq(("b", 99), ("c", 99)).toDF("k", "v"), batchId = 2)
    (1 to 3).foreach { _ =>
      assert(w.read().collect().map(r => (r.getString(0), r.getInt(1))).toSet ==
        Set(("a", 1), ("b", 99), ("c", 99)))
    }
  }

  test("commit-order tiebreak survives a store ROOT containing a /data/ path segment") {
    val spark2 = spark
    import spark2.implicits._
    // the _seq extraction must anchor to the path TAIL: an unanchored
    // /data/([^/]+)/ match would capture "nested" here and zero every
    // _seq, making the compaction-vs-retry tiebreak nondeterministic
    val dir = s"${tmp("txlog-dataroot")}/data/nested/sigs"
    val w = new MergeWriter(spark, dir, Seq("k"))
    w.upsert(Seq(("a", 1), ("b", 1)).toDF("k", "v"), batchId = 1)
    w.upsert(Seq(("b", 2), ("c", 2)).toDF("k", "v"), batchId = 2)
    w.compact(vacuumGraceMs = 60000L)
    w.upsert(Seq(("b", 99), ("c", 99)).toDF("k", "v"), batchId = 2)
    (1 to 3).foreach { _ =>
      assert(w.read().collect().map(r => (r.getString(0), r.getInt(1))).toSet ==
        Set(("a", 1), ("b", 99), ("c", 99)))
    }
  }

  test("SQL time travel: two pinned versions queryable side by side + DESCRIBE HISTORY analog") {
    val spark2 = spark
    import spark2.implicits._
    import graft.store.TxLogSql
    val dir = tmp("txlog-sql")
    val w = new MergeWriter(spark, dir, Seq("k"))
    w.upsert(Seq(("a", 1), ("b", 1)).toDF("k", "v"), batchId = 1) // version 0
    w.upsert(Seq(("b", 2), ("c", 2)).toDF("k", "v"), batchId = 2) // version 1
    TxLogSql.pinView(spark, "store_v0", dir, Seq("k"), version = 0)
    TxLogSql.pinView(spark, "store_v1", dir, Seq("k"), version = 1)
    def rows(view: String) =
      spark.sql(s"SELECT k, v FROM $view ORDER BY k")
        .collect().map(r => (r.getString(0), r.getInt(1))).toSeq
    assert(rows("store_v0") == Seq(("a", 1), ("b", 1)))
    assert(rows("store_v1") == Seq(("a", 1), ("b", 2), ("c", 2)))
    // versions join in ONE SQL statement (the serving use case: diff a
    // store against its previous snapshot)
    val changed = spark.sql(
      """SELECT cur.k FROM store_v1 cur LEFT JOIN store_v0 old ON cur.k = old.k
        |WHERE old.v IS NULL OR old.v <> cur.v ORDER BY cur.k""".stripMargin)
      .collect().map(_.getString(0)).toSeq
    assert(changed == Seq("b", "c"))
    // a later commit does NOT move a pinned view until re-pinned
    w.upsert(Seq(("a", 9)).toDF("k", "v"), batchId = 3)
    assert(rows("store_v1") == Seq(("a", 1), ("b", 2), ("c", 2)))
    TxLogSql.pinViewLatest(spark, "store_latest", dir, Seq("k"))
    assert(rows("store_latest") == Seq(("a", 9), ("b", 2), ("c", 2)))
    // history: one append-style commit per upsert, entry counts grow
    val hist = TxLogSql.history(spark, s"$dir/table")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSeq
    assert(hist.map(_._1) == Seq(0L, 1L, 2L))
    assert(hist.forall(_._2 == "upsert"))
    assert(hist.map(_._3) == Seq(1, 2, 3))
  }

  test("randomized probes: manifest skipping is never lossy (range stats + point blooms)") {
    val spark2 = spark
    import spark2.implicits._
    val log = new TxLog(tmp("txlog-rand-prune"))
    val rnd = new scala.util.Random(fuzzSeed(20260820L))
    // 10 commits × 20 rows over overlapping random id sub-ranges and a
    // small string alphabet (so probes hit some commits and miss others,
    // and bloom false positives are actually possible) — the property
    // under test is one-sided: pruning may KEEP extra entries, but every
    // entry holding a matching row must survive, and the pruned read
    // filtered row-level must equal the full read filtered row-level
    val byCommit = (0 until 10).map { c =>
      val base = rnd.nextInt(500).toLong
      val rows = Seq.fill(20)((base + rnd.nextInt(60),
        "" + ('a' + rnd.nextInt(8)).toChar + ('a' + rnd.nextInt(8)).toChar))
      log.writeAppend(rows.toDF("id", "s"), batch = c,
        statsCols = Seq("id", "s"), bloomCols = Seq("s"))
      c.toLong -> rows
    }.toMap
    val allRows = byCommit.values.flatten.toSeq
    val snap = log.snapshot()

    def sortedMultiset(rows: Seq[(Long, String)]): Seq[(Long, String)] =
      rows.sortBy(r => (r._1, r._2))

    (0 until 12).foreach { _ =>
      val lo = if (rnd.nextBoolean()) Some(rnd.nextInt(600).toLong) else None
      val hi = if (rnd.nextBoolean()) Some(rnd.nextInt(600).toLong) else None
      if (lo.nonEmpty || hi.nonEmpty) {
        def matches(id: Long) =
          lo.forall(id >= _) && hi.forall(id <= _)
        // entry-level: every commit holding a match is kept
        val kept = log.pruneRange(snap, "id", lo, hi).map(_.batch).toSet
        val mustKeep = byCommit.filter(_._2.exists(r => matches(r._1))).keySet
        assert(mustKeep.subsetOf(kept),
          s"range [$lo,$hi] pruned a commit holding matches: want $mustKeep kept $kept")
        // row-level: pruned read + exact predicate == full filter
        var df = log.readRange(spark, "id", lo, hi).get
        lo.foreach(v => df = df.where(col("id") >= v))
        hi.foreach(v => df = df.where(col("id") <= v))
        val got = df.select("id", "s").collect()
          .map(r => (r.getLong(0), r.getString(1))).toSeq
        assert(sortedMultiset(got) ==
          sortedMultiset(allRows.filter(r => matches(r._1))),
          s"range [$lo,$hi] read mismatch")
      }
    }

    (0 until 8).foreach { _ =>
      val probes = Seq.fill(1 + rnd.nextInt(3))(
        "" + ('a' + rnd.nextInt(8)).toChar + ('a' + rnd.nextInt(8)).toChar)
      val kept = log.prunePoint(snap, "s", probes).map(_.batch).toSet
      val mustKeep = byCommit.filter(_._2.exists(r => probes.contains(r._2))).keySet
      assert(mustKeep.subsetOf(kept),
        s"point IN $probes pruned a commit holding matches: want $mustKeep kept $kept")
      val got = log.readPoint(spark, "s", probes).get
        .where(col("s").isin(probes: _*)).select("id", "s").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSeq
      assert(sortedMultiset(got) ==
        sortedMultiset(allRows.filter(r => probes.contains(r._2))),
        s"point IN $probes read mismatch")
    }
  }

  test("column stats: writeAppend stamps min/max; pruneRange skips disjoint commits, keeps stats-less ones") {
    val spark2 = spark
    import spark2.implicits._
    val log = new TxLog(tmp("txlog-stats"))
    // three commits with disjoint id ranges + one legacy commit without stats
    log.writeAppend(Seq((1L, "a"), (9L, "b")).toDF("id", "s"), statsCols = Seq("id"))
    log.writeAppend(Seq((10L, "c"), (19L, "d")).toDF("id", "s"), statsCols = Seq("id"))
    log.writeAppend(Seq((20L, "e"), (29L, "f")).toDF("id", "s"), statsCols = Seq("id"))
    val legacyDir = log.newDataDir()
    Seq((100L, "z")).toDF("id", "s").write.parquet(legacyDir.getPath)
    log.commitAppend(Seq(TxEntry(log.relativize(legacyDir), -1L)))

    val snap = log.snapshot()
    assert(snap.entries.count(_.stats.contains("id")) == 3)
    assert(snap.entries.exists(_.stats.isEmpty)) // legacy entry round-trips

    // [12, 15] intersects only commit 2 — plus the stats-less legacy entry
    val kept = log.pruneRange(snap, "id", Some(12L), Some(15L))
    assert(kept.size == 2)
    // unknown column prunes nothing
    assert(log.pruneRange(snap, "nope", Some(0L), Some(1L)).size == 4)
    // boundary inclusivity: hi == a commit's min keeps it
    assert(log.pruneRange(snap, "id", Some(0L), Some(10L)).size == 3)

    // readRange + row filter == full read + row filter, both directions
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.where(col("id") >= 12 && col("id") <= 15)
        .collect().map(_.getLong(0)).toSet
    val pruned = log.readRange(spark, "id", Some(12L), Some(15L)).get
    assert(rows(pruned) == rows(log.read(spark).get))
    // the skip is real: fewer parquet files enter the pruned scan
    assert(pruned.inputFiles.length < log.read(spark).get.inputFiles.length)
    // fully-disjoint probe: schema survives, result is empty
    val empty = log.readRange(spark, "id", Some(500L), Some(600L)).get
    assert(empty.columns.toSeq == Seq("id", "s"))
    assert(empty.where(col("id") >= 500).count() == 0)
  }

  test("hidden-partitioned append: one entry per week, _part invisible, prune + vacuum respect subdirs") {
    val spark2 = spark
    import spark2.implicits._
    val log = new TxLog(tmp("txlog-part"))
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // Mon 2026-01-05 and Tue 2026-01-06 share a week; 01-12 and 01-19
    // are the two following Mondays -> exactly three weekly partitions
    val df = Seq((1L, ts("2026-01-05 00:00:00")), (2L, ts("2026-01-06 12:00:00")),
      (3L, ts("2026-01-12 00:00:00")), (4L, ts("2026-01-19 00:00:00"))).toDF("id", "ts")
    log.writePartitionedAppend(df,
      date_format(date_trunc("week", col("ts")), "yyyyMMdd"), statsCols = Seq("ts"))

    val snap = log.snapshot()
    assert(snap.entries.size == 3) // one manifest entry per week
    assert(snap.entries.forall(e => e.path.contains("/_part=") &&
      e.stats.contains("ts")))

    // the partition key is HIDDEN: derived at write, never a data column
    val back = log.read(spark).get
    assert(back.columns.toSeq == Seq("id", "ts"))
    assert(back.count() == 4)

    // per-week stats make range reads skip whole partitions
    val kept = log.pruneRange(snap, "ts",
      Some(ts("2026-01-11 00:00:00")), Some(ts("2026-01-13 00:00:00")))
    assert(kept.size == 1)
    val pruned = log.readRange(spark, "ts",
      Some(ts("2026-01-12 00:00:00")), Some(ts("2026-01-13 00:00:00"))).get
    assert(pruned.collect().map(_.getLong(0)).toSet == Set(3L))
    assert(pruned.inputFiles.length < back.inputFiles.length)

    // vacuum must treat the shared parent data dir as live when only
    // its _part subdirs are referenced (regression: startsWith check)
    log.writeAppend(Seq((9L, ts("2026-02-02 00:00:00"))).toDF("id", "ts"),
      statsCols = Seq("ts"))
    log.vacuum(keepVersions = 1, orphanGraceMs = 0L)
    assert(log.read(spark).get.count() == 5)

    // non-filesystem-safe partition values fail loudly, pre-commit
    intercept[IllegalArgumentException] {
      log.writePartitionedAppend(Seq((7L, "a b/c")).toDF("id", "p"),
        col("p"), statsCols = Nil): Unit
    }
  }

  test("partition-scoped compaction: merges only multi-entry partitions, merged manifest stats, rows identical") {
    val spark2 = spark
    import spark2.implicits._
    val log = new TxLog(tmp("txlog-part-compact"))
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val weekExpr = date_format(date_trunc("week", col("ts")), "yyyyMMdd")
    // two ingests hitting the SAME week + one ingest of a second week +
    // one plain (unpartitioned) append
    log.writePartitionedAppend(Seq((1L, ts("2026-01-05 00:00:00")),
      (2L, ts("2026-01-06 12:00:00"))).toDF("id", "ts"), weekExpr, Seq("ts"))
    log.writePartitionedAppend(Seq((3L, ts("2026-01-07 00:00:00"))).toDF("id", "ts"),
      weekExpr, Seq("ts"))
    log.writePartitionedAppend(Seq((4L, ts("2026-01-12 00:00:00"))).toDF("id", "ts"),
      weekExpr, Seq("ts"))
    log.writeAppend(Seq((9L, ts("2026-02-02 00:00:00"))).toDF("id", "ts"),
      statsCols = Seq("ts"))
    val before = log.read(spark).get.collect().map(_.getLong(0)).toSet
    assert(log.snapshot().entries.size == 4) // 2 + 1 + 1 plain

    assert(log.compactPartitions(spark, vacuumGraceMs = 0L))
    val snap = log.snapshot()
    // hot week merged into one entry; cold week + plain entry untouched
    assert(snap.entries.size == 3)
    assert(snap.entries.count(_.path.contains("_part=20260105")) == 1)
    // merged stats span both source entries (min of mins / max of maxs)
    val merged = snap.entries.find(_.path.contains("_part=20260105")).get
    val enc = (t: java.sql.Timestamp) =>
      t.toInstant.getEpochSecond * 1000000L + t.toInstant.getNano / 1000
    assert(merged.stats("ts").min == enc(ts("2026-01-05 00:00:00")).toString)
    assert(merged.stats("ts").max == enc(ts("2026-01-07 00:00:00")).toString)
    // rows identical, pruning still partition-accurate, vacuum ran
    assert(log.read(spark).get.collect().map(_.getLong(0)).toSet == before)
    val kept = log.pruneRange(snap, "ts",
      Some(ts("2026-01-05 12:00:00")), Some(ts("2026-01-06 00:00:00")))
    assert(kept.size == 1 && kept.head.path.contains("_part=20260105"))
    // idempotent: nothing left to compact
    assert(!log.compactPartitions(spark, vacuumGraceMs = 0L))
  }

  test("vacuum reclaims superseded partition subdirs inside a parent kept live by a sibling partition") {
    val spark2 = spark
    import spark2.implicits._
    val log = new TxLog(tmp("txlog-part-reclaim"))
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val weekExpr = date_format(date_trunc("week", col("ts")), "yyyyMMdd")
    // ONE write carrying two weeks -> both _part subdirs share a uuid
    // parent; a second write makes week 1 hot
    log.writePartitionedAppend(Seq((1L, ts("2026-01-05 00:00:00")),
      (2L, ts("2026-01-12 00:00:00"))).toDF("id", "ts"), weekExpr, Seq("ts"))
    log.writePartitionedAppend(Seq((3L, ts("2026-01-06 00:00:00"))).toDF("id", "ts"),
      weekExpr, Seq("ts"))
    val sharedParent = new File(log.root,
      log.snapshot().entries.find(_.path.contains("_part=20260112")).get
        .path.split("/").init.mkString("/"))
    assert(new File(sharedParent, "_part=20260105").exists())

    // compacting week 1 supersedes sharedParent/_part=20260105, but the
    // parent stays live via _part=20260112 — the stale subdir must be
    // reclaimed, not leaked
    assert(log.compactPartitions(spark, vacuumGraceMs = 0L))
    assert(new File(sharedParent, "_part=20260112").exists(),
      "live sibling partition must survive vacuum")
    assert(!new File(sharedParent, "_part=20260105").exists(),
      "superseded partition subdir must be reclaimed")
    assert(log.read(spark).get.collect().map(_.getLong(0)).toSet ==
      Set(1L, 2L, 3L))
  }

  test("column stats: timestamp and string domains prune; escaped string bounds round-trip the manifest") {
    val spark2 = spark
    import spark2.implicits._
    val log = new TxLog(tmp("txlog-stats-ts"))
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    log.writeAppend(
      Seq((ts("2024-01-01 00:00:00"), """he said "hi"\path"""),
        (ts("2024-01-07 23:59:59"), "bbb")).toDF("ts", "s"),
      statsCols = Seq("ts", "s"))
    log.writeAppend(
      Seq((ts("2024-02-01 00:00:00"), "x1"),
        (ts("2024-02-07 23:59:59"), "x2")).toDF("ts", "s"),
      statsCols = Seq("ts", "s"))

    val snap = log.snapshot() // re-parsed from disk: escaping round-trip
    assert(snap.entries.forall(_.stats.contains("s")))
    // 'b' < 'h': commit 1's string max is the quote/backslash-laden value,
    // which must survive JSON render -> parse byte-identically
    assert(snap.entries.flatMap(_.stats.get("s"))
      .exists(_.max == """he said "hi"\path"""))
    // probe January only (timestamps encode as epoch micros)
    val jan = log.pruneRange(snap, "ts",
      Some(ts("2024-01-03 00:00:00")), Some(ts("2024-01-05 00:00:00")))
    assert(jan.size == 1)
    // string-domain probe: only commit 2's ["x1","x2"] intersects [w, z]
    // (commit 1's range ["bbb", "he said..."] ends before 'w')
    val sOnly = log.pruneRange(snap, "s", Some("w"), Some("z"))
    assert(sOnly.size == 1)
    // incomparable probe domain (long vs timestamp stats) keeps everything
    assert(log.pruneRange(snap, "ts", Some(5L), Some(6L)).size == 2)
  }

  test("column stats: non-finite double bounds are skipped at write and tolerated at read") {
    val spark2 = spark
    import spark2.implicits._
    val log = new TxLog(tmp("txlog-stats-nan"))
    // NaN poisons max() (NaN sorts greatest): the column gets NO stats
    // rather than an unparseable "NaN" bound
    log.writeAppend(Seq((1L, Double.NaN), (2L, 0.5)).toDF("id", "v"),
      statsCols = Seq("id", "v"))
    val e = log.snapshot().entries.head
    assert(e.stats.contains("id"))
    assert(!e.stats.contains("v"))
    // a FOREIGN manifest carrying "NaN" bounds must degrade to
    // reading the entry, never crash the pruning pass
    val alien = log.newDataDir()
    Seq((3L, 1.0)).toDF("id", "v").write.parquet(alien.getPath)
    log.commitAppend(Seq(TxEntry(log.relativize(alien), -1L,
      Map("v" -> graft.store.ColStats("double", "NaN", "NaN")))))
    val snap = log.snapshot()
    val kept = log.pruneRange(snap, "v", Some(100.0), Some(200.0))
    assert(kept.size == 2) // both unprunable on v: no stats / NaN bounds
  }

  test("column stats: TIMESTAMP_NTZ prunes in its own wall-clock domain, zoned probes keep everything") {
    val spark2 = spark
    import spark2.implicits._
    val log = new TxLog(tmp("txlog-stats-ntz"))
    def ntz(src: org.apache.spark.sql.DataFrame) =
      src.select(col("ts").cast("timestamp_ntz").as("ts"), col("v"))
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    log.writeAppend(ntz(Seq((ts("2024-01-01 00:00:00"), 1),
      (ts("2024-01-07 00:00:00"), 2)).toDF("ts", "v")), statsCols = Seq("ts"))
    log.writeAppend(ntz(Seq((ts("2024-02-01 00:00:00"), 3),
      (ts("2024-02-07 00:00:00"), 4)).toDF("ts", "v")), statsCols = Seq("ts"))
    val snap = log.snapshot()
    assert(snap.entries.forall(_.stats.get("ts").exists(_.typ == "timestamp_ntz")))
    // wall-clock probe (LocalDateTime) prunes to the January commit
    val jan = log.pruneRange(snap, "ts",
      Some(java.time.LocalDateTime.parse("2024-01-02T00:00:00")),
      Some(java.time.LocalDateTime.parse("2024-01-05T00:00:00")))
    assert(jan.size == 1)
    // a zoned Instant probe is a DIFFERENT order — incomparable, no pruning
    val zoned = log.pruneRange(snap, "ts",
      Some(java.time.Instant.parse("2024-01-02T00:00:00Z")),
      Some(java.time.Instant.parse("2024-01-05T00:00:00Z")))
    assert(zoned.size == 2)
  }

  test("no-hardlink filesystems: commit fails loudly unless the unsafe fallback is opted into") {
    val spark2 = spark
    import spark2.implicits._
    val dir = tmp("txlog-nolink")
    val w = new MergeWriter(spark, dir, Seq("k"))
    TxLog.simulateNoHardLinks = true
    try {
      val ex = intercept[IllegalStateException] {
        w.upsert(Seq(("a", 1)).toDF("k", "v"), batchId = 1)
      }
      assert(ex.getMessage.contains(TxLog.UnsafePublishFallbackProp))
      assert(!w.exists(), "failed publish must not leave a manifest")
      // explicit opt-in: the single-JVM atomic-move fallback engages
      System.setProperty(TxLog.UnsafePublishFallbackProp, "true")
      try {
        w.upsert(Seq(("a", 1)).toDF("k", "v"), batchId = 1)
        assert(w.read().collect().map(r => (r.getString(0), r.getInt(1))).toSet ==
          Set(("a", 1)))
      } finally {
        System.clearProperty(TxLog.UnsafePublishFallbackProp); ()
      }
    } finally {
      TxLog.simulateNoHardLinks = false
    }
  }

  test("schema evolution: added column null on old files, drop hides it, raw commits carry schema forward") {
    val spark2 = spark
    import spark2.implicits._
    val dir = tmp("txlog-evolve")
    val log = new TxLog(dir)
    log.writeAppend(Seq((1L, "a"), (2L, "b")).toDF("id", "s"))
    // ADD a column: old files must read it as null, not footer-roulette
    log.writeAppend(Seq((3L, "c", 0.5)).toDF("id", "s", "q"))
    val added = log.read(spark).get
    assert(added.columns.toSeq == Seq("id", "s", "q"))
    assert(added.where(col("q").isNull).count() == 2)
    assert(added.where(col("q") === 0.5).count() == 1)
    // a RAW entry commit (no schema declared) carries the evolved
    // schema forward — infra commits never erase evolution
    val legacy = log.newDataDir()
    Seq((4L, "d")).toDF("id", "s").write.parquet(legacy.getPath)
    log.commitAppend(Seq(TxEntry(log.relativize(legacy), -1L)))
    val carried = log.read(spark).get
    assert(carried.columns.toSeq == Seq("id", "s", "q"))
    assert(carried.count() == 4 && carried.where(col("q").isNull).count() == 3)
    // DROP a column: a write declaring the narrower schema hides it
    log.writeAppend(Seq((5L, 0.9)).toDF("id", "q"))
    val dropped = log.read(spark).get
    assert(dropped.columns.toSeq == Seq("id", "q"))
    assert(dropped.count() == 5)
    // time travel reads each version under ITS schema
    assert(log.readSnapshot(spark, log.snapshotAt(0L)).columns.toSeq ==
      Seq("id", "s"))
  }

  test("schema evolution: a column type change fails loudly at commit, naming the column") {
    val spark2 = spark
    import spark2.implicits._
    val dir = tmp("txlog-evolve-bad")
    val log = new TxLog(dir)
    log.writeAppend(Seq((1L, "a")).toDF("id", "s"))
    val before = log.currentVersion()
    val ex = intercept[IllegalArgumentException] {
      log.writeAppend(Seq(("oops", "b")).toDF("id", "s"))
    }
    assert(ex.getMessage.contains("'id'"))
    assert(log.currentVersion() == before, "rejected commit must not publish")
  }

  test("schema evolution: drop-then-re-add must keep the original type (column lineage)") {
    val spark2 = spark
    import spark2.implicits._
    val log = new TxLog(tmp("txlog-lineage"))
    log.writeAppend(Seq((1L, "a")).toDF("id", "s"))
    log.writeAppend(Seq(Tuple1(2L)).toDF("id")) // drop s
    // re-adding s at a DIFFERENT type must fail at commit — the v0
    // files still carry s as a string and a pinned read would explode
    // at scan time instead
    val ex = intercept[IllegalArgumentException] {
      log.writeAppend(Seq((3L, 0.5)).toDF("id", "s"))
    }
    assert(ex.getMessage.contains("'s'"))
    // re-adding at the ORIGINAL type is fine
    log.writeAppend(Seq((3L, "c")).toDF("id", "s"))
    val back = log.read(spark).get
    assert(back.columns.toSeq == Seq("id", "s") && back.count() == 3)
    assert(back.where(col("s").isNull).count() == 1) // the dropped-era row
  }

  test("manifest robustness: string stats bounds with control characters round-trip; stale-version replace returns false") {
    val spark2 = spark
    import spark2.implicits._
    val log = new TxLog(tmp("txlog-ctrl"))
    // a newline inside a string bound must not brick the manifest
    log.writeAppend(Seq(("a\nb\tc", 1L), ("zz", 2L)).toDF("s", "id"),
      statsCols = Seq("s", "id"))
    val snap = log.snapshot() // parses the manifest — must not throw
    assert(snap.entries.head.stats("s").min == "a\nb\tc")
    assert(log.pruneRange(snap, "s", Some("a"), Some("a\nz")).size == 1)
    // a replace computed against a vacuumed-away version loses the CAS
    // gracefully (false), never crashes on the missing manifest
    log.writeAppend(Seq(("q", 3L)).toDF("s", "id"))
    log.vacuum(keepVersions = 1, orphanGraceMs = 0L)
    assert(!log.commitReplace(Vector.empty, expectedVersion = 0L))
  }

  test("reserved _part guard is case-insensitive; legacy first declaration checked against footers") {
    val spark2 = spark
    import spark2.implicits._
    val log = new TxLog(tmp("txlog-guards"))
    intercept[IllegalArgumentException] {
      log.writePartitionedAppend(Seq((1L, "x")).toDF("id", "_PART"),
        col("id").cast("string"), statsCols = Nil): Unit
    }
    // legacy store (raw commit, no schema) whose files say id:string —
    // a first declaration of id:long must be rejected, not pinned
    val legacy = new TxLog(tmp("txlog-legacy"))
    val dir = legacy.newDataDir()
    Seq(("1", "a")).toDF("id", "s").write.parquet(dir.getPath)
    legacy.commitAppend(Seq(TxEntry(legacy.relativize(dir), -1L)))
    val ex = intercept[IllegalArgumentException] {
      legacy.writeAppend(Seq((2L, "b")).toDF("id", "s"))
    }
    assert(ex.getMessage.contains("'id'"))
    // matching declaration over the same legacy store is accepted
    legacy.writeAppend(Seq(("2", "b")).toDF("id", "s"))
    assert(legacy.read(spark).get.count() == 2)
  }

  test("metadata-only ALTER TABLE: add/drop columns without touching data; lineage enforced on re-add") {
    val spark2 = spark
    import spark2.implicits._
    import org.apache.spark.sql.types.{DoubleType, LongType, StringType}
    val log = new TxLog(tmp("txlog-alter"))
    log.writeAppend(Seq((1L, "a")).toDF("id", "s"))
    def dataFiles(): Int = {
      def walk(f: File): Int =
        if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).map(walk).sum
        else 1
      walk(new File(log.root, "data"))
    }
    val before = dataFiles()
    log.alterAddColumn("score", DoubleType)
    assert(dataFiles() == before, "ALTER must write zero data")
    val df = log.read(spark).get
    assert(df.columns.toSeq == Seq("id", "s", "score"))
    assert(df.where(col("score").isNull).count() == 1)
    // a writer can then fill the altered-in column
    log.writeAppend(Seq((2L, "b", 0.5)).toDF("id", "s", "score"))
    assert(log.read(spark).get.where(col("score") === 0.5).count() == 1)
    // drop is also metadata-only, and the lineage survives it
    log.alterDropColumn("s")
    assert(log.read(spark).get.columns.toSeq == Seq("id", "score"))
    intercept[IllegalArgumentException] {
      log.alterAddColumn("s", LongType) // s was committed as string
    }
    log.alterAddColumn("s", StringType): Unit // original type: fine
    assert(log.read(spark).get.columns.toSeq == Seq("id", "score", "s"))
    // duplicate add is rejected case-insensitively (resolver semantics)
    intercept[IllegalArgumentException] {
      log.alterAddColumn("ID", LongType)
    }
  }

  test("schema evolution through MergeWriter: evolved store reads old batches with nulls; readAsOf keeps the old shape") {
    val spark2 = spark
    import spark2.implicits._
    val dir = tmp("txlog-evolve-mw")
    val w = new MergeWriter(spark, dir, Seq("k"))
    w.upsert(Seq(("a", 1), ("b", 2)).toDF("k", "v"), batchId = 1)
    val v0 = w.txLog.currentVersion()
    w.upsert(Seq(("b", 3, 0.7)).toDF("k", "v", "score"), batchId = 2)
    val now = w.read().collect().map(r =>
      (r.getString(0), r.getInt(1), Option(r.get(2)))).toSet
    assert(now == Set(("a", 1, None), ("b", 3, Some(0.7))))
    // time travel: the pre-evolution version keeps its own schema
    assert(w.readAsOf(v0).columns.toSeq == Seq("k", "v"))
    // compaction carries the evolved schema through the replace commit
    w.compact(vacuumGraceMs = 60000L)
    assert(w.read().columns.toSeq == Seq("k", "v", "score"))
    assert(w.read().where(col("score").isNull).count() == 1)
  }

  test("vacuum age-based retention: young manifests survive count-only expiry; retainMs=0 is count-only") {
    val spark2 = spark
    import spark2.implicits._
    val log = new TxLog(tmp("txlog-retain"))
    (1 to 3).foreach(i => log.writeAppend(Seq((i, s"v$i")).toDF("id", "v")): Unit)
    assert(log.history().size == 3)
    // all three manifests are seconds old: a 1h age guard keeps every
    // one of them even though keepVersions=1 would drop two
    log.vacuum(keepVersions = 1, orphanGraceMs = 0L, retainMs = 3600000L)
    assert(log.history().size == 3, "age guard must override count expiry")
    assert(log.readSnapshot(spark, log.snapshotAt(0)).count() == 1) // still readable
    // age the first two manifests artificially past the cut
    log.history() // (manifest files are _log/v%012d.json)
    (0 to 1).foreach { v =>
      val f = new File(new File(log.root, "_log"), f"v$v%012d.json")
      assert(f.setLastModified(System.currentTimeMillis() - 7200000L))
    }
    log.vacuum(keepVersions = 1, orphanGraceMs = 0L, retainMs = 3600000L)
    assert(log.history().map(_._1) == Seq(2L), "aged manifests expire")
    assert(log.read(spark).get.count() == 3)
    // retainMs = 0 behaves exactly as before (count-only)
    val log2 = new TxLog(tmp("txlog-retain0"))
    (1 to 3).foreach(i => log2.writeAppend(Seq((i, s"v$i")).toDF("id", "v")): Unit)
    log2.vacuum(keepVersions = 1, orphanGraceMs = 0L)
    assert(log2.history().map(_._1) == Seq(2L))
  }

  test("schema evolution guards are case-insensitive; upsert widens but never narrows; reserved read columns rejected") {
    val spark2 = spark
    import spark2.implicits._
    import org.apache.spark.sql.types.{LongType, StringType}
    // Spark resolves parquet columns case-insensitively, so a
    // case-variant re-add at a new type is a TYPE CHANGE and must fail
    // at commit, not at some later pinned scan
    val log = new TxLog(tmp("txlog-case"))
    log.writeAppend(Seq((1L, 2L)).toDF("id", "Count"))
    log.alterDropColumn("Count")
    intercept[IllegalArgumentException] {
      log.alterAddColumn("count", StringType)
    }
    log.alterAddColumn("count", LongType): Unit // original type: fine
    intercept[IllegalArgumentException] { // writer-declared case-variant
      log.writeAppend(Seq((2L, "s")).toDF("id", "COUNT"))
    }

    // a batch NARROWER than the table must not hide the table's other
    // columns (dropping is a deliberate DDL, never a batch side effect)
    val w = new MergeWriter(spark, tmp("txlog-widen"), Seq("k"))
    w.upsert(Seq(("a", 1, 0.5), ("b", 2, 0.6)).toDF("k", "v", "score"),
      batchId = 1)
    w.upsert(Seq(("b", 3)).toDF("k", "v"), batchId = 2) // narrow batch
    val df = w.read()
    assert(df.columns.toSeq == Seq("k", "v", "score"))
    // row-level MERGE semantics: the narrow batch's winning row carries
    // null for the column it did not provide; untouched keys keep theirs
    val got = df.collect()
      .map(r => (r.getString(0), r.getInt(1), Option(r.get(2)))).toSet
    assert(got == Set(("a", 1, Some(0.5)), ("b", 3, None)))
    // read-time reserved names would be silently overwritten + dropped
    intercept[IllegalArgumentException] {
      w.upsert(Seq(("c", 1)).toDF("k", "_seq"), batchId = 3)
    }
  }

  test("Bloom point-skip: high-cardinality keys prune to the right directory where min/max cannot") {
    val spark2 = spark
    import spark2.implicits._
    val log = new TxLog(tmp("txlog-bloom"))
    // three appends with fully INTERLEAVED key ranges: every dir's
    // min/max spans ~the whole key space, so stats alone prune nothing
    // — exactly the high-cardinality-key regime blooms exist for
    (0 until 3).foreach { r =>
      val keys = (0 until 300 by 3).map(i => f"u${i + r}%03d": String)
      val rows = keys.map(k => (k, s"payload-$k")) :+ (null, "null-key-row")
      log.writeAppend(rows.toDF("k", "v"), batch = r.toLong,
        statsCols = Seq("k"), bloomCols = Seq("k")): Unit
    }
    val snap = log.snapshot()
    assert(snap.entries.size == 3)
    assert(snap.entries.forall(_.blooms.contains("k")))
    // stats overlap on every entry: a range probe keeps all three
    assert(log.pruneRange(snap, "k", Some("u004"), Some("u004")).size == 3)
    // the bloom prunes to the single directory holding the key
    val kept = log.prunePoint(snap, "k", Seq("u004"))
    assert(kept.map(_.batch) == Vector(1L), s"kept ${kept.map(_.path)}")
    // IN-list across two dirs keeps exactly those two
    assert(log.prunePoint(snap, "k", Seq("u004", "u006"))
      .map(_.batch).toSet == Set(1L, 0L))
    // an absent key prunes everything; readPoint still yields a
    // correctly-typed empty result through its row filter
    assert(log.prunePoint(snap, "k", Seq("zzz-not-there")).isEmpty)
    val viaPoint = log.readPoint(spark, "k", Seq("zzz-not-there")).get
      .where(col("k") === "zzz-not-there")
    assert(viaPoint.columns.toSeq == Seq("k", "v") && viaPoint.count() == 0)
    // point read + row filter ≡ full-scan filter (pruning is invisible)
    val ids = Seq("u004", "u152", "u299")
    val got = log.readPoint(spark, "k", ids).get
      .where(col("k").isin(ids: _*)).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    val want = log.read(spark).get
      .where(col("k").isin(ids: _*)).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == want && got.map(_._1) == ids.toSet)
  }

  test("prunePoint: entries without blooms kept; non-bloomable probe domains fall back to stats; bad keys fail loudly") {
    val spark2 = spark
    import spark2.implicits._
    val log = new TxLog(tmp("txlog-bloom-fallback"))
    log.writeAppend(Seq((10L, "a")).toDF("id", "v"),
      statsCols = Seq("id"), bloomCols = Seq("id")): Unit
    log.writeAppend(Seq((20L, "b")).toDF("id", "v")): Unit // no stats/bloom
    val snap = log.snapshot()
    // bloom-less entry always kept; bloomed entry pruned for a key it
    // cannot contain (stats already exclude 99; bloom excludes 15)
    assert(log.prunePoint(snap, "id", Seq(15L)).map(_.path) ==
      snap.entries.filter(_.blooms.isEmpty).map(_.path))
    // integral probe classes share the bloom's canonical rendering
    assert(log.prunePoint(snap, "id", Seq(10)).size == 2)
    // a double probe is not a bloom domain: falls back to stats-only
    // (10.5 is outside no entry's [10,10] ∪ no-stats, so only the
    // stats-less entry survives)
    assert(log.prunePoint(snap, "id", Seq(10.5)).map(_.path) ==
      snap.entries.filter(_.stats.isEmpty).map(_.path))
    intercept[RuntimeException] {
      log.prunePoint(snap, "id", Seq(new Object))
    }
    intercept[IllegalArgumentException] { // non-integral bloom key type
      log.writeAppend(Seq((0.5, "x")).toDF("d", "v"), bloomCols = Seq("d"))
    }
  }

  test("partitioned blooms OR-merge through compaction at uniform geometry; mixed geometry drops conservatively") {
    val spark2 = spark
    import spark2.implicits._
    val log = new TxLog(tmp("txlog-bloom-compact"))
    def write(ids: Seq[Long]): Unit =
      log.writePartitionedAppend(ids.toDF("id"),
        concat(lit("b"), pmod(col("id"), lit(2)).cast("string")),
        statsCols = Nil, bloomCols = Seq("id")): Unit
    // the grouped bloom build must PARTIAL-aggregate (map-side combine:
    // the exchange carries bit arrays, never the key column)
    locally {
      val probe = Seq(("a", Option("k1")), ("b", Option("k2")))
        .toDS().groupByKey(_._1)
        .agg(new TxLog.BloomAgg(Map("a" -> 8192, "b" -> 8192)).toColumn)
      val plan = probe.queryExecution.executedPlan.toString
      assert(plan.contains("partial_"), s"no map-side partial in:\n$plan")
    }
    // two same-sized writes: uniform bloom geometry per partition
    write(0L until 100L)
    write(1000L until 1100L)
    val pre = log.snapshot()
    assert(pre.entries.size == 4 && pre.entries.forall(_.blooms.contains("id")))
    // a key from write 2 keeps only its (write, bucket) entry
    assert(log.prunePoint(pre, "id", Seq(1042L)).size == 1)
    assert(log.compactPartitions(spark, minEntries = 2, vacuumGraceMs = 0L))
    val post = log.snapshot()
    assert(post.entries.size == 2 && post.entries.forall(_.blooms.contains("id")))
    // the merged bloom contains keys from BOTH source writes
    assert(log.prunePoint(post, "id", Seq(42L)).size == 1)
    assert(log.prunePoint(post, "id", Seq(1042L)).size == 1)
    assert(log.prunePoint(post, "id", Seq(4242L)).isEmpty) // absent key
    assert(log.read(spark).get.count() == 200)
    // third write is much larger: its bloom geometry differs, so the
    // next compaction drops the merged partitions' blooms instead of
    // unioning incompatible filters — and stays correct
    write(10000L until 14000L)
    assert(log.compactPartitions(spark, minEntries = 2, vacuumGraceMs = 0L))
    val mixed = log.snapshot()
    assert(mixed.entries.size == 2 && mixed.entries.forall(_.blooms.isEmpty))
    assert(log.prunePoint(mixed, "id", Seq(42L)).size == 2) // conservative
    assert(log.read(spark).get.count() == 4200)
  }

  test("legacy columns absent from the first declaration still seed the lineage") {
    val spark2 = spark
    import spark2.implicits._
    import org.apache.spark.sql.types.{LongType, StringType}
    // legacy (pre-evolution) table whose live files carry `extra:string`
    val log = new TxLog(tmp("txlog-legacy-lineage"))
    val dir = log.newDataDir()
    Seq((1L, "keep-me")).toDF("id", "extra").write.parquet(dir.getPath)
    log.commitAppend(Seq(TxEntry(log.relativize(dir), -1L)))
    // first declaration does NOT mention `extra` — a legitimate narrow
    // declaration (evolution treats it as a drop). The legacy footer
    // union must still enter the lineage, or `extra` could later be
    // re-added at a different type and pinned reads over the legacy
    // file would fail at scan time.
    log.writeAppend(Seq(2L).toDF("id"))
    assert(log.read(spark).get.columns.toSeq == Seq("id"))
    val ex = intercept[IllegalArgumentException] {
      log.alterAddColumn("extra", LongType)
    }
    assert(ex.getMessage.contains("extra"))
    log.alterAddColumn("extra", StringType): Unit // original type: fine
    val rows = log.read(spark).get.collect()
      .map(r => (r.getLong(0), Option(r.getString(1)))).toSet
    assert(rows == Set((1L, Some("keep-me")), (2L, None)))
  }

  test("compaction honors vacuum retention: pinned pre-compact snapshots survive keepVersions>1") {
    val spark2 = spark
    import spark2.implicits._
    // partition-scoped compaction (compactPartitions)
    val log = new TxLog(tmp("txlog-compact-retain"))
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val weekExpr = date_format(date_trunc("week", col("ts")), "yyyyMMdd")
    log.writePartitionedAppend(Seq((1L, ts("2026-01-05 00:00:00"))).toDF("id", "ts"),
      weekExpr, Seq("ts"))
    val pinned = log.currentVersion()
    log.writePartitionedAppend(Seq((2L, ts("2026-01-06 00:00:00"))).toDF("id", "ts"),
      weekExpr, Seq("ts"))
    assert(log.compactPartitions(spark, vacuumGraceMs = 0L, keepVersions = 3))
    // the pre-compact snapshot is still fully readable: neither its
    // manifest nor its data files were reclaimed
    assert(log.readSnapshot(spark, log.snapshotAt(pinned)).count() == 1)
    // keyed-store compaction (MergeWriter.compact) under the same contract
    val w = new MergeWriter(spark, tmp("txlog-mw-retain"), Seq("k"))
    w.upsert(Seq(("a", 1)).toDF("k", "v"), batchId = 1)
    val v0 = w.txLog.currentVersion()
    w.upsert(Seq(("a", 2)).toDF("k", "v"), batchId = 2)
    w.compact(vacuumGraceMs = 0L, keepVersions = 4)
    assert(w.readAsOf(v0).collect().map(r => (r.getString(0), r.getInt(1)))
      .toSet == Set(("a", 1)))
    // keepVersions = 0 skips the vacuum entirely (caller owns retention)
    val w2 = new MergeWriter(spark, tmp("txlog-mw-novac"), Seq("k"))
    w2.upsert(Seq(("a", 1)).toDF("k", "v"), batchId = 1)
    w2.upsert(Seq(("a", 2)).toDF("k", "v"), batchId = 2)
    val preVersions = w2.txLog.history().size
    w2.compact(vacuumGraceMs = 0L, keepVersions = 0)
    assert(w2.txLog.history().size == preVersions + 1,
      "keepVersions=0 must leave every manifest in place")
    assert(w2.read().collect().map(r => (r.getString(0), r.getInt(1)))
      .toSet == Set(("a", 2)))
  }

  test("crash-injection matrix: table readable + correct at every kill point; vacuum + next writer heal") {
    val spark2 = spark
    import spark2.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val weekExpr = date_format(date_trunc("week", col("ts")), "yyyyMMdd")

    // Every scenario kills a writer protocol at a named step. Each
    // simulated crash state is built from PUBLIC-API prefixes of the
    // real protocol (stage = the writer's own parquet write into
    // newDataDir, replace-no-vacuum = the real replace commit with the
    // vacuum suppressed), so the injected state is exactly what a kill
    // at that step leaves on disk. Invariants checked at every point:
    // (1) reads serve the last committed snapshot, (2) vacuum heals the
    // debris without disturbing it, (3) the next writer lands normally.
    def freshLog(name: String): TxLog = {
      val log = new TxLog(tmp(s"txlog-kill-$name"))
      log.writePartitionedAppend(
        Seq((1L, ts("2026-01-05 00:00:00")), (2L, ts("2026-01-12 00:00:00")))
          .toDF("id", "ts"), weekExpr, Seq("id"))
      log.writePartitionedAppend(
        Seq((3L, ts("2026-01-06 00:00:00"))).toDF("id", "ts"),
        weekExpr, Seq("id"))
      log
    }
    def liveIds(log: TxLog): Set[Long] =
      log.read(spark).get.select("id").collect().map(_.getLong(0)).toSet

    val scenarios: Seq[(String, TxLog => Set[Long])] = Seq(
      "append killed between stage and publish (orphan dir)" -> { log =>
        val d = log.newDataDir()
        Seq((9L, ts("2026-02-02 00:00:00"))).toDF("id", "ts")
          .write.parquet(d.getPath)
        Set.empty
      },
      "append killed mid-stage (torn parquet file + _temporary dir)" -> { log =>
        val d = log.newDataDir()
        Seq((9L, ts("2026-02-02 00:00:00"))).toDF("id", "ts")
          .write.parquet(d.getPath)
        val f = d.listFiles().filter(_.getName.endsWith(".parquet")).head
        val bytes = Files.readAllBytes(f.toPath)
        Files.write(f.toPath, bytes.take(bytes.length / 2))
        Files.createDirectories(new File(d, "_temporary/0").toPath)
        Set.empty
      },
      "partitioned append killed before publish (subdirs + sidecar staged)" -> { log =>
        val d = log.newDataDir()
        Seq((9L, ts("2026-02-02 00:00:00"))).toDF("id", "ts")
          .withColumn("_part", weekExpr.cast("string"))
          .write.partitionBy("_part").parquet(d.getPath)
        val part = d.listFiles().filter(_.getName.startsWith("_part=")).head
        Files.write(new File(part, "_bloom_id.bin").toPath,
          Array[Byte](1, 2, 3)) // half-staged sidecar
        Set.empty
      },
      "publisher killed mid-manifest-write (torn tmp in _log)" -> { log =>
        Files.write(new File(log.root, "_log/.tmp-torn").toPath,
          """{"version":7,"op":"appe""".getBytes("UTF-8"))
        Set.empty
      },
      "compaction killed between publish and vacuum (superseded files linger)" -> { log =>
        assert(log.compactPartitions(spark, keepVersions = 0))
        Set.empty
      },
      "replace loser killed before staged cleanup (alter/compact CAS retry)" -> { log =>
        val v = log.currentVersion()
        log.writeAppend( // the competing writer that wins the CAS
          Seq((50L, ts("2026-02-09 00:00:00"))).toDF("id", "ts"))
        val d = log.newDataDir()
        Seq((99L, ts("2026-02-02 00:00:00"))).toDF("id", "ts")
          .write.parquet(d.getPath)
        assert(!log.commitReplace(Seq(TxEntry(log.relativize(d), -1L)), v),
          "stale replace must lose the CAS")
        Set(50L) // staged dir 99 is debris; the competing append is live
      },
      "vacuum killed mid-sweep (some superseded files gone, some left)" -> { log =>
        assert(log.compactPartitions(spark, keepVersions = 0))
        val live = log.snapshot().entries.map(_.path).toSet
        val dataRoot = new File(log.root, "data")
        val superseded = dataRoot.listFiles().filter(d =>
          !live.exists(_.startsWith(s"data/${d.getName}")))
        assert(superseded.nonEmpty, "compaction must supersede a directory")
        TxLog.deleteRecursively(superseded.head) // partial data sweep
        val manifests = new File(log.root, "_log").listFiles()
          .filter(_.getName.matches("""v\d{12}\.json""")).sortBy(_.getName)
        assert(manifests.length > 1)
        manifests.head.delete(): Unit // partial manifest sweep
        Set.empty
      })

    scenarios.foreach { case (name, inject) =>
      val log = freshLog(name.takeWhile(_ != ' '))
      val extra = inject(log)
      val expected = Set(1L, 2L, 3L) ++ extra
      assert(liveIds(log) == expected, s"[$name] post-crash read")
      log.vacuum(keepVersions = 1, orphanGraceMs = 0L)
      assert(liveIds(log) == expected, s"[$name] post-vacuum read")
      log.writeAppend(
        Seq((100L, ts("2026-03-02 00:00:00"))).toDF("id", "ts"))
      assert(liveIds(log) == expected + 100L, s"[$name] next writer")
    }
  }

  test("manifest row counts: every writer stamps them, compaction sum-merges, legacy degrades to None") {
    val spark2 = spark
    import spark2.implicits._
    // plain append: rows == written count, snapshot total follows
    val log = new TxLog(tmp("txlog-rows"))
    log.writeAppend((1L to 7L).toDF("id"))
    log.writeAppend((8L to 10L).toDF("id"))
    val snap = log.snapshot()
    assert(snap.entries.map(_.rows).sorted == Vector(3L, 7L))
    assert(snap.rowCount.contains(10L))
    // hidden-partitioned append: one count per partition entry
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val weekExpr = date_format(date_trunc("week", col("ts")), "yyyyMMdd")
    val plog = new TxLog(tmp("txlog-rows-part"))
    plog.writePartitionedAppend(
      Seq((1L, ts("2026-01-05 00:00:00")), (2L, ts("2026-01-06 00:00:00")),
        (3L, ts("2026-01-12 00:00:00"))).toDF("id", "ts"),
      weekExpr, Seq("ts"))
    plog.writePartitionedAppend(
      Seq((4L, ts("2026-01-07 00:00:00"))).toDF("id", "ts"),
      weekExpr, Seq("ts"))
    assert(plog.snapshot().rowCount.contains(4L))
    // partition-scoped compaction merges counts by summation (row-
    // preserving rewrite), and the total is unchanged
    assert(plog.compactPartitions(spark, vacuumGraceMs = 0L))
    val merged = plog.snapshot()
    assert(merged.rowCount.contains(4L))
    assert(merged.entries.exists(_.rows == 3L),
      "the compacted week-1 partition must carry the summed count")
    // a LEGACY entry (committed before row counts existed) poisons the
    // total to None — a partial sum must never under-report
    val legacy = new TxLog(tmp("txlog-rows-legacy"))
    val dir = legacy.newDataDir()
    Seq(1L, 2L).toDF("id").write.parquet(dir.getPath)
    legacy.commitAppend(Seq(TxEntry(legacy.relativize(dir), -1L)))
    assert(legacy.snapshot().entries.head.rows == -1L)
    assert(legacy.snapshot().rowCount.isEmpty)
    legacy.writeAppend(Seq(3L).toDF("id"))
    assert(legacy.snapshot().rowCount.isEmpty, "one legacy entry taints the sum")
    // keyed store: physical-row upper bound before compaction, exact after
    val w = new MergeWriter(spark, tmp("txlog-rows-mw"), Seq("k"))
    w.upsert(Seq(("a", 1), ("b", 1)).toDF("k", "v"), batchId = 1)
    w.upsert(Seq(("a", 2)).toDF("k", "v"), batchId = 2)
    assert(w.txLog.snapshot().rowCount.contains(3L)) // a superseded + a,b live
    w.compact(vacuumGraceMs = 0L)
    assert(w.txLog.snapshot().rowCount.contains(2L)) // exact after rewrite
  }

  test("string stats pruning compares in UTF-8 byte order (supplementary plane)") {
    val spark2 = spark
    import spark2.implicits._
    val log = new TxLog(tmp("txlog-utf8"))
    // one entry holding both U+FFFD (BMP, UTF-8 EF BF BD) and U+10000
    // (supplementary, UTF-8 F0 90 80 80): Spark computes the stats max
    // in UTF8String byte order, so max = U+10000. Java's UTF-16
    // compareTo would call that max SMALLER than a U+FFFD probe (its
    // first code unit is the surrogate 0xD800 < 0xFFFD) and wrongly
    // prune the entry that contains the matching U+FFFD row.
    val supp = new String(Character.toChars(0x10000))
    log.writeAppend(Seq(("�", 1), (supp, 2)).toDF("s", "v"),
      statsCols = Seq("s"))
    val snap = log.snapshot()
    assert(snap.entries.head.stats("s").max == supp,
      "precondition: Spark's max must be the supplementary-plane string")
    assert(log.pruneRange(snap, "s", Some("�"), None).size == 1,
      "UTF-16 comparison would lossily prune this entry")
    val got = log.readRange(spark, "s", Some("�"), None).get
      .where(col("s") === "�").count()
    assert(got == 1L)
    // symmetric direction: a probe UPPER bound below the UTF-8 min
    // must still prune (ordering fix must not disable pruning)
    assert(log.pruneRange(snap, "s", None, Some("A")).isEmpty)
  }

  test("vacuum survives concurrent vacuums retiring its listed manifests") {
    val spark2 = spark
    import spark2.implicits._
    val log = new TxLog(tmp("txlog-vacuum-race"))
    def commit(n: Long): Unit = {
      val dir = log.newDataDir()
      Seq(n).toDF("id").write.parquet(dir.getPath)
      log.commitAppend(Seq(TxEntry(log.relativize(dir), n)))
    }
    (0L until 6L).foreach(commit)
    // two vacuums with different retention race against a writer: the
    // looser one can list a manifest the stricter one deletes before it
    // reads — the prelude must re-list (progress is guaranteed: a
    // vanished manifest means the other vacuum already retired it),
    // never crash the caller (IvfCentroidStore.loadOrTrain first-caller
    // races and SQL VACUUM next to MergeWriter.compact are this shape)
    @volatile var failure: Option[Throwable] = None
    val racer = new Thread(() => {
      try (0 until 40).foreach { i =>
        commit(100L + i)
        log.vacuum(keepVersions = 1, orphanGraceMs = 60000L)
      } catch { case t: Throwable => failure = Some(t) }
    })
    racer.start()
    try (0 until 40).foreach { _ =>
      log.vacuum(keepVersions = 3, orphanGraceMs = 60000L)
    } finally racer.join()
    failure.foreach(t => fail(s"concurrent vacuum crashed: $t"))
    // the table stayed readable and the newest commit survived
    assert(log.snapshot().version >= 0)
    assert(log.read(spark).get.agg(org.apache.spark.sql.functions.max(
      col("id"))).head.getLong(0) == 139L)
  }

  test("manifest op tag is JSON-escaped; versionCount is listing-based") {
    val spark2 = spark
    import spark2.implicits._
    val log = new TxLog(tmp("txlog-op-escape"))
    val dir = log.newDataDir()
    Seq(1L).toDF("id").write.parquet(dir.getPath)
    log.commitAppend(Seq(TxEntry(log.relativize(dir), -1L)),
      op = "load \"v2\"\\nightly")
    // an op carrying quotes/backslashes must round-trip, not brick
    // every later parse of the manifest
    assert(log.snapshot().entries.size == 1)
    assert(log.history().map(_._2) == Seq("load \"v2\"\\nightly"))
    assert(log.versionCount() == log.history().size)
  }
}
