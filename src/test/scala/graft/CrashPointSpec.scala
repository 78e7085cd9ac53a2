package graft

import graft.streaming.CorpusIngest
import graft.operators.Similarity
import graft.sources.{Sinks, Warehouse}
import org.apache.spark.sql.functions._

/** Mechanical crash-point enumeration for every journaled swap (r10
  * verdict task 4): the crafted crash shapes in CorpusIngestSpec /
  * SinksSpec each encode ONE window someone thought of — and twice now
  * (r9 crash-after-rename, r10 stale-id marker) the window nobody
  * thought of was the bug. This spec stops choosing: each maintenance
  * op runs once against [[FailingRawFs]] to COUNT its fs mutations
  * (Spark committer traffic included), then once per prefix length k —
  * crash injected between mutation k and k+1 — followed by a
  * full-budget re-run (for compactState: at a LARGER upTo, the r10
  * cross-id healing path). After every single crash point the
  * invariant is identical: no row lost, no row duplicated, no
  * marker/tmp/journal debris, and the converged layout.
  *
  * The ops' own crash-discipline docs promise exactly this ("re-running
  * with ANY upTo after any crash converges"; "idempotent"; "a crash at
  * any instant leaves the index readable") — here the promise is swept,
  * not sampled. */
class CrashPointSpec extends SparkSuite {

  private lazy val ready: Unit = {
    spark.sparkContext.hadoopConfiguration
      .set("fs.failing.impl", classOf[FailingRawFs].getName)
    graft.functions.VectorOps.ensureRegistered(spark)
  }

  private def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def rmrf(p: java.io.File): Unit = {
    Option(p.listFiles()).foreach(_.foreach(rmrf)); p.delete()
  }

  /** Recursive template → work copy (plain java.nio, never gated). */
  private def resetWork(template: String, work: String): Unit = {
    rmrf(new java.io.File(work))
    val src = java.nio.file.Paths.get(template)
    val dst = java.nio.file.Paths.get(work)
    java.nio.file.Files.walk(src).forEach { p =>
      val t = dst.resolve(src.relativize(p))
      if (java.nio.file.Files.isDirectory(p)) java.nio.file.Files.createDirectories(t)
      else java.nio.file.Files.copy(p, t,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
  }

  private def failing(localPath: String): String = s"failing://$localPath"

  /** Run `op`; an injected crash (anywhere in the cause chain) is the
    * expected outcome, anything else a real failure. Returns whether
    * the op crashed. */
  private def crashed(op: => Unit): Boolean =
    try { op; false }
    catch {
      case t: Throwable =>
        val chain = Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
          .map(e => Option(e.getMessage).getOrElse("")).mkString(" | ")
        assert(chain.contains(FailingRawFs.CrashMessage),
          s"op failed for a non-injected reason: $chain")
        true
    }

  // five-token texts (the CorpusIngestSpec fixture): distinct docs
  // share no tokens; exact copies collide in every band
  private val texts = IndexedSeq(
    "alpha bravo charlie delta echo foxtrot golf hotel",
    "india juliett kilo lima mike november oscar papa",
    "quebec romeo sierra tango uniform victor whiskey xray",
    "yankee zulu one two three four five six",
    "seven eight nine ten eleven twelve thirteen fourteen",
    "fifteen sixteen seventeen eighteen nineteen twenty twentyone twentytwo")

  test("compactState: a crash after EVERY fs mutation heals under a later upTo") {
    ready
    import spark.implicits._
    val template = tmpDir("graft_crash_ingest_tpl")
    rmrf(new java.io.File(template)) // ingest creates it
    FailingRawFs.reset(Long.MaxValue)
    // 4 batches: novel docs, an indexed-dup (5→1) and a same-batch
    // shape, so all three state tables carry rows
    CorpusIngest.ingestBatch(
      Seq(1L -> texts(0), 2L -> texts(1)).toDF("doc_id", "text"), 0L, failing(template))
    CorpusIngest.ingestBatch(
      Seq(3L -> texts(2), 5L -> texts(0)).toDF("doc_id", "text"), 1L, failing(template))
    CorpusIngest.ingestBatch(
      Seq(4L -> texts(3)).toDF("doc_id", "text"), 2L, failing(template))
    CorpusIngest.ingestBatch(
      Seq(6L -> texts(4)).toDF("doc_id", "text"), 3L, failing(template))

    def content(root: String, sub: String): Set[Seq[Any]] =
      spark.read.parquet(s"$root/$sub").drop("batch_id")
        .collect().map(_.toSeq).toSet
    val expected = Seq("corpus", "index", "dups").map(s => s -> content(template, s))
    assert(expected.forall(_._2.nonEmpty), "every state table must carry rows")

    val work = tmpDir("graft_crash_ingest_wrk")
    resetWork(template, work)
    FailingRawFs.reset(Long.MaxValue)
    CorpusIngest.compactState(spark, failing(work), upTo = 2L)
    val m = FailingRawFs.mutations
    assert(m > 20, s"expected a rich mutation trace to sweep, got $m")

    for (k <- 0L until m) {
      resetWork(template, work)
      FailingRawFs.reset(k)
      crashed(CorpusIngest.compactState(spark, failing(work), upTo = 2L))
      // heal under a LARGER upTo — the r10 cross-id rule: the stale
      // upTo=2 swap must roll forward/back BEFORE the upTo=3 rebuild
      // reads the old partitions
      FailingRawFs.reset(Long.MaxValue)
      CorpusIngest.compactState(spark, failing(work), upTo = 3L)
      expected.foreach { case (sub, want) =>
        assert(content(work, sub) === want,
          s"crash point $k/$m: $sub rows diverged after recovery")
        val entries = new java.io.File(s"$work/$sub").listFiles().map(_.getName)
        assert(entries.forall(n => n == "batch_id=3" || n == "_SUCCESS"),
          s"crash point $k/$m: $sub not converged, has ${entries.mkString(",")}")
      }
    }
    rmrf(new java.io.File(template)); rmrf(new java.io.File(work))
  }

  test("eraseKeys: a crash after EVERY fs mutation re-runs to the exact erased table") {
    ready
    import spark.implicits._
    val template = tmpDir("graft_crash_erase_tpl")
    rmrf(new java.io.File(template))
    FailingRawFs.reset(Long.MaxValue)
    val rows = (0L until 300L).map(k => (k, s"payload_$k")).toDF("k", "payload")
    Warehouse.writeClustered(rows, failing(template), targetFiles = 3, "k")
    val deleteKeys = Seq(5L, 6L, 150L, 299L)
    val want = (0L until 300L).filterNot(deleteKeys.contains)
      .map(k => (k, s"payload_$k")).sorted

    def got(root: String): Seq[(Long, String)] =
      spark.read.parquet(root).collect()
        .map(r => (r.getLong(0), r.getString(1))).toSeq.sorted

    val work = tmpDir("graft_crash_erase_wrk")
    resetWork(template, work)
    FailingRawFs.reset(Long.MaxValue)
    Warehouse.eraseKeys(spark, failing(work), "k", deleteKeys)
    val m = FailingRawFs.mutations
    assert(m > 10, s"expected a rich mutation trace to sweep, got $m")
    assert(got(work) === want)

    for (k <- 0L until m) {
      resetWork(template, work)
      FailingRawFs.reset(k)
      crashed(Warehouse.eraseKeys(spark, failing(work), "k", deleteKeys))
      FailingRawFs.reset(Long.MaxValue)
      // the documented recovery: re-run the same erasure (recoverSwap
      // heals first; a completed first pass deletes 0 further rows)
      Warehouse.eraseKeys(spark, failing(work), "k", deleteKeys)
      // sorted-list equality = no loss AND no duplicates in one check
      assert(got(work) === want, s"crash point $k/$m: table diverged after recovery")
      val leftover = new java.io.File(work).listFiles().map(_.getName)
        .filter(n => n.contains("_swap_journal") || n.contains("erase_tmp"))
      assert(leftover.isEmpty, s"crash point $k/$m: debris ${leftover.mkString(",")}")
    }
    rmrf(new java.io.File(template)); rmrf(new java.io.File(work))
  }

  test("compactIndex: a crash after EVERY fs mutation preserves the index and its searches") {
    ready
    import spark.implicits._
    // small deterministic corpus, K=2 cells so the per-cell sweep stays
    // tractable — the per-cell journal logic is identical at any K
    // (cells heal independently; compactPartitionedSmallFiles folds the
    // same compactSmallFiles over every cid= dir)
    val emb = (0L until 60L).map { i =>
      (i, Array.tabulate(64)(d => math.sin(i * 64.0 + d)))
    }.toDF("vec_id", "v")
    val cent = Similarity.seedCentroids(emb, 2)
    val template = tmpDir("graft_crash_index_tpl")
    rmrf(new java.io.File(template))
    FailingRawFs.reset(Long.MaxValue)
    Similarity.buildIvfIndex(emb.filter(col("vec_id") < 40), cent, failing(template))
    Similarity.appendToIvfIndex(spark,
      emb.filter(col("vec_id") >= 40 && col("vec_id") < 50), failing(template))
    Similarity.appendToIvfIndex(spark,
      emb.filter(col("vec_id") >= 50), failing(template))

    def cells(root: String): Set[(Long, Long, Seq[Byte])] =
      spark.read.parquet(s"$root/cells").collect()
        .map(r => (r.getAs[Long]("nid"), r.getAs[Number]("cid").longValue(),
          r.getAs[scala.collection.Seq[Byte]]("nv8").toSeq)).toSet
    val wantCells = cells(template)
    assert(wantCells.size === 60)
    val queries = emb.filter(col("vec_id") % 20 === 0)
    def search(root: String): Seq[Seq[Any]] =
      Similarity.searchIvfIndex(spark, root, emb, queries)
        .collect().map(_.toSeq).toSeq.sortBy(_.toString)
    val wantSearch = search(template)
    assert(wantSearch.nonEmpty)

    val work = tmpDir("graft_crash_index_wrk")
    resetWork(template, work)
    FailingRawFs.reset(Long.MaxValue)
    Similarity.compactIndex(spark, failing(work))
    val m = FailingRawFs.mutations
    assert(m > 10, s"expected a rich mutation trace to sweep, got $m")
    assert(cells(work) === wantCells)

    for (k <- 0L until m) {
      resetWork(template, work)
      FailingRawFs.reset(k)
      crashed(Similarity.compactIndex(spark, failing(work)))
      FailingRawFs.reset(Long.MaxValue)
      Similarity.compactIndex(spark, failing(work))
      // row-set identity is THE invariant (search is a pure function of
      // cells + frozen centroids); the search replay every few points
      // pins the end-to-end claim without tripling the sweep's runtime
      assert(cells(work) === wantCells,
        s"crash point $k/$m: index rows diverged after recovery")
      if (k % 10 == 0 || k == m - 1)
        assert(search(work) === wantSearch,
          s"crash point $k/$m: search results diverged after recovery")
    }
    rmrf(new java.io.File(template)); rmrf(new java.io.File(work))
  }

  test("compactSmallFiles: a crash after EVERY fs mutation re-runs to the exact row set") {
    ready
    import spark.implicits._
    val template = tmpDir("graft_crash_csf_tpl")
    rmrf(new java.io.File(template))
    FailingRawFs.reset(Long.MaxValue)
    // six single-task appends = six small part files (the shape the
    // op exists to repair); every row distinct so sorted-list equality
    // catches loss AND duplication in one check
    val rows = (0L until 120L).map(k => (k, s"payload_$k")).toDF("k", "payload")
    for (g <- 0 until 6)
      rows.filter(col("k") % 6 === g).repartition(1)
        .write.mode("append").parquet(failing(template))
    def got(root: String): Seq[(Long, String)] =
      spark.read.parquet(root).collect()
        .map(r => (r.getLong(0), r.getString(1))).toSeq.sorted
    val want = got(template)
    assert(want.size === 120)

    val work = tmpDir("graft_crash_csf_wrk")
    resetWork(template, work)
    FailingRawFs.reset(Long.MaxValue)
    val rep = Warehouse.compactSmallFiles(spark, failing(work), 1L << 20, 1L << 20)
    assert(rep.filesCompacted === 6 && got(work) === want)
    val m = FailingRawFs.mutations
    assert(m > 10, s"expected a rich mutation trace to sweep, got $m")

    for (k <- 0L until m) {
      resetWork(template, work)
      FailingRawFs.reset(k)
      crashed(Warehouse.compactSmallFiles(spark, failing(work), 1L << 20, 1L << 20))
      FailingRawFs.reset(Long.MaxValue)
      // the documented recovery: the NEXT compaction heals the swap
      // first (recoverSwap), then packs whatever small files remain
      Warehouse.compactSmallFiles(spark, failing(work), 1L << 20, 1L << 20)
      assert(got(work) === want, s"crash point $k/$m: table diverged after recovery")
      val leftover = new java.io.File(work).listFiles().map(_.getName)
        .filter(n => n.contains("_swap_journal") || n.contains("compact_tmp"))
      assert(leftover.isEmpty, s"crash point $k/$m: debris ${leftover.mkString(",")}")
    }
    rmrf(new java.io.File(template)); rmrf(new java.io.File(work))
  }

  test("compactParquet: a crash after EVERY fs mutation re-runs to the exact dst, src intact") {
    ready
    import spark.implicits._
    val template = tmpDir("graft_crash_cp_tpl")
    rmrf(new java.io.File(template))
    FailingRawFs.reset(Long.MaxValue)
    val rows = (0L until 90L).map(k => (k, s"payload_$k")).toDF("k", "payload")
    for (g <- 0 until 3)
      rows.filter(col("k") % 3 === g).repartition(1)
        .write.mode("append").parquet(failing(s"$template/src"))
    def got(root: String): Seq[(Long, String)] =
      spark.read.parquet(root).collect()
        .map(r => (r.getLong(0), r.getString(1))).toSeq.sorted
    val want = got(s"$template/src")
    def srcFiles(root: String): Seq[String] =
      new java.io.File(s"$root/src").listFiles().map(_.getName).toSeq.sorted
    val wantSrc = srcFiles(template)

    val work = tmpDir("graft_crash_cp_wrk")
    resetWork(template, work)
    FailingRawFs.reset(Long.MaxValue)
    val n = Sinks.compactParquet(spark, failing(s"$work/src"), failing(s"$work/dst"), 2, 1000000)
    assert(n === 90 && got(s"$work/dst") === want)
    val m = FailingRawFs.mutations
    assert(m > 5, s"expected a rich mutation trace to sweep, got $m")

    for (k <- 0L until m) {
      resetWork(template, work)
      FailingRawFs.reset(k)
      crashed {
        Sinks.compactParquet(spark, failing(s"$work/src"), failing(s"$work/dst"), 2, 1000000)
        ()
      }
      FailingRawFs.reset(Long.MaxValue)
      // the documented recovery: the rewrite is an idempotent sized
      // OVERWRITE into a fresh dir — a retry rewrites dst outright
      val n2 = Sinks.compactParquet(spark, failing(s"$work/src"), failing(s"$work/dst"), 2, 1000000)
      assert(n2 === 90 && got(s"$work/dst") === want,
        s"crash point $k/$m: dst diverged after recovery")
      assert(srcFiles(work) === wantSrc && got(s"$work/src") === want,
        s"crash point $k/$m: src mutated")
      val leftover = new java.io.File(s"$work/dst").listFiles().map(_.getName)
        .filter(n => n.startsWith("_temporary") || n.startsWith(".spark-staging"))
      assert(leftover.isEmpty, s"crash point $k/$m: debris ${leftover.mkString(",")}")
    }
    rmrf(new java.io.File(template)); rmrf(new java.io.File(work))
  }

  test("overwriteDayPartitions: a crash after EVERY fs mutation re-runs to the corrected table") {
    ready
    import spark.implicits._
    val template = tmpDir("graft_crash_dyn_tpl")
    rmrf(new java.io.File(template))
    FailingRawFs.reset(Long.MaxValue)
    val twoDays = ((0L until 40L).map(k => (k, 1, s"v1_$k"))
      ++ (40L until 80L).map(k => (k, 2, s"stale_$k"))).toDF("k", "day", "payload")
    Sinks.overwriteDayPartitions(twoDays.repartition(col("day")), failing(s"$template/t"),
      "day", 1000000)
    // the day-2 correction: fewer rows, new payloads — day 1 must
    // survive every crash point byte-for-byte (the whole point of
    // dynamic over static overwrite)
    val corrected = (40L until 70L).map(k => (k, 2, s"fixed_$k")).toDF("k", "day", "payload")
    def got(root: String): Seq[(Long, Int, String)] =
      spark.read.parquet(s"$root/t").select("k", "day", "payload").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSeq.sorted
    val want = ((0L until 40L).map(k => (k, 1, s"v1_$k"))
      ++ (40L until 70L).map(k => (k, 2, s"fixed_$k"))).sorted

    val work = tmpDir("graft_crash_dyn_wrk")
    resetWork(template, work)
    FailingRawFs.reset(Long.MaxValue)
    Sinks.overwriteDayPartitions(corrected.repartition(col("day")), failing(s"$work/t"),
      "day", 1000000)
    assert(got(work) === want)
    val m = FailingRawFs.mutations
    assert(m > 5, s"expected a rich mutation trace to sweep, got $m")

    for (k <- 0L until m) {
      resetWork(template, work)
      FailingRawFs.reset(k)
      crashed(Sinks.overwriteDayPartitions(corrected.repartition(col("day")),
        failing(s"$work/t"), "day", 1000000))
      FailingRawFs.reset(Long.MaxValue)
      // the documented recovery: dynamic overwrite is the idempotent
      // backfill idiom — re-running the same day's load converges
      Sinks.overwriteDayPartitions(corrected.repartition(col("day")),
        failing(s"$work/t"), "day", 1000000)
      assert(got(work) === want, s"crash point $k/$m: table diverged after recovery")
      val leftover = new java.io.File(s"$work/t").listFiles().map(_.getName)
        .filter(n => n.startsWith("_temporary") || n.startsWith(".spark-staging"))
      assert(leftover.isEmpty, s"crash point $k/$m: debris ${leftover.mkString(",")}")
    }
    rmrf(new java.io.File(template)); rmrf(new java.io.File(work))
  }
}
