package graft

import graft.operators.GraphMart
import org.apache.spark.sql.functions._

/** The co-order edge mart: losslessness of the persisted/merged forms
  * against a from-scratch build, the read-time minCo cut, the session
  * cache's build-once identity, and the incremental merge contract.
  */
class GraphMartSpec extends SparkSpecBase {
  import spark.implicits._

  private def edgeSet(df: org.apache.spark.sql.DataFrame) =
    df.select("src", "dst", "w").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("counts match a hand-derived fixture; minCo cut applies at read") {
    // orders: 10 -> parts {1,2,3}, 11 -> {1,2}, 12 -> {2,3} and a
    // duplicate lineitem (order 10, part 1) that must NOT double-count
    val li = Seq(
      (10L, 1L), (10L, 2L), (10L, 3L), (10L, 1L),
      (11L, 1L), (11L, 2L),
      (12L, 2L), (12L, 3L))
      .toDF("l_orderkey", "l_partkey")
    val counts = edgeSet(GraphMart.coOrderCounts(li))
    assert(counts == Set((1L, 2L, 2L), (1L, 3L, 1L), (2L, 3L, 2L)),
      s"got $counts")
    val cut = edgeSet(GraphMart.edges(GraphMart.coOrderCounts(li), minCo = 2))
    assert(cut == Set((1L, 2L, 2L), (2L, 3L, 2L)), s"got $cut")
  }

  test("mart build off fixture lineitem equals the inline self-join") {
    val li = Tables.lineitem(spark, sfDir)
    val mart = GraphMart.edges(GraphMart.coOrderCounts(li))
    // independent formulation: SQL over a temp view
    li.select("l_orderkey", "l_partkey").createOrReplaceTempView("li_gm")
    val want = spark.sql(
      """SELECT a.l_partkey AS src, b.l_partkey AS dst,
        |       count(DISTINCT a.l_orderkey) AS w
        |FROM li_gm a JOIN li_gm b
        |  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |GROUP BY 1, 2 HAVING count(DISTINCT a.l_orderkey) >= 2""".stripMargin)
    assert(edgeSet(mart) == edgeSet(want))
  }

  test("order-complete incremental merge is bit-equal to a full rebuild") {
    val li = Tables.lineitem(spark, sfDir)
    // split by ORDER (the contract): each order's lineitems stay together
    val a = li.filter(col("l_orderkey") % 3 =!= 0)
    val b = li.filter(col("l_orderkey") % 3 === 0)
    val merged = GraphMart.mergeCounts(
      GraphMart.coOrderCounts(a), GraphMart.coOrderCounts(b))
    assert(edgeSet(merged) == edgeSet(GraphMart.coOrderCounts(li)),
      "merge-on-read diverged from the from-scratch build")
  }

  test("write/read round-trips exactly and prunes at the scan") {
    val dir = java.nio.file.Files.createTempDirectory("graphmart").toString
    val li = Tables.lineitem(spark, sfDir)
    val counts = GraphMart.coOrderCounts(li)
    GraphMart.write(counts, s"$dir/edges", numFiles = 3)
    val back = GraphMart.read(spark, s"$dir/edges")
    assert(edgeSet(back) == edgeSet(counts))
    // the minCo cut must reach the parquet scan as a pushed filter
    val plan = GraphMart.edges(back, minCo = 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains("GreaterThanOrEqual(w,2)"), s"no pushdown in:\n$plan")
  }

  test("bucketed mart table elides the exchange for src-keyed work") {
    spark.sql("DROP TABLE IF EXISTS gm_edges_bk")
    // in-memory catalog forgets tables across JVMs but warehouse dirs
    // persist; a stale dir makes saveAsTable fail LOCATION_ALREADY_EXISTS
    val dir = new java.io.File(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"),
      "gm_edges_bk")
    if (dir.exists()) { dir.listFiles().foreach(_.delete()); dir.delete() }
    GraphMart.writeBucketed(
      GraphMart.coOrderCounts(Tables.lineitem(spark, sfDir)),
      "gm_edges_bk", buckets = 4)
    // the degree/out-weight aggregation every graph op opens with must
    // read the bucketing straight from the catalog — no Exchange
    val agg = spark.table("gm_edges_bk")
      .groupBy("src").agg(sum(col("w")).as("sw"))
    assert(agg.count() > 0)
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      "src-keyed aggregate over the bucketed mart still shuffled:\n" +
        plan.take(1200))
  }

  // A private writable fixture (lineitem only) so the disk-mart tests can
  // mutate mtimes without touching the shared read-only testdata.
  private def copyFixture(): java.io.File = {
    val dir = java.nio.file.Files.createTempDirectory("gm_fixture").toFile
    val src = java.nio.file.Paths.get(sfDir, "lineitem.parquet")
    val dst = dir.toPath.resolve("lineitem.parquet")
    if (java.nio.file.Files.isDirectory(src)) {
      java.nio.file.Files.walk(src).forEach(p =>
        java.nio.file.Files.copy(p, dst.resolve(src.relativize(p)),
          java.nio.file.StandardCopyOption.REPLACE_EXISTING))
    } else java.nio.file.Files.copy(src, dst)
    dir
  }

  test("diskCounts persists once, re-reads across sessions, rebuilds on stale") {
    val fixture = copyFixture()
    // the fixture dir is unique per run, so its mart home is too — delete
    // both afterwards or every run leaks a parquet copy into tmpdir
    try {
    val want = edgeSet(GraphMart.coOrderCounts(
      spark.read.parquet(s"$fixture/lineitem.parquet")))

    // first call: builds and persists
    assert(edgeSet(GraphMart.diskCounts(spark, fixture.getPath)) == want)
    // locate the manifest via a second call's no-rebuild property: a
    // FRESH SESSION (cross-session path) must read, not rebuild — pin it
    // by manifest mtime staying put
    val base = new java.io.File(sys.env.getOrElse("SPARK_GRAFT_MART_DIR",
      new java.io.File(System.getProperty("java.io.tmpdir"), "graft-marts").getPath))
    val manifest = base.listFiles()
      .filter(d => new java.io.File(d, "MANIFEST").isFile)
      .map(d => new java.io.File(d, "MANIFEST"))
      .filter(m => new String(java.nio.file.Files.readAllBytes(m.toPath), "UTF-8")
        .contains(fixture.getCanonicalPath))
      .maxBy(_.lastModified)
    val builtAt = manifest.lastModified

    val s2 = spark.newSession()
    assert(edgeSet(GraphMart.diskCounts(s2, fixture.getPath)) == want)
    assert(manifest.lastModified == builtAt,
      "fresh-session read must NOT rebuild a fingerprint-fresh mart")

    // stale fixture (mtime bumped) must rebuild — manifest rewritten,
    // content unchanged (same bytes, newer fingerprint)
    val li = new java.io.File(fixture, "lineitem.parquet")
    assert(li.setLastModified(li.lastModified + 10000))
    assert(edgeSet(GraphMart.diskCounts(spark, fixture.getPath)) == want)
    assert(manifest.lastModified > builtAt,
      "stale-fingerprint mart must rebuild (manifest not rewritten)")
    } finally {
      GraphMart.deleteRecursively(GraphMart.martHome(fixture.getPath))
      GraphMart.deleteRecursively(fixture)
    }
  }

  test("concurrent first-builders serialize; both read one complete mart") {
    val fixture = copyFixture()
    try {
      val want = edgeSet(GraphMart.coOrderCounts(
        spark.read.parquet(s"$fixture/lineitem.parquet")))
      // two same-JVM racers on a never-built mart: the build lock must
      // serialize them (no interleaved writes into one counts dir) and
      // both must come back with the complete edge set
      import scala.concurrent.{Await, Future}
      import scala.concurrent.ExecutionContext.Implicits.global
      import scala.concurrent.duration._
      val sessions = Seq(spark.newSession(), spark.newSession())
      val results = Await.result(Future.sequence(sessions.map(s =>
        Future(edgeSet(GraphMart.diskCounts(s, fixture.getPath))))),
        120.seconds)
      assert(results.forall(_ == want),
        "a racing first-builder read an incomplete mart")
      // no stray temp/retired dirs left behind by the swap
      val leftovers = Option(GraphMart.martHome(fixture.getPath).listFiles())
        .getOrElse(Array.empty).map(_.getName)
        .filter(_.startsWith("counts_tmp_"))
      assert(leftovers.isEmpty, s"leaked temp build dirs: ${leftovers.toSeq}")
    } finally {
      GraphMart.deleteRecursively(GraphMart.martHome(fixture.getPath))
      GraphMart.deleteRecursively(fixture)
    }
  }

  test("retireStale: grace counts from supersession (tombstone), not build") {
    val home = java.nio.file.Files.createTempDirectory("gm_retire").toFile
    def mk(name: String, buildAgeMs: Long, tombAgeMs: Option[Long] = None) = {
      val d = new java.io.File(home, name); d.mkdirs()
      new java.io.File(d, "part-0").createNewFile()
      tombAgeMs.foreach { age =>
        val t = new java.io.File(d, GraphMart.SupersededMarker)
        t.createNewFile()
        assert(t.setLastModified(System.currentTimeMillis - age))
      }
      assert(d.setLastModified(System.currentTimeMillis - buildAgeMs)); d
    }
    val grace = 5 * 60 * 1000L
    val keep = mk("counts_aaa", 10 * grace)  // current (old is fine) → kept
    // superseded JUST NOW but built long ago — the r13 bug deleted this
    // immediately (grace measured from build time); now it must survive
    // the first pass and merely gain a tombstone
    val fresh = mk("counts_bbb", 10 * grace)
    // tombstoned within grace → kept (a reader may still be scanning)
    val young = mk("counts_ccc", 10 * grace, tombAgeMs = Some(grace / 2))
    // tombstoned past grace → swept
    val old = mk("counts_ddd", 10 * grace, tombAgeMs = Some(2 * grace))
    // pre-v3 layout follows the same protocol
    val legacy = mk("counts", 10 * grace, tombAgeMs = Some(2 * grace))
    val tmp = mk("counts_tmp_x", 0L)         // crashed build → swept regardless
    val manifest = new java.io.File(home, "MANIFEST")
    java.nio.file.Files.write(manifest.toPath, "fp".getBytes("UTF-8"))
    GraphMart.retireStale(home, keep = "counts_aaa", graceMs = grace)
    assert(keep.isDirectory && manifest.isFile,
      "retireStale must keep the current dir and the manifest")
    assert(fresh.isDirectory &&
      new java.io.File(fresh, GraphMart.SupersededMarker).isFile,
      "a newly superseded dir must be kept and tombstoned, however old " +
        "its build time")
    assert(young.isDirectory,
      "a dir tombstoned within grace must be kept")
    assert(!old.exists && !legacy.exists && !tmp.exists,
      "retireStale must sweep past-grace tombstoned dirs and crashed tmps")
    // second pass, tombstone now past grace → the fresh dir is reclaimed
    val t = new java.io.File(fresh, GraphMart.SupersededMarker)
    assert(t.setLastModified(System.currentTimeMillis - 2 * grace))
    GraphMart.retireStale(home, keep = "counts_aaa", graceMs = grace)
    assert(!fresh.exists, "second pass past grace must reclaim the dir")
    assert(keep.isDirectory)
    // a dir that becomes CURRENT again after being tombstoned (fixture
    // flips A → B → A) must shed the stale tombstone — otherwise its
    // NEXT supersession counts grace from the old mtime and deletes it
    // immediately
    val back = mk("counts_eee", 10 * grace, tombAgeMs = Some(2 * grace))
    GraphMart.retireStale(home, keep = "counts_eee", graceMs = grace)
    assert(back.isDirectory &&
      !new java.io.File(back, GraphMart.SupersededMarker).exists,
      "a re-current dir must be kept and its stale tombstone removed")
    GraphMart.deleteRecursively(home)
  }

  test("rebuild never deletes the dir a concurrent reader resolved") {
    val fixture = copyFixture()
    try {
      val want = edgeSet(GraphMart.diskCounts(spark, fixture.getPath))
      // a "concurrent reader": a lazy frame resolved against the
      // CURRENT versioned dir, scanned only after the rebuild below
      val resolved = GraphMart.diskCounts(spark, fixture.getPath)
      val li = new java.io.File(fixture, "lineitem.parquet")
      assert(li.setLastModified(li.lastModified + 10000))
      // stale fingerprint → rebuild lands under a NEW versioned name
      assert(edgeSet(GraphMart.diskCounts(spark, fixture.getPath)) == want)
      assert(edgeSet(resolved) == want,
        "the pre-rebuild frame must stay scannable (lazy retirement)")
    } finally {
      GraphMart.deleteRecursively(GraphMart.martHome(fixture.getPath))
      GraphMart.deleteRecursively(fixture)
    }
  }

  test("cachedEdges normalizes the dir key (trailing slash = same entry)") {
    val e1 = GraphMart.cachedEdges(spark, sfDir)
    val e2 = GraphMart.cachedEdges(spark, sfDir + "/")
    assert(e1 eq e2,
      "path spellings of one fixture must share one cached mart")
  }

  test("cachedEdges builds once per (session, dir) and returns the cut graph") {
    val e1 = GraphMart.cachedEdges(spark, sfDir)
    val e2 = GraphMart.cachedEdges(spark, sfDir)
    assert(e1 eq e2, "second call must return the SAME cached frame")
    assert(edgeSet(e1) ==
      edgeSet(GraphMart.edges(GraphMart.coOrderCounts(
        Tables.lineitem(spark, sfDir)))))
    // checkpointed: the plan must not contain the lineitem self-join
    val plan = e1.queryExecution.optimizedPlan.toString
    assert(!plan.toLowerCase.contains("join"),
      s"cached mart still re-plans the self-join:\n$plan")
  }

  test("edgePartitions derives the round width from the measured edge count") {
    // the scale-adaptive rule (round 18): ceil(edges / 2M rows), min 1 —
    // the spec fixture's edge list is far under one 2M-row partition, so
    // the iterative ops must run 1-wide here, and the rule must agree
    // with the frame's own count at any scale
    val n = GraphMart.cachedEdges(spark, sfDir).count()
    val per = GraphMart.EdgeRowsPerPartition
    val want = math.max(1L, (n + per - 1) / per).toInt
    assert(GraphMart.edgePartitions(spark, sfDir) == want,
      s"edgePartitions disagrees with ceil($n / $per)")
    assert(want == 1, s"spec fixture unexpectedly large: $n edges")
  }
}
