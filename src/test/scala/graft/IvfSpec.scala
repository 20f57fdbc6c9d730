package graft

import graft.similarity.{Ivf, VectorOps}
import org.apache.spark.sql.functions._

class IvfSpec extends SparkSpecBase {
  import spark.implicits._

  // three well-separated clusters in 4-d, 20 points each
  private lazy val corpus = {
    val rng = new scala.util.Random(11)
    val centers = Seq(
      Array(10.0, 0.0, 0.0, 0.0),
      Array(0.0, 10.0, 0.0, 0.0),
      Array(0.0, 0.0, 10.0, 0.0))
    val pts = for {
      (c, ci) <- centers.zipWithIndex
      j <- 0 until 20
    } yield ((ci * 20 + j).toLong,
      c.map(_ + rng.nextGaussian() * 0.5).toSeq)
    pts.toDF("id", "vec")
  }

  test("kmeansFit recovers the planted cluster structure deterministically") {
    val c1 = Ivf.kmeansFit(corpus, k = 3, iters = 4)
    val c2 = Ivf.kmeansFit(corpus, k = 3, iters = 4)
    assert(c1.map(_.toSeq).toSeq == c2.map(_.toSeq).toSeq) // deterministic
    // each centroid should sit near one planted center: its max component
    // ≈ 10 and dominates
    c1.foreach { c =>
      val mx = c.max
      assert(mx > 8.0 && c.count(_ > 5.0) == 1, s"bad centroid ${c.toSeq}")
    }
  }

  test("assignCells puts same-cluster points in the same cell") {
    val cs = Ivf.kmeansFit(corpus, k = 3, iters = 4)
    val cells = Ivf.assignCells(corpus, cs)
      .select($"id", $"cell").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    for (base <- Seq(0L, 20L, 40L); j <- 1 until 20)
      assert(cells(base + j) == cells(base), s"split cluster at ${base + j}")
  }

  test("topKIvf achieves high recall vs brute force on clustered data") {
    val queries = corpus.filter($"id" % 20 === 0) // one per cluster
    val exact = VectorOps.topKBruteForce(queries, corpus, k = 5)
      .select("qid", "vec_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val approx = Ivf.topKIvf(queries, corpus, k = 5, nlist = 3, nprobe = 1,
        kmeansIters = 4)
      .select("qid", "vec_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    assert(approx.keySet == exact.keySet)
    val recall = exact.keys.toSeq.map(q =>
      (approx(q) & exact(q)).size.toDouble / exact(q).size).sum / exact.size
    assert(recall >= 0.9, s"recall $recall too low") // 1 probe on 3 clean cells
  }

  test("topKIvf output is deterministic and correctly shaped") {
    val queries = corpus.filter($"id" === 0)
    val r1 = Ivf.topKIvf(queries, corpus, k = 3, nlist = 3, nprobe = 2).collect()
    val r2 = Ivf.topKIvf(queries, corpus, k = 3, nlist = 3, nprobe = 2).collect()
    assert(r1.map(_.toSeq).toSeq == r2.map(_.toSeq).toSeq)
    assert(r1.map(_.getAs[Int]("rn")).toSeq == Seq(1, 2, 3))
  }

  test("hardNegativesIvf == hardNegatives exactly when every cell is probed") {
    val labeled = corpus.withColumn("label",
      (col("id") / 20).cast("int").cast("string"))
    val queries = labeled.filter($"id" % 20 === 0)
    val exact = VectorOps.hardNegatives(queries, labeled, k = 4)
      .orderBy("qid", "rn").collect().map(_.toSeq).toSeq
    val allProbes = VectorOps.hardNegativesIvf(queries, labeled, k = 4,
        nlist = 3, nprobe = 3, kmeansIters = 4)
      .orderBy("qid", "rn").collect().map(_.toSeq).toSeq
    assert(allProbes == exact)
    // a restricted probe still returns k differently-labeled negatives
    val probed = VectorOps.hardNegativesIvf(queries, labeled, k = 4,
        nlist = 3, nprobe = 2, kmeansIters = 4).collect()
    assert(probed.map(_.getAs[String]("neg_label")).toSet.nonEmpty)
    probed.foreach { r =>
      val qLabel = (r.getAs[Long]("qid") / 20).toString
      assert(r.getAs[String]("neg_label") != qLabel)
    }
  }

  test("centroids round-trip the lake bit-identically; assignments stay stable") {
    val cents = Ivf.kmeansFit(corpus, k = 3)
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-cent").toString
    Ivf.saveCentroids(spark, cents, s"$dir/c")
    val back = Ivf.loadCentroids(spark, s"$dir/c")
    assert(back.length == cents.length)
    cents.zip(back).foreach { case (a, b) => assert(a.toSeq == b.toSeq) }
    // a later batch assigned with the LOADED quantizer lands in the same
    // cells — the property incremental IVF maintenance depends on
    val a1 = Ivf.assignCells(corpus, cents)
      .select("id", "cell").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val a2 = Ivf.assignCells(corpus, back)
      .select("id", "cell").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(a1 == a2)
  }

  test("incremental index == full rebuild under fixed centroids; " +
    "topKIvfIndexed at nprobe = nlist is brute force over the union") {
    // fit on the BASE only, then append the batch incrementally — the
    // (id, cell) set must equal assigning the whole union in one pass
    // (cells are a pure function of (vec, centroids)), and searching the
    // incremental index with every cell probed must land on the exact
    // brute-force answer over base ∪ batch (q_ann_ivf_incremental's
    // exact-equivalence contract).
    val base = corpus.filter($"id" % 3 =!= 0)
    val batch = corpus.filter($"id" % 3 === 0)
    val cents = Ivf.kmeansFit(base, k = 3, iters = 4)
    val incremental = Ivf.assignCells(base, cents)
      .unionByName(Ivf.assignCells(batch, cents))
    val rebuilt = Ivf.assignCells(corpus, cents)
    def cellSet(df: org.apache.spark.sql.DataFrame) =
      df.select("id", "cell").collect()
        .map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(cellSet(incremental) == cellSet(rebuilt))
    val queries = corpus.filter($"id" % 20 === 0)
    val exact = VectorOps.topKBruteForce(queries, corpus, k = 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val inc = Ivf.topKIvfIndexed(queries, incremental, cents, k = 5,
        nprobe = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(inc == exact, "exhaustive probe over the incremental index " +
      "must equal brute force")
  }
}
