package graft

import graft.similarity.{Pq, VectorOps}
import org.apache.spark.sql.functions.col

class PqSpec extends SparkSpecBase {

  private lazy val corpus = graft.Tables.embeddings(spark, sfDir)
    .select(col("vec_id").as("id"),
      VectorOps.asDouble(col("embedding")).as("vec"))

  test("codebooks and codes are deterministic and well-formed") {
    val cb1 = Pq.fitCodebooks(corpus, m = 8, ksub = 16)
    val cb2 = Pq.fitCodebooks(corpus, m = 8, ksub = 16)
    assert(cb1.length == 8 && cb1.forall(_.length == 16))
    assert(cb1.flatten.flatten.toSeq == cb2.flatten.flatten.toSeq)
    val codes = Pq.encode(corpus, cb1).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(codes.values.forall(c => c.length == 8 &&
      c.forall(x => x >= 0 && x < 16)))
    // 8 codes of 4 bits replace 64 float64s — the 64x scan reduction
    assert(codes.nonEmpty)
  }

  test("PQ-ADC top-k recall vs brute force is high after exact re-rank") {
    val queries = corpus.filter(col("id") < 10)
    val exact = VectorOps.topKBruteForce(queries, corpus, 3).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val approx = Pq.topKPq(queries, corpus, 3).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.7, s"recall $recall below floor; got $approx")
    // results are deterministic run to run
    val again = Pq.topKPq(queries, corpus, 3).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(approx == again)
  }

  test("IVFPQ composes the cell filter with ADC and keeps useful recall") {
    val queries = corpus.filter(col("id") < 10)
    val exact = VectorOps.topKBruteForce(queries, corpus, 3).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val approx = Pq.topKIvfPq(queries, corpus, 3).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    // each query still yields k results (probed cells are never empty:
    // the query's own cell is always among its nprobe nearest)
    assert(approx.groupBy(_._1).forall(_._2.size == 3))
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.5, s"recall $recall below floor; got $approx")
  }

  test("codebooks round-trip the lake bit-identically; incremental " +
    "index == full re-encode; indexed search == topKPq") {
    val base = corpus.filter(col("id") % 3 =!= 0)
    val batch = corpus.filter(col("id") % 3 === 0)
    val trained = Pq.fitCodebooks(base, m = 8, ksub = 16)
    val dir = java.nio.file.Files.createTempDirectory("pq-books")
      .resolve("cb").toString
    Pq.saveCodebooks(spark, trained, dir)
    val loaded = Pq.loadCodebooks(spark, dir)
    assert(loaded.flatten.flatten.toSeq == trained.flatten.flatten.toSeq,
      "doubles must round-trip parquet bit-identically")
    // encode is a pure per-row map: base+batch under loaded books ==
    // one-pass re-encode of the whole corpus under trained books
    def codeSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val incremental = codeSet(Pq.encode(base, loaded)
      .unionByName(Pq.encode(batch, loaded)))
    val rebuilt = codeSet(Pq.encode(corpus, trained))
    assert(incremental == rebuilt)
    // searching the incrementally-grown index under loaded books ==
    // topKPq given the same codebooks (one definition of the scan path)
    val queries = corpus.filter(col("id") < 10)
    def res(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val viaIndex = res(Pq.topKPqIndexed(queries,
      Pq.encode(base, loaded).unionByName(Pq.encode(batch, loaded)),
      corpus, loaded, k = 3))
    val viaFit = res(Pq.topKPqIndexed(queries, Pq.encode(corpus, trained),
      corpus, trained, k = 3))
    assert(viaIndex == viaFit)
  }

  test("recommendParams reads the committed r16 curve: least-work point " +
    "reaching the target, saturation/knee evidence encoded") {
    // pinned against probes/r16/ann_probe_100x.json — the committed
    // 200k-corpus sweep whose measurements this chooser exists to
    // operationalize (rerank saturates at 256; nprobe 2-4 is the knee).
    // Regeneration recipe = graft.AnnProbe (the scaladoc points there).
    assert(new java.io.File("probes/r16/ann_probe_100x.json").isFile,
      "committed curve artifact moved — update the default curvePath")
    val p95 = Pq.recommendParams(0.95)
    assert(p95.nprobe == 2 && p95.rerank == 256 && p95.meetsTarget &&
      p95.expectedRecall == 0.988, s"knee pick regressed: $p95")
    val p99 = Pq.recommendParams(0.99)
    assert(p99.nprobe == 4 && p99.rerank == 256 && p99.meetsTarget,
      s"0.99 pick regressed: $p99")
    val exact = Pq.recommendParams(1.0)
    assert(exact.nprobe == 8 && exact.rerank == 256 && exact.meetsTarget,
      s"1.0 pick regressed: $exact")
    // a lax target takes the cheapest measured point, not a bigger one
    val lax = Pq.recommendParams(0.5)
    assert(lax.nprobe == 1 && lax.rerank == 64 && lax.meetsTarget,
      s"lax pick regressed: $lax")
    assert(intercept[IllegalArgumentException] {
      Pq.recommendParams(0.0)
    }.getMessage.contains("targetRecall"))
    assert(intercept[IllegalArgumentException] {
      Pq.recommendParams(0.9, curvePath = "/nonexistent/curve.json")
    }.getMessage.contains("AnnProbe"))
  }

  test("recommendParams past the curve's ceiling returns best-available " +
    "with meetsTarget = false") {
    // a synthetic curve topping out below the target — the chooser must
    // say so instead of silently under-delivering
    val f = java.io.File.createTempFile("graft-curve", ".json")
    f.deleteOnExit()
    val json = """{"metric":"ann_probe","grid":[
      {"nprobe":1,"rerank":64,"recall_at_10":0.7,"sec":1.0},
      {"nprobe":4,"rerank":256,"recall_at_10":0.9,"sec":2.0},
      {"nprobe":8,"rerank":256,"recall_at_10":0.9,"sec":3.0}]}"""
    java.nio.file.Files.write(f.toPath, json.getBytes("UTF-8"))
    val p = Pq.recommendParams(0.95, curvePath = f.getPath)
    assert(!p.meetsTarget && p.expectedRecall == 0.9 &&
      p.nprobe == 4 && p.rerank == 256, // least work among ceiling ties
      s"ceiling fallback regressed: $p")
  }

  test("recommendParams provenance: stamped curve checked against the " +
    "caller's index; mismatched nlist refuses, off-decade corpus flags") {
    // the committed curve is stamped n_corpus=200000, nlist=64
    val ok = Pq.recommendParams(0.95, forNlist = Some(64),
      forCorpusSize = Some(450000L)) // same decade as 200k
    assert(ok.provenanceMatch && ok.nprobe == 2 && ok.rerank == 256,
      s"matching provenance regressed: $ok")
    // nlist mismatch is a REFUSAL — nprobe is a fraction of nlist
    val e = intercept[IllegalArgumentException] {
      Pq.recommendParams(0.95, forNlist = Some(1024))
    }
    assert(e.getMessage.contains("nlist=64") &&
      e.getMessage.contains("nlist=1024"), e.getMessage)
    // corpus decade mismatch: pick still returned, flagged extrapolation
    val far = Pq.recommendParams(0.95, forCorpusSize = Some(50000000L))
    assert(!far.provenanceMatch && far.meetsTarget,
      s"decade mismatch not flagged: $far")
    // a STAMPLESS curve cannot confirm a declared nlist → flagged
    val f = java.io.File.createTempFile("graft-curve-nostamp", ".json")
    f.deleteOnExit()
    java.nio.file.Files.write(f.toPath,
      """{"metric":"ann_probe","grid":[
        {"nprobe":1,"rerank":64,"recall_at_10":0.7,"sec":1.0}]}"""
        .getBytes("UTF-8"))
    val ns = Pq.recommendParams(0.5, curvePath = f.getPath,
      forNlist = Some(64))
    assert(!ns.provenanceMatch, s"stampless curve not flagged: $ns")
    // declaring nothing keeps the advisory r16 behavior
    assert(Pq.recommendParams(0.95).provenanceMatch)
  }

  test("default curve ships as a classpath resource identical to the " +
    "committed file (library callers outside the repo root)") {
    val in = getClass.getResourceAsStream("/graft/ann_probe_100x.json")
    assert(in != null, "resource graft/ann_probe_100x.json missing")
    val res = try in.readAllBytes() finally in.close()
    val file = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(Pq.DefaultCurvePath))
    assert(java.util.Arrays.equals(res, file),
      "classpath curve diverged from the committed probe artifact — " +
        "re-copy probes/r16/ann_probe_100x.json into resources")
  }
}
