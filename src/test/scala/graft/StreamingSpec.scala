package graft

import graft.streaming.StreamingTelemetry
import graft.streaming.StreamingTelemetry.{JobEvent, JobSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.sql.Timestamp

/** Top-level so Spark codegen sees a static constructor (nested test case
  * classes carry an outer pointer and break the generated encoder code).
  */
case class StreamMetric(ts: Timestamp, machine_id: String,
                        gpu_util_pct: java.lang.Double,
                        cpu_util_pct: java.lang.Double)

case class StreamEvent(event_id: Long, ts: Timestamp, user_id: Long,
                       event_type: String, value: java.lang.Double)

case class ScoredDay(dt: Timestamp, avg_gpu_util: Double,
                     anomaly_score: Double, anomaly_flag: Int)

/** Streaming operators through MemoryStream sources: the same transforms
  * must behave per their event-time/watermark/state contracts.
  */
class StreamingSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(day: Int, hour: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-03-${day}%02d $hour%02d:00:00")

  test("windowedUtilization aggregates per event-time day with watermark") {
    implicit val sql = spark.sqlContext
    val in = MemoryStream[StreamMetric]
    val q = StreamingTelemetry.windowedUtilization(in.toDF(), "1 day", "1 day")
      .writeStream.format("memory").queryName("daily_util")
      .outputMode("append").start()
    try {
      in.addData(
        StreamMetric(ts(1, 1), "m1", 10.0, 1.0),
        StreamMetric(ts(1, 2), "m1", 30.0, 3.0),
        StreamMetric(ts(1, 3), "m2", null, 9.0), // null gpu filtered
        StreamMetric(ts(2, 1), "m1", 50.0, 5.0))
      q.processAllAvailable()
      // advance watermark past day 1+2 so their windows close (append mode)
      in.addData(StreamMetric(ts(5, 0), "m9", 1.0, 1.0))
      q.processAllAvailable()
      val rows = spark.table("daily_util").orderBy("dt").collect()
      assert(rows.length >= 2)
      val d1 = rows(0)
      assert(d1.getAs[Timestamp]("dt") == ts(1))
      assert(d1.getAs[Double]("avg_gpu_util") == 20.0)
      assert(d1.getAs[Long]("n_samples") == 2L)
      assert(rows(1).getAs[Double]("avg_gpu_util") == 50.0)
    } finally q.stop()
  }

  test("streamAlerts emits each anomalous day once across micro-batches") {
    implicit val sql = spark.sqlContext
    val lake = java.nio.file.Files.createTempDirectory("graft-salerts").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-salerts-ck").toString
    val in = MemoryStream[ScoredDay]
    val q = StreamingTelemetry.streamAlerts(in.toDF(), lake, ckpt)
    try {
      // trigger 1: one quiet day, one anomalous day → one alert
      in.addData(
        ScoredDay(ts(1), 50.0, -0.1, 0),
        ScoredDay(ts(2), 20.0, -0.6, 1))
      q.processAllAvailable()
      val a1 = graft.telemetry.Alerts.readAlerts(spark, lake)
      assert(a1.count() == 1)
      // trigger 2: day 2 re-scored (still anomalous) + a NEW anomalous
      // day → only the new day alerts; day 2 is anti-joined away
      in.addData(
        ScoredDay(ts(2), 20.0, -0.6, 1),
        ScoredDay(ts(3), 19.0, -0.8, 1))
      q.processAllAvailable()
      val rows = graft.telemetry.Alerts.readAlerts(spark, lake)
        .orderBy("dt").collect()
      assert(rows.map(_.getTimestamp(0)).toSeq == Seq(ts(2), ts(3)))
      // stream epochs land in the stream-reserved id range (AlertsSpec
      // covers replay; the range keeps them disjoint from refresh ids)
      val base = graft.telemetry.Alerts.streamBatchBase
      assert(rows.map(_.getLong(3)).toSeq == Seq(base, base + 1))
    } finally q.stop()
  }

  test("streamNearDups maintains the band index across batches, pairs == batch dedup") {
    implicit val sql = spark.sqlContext
    def tmp(p: String) = java.nio.file.Files.createTempDirectory(p).toString
    val (corpus, index, pairs, ckpt) =
      (tmp("graft-snd-c"), tmp("graft-snd-i"), tmp("graft-snd-p"), tmp("graft-snd-k"))
    // dirs must not pre-exist or the first batch thinks it has history
    Seq(corpus, index, pairs).foreach(d => new java.io.File(d).delete())
    val in = MemoryStream[(Long, String)]
    val q = StreamingTelemetry.streamNearDups(
      in.toDF().toDF("doc_id", "text"), corpus, index, pairs, ckpt)
    val b1 = Seq(
      (1L, "The quick brown fox jumps over the lazy dog near the river bank"),
      (2L, "the QUICK brown fox jumps over the lazy dog near the river bank"),
      (4L, "completely different content about gpu clusters and telemetry data"))
    val b2 = Seq(
      (5L, "The quick brown fox jumps over the lazy dog near the river bank"),
      (6L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda"),
      (7L, "alpha beta gamma delta epsilon zeta eta theta iota kappa mu"))
    try {
      in.addData(b1: _*); q.processAllAvailable()
      in.addData(b2: _*); q.processAllAvailable()
      val streamed = spark.read.parquet(pairs)
        .select("ida", "idb")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val batch = graft.dedup.Dedup.minhashLshPairs(
        (b1 ++ b2).toDF("doc_id", "text"), "text", "doc_id", 0.7)
        .select("ida", "idb")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // batch-1 pairs land in epoch 0, cross/new pairs in epoch 1 —
      // together exactly the one-shot batch result, nothing double-counted
      assert(streamed == batch, s"streamed=$streamed batch=$batch")
      assert(spark.read.parquet(pairs).count() == streamed.size)
      // the lake now holds band keys for every doc (4 bands each)
      assert(spark.read.parquet(index).count() == 6 * 4)
    } finally q.stop()
  }

  test("streamed KMV and histogram marts answer EXACTLY like batch builds") {
    implicit val sql = spark.sqlContext
    def tmp(p: String) = {
      val d = java.nio.file.Files.createTempDirectory(p).toString
      new java.io.File(d).delete(); d
    }
    val (kmvDir, kmvCk, histDir, histCk) =
      (tmp("graft-skm-m"), tmp("graft-skm-k"), tmp("graft-shm-m"), tmp("graft-shm-k"))
    val in = MemoryStream[StreamEvent]
    val df = in.toDF()
    val k = 32
    val qk = StreamingTelemetry.streamKmvMart(df, kmvDir, kmvCk,
      Seq("event_type"), col("user_id").cast("string"), k)
    val qh = StreamingTelemetry.streamHistMart(df, histDir, histCk,
      Seq("event_type"), col("value"), binWidth = 10.0)
    val rnd = new scala.util.Random(31)
    def ev(id: Long) = StreamEvent(id, ts(1 + (id % 9).toInt), rnd.nextInt(60),
      if (id % 3 == 0) "click" else "view", rnd.nextDouble() * 100)
    val all = (1L to 300L).map(ev)
    try {
      // three uneven epochs
      Seq(all.slice(0, 40), all.slice(40, 250), all.slice(250, 300)).foreach {
        b => in.addData(b: _*); qk.processAllAvailable(); qh.processAllAvailable()
      }
      val batchDf = all.toDF()
      // KMV: merge-on-read rollup over epochs == one-shot batch mart
      val streamedEst = graft.operators.Kmv.rollup(
          spark.read.parquet(kmvDir).drop("batch"), Seq("event_type"), k)
        .select(col("event_type"), graft.operators.Kmv.estimate("kmv", k))
        .as[(String, Long)].collect().toMap
      val batchEst = graft.operators.Kmv.mart(
          batchDf, Seq("event_type"), col("user_id").cast("string"), k)
        .select(col("event_type"), graft.operators.Kmv.estimate("kmv", k))
        .as[(String, Long)].collect().toMap
      assert(streamedEst == batchEst,
        s"streamed $streamedEst != batch $batchEst")
      // histogram: summed epoch bins == one-shot histogram, so quantile
      // read-offs are bit-identical
      val sq = graft.operators.Quantiles.quantiles(
          graft.operators.Quantiles.rollup(
            spark.read.parquet(histDir).drop("batch"), Seq("event_type")),
          Seq("event_type"), 10.0, Seq(("p50", 1, 2), ("p95", 19, 20)))
        .as[(String, Double, Double, Long)].collect().toSet
      val bq = graft.operators.Quantiles.quantiles(
          graft.operators.Quantiles.histMart(
            batchDf, Seq("event_type"), col("value"), 10.0),
          Seq("event_type"), 10.0, Seq(("p50", 1, 2), ("p95", 19, 20)))
        .as[(String, Double, Double, Long)].collect().toSet
      assert(sq == bq, s"streamed quantiles $sq != batch $bq")
    } finally { qk.stop(); qh.stop() }
  }

  test("streamed edge mart: order-complete epochs answer like a batch build") {
    implicit val sql = spark.sqlContext
    def tmp(p: String) = {
      val d = java.nio.file.Files.createTempDirectory(p).toString
      new java.io.File(d).delete(); d
    }
    val (martDir, ckDir) = (tmp("graft-sem-m"), tmp("graft-sem-k"))
    val in = MemoryStream[(Long, Long)]
    val q = StreamingTelemetry.streamEdgeMart(
      in.toDF().toDF("l_orderkey", "l_partkey"), martDir, ckDir)
    // synthetic baskets: order o carries parts {o%7, o%5+10, o%3+20},
    // plus a duplicate lineitem every 4th order (must not double-count)
    val all = (1L to 120L).flatMap { o =>
      val parts = Seq(o % 7, o % 5 + 10, o % 3 + 20) ++
        (if (o % 4 == 0) Seq(o % 7) else Seq.empty)
      parts.map(p => (o, p))
    }
    try {
      // three uneven ORDER-COMPLETE epochs (split by order, never within)
      val byOrder = all.groupBy(_._1)
      val epochs = Seq(
        byOrder.filter(_._1 <= 30).values.flatten.toSeq,
        byOrder.filter(k => k._1 > 30 && k._1 <= 100).values.flatten.toSeq,
        byOrder.filter(_._1 > 100).values.flatten.toSeq)
      epochs.foreach { b => in.addData(b: _*); q.processAllAvailable() }
      val streamed = graft.operators.GraphMart.readMerged(spark, martDir)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      val batch = graft.operators.GraphMart.coOrderCounts(
          all.toDF("l_orderkey", "l_partkey"))
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(streamed == batch,
        s"streamed mart diverged: ${streamed.size} vs ${batch.size} pairs")
      // and the graph ops run identically off the streamed mart
      val gs = graft.dedup.Components.pageRank(
          graft.operators.GraphMart.edges(
            graft.operators.GraphMart.readMerged(spark, martDir))
            .select("src", "dst"), iters = 3)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val gb = graft.dedup.Components.pageRank(
          graft.operators.GraphMart.edges(
            graft.operators.GraphMart.coOrderCounts(
              all.toDF("l_orderkey", "l_partkey")))
            .select("src", "dst"), iters = 3)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(gs == gb, "pageRank off streamed mart diverged from batch")
    } finally q.stop()
  }

  test("streamDecontam: two-trigger union equals batch crossSpanMatches") {
    implicit val sql = spark.sqlContext
    def tmp(p: String) = java.nio.file.Files.createTempDirectory(p).toString
    val (out, ckpt) = (tmp("graft-sdc-o"), tmp("graft-sdc-k"))
    new java.io.File(out).delete()
    // the q_decontam_ngram fixture split: 15% eval bucket, rest corpus
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
    val b = graft.sampling.Sampling.bucket(col("doc_id"), "evalset")
    val evalSet = docs.filter(b < 1500)
    val corpus = docs.filter(b >= 1500)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    // two triggers: even doc_ids arrive first, odd second
    val (t1, t2) = corpus.partition(_._1 % 2 == 0)
    val in = MemoryStream[(Long, String)]
    val q = StreamingTelemetry.streamDecontam(
      in.toDF().toDF("doc_id", "text"), evalSet, out, ckpt, w = 5)
    try {
      in.addData(t1.toSeq: _*); q.processAllAvailable()
      in.addData(t2.toSeq: _*); q.processAllAvailable()
      val streamed = spark.read.parquet(out)
        .select("corpus_id", "n_spans", "n_hit_spans", "hit_frac")
        .collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
        .toSet
      val batch = graft.dedup.Dedup.crossSpanMatches(
          corpus.toSeq.toDF("doc_id", "text"), evalSet, "text", "doc_id",
          w = 5)
        .collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
        .toSet
      assert(streamed.nonEmpty, "fixture produced no contaminated docs")
      assert(streamed == batch)
    } finally q.stop()
  }

  test("streamDrift: per-batch PSI vs a fixed reference, batch parity") {
    implicit val sql = spark.sqlContext
    def tmp(p: String) = java.nio.file.Files.createTempDirectory(p).toString
    val (out, ckpt) = (tmp("graft-drift-o"), tmp("graft-drift-k"))
    val ref = (Seq.fill(10)(5.0) ++ Seq.fill(10)(30.0)).toDF("v")
    val in = MemoryStream[Double]
    val splits = Seq(20.0)
    val q = StreamingTelemetry.streamDrift(
      in.toDF().toDF("v"), ref, "v", splits, out, ckpt)
    val b0 = Seq.fill(4)(5.0) ++ Seq.fill(12)(30.0)  // shifted high
    val b1 = Seq.fill(8)(5.0) ++ Seq.fill(8)(30.0)   // matches ref
    try {
      in.addData(b0: _*); q.processAllAvailable()
      in.addData(b1: _*); q.processAllAvailable()
      val got = spark.read.parquet(out)
      // each epoch's partition equals the BATCH psiBins result exactly
      for ((b, id) <- Seq((b0, 0), (b1, 1))) {
        val streamed = got.filter(col("batch") === id)
          .select("bin", "ref_frac", "cur_frac", "psi_term")
          .collect().map(r =>
            (r.getInt(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
          .toSet
        val batch = graft.operators.Drift.psiBins(ref, b.toDF("v"), "v",
            splits).collect().map(r =>
            (r.getInt(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
          .toSet
        assert(streamed == batch, s"epoch $id: $streamed vs $batch")
      }
      // the matching batch drifts less than the shifted one
      def totalPsi(id: Int) = got.filter(col("batch") === id)
        .agg(org.apache.spark.sql.functions.sum("psi_term"))
        .collect()(0).getDouble(0)
      assert(totalPsi(1) < totalPsi(0))
    } finally q.stop()
  }

  test("streamAlerts epoch 0 still fires on a lake a fullRefresh already alerted") {
    // regression: epoch ids and refresh ids used to share one ledger
    // namespace — a committed refresh marker 0 made the stream's epoch 0
    // a silent no-op (and a replayed epoch could wipe the refresh's files
    // via the shared batch-0- prefix)
    implicit val sql = spark.sqlContext
    val lake = java.nio.file.Files.createTempDirectory("graft-salerts-mix").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-salerts-mix-ck").toString
    // batch-side refresh alerts day 1 under refresh id 0
    val batchScored = Seq(ScoredDay(ts(1), 20.0, -0.6, 1)).toDF()
    assert(graft.telemetry.Alerts.appendAlerts(spark, lake, batchScored,
      graft.telemetry.Alerts.nextBatchId(lake)) == 1L)
    // stream epoch 0 carries a DIFFERENT anomalous day: must still alert
    val in = MemoryStream[ScoredDay]
    val q = StreamingTelemetry.streamAlerts(in.toDF(), lake, ckpt)
    try {
      in.addData(ScoredDay(ts(2), 19.0, -0.8, 1))
      q.processAllAvailable()
      val rows = graft.telemetry.Alerts.readAlerts(spark, lake)
        .orderBy("dt").collect()
      assert(rows.map(_.getTimestamp(0)).toSeq == Seq(ts(1), ts(2)))
      assert(rows.map(_.getLong(3)).toSeq ==
        Seq(0L, graft.telemetry.Alerts.streamBatchBase))
      // and the refresh sequence stays in its own range afterwards
      assert(graft.telemetry.Alerts.nextBatchId(lake) == 1L)
    } finally q.stop()
  }

  test("attributionJoin: stream-stream interval join matches batch exactly") {
    implicit val sql = spark.sqlContext
    def tm(h: Int, m: Int) = Timestamp.valueOf(f"2024-03-01 $h%02d:$m%02d:00")
    val clicks = Seq(
      StreamEvent(1L, tm(10, 0), 1L, "click", null),
      StreamEvent(4L, tm(10, 0), 2L, "click", null))
    val purchases = Seq(
      StreamEvent(2L, tm(10, 10), 1L, "purchase", 9.99), // in horizon, u1
      StreamEvent(3L, tm(11, 0), 1L, "purchase", 5.00),  // outside 30 min
      StreamEvent(5L, tm(10, 20), 2L, "purchase", 1.00), // in horizon, u2
      StreamEvent(6L, tm(10, 5), 3L, "purchase", 2.00))  // no click, u3
    val cIn = MemoryStream[StreamEvent]
    val pIn = MemoryStream[StreamEvent]
    val q = StreamingTelemetry.attributionJoin(cIn.toDF(), pIn.toDF(),
        horizon = "30 minutes", watermark = "1 hour")
      .writeStream.format("memory").queryName("attributed")
      .outputMode("append").start()
    try {
      cIn.addData(clicks: _*)
      pIn.addData(purchases: _*)
      q.processAllAvailable()
      val streamed = spark.table("attributed")
        .select("click_id", "purchase_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(streamed == Set((1L, 2L), (4L, 5L)))
      // identical expression over the same data as plain batch frames
      val batch = StreamingTelemetry.attributionJoin(
          clicks.toDF(), purchases.toDF(), "30 minutes", "1 hour")
        .select("click_id", "purchase_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(batch == streamed, "stream/batch parity broken")
    } finally q.stop()
  }

  test("attributionJoin under the RocksDB state store matches the default provider") {
    // BASELINE.md round 9 benches the provider knob; this pins that the
    // swap is RESULT-invisible — same join state semantics, same output —
    // so the tuning choice never becomes a correctness choice.
    implicit val sql = spark.sqlContext
    def tm(h: Int, m: Int) = Timestamp.valueOf(f"2024-03-01 $h%02d:$m%02d:00")
    val clicks = Seq(
      StreamEvent(1L, tm(10, 0), 1L, "click", null),
      StreamEvent(4L, tm(10, 0), 2L, "click", null))
    val purchases = Seq(
      StreamEvent(2L, tm(10, 10), 1L, "purchase", 9.99),
      StreamEvent(3L, tm(11, 0), 1L, "purchase", 5.00),
      StreamEvent(5L, tm(10, 20), 2L, "purchase", 1.00),
      StreamEvent(6L, tm(10, 5), 3L, "purchase", 2.00))
    val prev = spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val cIn = MemoryStream[StreamEvent]
    val pIn = MemoryStream[StreamEvent]
    val q = StreamingTelemetry.attributionJoin(cIn.toDF(), pIn.toDF(),
        horizon = "30 minutes", watermark = "1 hour")
      .writeStream.format("memory").queryName("attributed_rocks")
      .outputMode("append").start()
    try {
      cIn.addData(clicks: _*)
      pIn.addData(purchases: _*)
      q.processAllAvailable()
      val got = spark.table("attributed_rocks")
        .select("click_id", "purchase_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == Set((1L, 2L), (4L, 5L)),
        s"RocksDB-backed join diverged: $got")
    } finally {
      q.stop()
      prev match {
        case Some(v) => spark.conf.set(
          "spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset(
          "spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("dedupStream drops same-id rows within the watermark horizon") {
    implicit val sql = spark.sqlContext
    val in = MemoryStream[(Timestamp, String, String)]
    val df = in.toDF().toDF("ts", "doc_id", "body")
    val q = StreamingTelemetry.dedupStream(df, "doc_id", "ts", "1 day")
      .writeStream.format("memory").queryName("deduped")
      .outputMode("append").start()
    try {
      in.addData(
        (ts(1, 1), "a", "x"), (ts(1, 2), "a", "x-dup"), (ts(1, 3), "b", "y"))
      q.processAllAvailable()
      in.addData((ts(1, 4), "a", "x-dup2"), (ts(1, 5), "c", "z"))
      q.processAllAvailable()
      val ids = spark.table("deduped").select("doc_id")
        .collect().map(_.getString(0)).sorted
      assert(ids.toSeq == Seq("a", "b", "c"))
    } finally q.stop()
  }

  test("jobSessions emits one session per completed job with duration") {
    implicit val sql = spark.sqlContext
    val in = MemoryStream[JobEvent]
    val q = StreamingTelemetry.jobSessions(in.toDS(), timeout = None)
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      in.addData(
        JobEvent("j1", "alice", "Running", ts(1, 1)),
        JobEvent("j2", "bob", "Running", ts(1, 2)))
      q.processAllAvailable()
      in.addData(
        JobEvent("j1", "alice", "Terminated", ts(1, 3)),
        JobEvent("j3", "carol", "Running", ts(1, 4))) // j3 never ends
      q.processAllAvailable()
      val sessions = spark.table("sessions").as[JobSession].collect()
      assert(sessions.length == 1)
      val s = sessions(0)
      assert(s.job_id == "j1" && s.user_id == "alice")
      assert(s.run_time_sec == 7200L) // 01:00 → 03:00
    } finally q.stop()
  }

  test("file-stream replay of the events table matches the batch aggregate") {
    // the reference's "streaming simulation" future-work item: replay a
    // stored table through readStream and check the unified-engine
    // property — identical transform, identical result as batch.
    // file streams consume directories; stage the fixture into one
    val dir = java.nio.file.Files.createTempDirectory("replay-src")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      dir.resolve("events.parquet"))
    // the stream schema must match the PHYSICAL encoding, which the
    // driver has shipped two ways (TIMESTAMP(NANOS)-as-long under the
    // session's nanosAsLong posture; TIMESTAMP(MICROS) scanning as NTZ)
    // — take the raw batch-scan schema verbatim and apply the same
    // type-branched normalization Tables.events applies
    val rawSchema = spark.read.parquet(s"$sfDir/events.parquet").schema
    val streamedRaw = spark.readStream.schema(rawSchema).parquet(dir.toString)
    val streamed = (rawSchema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        streamedRaw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case _ => streamedRaw.withColumn("ts", $"ts".cast("timestamp"))
    })
      .filter($"value".isNotNull)
      .withWatermark("ts", "10 days")
      .groupBy(window($"ts", "1 day").as("w"))
      .agg(count(lit(1)).as("n"), sum($"value").as("sv"))
      .select($"w.start".as("dt"), $"n", round($"sv", 4).as("sv"))
    val q = streamed.writeStream.format("memory").queryName("replay")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val stream = spark.table("replay").collect()
        .map(r => r.getTimestamp(0) -> (r.getLong(1), r.getDouble(2))).toMap
      val batch = Tables.events(spark, sfDir)
        .filter($"value".isNotNull)
        .groupBy(date_trunc("day", $"ts").as("dt"))
        .agg(count(lit(1)).as("n"), round(sum($"value"), 4).as("sv"))
        .collect()
        .map(r => r.getTimestamp(0) -> (r.getLong(1), r.getDouble(2))).toMap
      assert(stream == batch, s"stream/batch divergence")
      assert(stream.nonEmpty)
    } finally q.stop()
  }

  test("a fitted isolation forest scores a stream (same transform, unbounded input)") {
    implicit val sql = spark.sqlContext
    // fit on a batch of inliers — SEEDED draw: the global Random made
    // the training cloud (and hence the fitted threshold) differ per
    // run, and an unlucky cloud flagged the inlier (observed as a rare
    // full-suite flake)
    val rnd = new scala.util.Random(7)
    val train = Seq.fill(50)((10.0 + rnd.nextGaussian(), 5.0))
      .toDF("f1", "f2")
    val model = graft.ml.IsolationForest.fit(train, Seq("f1", "f2"), seed = 7L)
    val in = MemoryStream[(Double, Double)]
    val q = model.transform(in.toDF().toDF("f1", "f2"))
      .writeStream.format("memory").queryName("scored_stream")
      .outputMode("append").start()
    try {
      in.addData((10.0, 5.0), (500.0, -300.0)) // inlier + blatant outlier
      q.processAllAvailable()
      val rows = spark.table("scored_stream").orderBy("f1").collect()
      assert(rows.length == 2)
      assert(rows(0).getAs[Int]("anomaly_flag") == 0) // 10.0 inlier
      assert(rows(1).getAs[Int]("anomaly_flag") == 1) // 500.0 outlier
    } finally q.stop()
  }

  test("machineUtilization computes sliding windows per machine") {
    implicit val sql = spark.sqlContext
    val in = MemoryStream[StreamMetric]
    val q = StreamingTelemetry.machineUtilization(in.toDF(),
        "1 hour", "30 minutes", "2 hours")
      .writeStream.format("memory").queryName("machine_util")
      .outputMode("append").start()
    try {
      in.addData(
        StreamMetric(ts(1, 1), "m1", 40.0, 1.0),
        StreamMetric(ts(1, 1), "m1", 60.0, 1.0))
      q.processAllAvailable()
      in.addData(StreamMetric(ts(2, 0), "m1", 1.0, 1.0)) // advance watermark
      q.processAllAvailable()
      val rows = spark.table("machine_util")
        .filter($"machine_id" === "m1" && $"n_samples" === 2).collect()
      // hour-long window sliding by 30min → the 01:00 points appear in 2 windows
      assert(rows.length == 2)
      assert(rows.forall(_.getAs[Double]("avg_gpu_util") == 50.0))
    } finally q.stop()
  }
}
