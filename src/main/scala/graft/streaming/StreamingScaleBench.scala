package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.StreamingQueryListener

import java.nio.file.Files

/** Scale probe for the STREAMED legs (round 14): StreamingBench proved
  * throughput at sf0.1; this replays a 30× corpus through
  * [[StreamingTelemetry.streamNearDups]] and a 30× lineitem stream
  * through [[StreamingTelemetry.streamEdgeMart]], each at TWO trigger
  * sizes, and reports PER-EPOCH cost so the scale claim — each epoch's
  * work tracks the BATCH's volume, not the accumulated history — is
  * measured, not asserted.
  *
  * Where history CAN leak in: streamNearDups' incremental probe reads
  * the accumulated band index and corpus dirs every epoch (merge-on-read
  * partitions), so a per-epoch cost that grows with trigger NUMBER at
  * fixed batch size is the signature of paying O(history) per epoch;
  * the edge/sketch marts never read history at write time by
  * construction. Per-epoch timing comes from the engine's own
  * QueryProgress events (triggerExecution), not wall clocks around
  * addData, so MemoryStream feeding cost is excluded.
  *
  * Inputs: $SPARK_GRAFT_D30_DIR/documents.parquet (the diversify-30×
  * fixture — distinct texts, so the near-dup index takes real load) and
  * $SPARK_GRAFT_LI30_DIR/lineitem.parquet (the 30× lineitem fixture),
  * pre-partitioned by l_orderkey into files so a files-per-trigger
  * stream respects the mart's ORDER-COMPLETE contract.
  */
object StreamingScaleBench {

  /** (queryId, batchId, inputRows, triggerExecution seconds) per
    * completed epoch of EVERY query. Progress events are delivered
    * ASYNCHRONOUSLY on the listener bus, so attribution must ride the
    * event's own query id (a current-run flag set after start would
    * race batch 0 and a late event from the previous run could land in
    * the next run's window); [[of]] selects one query's epochs, and
    * callers drain the bus before reading (see main).
    */
  private final class ProgressLog extends StreamingQueryListener {
    private val rows = scala.collection.mutable.ListBuffer
      .empty[(java.util.UUID, Long, Long, Double)]
    def of(id: java.util.UUID): Seq[(Long, Long, Double)] =
      rows.synchronized {
        rows.collect { case (q, b, n, s) if q == id => (b, n, s) }
          .sortBy(_._1).toSeq
      }
    override def onQueryStarted(
        e: StreamingQueryListener.QueryStartedEvent): Unit = ()
    override def onQueryTerminated(
        e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    override def onQueryProgress(
        e: StreamingQueryListener.QueryProgressEvent): Unit = {
      val p = e.progress
      val ms = Option(p.durationMs.get("triggerExecution"))
        .map(_.longValue).getOrElse(0L)
      if (p.numInputRows > 0)
        rows.synchronized {
          rows += ((p.id, p.batchId, p.numInputRows, ms / 1e3)); ()
        }
    }
  }

  private def report(op: String, rate: String,
                     log: Seq[(Long, Long, Double)]): Unit = {
    val t = log.map(_._3)
    if (t.isEmpty) {
      println(s"""{"op":"$op","rate":"$rate","triggers":0}""")
      return
    }
    val n = t.size
    val rowsTotal = log.map(_._2).sum
    // slope witness: mean of the first 3 vs last 3 NON-FIRST epochs
    // (epoch 0 runs the self-dedup/cold path and is reported separately)
    val steady = t.drop(1)
    val head3 = steady.take(3)
    val tail3 = steady.takeRight(3)
    def mean(xs: Seq[Double]) = if (xs.isEmpty) 0.0 else xs.sum / xs.size
    println(f"""{"op":"$op","rate":"$rate","triggers":$n,"rows":$rowsTotal,"total_sec":${t.sum}%.2f,"epoch0_sec":${t.headOption.getOrElse(0.0)}%.3f,"steady_first3_sec":${mean(head3)}%.3f,"steady_last3_sec":${mean(tail3)}%.3f,"max_sec":${t.max}%.3f}""")
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val d30 = sys.env.getOrElse("SPARK_GRAFT_D30_DIR", "/tmp/sf3d")
    val li30 = sys.env.getOrElse("SPARK_GRAFT_LI30_DIR", "/tmp/sf3.0")
    val spark: SparkSession = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext

    val log = new ProgressLog
    spark.streams.addListener(log)
    // Leg/rate selectors (round 15): bound a run to one leg or one
    // trigger size — a d300 dedup leg at 3k/trigger is ~500 epochs, so
    // deeper-fixture runs pick the leg and rate explicitly.
    val legs = sys.env.getOrElse("SPARK_GRAFT_SSB_LEGS", "dedup,edge")
      .split(",").map(_.trim).toSet
    val rates = sys.env.getOrElse("SPARK_GRAFT_SSB_RATES", "3000,12000")
      .split(",").map(_.trim.toInt).toSeq
    val tag = sys.env.getOrElse("SPARK_GRAFT_SSB_TAG", "30x")
    // Round 15: periodic epoch-fold A/B knob (0 = off) — the committed
    // 300× run measured a linear history term from epoch-partition
    // accretion; this knob turns on Epochs.fold every K epochs inside
    // the dedup leg so the with/without per-epoch tails are comparable
    // on the same fixture and rate.
    val compactEvery =
      sys.env.getOrElse("SPARK_GRAFT_SSB_COMPACT_EVERY", "0").toInt
    val tailRatio =
      sys.env.getOrElse("SPARK_GRAFT_SSB_TAIL_RATIO", "0").toDouble
    // Round 16 (VERDICT r15 #3): the incremental probe's collect-route
    // bound — 0 pins the DISTRIBUTED candidate semi-join fallback so the
    // cliff above collectCandLimit is measurable on the same fixture
    // (route parity is spec'd; this is a pure cost A/B).
    val candLimit =
      sys.env.getOrElse("SPARK_GRAFT_SSB_CAND_LIMIT", "8192").toInt
    // Round 17 (VERDICT r16 #4): the tiered-fold size floor A/B — the
    // sinks' default (8 MiB) is the new behavior under test; 0 restores
    // the unconditional r16 schedule so the premium is comparable on
    // the same fixture.
    val foldFloor = sys.env.getOrElse("SPARK_GRAFT_SSB_FOLD_FLOOR",
      StreamingTelemetry.DefaultMartFoldFloor.toString).toLong

    // ---- streamNearDups over the diversify documents ----
    val docs = if (!legs("dedup")) Seq.empty else
      spark.read.parquet(s"$d30/documents.parquet")
        .select("doc_id", "text").as[(Long, String)].collect().toSeq
    for (rate <- rates if legs("dedup")) {
      val root = Files.createTempDirectory(s"ssb_dedup_$rate").toString
      val in = MemoryStream[(Long, String)]
      val q = StreamingTelemetry.streamNearDups(
        in.toDF().toDF("doc_id", "text"),
        s"$root/corpus", s"$root/index", s"$root/pairs", s"$root/ckpt",
        compactEvery = compactEvery, compactTailRatio = tailRatio,
        collectCandLimit = candLimit, minFoldBytes = foldFloor)
      try {
        docs.grouped(rate).foreach { c =>
          in.addData(c: _*); q.processAllAvailable()
        }
        // deliver every queued progress event before reading the log
        org.apache.spark.sql.GraftSqlBridge.drainListenerBus(
          spark.sparkContext)
        val suffix0 =
          if (compactEvery > 0) s"_fold$compactEvery"
          else if (tailRatio > 0) s"_tiered$tailRatio"
          else ""
        val suffix = suffix0 + (if (candLimit == 0) "_nocollect" else "")
        report(s"stream_near_dups_$tag$suffix", s"$rate docs/trigger",
          log.of(q.id))
        // Output-volume witness (round 15): pairs found per epoch, from
        // the pairs sink's own batch=N partitions — separates "later
        // epochs cost more because the merge-on-read floor grows" from
        // "later epochs cost more because they genuinely FIND more"
        // (the diversify fixture accretes cross-epoch near-dups, so
        // match volume growing with history is correct work, not
        // overhead).
        val perEpochPairs = spark.read.parquet(s"$root/pairs")
          .groupBy("batch").count()
          .collect().map(r => (r.getAs[Number]("batch").longValue,
            r.getLong(1))).sortBy(_._1)
        val pe = perEpochPairs.drop(1).map(_._2)
        if (pe.nonEmpty) {
          def m(xs: Seq[Long]) = if (xs.isEmpty) 0.0 else
            xs.sum.toDouble / xs.size
          println(f"""{"op":"pairs_per_epoch_$tag$suffix","rate":"$rate docs/trigger","total_pairs":${perEpochPairs.map(_._2).sum},"epoch0":${perEpochPairs.head._2},"first3_mean":${m(pe.take(3))}%.1f,"last3_mean":${m(pe.takeRight(3))}%.1f}""")
        }
      } finally q.stop()
      graft.operators.GraphMart.deleteRecursively(new java.io.File(root))
    }

    // ---- streamEdgeMart over the lineitem fixture, files-per-trigger ----
    // Pre-split the fixture by l_orderkey into files so each trigger
    // holds whole orders (the mart's order-complete contract); two
    // trigger volumes = two files-per-trigger settings over one layout.
    if (legs("edge")) {
      val liSrc = spark.read.parquet(s"$li30/lineitem.parquet")
        .select("l_orderkey", "l_partkey")
      val splitDir = Files.createTempDirectory("ssb_li_src").toString
      liSrc.repartition(24, org.apache.spark.sql.functions.col("l_orderkey"))
        .write.mode("overwrite").parquet(splitDir)
      val liSchema = spark.read.parquet(splitDir).schema
      for (filesPerTrigger <- Seq(1, 4)) {
        val root = Files.createTempDirectory(s"ssb_edge_$filesPerTrigger").toString
        val stream = spark.readStream.schema(liSchema)
          .option("maxFilesPerTrigger", filesPerTrigger)
          .parquet(splitDir)
        val q = StreamingTelemetry.streamEdgeMart(stream,
          s"$root/mart", s"$root/ckpt")
        try {
          q.processAllAvailable()
          org.apache.spark.sql.GraftSqlBridge.drainListenerBus(
            spark.sparkContext)
          report(s"stream_edge_mart_$tag", s"$filesPerTrigger files/trigger",
            log.of(q.id))
        } finally q.stop()
        graft.operators.GraphMart.deleteRecursively(new java.io.File(root))
      }
      graft.operators.GraphMart.deleteRecursively(new java.io.File(splitDir))
    }

    // ---- DEEP mart legs (round 16, VERDICT r15 #5): ≥ 100 epochs per
    // mart type with the fold knobs live ----
    // One 128-file layout (l_orderkey-hashed so each file holds whole
    // orders) streamed at 1 file/trigger = 128 epochs into EACH of the
    // kmv / hist / edge marts. What the leg measures is the
    // merge-on-read floor the folds exist to bound: trigger costs stay
    // flat by construction (mart writes never read history), so the
    // committed witnesses are (a) live dir/file counts after 128
    // epochs and (b) the timed READ-OFF at full depth — fold on vs off
    // across two runs of the same leg (SSB_COMPACT_EVERY / SSB_TAIL_RATIO).
    if (legs("marts")) {
      val epochsN = sys.env.getOrElse("SPARK_GRAFT_SSB_MART_EPOCHS", "128").toInt
      val src = spark.read.parquet(s"$li30/lineitem.parquet")
        .select(org.apache.spark.sql.functions.col("l_orderkey"),
          org.apache.spark.sql.functions.col("l_partkey"),
          (org.apache.spark.sql.functions.col("l_partkey") % 8).as("g"),
          (org.apache.spark.sql.functions.col("l_orderkey") % 1000)
            .cast("double").as("v"))
      val splitDir = Files.createTempDirectory("ssb_mart_src").toString
      src.repartition(epochsN,
          org.apache.spark.sql.functions.col("l_orderkey"))
        .write.mode("overwrite").parquet(splitDir)
      val schema = spark.read.parquet(splitDir).schema
      val suffix =
        if (compactEvery > 0) s"_fold$compactEvery"
        else if (tailRatio > 0 && foldFloor > 0)
          s"_tiered${tailRatio}_floor${foldFloor / 1048576}m"
        else if (tailRatio > 0) s"_tiered$tailRatio"
        else ""
      def dirStats(dir: String): (Int, Int) = {
        val ds = Option(new java.io.File(dir).listFiles())
          .getOrElse(Array.empty)
          .filter(f => f.isDirectory && f.getName.startsWith("batch="))
        (ds.length, ds.map(d => Option(d.listFiles()).getOrElse(Array.empty)
          .count(_.getName.endsWith(".parquet"))).sum)
      }
      def deepLeg(name: String)(
          start: (org.apache.spark.sql.DataFrame, String, String) =>
            org.apache.spark.sql.streaming.StreamingQuery)(
          readOff: String => Long): Unit = {
        val root = Files.createTempDirectory(s"ssb_deep_$name").toString
        val stream = spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", 1).parquet(splitDir)
        val q = start(stream, s"$root/mart", s"$root/ckpt")
        try {
          q.processAllAvailable()
          org.apache.spark.sql.GraftSqlBridge.drainListenerBus(
            spark.sparkContext)
          report(s"deep_${name}_mart_$tag$suffix", "1 file/trigger",
            log.of(q.id))
        } finally q.stop()
        val (dirs, files) = dirStats(s"$root/mart")
        // timed read-off at full depth — the cost the fold bounds
        val t0 = System.nanoTime()
        val n = readOff(s"$root/mart")
        val readSec = (System.nanoTime() - t0) / 1e9
        println(f"""{"op":"deep_${name}_readoff_$tag$suffix","dirs":$dirs,"files":$files,"rows":$n,"read_sec":$readSec%.2f}""")
        graft.operators.GraphMart.deleteRecursively(new java.io.File(root))
      }
      deepLeg("kmv") { (s, m, c) =>
        StreamingTelemetry.streamKmvMart(s, m, c, Seq("g"),
          org.apache.spark.sql.functions.col("l_orderkey").cast("string"),
          128, compactEvery, tailRatio, foldFloor)
      } { dir =>
        graft.operators.Kmv.rollup(
            spark.read.parquet(dir).drop("batch"), Seq("g"), 128)
          .select(org.apache.spark.sql.functions.col("g"),
            graft.operators.Kmv.estimate("kmv", 128))
          .collect().length.toLong
      }
      deepLeg("hist") { (s, m, c) =>
        StreamingTelemetry.streamHistMart(s, m, c, Seq("g"),
          org.apache.spark.sql.functions.col("v"), 50.0,
          compactEvery, tailRatio, foldFloor)
      } { dir =>
        graft.operators.Quantiles.rollup(
            spark.read.parquet(dir).drop("batch"), Seq("g"))
          .collect().length.toLong
      }
      deepLeg("edge") { (s, m, c) =>
        StreamingTelemetry.streamEdgeMart(
          s.select("l_orderkey", "l_partkey"), m, c, compactEvery, tailRatio,
          foldFloor)
      } { dir =>
        graft.operators.GraphMart.readMerged(spark, dir).count()
      }
      graft.operators.GraphMart.deleteRecursively(new java.io.File(splitDir))
    }
    spark.stop()
  }
}
