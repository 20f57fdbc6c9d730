package graft

import graft.sources.Export

class ExportSpec extends SparkSpecBase {
  import spark.implicits._

  private def manifest(dir: String, epoch: Int) = {
    val docs = (1L to 97L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    Export.exportJsonlShards(docs, "doc_id", dir, epoch,
      maxRecordsPerShard = 10, shufflePartitions = 4).collect()
  }

  test("exportJsonlShards: bounded shards, exactly-once rows, reproducible") {
    val base = java.nio.file.Files.createTempDirectory("graft-export").toString
    val m1 = manifest(s"$base/e1", epoch = 1)
    // every shard respects the bound and no shard is empty
    assert(m1.forall(r => r.getLong(1) <= 10 && r.getLong(1) > 0))
    // exactly-once: global row count and id checksum survive the export
    assert(m1.map(_.getLong(1)).sum == 97L)
    assert(m1.map(_.getLong(2)).sum == (1L to 97L).sum)
    // reproducible: a re-export yields the same shard-content sequence
    // (file NAMES carry task uuids, so compare the ordered content
    // profile, not paths)
    val m1b = manifest(s"$base/e1b", epoch = 1)
    assert(m1.map(r => (r.getLong(1), r.getLong(2))).toSeq ==
      m1b.map(r => (r.getLong(1), r.getLong(2))).toSeq)
    // a different epoch re-keys the order → different shard contents
    val m2 = manifest(s"$base/e2", epoch = 2)
    assert(m1.map(_.getLong(2)).toSeq != m2.map(_.getLong(2)).toSeq)
  }

  test("epochShuffle is a pure function of (seed, epoch, id)") {
    val docs = (1L to 50L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    def order(epoch: Int) =
      Export.epochShuffle(docs, "doc_id", epoch)
        .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(order(1) == order(1))        // deterministic
    assert(order(1) != order(2))        // epochs re-key
    assert(order(1).sorted == (1L to 50L))  // a permutation, not a sample
  }
}
