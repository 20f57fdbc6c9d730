package graft

import graft.text.Bm25

class Bm25Spec extends SparkSpecBase {
  import spark.implicits._

  private val docs = Seq(
    (1L, "apple apple banana"),
    (2L, "banana cherry"),
    (3L, "cherry"),
    (4L, "apple banana cherry date"),
    (5L, "")).toDF("doc_id", "text")

  /** Driver-side reference of the exact scoring pipeline: same formula,
    * same e9 long rounding, same exact integer summation.
    */
  private def refScores(corpus: Seq[(Long, String)],
                        query: Seq[String]): Map[Long, Long] = {
    val toks = corpus.map { case (id, t) =>
      id -> t.toLowerCase.trim.split("\\s+").filter(_.nonEmpty).toSeq
    }
    val n = corpus.size.toLong
    val sumDl = toks.map(_._2.size.toLong).sum
    val avgdl = sumDl.toDouble / n
    val df = toks.flatMap(_._2.distinct.map(_ -> 1)).groupBy(_._1)
      .map { case (t, v) => t -> v.size.toLong }
    val out = for {
      (id, w) <- toks
      contribs = query.flatMap { term =>
        val tf = w.count(_ == term).toLong
        if (tf == 0 || !df.contains(term)) None
        else {
          val idf = math.log(1.0 + (n - df(term) + 0.5) / (df(term) + 0.5))
          val c = idf * (tf * (1.2 + 1.0)) /
            (tf + 1.2 * (1.0 - 0.75 + 0.75 * w.size / avgdl)) * 1e9
          Some(math.round(c))
        }
      }
      if contribs.nonEmpty
    } yield id -> contribs.sum
    out.toMap
  }

  test("search matches the driver-side exact scorer, ranked and tied-broken") {
    val q = Seq((1, "apple"), (1, "cherry"), (2, "banana"),
      (3, "zzz_absent")).toDF("query_id", "term")
    val got = Bm25.search(docs, q, topK = 10).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    val corpus = Seq((1L, "apple apple banana"), (2L, "banana cherry"),
      (3L, "cherry"), (4L, "apple banana cherry date"), (5L, ""))
    for (qid <- Seq(1, 2)) {
      val terms = if (qid == 1) Seq("apple", "cherry") else Seq("banana")
      val want = refScores(corpus, terms).toSeq
        .sortBy { case (id, s) => (-s, id) }
      val rows = got.filter(_._1 == qid).sortBy(_._2)
      assert(rows.map(r => (r._3, r._4)).toSeq == want,
        s"query $qid: got ${rows.toSeq} want $want")
      assert(rows.map(_._2).toSeq == (1 to want.size))
    }
    // a query whose only term is absent from the corpus emits nothing
    assert(!got.exists(_._1 == 3))
  }

  test("topK truncates per query by (score desc, id asc)") {
    val q = Seq((7, "banana")).toDF("query_id", "term")
    val all = Bm25.search(docs, q, topK = 10).collect()
    val top2 = Bm25.search(docs, q, topK = 2).collect()
      .map(r => (r.getInt(1), r.getLong(2)))
    assert(all.length >= 3)
    assert(top2.toSeq == all.sortBy(_.getInt(1)).take(2)
      .map(r => (r.getInt(1), r.getLong(2))).toSeq)
  }

  test("postings carry per-doc tf and dl; empty docs emit no postings") {
    val p = Bm25.postings(docs).collect()
      .map(r => (r.getLong(0), r.getString(2)) -> (r.getInt(1), r.getLong(3)))
      .toMap
    assert(p((1L, "apple")) == (3, 2L)) // dl 3, tf 2
    assert(p((4L, "date")) == (4, 1L))
    assert(!p.keys.exists(_._1 == 5L))
  }

  test("term saturation: higher tf scores higher at equal dl, sublinearly") {
    val c = Seq((1L, "x x x x"), (2L, "x y y y"), (3L, "y y y y"))
      .toDF("doc_id", "text")
    val q = Seq((1, "x")).toDF("query_id", "term")
    val rows = Bm25.search(c, q, topK = 3).collect()
      .map(r => r.getLong(2) -> r.getLong(3)).toMap
    assert(rows(1L) > rows(2L)) // tf 4 beats tf 1
    assert(rows(1L) < 4 * rows(2L)) // but sublinearly (k1 saturation)
    assert(!rows.contains(3L))
  }
}
