package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed custom aggregates over vector columns (SURVEY.md §4's optional
  * custom-aggregate surface, realized).
  *
  * `VectorAvg` is the element-wise mean of array<double> rows. Versus the
  * posexplode→groupBy(dim) formulation it shuffles one partial (sums,
  * count) buffer per map task per group instead of n×dim exploded rows —
  * for k-means updates over 64-dim embeddings that is a 64× reduction in
  * shuffle rows. Buffers merge associatively, so the aggregate is
  * partial-aggregation- and streaming-friendly.
  */
object VectorAggregates {

  final case class VAvgBuf(sums: Array[Double], count: Long)

  class VectorAvg extends Aggregator[Seq[Double], VAvgBuf, Seq[Double]] {
    override def zero: VAvgBuf = VAvgBuf(Array.empty, 0L)

    override def reduce(b: VAvgBuf, v: Seq[Double]): VAvgBuf = {
      if (v == null) return b
      val s = if (b.sums.isEmpty) new Array[Double](v.length)
              else b.sums
      val n = math.min(s.length, v.length)
      var i = 0
      while (i < n) { s(i) += v(i); i += 1 }
      VAvgBuf(s, b.count + 1)
    }

    override def merge(a: VAvgBuf, b: VAvgBuf): VAvgBuf = {
      if (a.sums.isEmpty) return b
      if (b.sums.isEmpty) return a
      val n = math.min(a.sums.length, b.sums.length)
      var i = 0
      while (i < n) { a.sums(i) += b.sums(i); i += 1 }
      VAvgBuf(a.sums, a.count + b.count)
    }

    override def finish(r: VAvgBuf): Seq[Double] =
      if (r.count == 0) Seq.empty
      else r.sums.map(_ / r.count).toSeq

    override def bufferEncoder: Encoder[VAvgBuf] = Encoders.product[VAvgBuf]
    override def outputEncoder: Encoder[Seq[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  /** vector_avg(col: array<double>): array<double> as a DataFrame agg. */
  val vectorAvg: org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(new VectorAvg())

  def vectorAvgCol(c: Column): Column = vectorAvg(c)
}
