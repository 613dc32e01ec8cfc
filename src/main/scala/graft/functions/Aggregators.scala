package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed `Aggregator` UDAFs (the user-facing custom-aggregate surface;
  * escalation path beyond built-ins per SURVEY.md §7.3).
  *
  * [[WeightedAvg]] keeps an exact integer buffer (price in cents × qty)
  * so the result is order-independent — merge order across partitions
  * can't perturb the output, and a DuckDB oracle can reproduce it
  * bit-for-bit with one final double division.
  */
object Aggregators {

  case class WAvgBuf(centsTimesQty: Long, qty: Long)

  /** Quantity-weighted average price over (qty, price) pairs.
    * Exact in integer cents until the single final division. */
  object WeightedAvg extends Aggregator[(Double, Double), WAvgBuf, Double] {
    override def zero: WAvgBuf = WAvgBuf(0L, 0L)
    override def reduce(b: WAvgBuf, in: (Double, Double)): WAvgBuf = {
      val (qty, price) = in
      WAvgBuf(b.centsTimesQty + math.round(price * 100) * qty.toLong,
        b.qty + qty.toLong)
    }
    override def merge(a: WAvgBuf, b: WAvgBuf): WAvgBuf =
      WAvgBuf(a.centsTimesQty + b.centsTimesQty, a.qty + b.qty)
    override def finish(b: WAvgBuf): Double =
      if (b.qty == 0) Double.NaN else b.centsTimesQty.toDouble / (100.0 * b.qty)
    override def bufferEncoder: Encoder[WAvgBuf] = Encoders.product[WAvgBuf]
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Column form: weighted_avg(qty, price). */
  def weightedAvg(qty: Column, price: Column): Column =
    udaf(WeightedAvg).apply(qty, price)
}
