package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** D5/I3: typed custom Aggregator — weighted-average cost basis
  * (total paid / total quantity), the tax-report computation the reference's
  * schema indexes exist for (`/root/reference/migrations/
  * 20251219000000_init.sql:34-35`, "Index for tax calculations").
  *
  * Accumulates in exact BigDecimal (quantized to 2 fractional digits, the
  * corpus precision) so the result is order-independent and reproducible —
  * a double accumulator would make the answer depend on partition merge
  * order. Spark plans this as a partial + final hash aggregate: the buffer
  * merges map-side, so the shuffle carries one (sumQty, sumPaid) pair per
  * group, not raw rows.
  */
object CostBasisAggregator extends Aggregator[(Double, Double), (BigDecimal, BigDecimal), Double] {

  private def q2(x: Double): BigDecimal =
    BigDecimal(x).setScale(2, BigDecimal.RoundingMode.HALF_UP)

  override def zero: (BigDecimal, BigDecimal) = (BigDecimal(0), BigDecimal(0))

  override def reduce(b: (BigDecimal, BigDecimal), in: (Double, Double)): (BigDecimal, BigDecimal) =
    (b._1 + q2(in._1), b._2 + q2(in._2))

  override def merge(a: (BigDecimal, BigDecimal), b: (BigDecimal, BigDecimal)): (BigDecimal, BigDecimal) =
    (a._1 + b._1, a._2 + b._2)

  override def finish(b: (BigDecimal, BigDecimal)): Double =
    if (b._1 == BigDecimal(0)) 0.0 else b._2.toDouble / b._1.toDouble

  override def bufferEncoder: Encoder[(BigDecimal, BigDecimal)] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(BigDecimal, BigDecimal)]()

  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
