package graft

import org.apache.spark.sql.functions._

/** Typed case-class row models. */
case class LineitemRow(l_orderkey: Long, l_quantity: Double,
    l_extendedprice: Double, l_discount: Double, l_returnflag: String)
case class FlagStats(flag: String, totalQty: Double, n: Long)

/** The `Dataset[T]` face of the engine (SURVEY §1: case-class Encoders
  * where compile-time field checks help). Typed filters/maps compile
  * field access; groupByKey + typed agg mirrors the untyped q01 shape.
  */
class TypedApiSpec extends SparkTestBase {
  import spark.implicits._

  private def li = Tables.lineitem(spark, sf)
    .select(col("l_orderkey"), col("l_quantity"), col("l_extendedprice"),
      col("l_discount"), col("l_returnflag"))
    .as[LineitemRow]

  test("typed filter + groupByKey agg equals the untyped pipeline") {
    val typedRes = li.filter(_.l_quantity >= 30)
      .groupByKey(_.l_returnflag)
      .mapGroups { (flag, rows) =>
        var q = 0.0; var n = 0L
        rows.foreach { r => q += r.l_quantity; n += 1 }
        FlagStats(flag, q, n)
      }
      .collect().map(f => f.flag -> ((f.totalQty, f.n))).toMap
    val untyped = Tables.lineitem(spark, sf)
      .filter(col("l_quantity") >= 30)
      .groupBy(col("l_returnflag"))
      .agg(sum(col("l_quantity")), count(lit(1)))
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    assert(typedRes.keySet == untyped.keySet)
    typedRes.foreach { case (k, (q, n)) =>
      assert(n == untyped(k)._2)
      assert(math.abs(q - untyped(k)._1) < 1e-6)
    }
  }

  test("typed map/flatMap stay in the Dataset world") {
    val revs = li.map(r => r.l_extendedprice * (1 - r.l_discount))
    assert(revs.filter(_ > 0).count() == li.count())
  }
}
