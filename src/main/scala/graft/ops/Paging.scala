package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Offset/limit pagination (SURVEY §2.6 O3) with the reference's clamps
  * (`/root/reference/src/api.py:196-207`: page ≥ 1, 1 ≤ size ≤ maxSize).
  *
  * Plan shape: `limit(page*size)` plans a TakeOrderedAndProject (distributed
  * top-k, no global sort), and only that tiny prefix flows into the offset
  * window — the global-window-over-the-whole-table anti-pattern never
  * appears (PlanSpec pins this).
  */
object Paging {

  def clamp(page: Int, size: Int, maxSize: Int = 100): (Int, Int) =
    (math.max(1, page), math.min(maxSize, math.max(1, size)))

  /** `orderBy` must be a total order (add a unique tie-break column) or
    * page boundaries are nondeterministic.
    */
  def paginate(df: DataFrame, orderBy: Seq[Column], page: Int, size: Int,
      maxSize: Int = 100): DataFrame = {
    val (p, sz) = clamp(page, size, maxSize)
    val top = df.orderBy(orderBy: _*).limit(p * sz)
    top
      .withColumn("__rn", row_number().over(Window.orderBy(orderBy: _*)))
      .filter(col("__rn") > (p - 1) * sz)
      .drop("__rn")
  }
}
