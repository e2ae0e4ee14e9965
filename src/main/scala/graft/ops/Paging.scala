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
  *
  * DEEP-PAGINATION CAP, a deliberate deviation from the reference:
  * `api.py` doesn't bound `page` because Elasticsearch refuses
  * `from + size > index.max_result_window` (10000) server-side — the cap
  * exists in its stack, just not in its code. Here the engine IS the
  * server, so [[paginate]] enforces the same bound itself: without it,
  * page=10⁶ would funnel `page·size` rows through the single-partition
  * offset window — the one shape in this operator that does not survive a
  * 100× scale-up. Deep scans belong to sort-keyed range pagination
  * (ES search_after), not offsets; the error says so.
  */
object Paging {

  /** The `index.max_result_window` analog: the deepest row an
    * offset-paginated read may reach. Everything below it is a bounded
    * top-k; everything above it is a scan wearing a pagination costume.
    */
  val MaxResultWindow: Int = 10000

  def clamp(page: Int, size: Int, maxSize: Int = 100): (Int, Int) =
    (math.max(1, page), math.min(maxSize, math.max(1, size)))

  /** `orderBy` must be a total order (add a unique tie-break column) or
    * page boundaries are nondeterministic. Refuses (after clamping)
    * `page·size > maxWindow` — the ES behavior; see the object scaladoc.
    */
  def paginate(df: DataFrame, orderBy: Seq[Column], page: Int, size: Int,
      maxSize: Int = 100, maxWindow: Int = MaxResultWindow): DataFrame = {
    val (p, sz) = clamp(page, size, maxSize)
    require(p.toLong * sz <= maxWindow,
      s"result window too large: page $p x size $sz = ${p.toLong * sz} rows " +
        s"exceeds the $maxWindow-row offset-pagination window " +
        "(the index.max_result_window analog); deep scans should use " +
        "sort-keyed range pagination, not offsets")
    val top = df.orderBy(orderBy: _*).limit(p * sz)
    top
      .withColumn("__rn", row_number().over(Window.orderBy(orderBy: _*)))
      .filter(col("__rn") > (p - 1) * sz)
      .drop("__rn")
  }
}
