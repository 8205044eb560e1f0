package graft

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Exact weighted percentile as a typed [[Aggregator]] — the SURVEY §2.8
  * `AggregateUDFImpl` surface (reference `datafusion/expr/src/udaf.rs:376`)
  * and the §2.5 `approx_percentile_cont_with_weight` capability, exact
  * variant (reference `datafusion/functions-aggregate/src/
  * approx_percentile_cont_with_weight.rs`).
  *
  * Definition (matches the DuckDB oracle's window formulation): sort pairs
  * by value, accumulate weights, return the first value whose cumulative
  * weight reaches q × total. Ties in the value are safe: wherever the
  * threshold lands inside a run of equal values, the returned value is the
  * same. With integer-valued weights every sum is an exact double, so the
  * comparison can't wobble across engines.
  *
  * Scale note: exact weighted percentile requires the full (value, weight)
  * multiset per group — this buffers it, like DataFusion's exact `median`.
  * At 100 TB you'd switch to the t-digest sketch (`approx_percentile`);
  * this Aggregator is the exact-parity contract surface.
  */
final case class VW(v: Double, w: Double)

class WeightedPercentile(q: Double) extends Aggregator[VW, List[VW], Double] {
  override def zero: List[VW] = Nil
  override def reduce(b: List[VW], a: VW): List[VW] = a :: b
  override def merge(b1: List[VW], b2: List[VW]): List[VW] = b1 ::: b2
  override def finish(r: List[VW]): Double = {
    if (r.isEmpty) return Double.NaN
    val sorted = r.sortBy(_.v)
    val total = sorted.iterator.map(_.w).sum
    val threshold = q * total
    var cum = 0.0
    val it = sorted.iterator
    while (it.hasNext) {
      val p = it.next()
      cum += p.w
      if (cum >= threshold) return p.v
    }
    sorted.last.v
  }
  override def bufferEncoder: Encoder[List[VW]] = Encoders.kryo[List[VW]]
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

/** Remaining SURVEY §2 surface rows: set-operation ALL variants (§2.3
  * `DataFrame::intersect_all/except_all`, reference
  * `datafusion/core/src/dataframe/mod.rs:1484,1519`), the `range`/
  * `generate_series` table function (§2.2 `TableFunctionImpl`, reference
  * `datafusion/core/src/datasource/function.rs:29`), DDL + DML
  * (§2.3 `LogicalPlan::{Ddl,Dml}`, reference
  * `datafusion/expr/src/logical_plan/plan.rs:249-282`), and the
  * weighted-percentile UDAF contract query.
  */
object Extras {
  import Queries.{Entry, e}

  /** INTERSECT ALL / EXCEPT ALL keep duplicate multiplicity — both engines
    * implement the SQL-standard bag semantics, counted here so the hash
    * compare pins the multiset cardinality, not just membership. */
  private val setOpsAll = {
    val body =
      """SELECT
        |  (SELECT COUNT(*) FROM
        |    (SELECT c_nationkey AS nk FROM customer INTERSECT ALL SELECT s_nationkey FROM supplier) i)
        |    AS n_intersect_all,
        |  (SELECT COUNT(*) FROM
        |    (SELECT c_nationkey AS nk FROM customer EXCEPT ALL SELECT s_nationkey FROM supplier) x)
        |    AS n_except_all""".stripMargin
    e("q61_setops_all", body) { (s, _) => s.sql(body) }
  }

  /** `range(start, stop, step)` table-valued function ≙ the reference's
    * `generate_series`/UDTF source. Derived column + aggregate to pin
    * values, not just cardinality. */
  private val rangeTvf = {
    val spark_ =
      """SELECT id, id * id AS sq, CAST(sum(id) OVER (ORDER BY id) AS BIGINT) AS running
        |FROM range(0, 50, 3) ORDER BY id""".stripMargin
    val duck =
      """SELECT id, id * id AS sq, CAST(sum(id) OVER (ORDER BY id) AS BIGINT) AS running
        |FROM range(0, 50, 3) t(id) ORDER BY id""".stripMargin
    e("q64_range_tvf", duck) { (s, _) => s.sql(spark_) }
  }

  /** CREATE TABLE / INSERT INTO … SELECT / INSERT INTO … VALUES / read
    * back — the §2.3 Ddl/Dml row. The table is a managed parquet table in
    * the session warehouse; the oracle derives the same rows from `nation`
    * plus the literal inserts. */
  private val ddlDml = {
    val duck =
      """WITH t AS (
        |  SELECT n_regionkey AS rk, n_name AS name FROM nation
        |  UNION ALL
        |  SELECT * FROM (VALUES (0, 'ATLANTIS'), (1, 'ELBONIA')) v(rk, name))
        |SELECT CAST(rk AS BIGINT) AS rk, COUNT(*) AS n, min(name) AS first_name
        |FROM t GROUP BY rk ORDER BY rk""".stripMargin
    e("q63_ddl_dml", duck) { (s, _) =>
      s.sql("DROP TABLE IF EXISTS graft_ddl_nation")
      // the in-memory catalog forgets the table across JVMs but its
      // warehouse directory persists, so DROP alone can't clear the way
      val loc = new java.io.File(
        new java.net.URI(s.conf.get("spark.sql.warehouse.dir")).getPath, "graft_ddl_nation")
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(); ()
      }
      if (loc.exists()) rm(loc)
      s.sql("CREATE TABLE graft_ddl_nation (nk BIGINT, name STRING, rk BIGINT) USING PARQUET")
      s.sql("INSERT INTO graft_ddl_nation SELECT n_nationkey, n_name, n_regionkey FROM nation")
      s.sql("INSERT INTO graft_ddl_nation VALUES (97, 'ATLANTIS', 0), (98, 'ELBONIA', 1)")
      s.sql("""SELECT CAST(rk AS BIGINT) AS rk, COUNT(*) AS n, min(name) AS first_name
              |FROM graft_ddl_nation GROUP BY rk ORDER BY rk""".stripMargin)
    }
  }

  /** Weighted median of extended price, weighted by quantity, per return
    * flag — exercises the [[WeightedPercentile]] Aggregator from SQL. The
    * oracle computes the identical definition with a cumulative-weight
    * window. */
  private val weightedPct = {
    val spark_ =
      """SELECT l_returnflag AS rf, weighted_median(l_extendedprice, l_quantity) AS wmedian
        |FROM lineitem GROUP BY l_returnflag ORDER BY rf""".stripMargin
    val duck =
      """WITH w AS (
        |  SELECT l_returnflag AS rf, l_extendedprice AS v, l_quantity AS wt FROM lineitem),
        |c AS (
        |  SELECT rf, v,
        |    sum(wt) OVER (PARTITION BY rf ORDER BY v
        |                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
        |    sum(wt) OVER (PARTITION BY rf) AS tw
        |  FROM w)
        |SELECT rf, min(v) AS wmedian FROM c WHERE cw >= 0.5 * tw
        |GROUP BY rf ORDER BY rf""".stripMargin
    e("q62_weighted_percentile", duck) { (s, _) => s.sql(spark_) }
  }

  val all: Seq[Entry] = Seq(setOpsAll, weightedPct, ddlDml, rangeTvf)
}
