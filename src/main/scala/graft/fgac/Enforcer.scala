package graft.fgac

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, expr}

/** Library-level enforcement: produce the secured view of a DataFrame
  * under a [[TablePolicy]]. Semantics match Lake Formation's data
  * cells filter: the row filter is evaluated against the *raw* row
  * (it may reference columns the principal cannot see), then masks,
  * then the column projection.
  *
  * Everything here is plain Column expressions, so Catalyst pushes
  * the filter and the pruned projection into the parquet scan — the
  * secured view costs nothing extra at scale.
  */
object Enforcer {
  def secure(df: DataFrame, policy: TablePolicy,
      who: String = ""): DataFrame = {
    // same context-function folding as the analyzer path
    // (FgacRule.compilePolicyExpr): graft_principal() becomes a
    // string literal of the effective principal before analysis
    def compile(sqlText: String) =
      org.apache.spark.sql.GraftSqlBridge.columnOf(
        FgacRule.compilePolicyExpr(sqlText, who))
    val filtered = policy.rowFilter.fold(df)(p => df.filter(compile(p)))
    val masked =
      if (policy.masks.isEmpty) filtered
      else filtered.select(filtered.columns.toIndexedSeq.map { c =>
        policy.masks.get(c).map(m => compile(m).as(c)).getOrElse(col(c))
      }: _*)
    policy.allowedColumns.fold(masked) { cs =>
      masked.select(cs.map(col): _*)
    }
  }
}
