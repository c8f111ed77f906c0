package graft.fgac

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, lit, struct, when}

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
  /** `who` is the effective principal and has NO default: an omitted
    * principal would silently enforce a context-free policy as
    * "nobody" — call sites must name the principal (or pass ""
    * deliberately for a context-free policy). */
  def secure(df: DataFrame, policy: TablePolicy,
      who: String): DataFrame = {
    // A context-dependent policy with no context must refuse, not
    // fold graft_principal() to "": row filters would fail closed
    // (acceptable) but masks would compute silently WRONG values.
    if (who.isEmpty) {
      val ctxRef = "(?i)graft_principal\\s*\\(".r
      val refs = (policy.rowFilter.toSeq ++ policy.masks.values)
        .filter(t => ctxRef.findFirstIn(t).isDefined)
      require(refs.isEmpty,
        "policy references graft_principal() but no principal was " +
          s"passed to secure(): ${refs.mkString("; ")}")
    }
    // same context-function folding as the analyzer path
    // (FgacRule.compilePolicyExpr): graft_principal() becomes a
    // string literal of the effective principal before analysis
    def compile(sqlText: String) =
      org.apache.spark.sql.GraftSqlBridge.columnOf(
        FgacRule.compilePolicyExpr(sqlText, who))
    val filtered = policy.rowFilter.fold(df)(p => df.filter(compile(p)))
    if (policy.allowedColumns.isEmpty && policy.masks.isEmpty)
      return filtered
    // same nested semantics as the analyzer path (FgacRule.securePlan):
    // `outer` = whole struct, nested masks in place via withField;
    // `outer.a` without bare `outer` = struct rebuilt from exactly
    // the listed children, null-preserving and fail-closed
    val visible = policy.allowedColumns
      .getOrElse(filtered.columns.toIndexedSeq)
    val topVisible = visible.map(_.takeWhile(_ != '.')).distinct
    filtered.select(topVisible.map { c =>
      val nested = policy.masks.collect { case (path, m)
          if path.toLowerCase.startsWith(c.toLowerCase + ".") =>
        path.substring(c.length + 1) -> m }
      policy.masks.find(_._1.equalsIgnoreCase(c)).map(_._2) match {
        case Some(m) => compile(m).as(c)
        case None if visible.exists(_.equalsIgnoreCase(c)) =>
          nested.foldLeft(col(c)) { case (acc, (k, m)) =>
            acc.withField(k, compile(m)) }.as(c)
        case None =>
          val kids = visible
            .filter(_.toLowerCase.startsWith(c.toLowerCase + "."))
            .map(_.substring(c.length + 1))
          val rebuilt = struct(kids.map { k =>
            nested.collectFirst { case (nk, m)
                if nk.equalsIgnoreCase(k) => compile(m) }
              .getOrElse(col(c).getField(k)).as(k)
          }.toIndexedSeq: _*)
          when(col(c).isNull, lit(null)).otherwise(rebuilt).as(c)
      }
    }.toIndexedSeq: _*)
  }
}
