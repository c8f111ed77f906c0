package graft.lakehouse

import org.apache.spark.sql.{GraftSqlBridge, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{Attribute, EqualTo, Expression, Literal}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand

/** SQL DML front-end for [[GraftTable]] — the reference's workflow is
  * SQL-first (`INSERT INTO` producer_iceberg_datalake_setup.sh:143-160,
  * `MERGE / UPDATE / DELETE` :203-236 against its Iceberg tables), so
  * a lakehouse table must be addressable from `spark.sql(...)`, not
  * only through the Scala API.
  *
  * Spark's parser already produces typed DML plans
  * ([[MergeIntoTable]], [[UpdateTable]], [[DeleteFromTable]],
  * [[InsertIntoStatement]]); [[LakeSqlRule]] intercepts those whose
  * target is a name registered in [[LakeRegistry]] and lowers them to
  * eagerly-executed commands over the [[GraftTable]] API. This is the
  * same structure as a DSv2 row-level-operation implementation with
  * the plumbing graft actually needs: conditions and assignments are
  * carried as Catalyst expressions, re-rendered into the table's flat
  * clause namespace (see [[MergeClause]]).
  */
object LakeRegistry {
  private val tables =
    new java.util.concurrent.ConcurrentHashMap[String, GraftTable]()

  /** Make `table` addressable from SQL DML as `name` (session-global,
    * like a temp view; the local-mode analog of a catalog entry). */
  def register(name: String, table: GraftTable): Unit =
    tables.put(name.toLowerCase, table)
  def get(name: String): Option[GraftTable] =
    Option(tables.get(name.toLowerCase))
}

case class LakeSqlRule(spark: SparkSession) extends Rule[LogicalPlan] {

  /** (registered table, its SQL aliases) for a DML target plan. */
  private def target(plan: LogicalPlan): Option[(GraftTable, Set[String], String)] =
    plan match {
      case SubqueryAlias(ident, u: UnresolvedRelation) =>
        target(u).map { case (t, as, n) => (t, as + ident.name.toLowerCase, n) }
      case u: UnresolvedRelation if u.multipartIdentifier.size == 1 =>
        val name = u.multipartIdentifier.head.toLowerCase
        LakeRegistry.get(name).map((_, Set(name), name))
      case _ => None
    }

  /** Write-path FGAC composes with the SQL front-end: a registered
    * name that is ALSO governed requires the session principal to
    * hold a write grant (deny-by-default, like the Lake Formation
    * INSERT/DELETE permissions the reference provisions). */
  private def checkWrite(name: String, op: String): Unit =
    graft.fgac.SecureCatalog.authorizeWrite(
      spark.conf.get(graft.fgac.SecureCatalog.PrincipalConf, ""), name, op)

  override def apply(plan: LogicalPlan): LogicalPlan = plan match {
    case d: DeleteFromTable =>
      target(d.table).map { case (t, aliases, name) =>
        checkWrite(name, "DELETE")
        GraftDeleteCommand(t, unqualified(d.condition, aliases).sql)
          : LogicalPlan
      }.getOrElse(plan)

    case u: UpdateTable =>
      target(u.table).map { case (t, aliases, name) =>
        checkWrite(name, "UPDATE")
        val sets = u.assignments.map { a =>
          attrName(a.key) -> unqualified(a.value, aliases).sql
        }.toMap
        val cond = u.condition.map(unqualified(_, aliases).sql).getOrElse("true")
        GraftUpdateCommand(t, sets, cond): LogicalPlan
      }.getOrElse(plan)

    case m: MergeIntoTable =>
      target(m.targetTable).map { case (t, targetAliases, name) =>
        checkWrite(name, "MERGE")
        if (m.notMatchedBySourceActions.nonEmpty)
          throw new UnsupportedOperationException(
            "WHEN NOT MATCHED BY SOURCE is not supported")
        val (srcPlan, srcAliases) = m.sourceTable match {
          case SubqueryAlias(ident, child) =>
            (m.sourceTable, Set(ident.name.toLowerCase))
          case other => (other, Set.empty[String])
        }
        val keys = equiKeys(m.mergeCondition, name, targetAliases, srcAliases)
        def flat(e: Expression): String =
          flatten(e, targetAliases, srcAliases).sql
        val clauses: Seq[MergeClause] =
          m.matchedActions.map {
            case UpdateAction(cond, assigns, _) =>
              MergeClause.Update(cond.map(flat),
                assigns.map(a => attrName(a.key) -> flat(a.value)).toMap)
            case UpdateStarAction(cond) =>
              MergeClause.Update(cond.map(flat), Map.empty)
            case DeleteAction(cond) => MergeClause.Delete(cond.map(flat))
            case other => throw new UnsupportedOperationException(
              s"merge clause $other")
          } ++ m.notMatchedActions.map {
            case InsertAction(cond, assigns) =>
              MergeClause.Insert(cond.map(flat),
                assigns.map(a => attrName(a.key) -> flat(a.value)).toMap)
            case InsertStarAction(cond) =>
              MergeClause.Insert(cond.map(flat), Map.empty)
            case other => throw new UnsupportedOperationException(
              s"merge clause $other")
          }
        GraftMergeCommand(t, srcPlan, keys, clauses): LogicalPlan
      }.getOrElse(plan)

    case i: InsertIntoStatement =>
      target(i.table).map { case (t, _, name) =>
        checkWrite(name, "INSERT")
        require(i.partitionSpec.isEmpty && i.userSpecifiedCols.isEmpty,
          "INSERT with a partition spec or column list is not supported")
        GraftInsertCommand(t, i.query, i.overwrite, i.byName): LogicalPlan
      }.getOrElse(plan)

    case _ => plan
  }

  private def attrName(e: Expression): String = e match {
    case a: UnresolvedAttribute => a.nameParts.last
    case a: Attribute           => a.name
    case other => throw new UnsupportedOperationException(
      s"assignment target $other")
  }

  /** Strip target-alias qualifiers: `t.c` → `c`. */
  private def unqualified(e: Expression, aliases: Set[String]): Expression =
    e.transformUp {
      case a: UnresolvedAttribute if a.nameParts.size == 2 &&
          aliases.contains(a.nameParts.head.toLowerCase) =>
        UnresolvedAttribute(Seq(a.nameParts.last))
    }

  /** Rewrite into the merge clause namespace: source references get
    * the [[GraftTable.SrcPrefix]], target references lose their
    * qualifier. Unqualified names are assumed to be target columns
    * (ambiguity is the SQL author's to resolve with aliases). */
  private def flatten(e: Expression, targetAliases: Set[String],
      srcAliases: Set[String]): Expression =
    e.transformUp {
      case a: UnresolvedAttribute if a.nameParts.size == 2 =>
        val q = a.nameParts.head.toLowerCase
        if (srcAliases.contains(q))
          UnresolvedAttribute(Seq(GraftTable.SrcPrefix + a.nameParts.last))
        else if (targetAliases.contains(q))
          UnresolvedAttribute(Seq(a.nameParts.last))
        else a
    }

  /** Extract equi-join key columns from the ON condition: a
    * conjunction of `t.k = s.k` (same column name both sides, the
    * standard upsert shape). */
  private def equiKeys(cond: Expression, name: String,
      targetAliases: Set[String], srcAliases: Set[String]): Seq[String] = {
    def split(e: Expression): Seq[Expression] = e match {
      case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
        split(l) ++ split(r)
      case other => Seq(other)
    }
    split(cond).map {
      case EqualTo(a: UnresolvedAttribute, b: UnresolvedAttribute) =>
        val (l, r) = (a.nameParts, b.nameParts)
        if (l.last.toLowerCase != r.last.toLowerCase)
          throw new UnsupportedOperationException(
            s"MERGE ON must equate same-named columns, got ${a.sql} = ${b.sql}")
        l.last
      case other => throw new UnsupportedOperationException(
        s"MERGE INTO $name: ON must be a conjunction of column " +
          s"equalities, got ${other.sql}")
    }
  }
}

case class GraftDeleteCommand(@transient table: GraftTable, cond: String)
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    table.delete(cond); Seq.empty
  }
}

case class GraftUpdateCommand(@transient table: GraftTable,
    sets: Map[String, String], cond: String) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    table.update(sets, cond); Seq.empty
  }
}

case class GraftMergeCommand(@transient table: GraftTable,
    @transient sourcePlan: LogicalPlan, keys: Seq[String],
    clauses: Seq[MergeClause]) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    table.merge(GraftSqlBridge.ofRows(spark, sourcePlan), keys, clauses)
    Seq.empty
  }
}

case class GraftInsertCommand(@transient table: GraftTable,
    @transient query: LogicalPlan, overwrite: Boolean, byName: Boolean)
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val df0 = GraftSqlBridge.ofRows(spark, query)
    // plain SQL INSERT matches columns by position (BY NAME opts out)
    val df =
      if (byName) df0
      else {
        val names = table.currentSnapshot.schema.fieldNames
        require(df0.columns.length == names.length,
          s"INSERT arity ${df0.columns.length} != table arity ${names.length}")
        df0.toDF(names.toIndexedSeq: _*)
      }
    if (overwrite) table.overwrite(df) else table.append(df)
    Seq.empty
  }
}
