package graft.lakehouse

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.util.StringUtils
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{BooleanType, StringType, StructType}

/** Operator-facing catalog SQL over lake tables — `DESCRIBE TABLE`,
  * `SHOW TABLES [IN db]`, `SHOW PARTITIONS` — the inspection surface
  * the reference workflow leans on constantly (the Athena/Glue
  * console in consumer_emr_on_eks_setup.sh's validation steps browses
  * schemas and partitions between every query). Without these claims
  * a [[LakeRegistry]] name falls through to Spark's session catalog
  * and errors with a cold "table not found".
  *
  * Claimed at PARSER level (the same point [[LakeMaintenance]] hooks)
  * because the analyzer's `ResolveSessionCatalog` converts
  * `ShowTables`/`DescribeRelation` to session-catalog commands in the
  * same resolution batch our rules run in — a rule-based claim would
  * race it. Governance precedence:
  *
  *  - DESCRIBE on a GOVERNED name (or a view) is NOT claimed here:
  *    [[graft.fgac.FgacRule]] answers it from the policy,
  *    column-filtered per grant — this file must never leak an
  *    ungoverned full schema for a governed name.
  *  - SHOW TABLES lists ungoverned lake tables and views freely
  *    (ungoverned = readable by anyone, so listable by anyone);
  *    governed names appear only when the session principal holds
  *    some effective grant ([[graft.fgac.SecureCatalog
  *    .governedNamesIn]] — an existence listing, deliberately
  *    audit-free).
  *  - SHOW PARTITIONS on a governed name REFUSES: partition values
  *    are data (a row-filtered principal could otherwise read the
  *    distribution of a column it cannot scan).
  *
  * Everything answers from the driver-side manifest — zero data-file
  * reads at any scale (the 100 TB design point: "which partitions
  * exist / how is this table shaped" must not cost a scan).
  */
object LakeCatalogSql {

  private val N = """(\w+(?:\.\w+)*)"""
  private val Describe =
    ("""(?is)\s*DESC(?:RIBE)?\s+(?:TABLE\s+)?(?:(EXTENDED|FORMATTED)\s+)?""" +
      N + """\s*;?\s*""").r
  private val ShowTablesRe =
    ("""(?is)\s*SHOW\s+TABLES(?:\s+(?:IN|FROM)\s+""" + N +
      """)?(?:\s+LIKE\s+'([^']*)')?\s*;?\s*""").r
  private val ShowPartitionsRe =
    ("""(?is)\s*SHOW\s+PARTITIONS\s+""" + N +
      """(\s+PARTITION\s*\([^)]*\))?\s*;?\s*""").r

  def parse(spark: SparkSession, sqlText: String): Option[LogicalPlan] =
    sqlText match {
      case Describe(ext, name) =>
        val n = name.toLowerCase
        // governed names and views stay on the policy-filtered
        // FgacRule path (fgac_describe); only plain lake tables
        // resolve to the full manifest schema here
        if (graft.fgac.SecureCatalog.isVisibleName(n) ||
            ViewRegistry.get(n).isDefined) None
        else if (LakeDdl.claimDrop(spark, n))
          Some(GraftDescribeCommand(n, ext != null))
        else None
      case ShowTablesRe(db, pat) =>
        // claimed unconditionally: the command MERGES the session
        // catalog's own listing (temp views included), so the claim
        // is a superset of Spark's behavior, never a replacement
        Some(GraftShowTablesCommand(
          Option(db).map(_.toLowerCase), Option(pat)))
      case ShowPartitionsRe(name, spec) =>
        val n = name.toLowerCase
        if (graft.fgac.SecureCatalog.isVisibleName(n))
          throw new graft.fgac.AccessDeniedException(
            s"SHOW PARTITIONS on governed table '$n': partition " +
              "values are data; scan the table under your grant " +
              "instead")
        else if (LakeDdl.claimDrop(spark, n)) {
          require(spec == null,
            "SHOW PARTITIONS … PARTITION(spec) is not supported on " +
              "lake tables; filter the lake_partitions('t') TVF " +
              "instead")
          Some(GraftShowPartitionsCommand(n))
        } else None
      case _ => None
    }
}

/** `DESCRIBE [EXTENDED] t` for a lake table: columns with types (a
  * `not null` comment marks declared NOT NULL columns), the partition
  * spec section, and — EXTENDED — location, current snapshot, table
  * properties and CHECK constraints. All from the manifest. */
case class GraftDescribeCommand(name: String, extended: Boolean)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("col_name", StringType, nullable = false)(),
    AttributeReference("data_type", StringType, nullable = false)(),
    AttributeReference("comment", StringType, nullable = true)())

  override def run(spark: SparkSession): Seq[Row] = {
    val t = LakeRegistry.get(name).getOrElse(
      throw new IllegalArgumentException(s"no lake table '$name'"))
    val snap = t.currentSnapshot
    def typeOf(col: String): String =
      snap.schema.fields.find(_.name.equalsIgnoreCase(col))
        .map(_.dataType.simpleString).getOrElse("unknown")
    // the `not null` marker is the DECLARED constraint (the
    // setNotNull metadata flag), not an accidental nullable=false a
    // source frame happened to carry — only the declared form is
    // validated on writes, so only it may advertise
    val cols = snap.schema.fields.toSeq.map { f =>
      Row(f.name, f.dataType.simpleString,
        if (f.metadata.contains(GraftTable.NotNullKey)) "not null"
        else null)
    }
    val partRows =
      if (snap.partitionCols.isEmpty) Nil
      else Row("# Partition Information", "", null) +:
        Row("# col_name", "data_type", "comment") +:
        snap.partitionCols.map { c =>
          val pf = PartField.parse(c)
          // a transform field (`day(ts)`) describes under its
          // rendered spec with the SOURCE column's type — the value
          // an operator filters the raw column by
          Row(pf.render, typeOf(pf.col), null)
        }
    val ext =
      if (!extended) Nil
      else {
        val props = t.properties.toSeq.sortBy(_._1)
          .filterNot(_._1.startsWith(GraftTable.ConstraintPrefix))
        val constraints = t.checkConstraints
        Seq(Row("", "", null),
          Row("# Detailed Table Information", "", null),
          Row("Name", name, null),
          Row("Type", "MANAGED", null),
          Row("Provider", "graft", null),
          Row("Location", t.location, null),
          Row("Snapshot", t.currentSnapshotId.toString, null)) ++
          (if (props.isEmpty) Nil
           else Seq(Row("Properties",
             props.map { case (k, v) => s"$k=$v" }.mkString(", "),
             null))) ++
          constraints.map { case (cn, sql) =>
            Row(s"Constraint $cn", s"CHECK ($sql)", null)
          }
      }
    cols ++ partRows ++ ext
  }
}

/** `SHOW TABLES [IN db] [LIKE 'pat']`: the session catalog's own
  * listing (temp views included) MERGED with lake tables, lake
  * views, and the grant-visible governed names under the namespace.
  * Bare lake names list under the empty namespace, like temp views
  * do. Metadata-only; pattern matching via Spark's own
  * `StringUtils.filterPattern` (`*` and `|`). */
case class GraftShowTablesCommand(db: Option[String],
    pattern: Option[String]) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("namespace", StringType, nullable = false)(),
    AttributeReference("tableName", StringType, nullable = false)(),
    AttributeReference("isTemporary", BooleanType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val cat = spark.sessionState.catalog
    val sessionRows: Seq[Row] = db match {
      case Some(d) if cat.databaseExists(d) =>
        cat.listTables(d, pattern.getOrElse("*")).map(ti =>
          Row(ti.database.getOrElse(""), ti.table, cat.isTempView(ti)))
      case Some(_) => Nil
      case None =>
        cat.listTables(cat.getCurrentDatabase, pattern.getOrElse("*"))
          .map(ti =>
            Row(ti.database.getOrElse(""), ti.table, cat.isTempView(ti)))
    }
    // bare registry keys list under the empty namespace (the temp-view
    // convention); `db.t` keys list under `db`
    def inNs(n: String): Option[String] = db match {
      case Some(d) if n.startsWith(d + ".") =>
        Some(n.drop(d.length + 1)).filterNot(_.contains('.'))
      case Some(_) => None
      case None => Some(n).filterNot(_.contains('.'))
    }
    def matches(bare: String): Boolean = pattern.forall(p =>
      StringUtils.filterPattern(Seq(bare), p).nonEmpty)
    val ns = db.getOrElse("")
    val lakeRows = LakeRegistry.list
      .filterNot(graft.fgac.SecureCatalog.isGoverned)
      .flatMap(inNs).filter(matches).map(Row(ns, _, false))
    val viewRows = ViewRegistry.list.map(_.name)
      .filterNot(graft.fgac.SecureCatalog.isGoverned)
      .flatMap(inNs).filter(matches).map(Row(ns, _, false))
    val who = spark.conf.get(graft.fgac.SecureCatalog.PrincipalConf, "")
    val govRows = graft.fgac.SecureCatalog.governedNamesIn(who, db)
      .flatMap(inNs).filter(matches).map(Row(ns, _, false))
    (sessionRows ++ lakeRows ++ viewRows ++ govRows).distinct
      .sortBy(r => (r.getString(0), r.getString(1)))
  }
}

/** `SHOW PARTITIONS t`: one row per live partition, rendered in
  * layout form (`col=v/col2=v2`), straight from the current
  * snapshot's manifest — zero data reads (the same harvest
  * [[GraftTable.partitionsMeta]] serves). Files written before a
  * partition-spec evolution report under the empty spec, which this
  * listing elides (Spark's output has no row shape for them). */
case class GraftShowPartitionsCommand(name: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("partition", StringType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val t = LakeRegistry.get(name).getOrElse(
      throw new IllegalArgumentException(s"no lake table '$name'"))
    require(t.currentSnapshot.partitionCols.nonEmpty,
      s"SHOW PARTITIONS is not allowed on a table that is not " +
        s"partitioned: $name")
    t.partitionsMeta().select("partition").collect().toSeq
      .map(_.getString(0)).filter(_.nonEmpty).sorted.map(Row(_))
  }
}
