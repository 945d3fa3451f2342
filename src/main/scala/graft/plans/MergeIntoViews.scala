package graft.plans

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Assignment, DeleteAction, InsertAction, InsertStarAction, LogicalPlan, MergeIntoTable, SubqueryAlias, UpdateAction, UpdateStarAction}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim

/** SQL-text `MERGE INTO` over temp views (M11, r16) — the dbt
  * incremental-materialization verb, the last §2.M stone.
  *
  * Spark 4 parses MERGE for any relation, but ANALYSIS requires a v2
  * catalog table with `SupportsRowLevelOperations` — against a temp view
  * or v1 table `spark.sql("MERGE INTO …")` fails with
  * `UNSUPPORTED_FEATURE.TABLE_OPERATION` / "does not support MERGE"
  * (probed in SqlMergeSpec, which pins that refusal so a Spark release
  * that lifts it is noticed). This sandbox cannot host a v2 catalog, and
  * the engine's tables are parquet-backed temp views, so the verb is
  * carried the extension-library way: Spark's OWN parser produces the
  * `MergeIntoTable` logical plan, and this module interprets it over the
  * session catalog — [[MergeIntoViews.mergeSql]] as the direct API, and
  * [[MergeIntoViewRule]] (injected by [[GraftExtensions]]) so a session
  * built with `spark.sql.extensions=graft.plans.GraftExtensions` runs
  * the raw `spark.sql("MERGE INTO view …")` text end-to-end.
  *
  * SEMANTICS (ANSI MERGE, the same contract Delta/Iceberg implement):
  * one full-outer join of target and source on the merge condition; for
  * each row the FIRST clause (in statement order, within its
  * matched / not-matched / not-matched-by-source group) whose condition
  * holds decides the row — UPDATE rewrites assigned columns (unassigned
  * keep the target value), DELETE drops the row, INSERT builds a row
  * from the assignments (unassigned columns NULL), `*` variants copy
  * source columns by name. A matched/target-only row no clause claims
  * survives unchanged; a source-only row no INSERT claims is skipped.
  * First-clause-wins falls out of a chained `when().otherwise()` —
  * exactly the expression Spark's own RewriteMergeIntoTable builds.
  * Cardinality caveat: like Delta, a target row matching MULTIPLE
  * source rows is a data error; this interpreter emits one output row
  * per JOIN row (it does not detect the ambiguity), so source keys
  * must be unique under the merge condition.
  *
  * The "table mutation" is a temp-view re-point: the merged result is
  * eagerly materialized (`localCheckpoint`, same discipline as
  * sql_ctas's read-back) and `createOrReplaceTempView`d over the target
  * name — the lazy-view equivalent of an atomic table swap.
  *
  * SCOPE: target and source must be NAMED relations (temp views or
  * catalog tables readable via `spark.table`); a subquery source is one
  * `CREATE TEMP VIEW` away. Schema evolution (`WHEN NOT MATCHED …` with
  * new columns) is not supported — assignments must name existing
  * target columns.
  *
  * Scale posture: the physical plan is ONE shuffle join on the merge
  * keys (broadcast if one side is small — Spark's stats decide), the
  * same shape as the DataFrame `merge_upsert` (Relational.scala) and
  * `cdc_apply`; every clause is a codegen'd projection over the joined
  * row, no per-clause passes. At 100 TB the view re-point becomes the
  * table format's commit (Delta/Iceberg swap a manifest pointer the
  * same way).
  */
object MergeIntoViews {

  /** Parse a MERGE INTO statement with Spark's SQL parser, execute it
    * against the session's temp views, and return the merged target. */
  def mergeSql(s: SparkSession, sqlText: String): DataFrame = {
    s.sessionState.sqlParser.parsePlan(sqlText) match {
      case m: MergeIntoTable =>
        run(s, m)
        s.table(relOf(m.targetTable)._1)
      case other => throw new IllegalArgumentException(
        s"not a MERGE INTO statement: ${other.nodeName}")
    }
  }

  /** Execute a parsed MERGE: materialize the merged rows, then re-point
    * the target temp view at them. */
  def run(s: SparkSession, m: MergeIntoTable): Unit = {
    val merged = interpret(s, m).localCheckpoint(true)
    merged.createOrReplaceTempView(relOf(m.targetTable)._1)
  }

  /** (relation name, alias) of a parsed MERGE side. */
  private def relOf(p: LogicalPlan): (String, String) = p match {
    case sa: SubqueryAlias => (relOf(sa.child)._1, sa.alias)
    case u: UnresolvedRelation =>
      (u.multipartIdentifier.mkString("."), u.multipartIdentifier.last)
    case other => throw new IllegalArgumentException(
      "MERGE target/source must be a named relation (temp view or " +
        s"table), got: ${other.nodeName}")
  }

  /** One clause of the merge, lowered to: a row-level guard, whether a
    * claimed row survives, and the value of each target column. */
  private final case class Clause(guard: Column, keep: Boolean,
      value: String => Column)

  /** Build the merged-rows DataFrame (no side effects). */
  private[graft] def interpret(s: SparkSession, m: MergeIntoTable)
      : DataFrame = {
    val (tName, tAlias) = relOf(m.targetTable)
    val (sName, sAlias) = relOf(m.sourceTable)
    val target = s.table(tName)
    val source = s.table(sName)
    val schema = target.schema
    require(!target.columns.contains("__graft_t") &&
      !source.columns.contains("__graft_s"),
      "MERGE presence-flag column name collision")
    // presence flags ride each side INTO the full-outer join: after it,
    // flag-null ⇔ that side contributed no row (null-safe even when
    // every data column of a side is legitimately null)
    val t = target.withColumn("__graft_t", lit(true)).as(tAlias)
    val src = source.withColumn("__graft_s", lit(true)).as(sAlias)
    val joined = t.join(src, graftshim.column(m.mergeCondition),
      "full_outer")
    val tP = col(s"$tAlias.__graft_t").isNotNull
    val sP = col(s"$sAlias.__graft_s").isNotNull
    val matched = tP && sP
    val srcOnly = !tP && sP
    val tgtOnly = tP && !sP

    def tcol(c: String): Column = col(s"$tAlias.$c")
    def scolCast(c: String): Column =
      col(s"$sAlias.$c").cast(schema(c).dataType)
    def condOf(c: Option[Expression]): Column =
      c.map(graftshim.column).getOrElse(lit(true))
    def keyName(e: Expression): String = e match {
      case u: UnresolvedAttribute => u.nameParts.last
      case n: NamedExpression => n.name
      case other => other.sql
    }
    // assigned columns take the (type-aligned) assignment value;
    // unassigned columns take `miss` — target value for UPDATE, NULL
    // for INSERT. Name match is case-insensitive, like the analyzer's.
    def fromAssignments(as: Seq[Assignment], miss: String => Column)
        (c: String): Column =
      as.find(a => keyName(a.key).equalsIgnoreCase(c))
        .map(a => graftshim.column(a.value).cast(schema(c).dataType))
        .getOrElse(miss(c))

    val clauses: Seq[Clause] =
      m.matchedActions.map {
        case UpdateStarAction(c) => Clause(matched && condOf(c),
          keep = true, scolCast)
        case u: UpdateAction if u.fromStar && u.assignments.isEmpty =>
          Clause(matched && condOf(u.condition), keep = true, scolCast)
        case u: UpdateAction => Clause(matched && condOf(u.condition),
          keep = true, fromAssignments(u.assignments, tcol))
        case DeleteAction(c) => Clause(matched && condOf(c),
          keep = false, tcol)
        case other => throw new IllegalArgumentException(
          s"unsupported WHEN MATCHED action: ${other.nodeName}")
      } ++
      m.notMatchedActions.map {
        case InsertStarAction(c) => Clause(srcOnly && condOf(c),
          keep = true, scolCast)
        case i: InsertAction => Clause(srcOnly && condOf(i.condition),
          keep = true, fromAssignments(i.assignments,
            c => lit(null).cast(schema(c).dataType)))
        case other => throw new IllegalArgumentException(
          s"unsupported WHEN NOT MATCHED action: ${other.nodeName}")
      } ++
      m.notMatchedBySourceActions.map {
        case u: UpdateAction => Clause(tgtOnly && condOf(u.condition),
          keep = true, fromAssignments(u.assignments, tcol))
        case DeleteAction(c) => Clause(tgtOnly && condOf(c),
          keep = false, tcol)
        case other => throw new IllegalArgumentException(
          s"unsupported WHEN NOT MATCHED BY SOURCE action: ${other.nodeName}")
      }

    // first-clause-wins: fold clauses in statement order into a chained
    // when(); the default (no clause claims the row) keeps target rows
    // unchanged and skips source-only rows
    val keep = clauses.foldRight(tP: Column)((cl, acc) =>
      when(cl.guard, lit(cl.keep)).otherwise(acc))
    val outCols = schema.fields.toSeq.map { f =>
      clauses.foldRight(tcol(f.name))((cl, acc) =>
        when(cl.guard, cl.value(f.name)).otherwise(acc)).as(f.name)
    }
    joined.select(outCols :+ keep.as("__graft_keep"): _*)
      .filter(col("__graft_keep")).drop("__graft_keep")
  }
}

/** Executes a parsed MERGE over temp views at command-execution time —
  * the analyzer leaf [[MergeIntoViewRule]] rewrites to. A leaf so the
  * embedded (still-unresolved) MergeIntoTable is invisible to
  * checkAnalysis; [[MergeIntoViews.run]] re-resolves both sides through
  * the session catalog when the command runs — the same move Spark's
  * own CreateViewCommand makes with its unresolved child plan. */
final case class GraftMergeIntoViewCommand(merge: MergeIntoTable)
    extends LeafRunnableCommand {
  override def output: Seq[Attribute] = Nil
  override def run(session: SparkSession): Seq[Row] = {
    MergeIntoViews.run(session, merge)
    Seq.empty
  }
}

/** Parser wrapper: `spark.sql("MERGE INTO <temp view> …")` executes
  * through [[MergeIntoViews]] instead of dying in the planner with
  * UNSUPPORTED_FEATURE.TABLE_OPERATION. The interception point is the
  * PARSER (not a resolution rule) deliberately: by the time an
  * extendedResolutionRules entry sees the node, the analyzer has
  * already substituted the temp-view plans and rebound every action
  * expression to their attribute ids (probed — the rule form left the
  * resolved MergeIntoTable for the planner to reject), whereas the
  * parse-time plan still carries the raw names the interpreter
  * re-resolves through the session catalog. Scoped STRICTLY to
  * temp-view targets, checked at parse-CALL time against the live
  * catalog — a MERGE against a real v2 catalog table passes through
  * untouched to Spark's native row-level-operation path. */
final class GraftSqlParser(session: SparkSession,
    delegate: org.apache.spark.sql.catalyst.parser.ParserInterface)
    extends org.apache.spark.sql.catalyst.parser.ParserInterface {

  private def rewrite(plan: LogicalPlan): LogicalPlan = plan match {
    case m: MergeIntoTable if isTempView(m.targetTable) =>
      GraftMergeIntoViewCommand(m)
    case p => p
  }
  private def isTempView(p: LogicalPlan): Boolean = p match {
    case sa: SubqueryAlias => isTempView(sa.child)
    case u: UnresolvedRelation =>
      session.sessionState.catalog.isTempView(u.multipartIdentifier)
    case _ => false
  }

  override def parsePlan(sqlText: String): LogicalPlan =
    rewrite(delegate.parsePlan(sqlText))
  override def parsePlanWithParameters(sqlText: String,
      ctx: org.apache.spark.sql.catalyst.parser.ParameterContext)
      : LogicalPlan =
    rewrite(delegate.parsePlanWithParameters(sqlText, ctx))
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseExpression(sqlText: String)
      : org.apache.spark.sql.catalyst.expressions.Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String)
      : org.apache.spark.sql.catalyst.TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String)
      : org.apache.spark.sql.catalyst.FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String)
      : org.apache.spark.sql.types.StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String)
      : org.apache.spark.sql.types.DataType =
    delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String)
      : org.apache.spark.sql.types.StructType =
    delegate.parseRoutineParam(sqlText)
}
