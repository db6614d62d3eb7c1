package graft.plans

import graft.log.{PolarLog, TopicConfig}
import org.apache.spark.sql.{Row, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, EqualTo}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.types.LongType

/**
 * `MERGE INTO polar.t USING src ON t.partitionKey = src.partitionKey` —
 * the SQL-text face of [[PolarLog.merge]] (Delta's MERGE shape over KTable
 * semantics), closing the syntax gap behind the engine's refusal: offsets,
 * tokens and placement are ENGINE-assigned facts of the append, so the
 * general SQL MERGE column-assignment contract cannot be honored soundly —
 * but the STAR clause set needs no column assignments at all. The rule
 * rewrites exactly that shape:
 *
 *  - `WHEN MATCHED THEN UPDATE SET *` (unconditioned) — upsert intent; a
 *    NULL source `value` updates the key to a tombstone, i.e. deletes it
 *    from the compacted view (so this maps to matchedUpdate AND
 *    matchedDelete in [[PolarLog.merge]]'s clause matrix);
 *  - `WHEN NOT MATCHED THEN INSERT *` (unconditioned) — insert intent;
 *  - the ON condition must be target.partitionKey = source.partitionKey
 *    (the log's merge key is the partition key, nothing else matches the
 *    placement contract).
 *
 * With both clauses on, the merge is ONE produce of the source — no read
 * of the current view (the 100 TB shape); a single enabled clause costs
 * one key-set read of the compacted view, as documented on the operator.
 * Any other MERGE shape (conditioned clauses, explicit assignments,
 * NOT MATCHED BY SOURCE, schema evolution) falls through untouched to the
 * engine's existing refusal, which points at `CALL polar.system.merge`.
 */
object PolarMergeRewrite {
  /** SparkSessionExtensions hook — wired by [[graft.GraftSession]] and
    * [[graft.GraftExtensions]]. */
  def install(ext: SparkSessionExtensions): Unit =
    ext.injectResolutionRule(_ => new PolarMergeRewrite)
}

class PolarMergeRewrite extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperators {
    case m: MergeIntoTable => rewrite(m).getOrElse(m)
  }

  private def unwrapTarget(plan: LogicalPlan): Option[DataSourceV2Relation] =
    plan match {
      case r: DataSourceV2Relation => Some(r)
      case SubqueryAlias(_, child) => unwrapTarget(child)
      case _ => None
    }

  /** True iff `e` resolves to a column named partitionKey IN `plan` —
    * by name-parts resolution while unresolved (qualifiers honored), by
    * exprId membership once resolved. Uses the SESSION resolver, so under
    * spark.sql.caseSensitive=true the rewrite only fires on conditions
    * vanilla analysis would also resolve. */
  private def resolvesToKey(
      plan: LogicalPlan,
      e: org.apache.spark.sql.catalyst.expressions.Expression): Boolean = e match {
    // UnresolvedAttribute IS an Attribute — match it first
    case u: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
      plan.resolve(u.nameParts, conf.resolver)
        .exists(a => conf.resolver(a.name, "partitionKey"))
    case a: Attribute =>
      conf.resolver(a.name, "partitionKey") && plan.outputSet.contains(a)
    case _ => false
  }

  private def rewrite(m: MergeIntoTable): Option[PolarMergeIntoCommand] = {
    // structural gates first — anything unsupported falls through to the
    // engine's refusal rather than a half-honored MERGE
    if (m.withSchemaEvolution) return None
    if (m.notMatchedBySourceActions.nonEmpty) return None
    val matchedOk = m.matchedActions match {
      case Seq() => true
      case Seq(UpdateStarAction(None)) => true
      case _ => false
    }
    val notMatchedOk = m.notMatchedActions match {
      case Seq() => true
      case Seq(InsertStarAction(None)) => true
      case _ => false
    }
    if (!matchedOk || !notMatchedOk) return None
    if (m.matchedActions.isEmpty && m.notMatchedActions.isEmpty) return None
    // the merge key must be TARGET.partitionKey = SOURCE.partitionKey —
    // each side must resolve to partitionKey against exactly ONE of the
    // two children, and the two sides against different ones. A same-side
    // tautology (t.pk = t.pk) or an ambiguous unqualified pair would
    // otherwise silently execute a semantically different statement.
    val keyOk = m.mergeCondition match {
      case EqualTo(l, r) =>
        def sides(e: org.apache.spark.sql.catalyst.expressions.Expression) =
          (resolvesToKey(m.targetTable, e), resolvesToKey(m.sourceTable, e))
        (sides(l), sides(r)) match {
          case ((true, false), (false, true)) => true
          case ((false, true), (true, false)) => true
          case _ => false
        }
      case _ => false
    }
    if (!keyOk) return None
    val rel = unwrapTarget(m.targetTable) match {
      case Some(r) => r
      case None => return None
    }
    val cfg = rel.table match {
      case t: graft.sources.PolarTable => t.singleTopic match {
        case Some(c) => c
        case None => return None
      }
      case _ => return None
    }
    // the source must be resolved and carry the producer shape the log
    // merge consumes; star expansion never runs (no assignments survive)
    if (!m.sourceTable.resolved) return None
    val srcCols = m.sourceTable.output.map(_.name)
    if (!srcCols.exists(conf.resolver(_, "partitionKey")) ||
        !srcCols.exists(conf.resolver(_, "value")))
      return None
    Some(PolarMergeIntoCommand(cfg, m.sourceTable,
      matchedUpdate = m.matchedActions.nonEmpty,
      notMatchedInsert = m.notMatchedActions.nonEmpty))
  }
}

/** The planned form of the rewritten MERGE: executes eagerly as a command
  * (one produce through the metadata CAS) and returns the appended-record
  * count, mirroring `CALL polar.system.merge`'s result row. */
case class PolarMergeIntoCommand(
    cfg: TopicConfig,
    source: LogicalPlan,
    matchedUpdate: Boolean,
    notMatchedInsert: Boolean) extends LeafRunnableCommand {

  override val output: Seq[Attribute] =
    Seq(AttributeReference("appended", LongType, nullable = false)())

  override def innerChildren: Seq[org.apache.spark.sql.catalyst.plans.QueryPlan[_]] =
    Seq(source)

  override def run(spark: SparkSession): Seq[Row] = {
    val src = org.apache.spark.sql.graftshims.GraftShims.ofRows(spark, source)
    val res = PolarLog.merge(spark, cfg, src,
      matchedUpdate = matchedUpdate,
      // SQL UPDATE SET * carries NULL source values into the view —
      // tombstones — so the star clause enables both matched intents
      matchedDelete = matchedUpdate,
      notMatchedInsert = notMatchedInsert)
    Seq(Row(res.recordsWritten))
  }
}
