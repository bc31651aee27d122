package graft.plans

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Cast, Expression, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

import graft.functions.TimeBucket

/** Aggregate navigator — the materialized-view rewrite every warehouse
  * grows (Oracle query rewrite, Calcite lattices, BigQuery BI Engine):
  * an aggregate that RE-BUCKETS the hour rollup to a coarser grain is
  * answered from the registered day rollup instead, reading ~1/24 of the
  * rows with bit-identical results (counts and sums are decomposable,
  * and day buckets are exact unions of hour buckets).
  *
  * Matching is deliberately conservative — rewrite only when provably
  * safe:
  *  - the aggregate reads a registered hour-rollup path DIRECTLY (a
  *    column-pruning Project is allowed; a Filter is NOT — a predicate
  *    on hour buckets need not commute with day re-bucketing);
  *  - every grouping expression is a [[TimeBucket]] of `bucket_us` whose
  *    width is a multiple of a day, or a plain column other than
  *    `bucket_us` (raw hour buckets would change the result);
  *  - every aggregate is a plain `sum` (no DISTINCT, no FILTER) of a
  *    column other than `bucket_us` — sums of sums compose; counts of
  *    rows, mins of sums, etc. do NOT.
  * The day relation is re-resolved at rewrite time, so a freshly merged
  * store is picked up. Registration is per-path via [[register]]. */
object RollupRewrite extends Rule[LogicalPlan] {

  val DayUs: Long = 86400000000L

  /** A registered routing: the day table's path plus the GRAIN-INVARIANT
    * dimension columns (part of both tables' grouping key — the only
    * plain columns safe to group by; grouping by a measure like
    * `n_events` would form different groups at different grains). */
  private final case class Target(dayPath: String, dims: Set[String])

  private val mappings = new ConcurrentHashMap[String, Target]()

  /** Route day-or-coarser aggregates over `hourPath` to `dayPath`.
    * `dims` are the dimension columns shared by both grouping keys
    * (default matches [[graft.operators.Rollup]]'s layout). The day plan
    * is resolved through the ACTIVE session at rewrite time — nothing
    * captures or pins the registering session. */
  def register(spark: SparkSession, hourPath: String, dayPath: String,
      dims: Set[String] = Set("event_type")): Unit =
    mappings.put(qualify(spark, hourPath), Target(dayPath, dims))

  def clear(): Unit = mappings.clear()

  private def qualify(spark: SparkSession, p: String): String = {
    val hp = new org.apache.hadoop.fs.Path(p)
    hp.getFileSystem(spark.sessionState.newHadoopConf())
      .makeQualified(hp).toString
  }

  private def relationRoot(plan: LogicalPlan): Option[String] = plan match {
    case lr: LogicalRelation => lr.relation match {
      case fs: HadoopFsRelation if fs.location.rootPaths.length == 1 =>
        Some(fs.location.rootPaths.head.toString)
      case _ => None
    }
    case Project(projList, child)
        if projList.forall(_.isInstanceOf[AttributeReference]) =>
      relationRoot(child)
    case _ => None
  }

  private def isDayBucket(e: Expression, bucketNames: Set[String]): Boolean =
    e match {
      case TimeBucket(a: AttributeReference, w) =>
        bucketNames.contains(a.name) && w > 0 && w % DayUs == 0
      case _ => false
    }

  private def groupingOk(gs: Seq[Expression], dims: Set[String]): Boolean =
    gs.nonEmpty && gs.exists(isDayBucket(_, Set("bucket_us"))) &&
      gs.forall {
        // plain grouping columns must be registered GRAIN-INVARIANT
        // dimensions — a measure column (n_events, sum_value) groups
        // differently at hour vs day grain and must refuse the rewrite
        case a: AttributeReference => dims.contains(a.name)
        case e => isDayBucket(e, Set("bucket_us"))
      }

  /** Strip casts (re-bucketed sums are cast back to their display type;
    * the cast commutes because the underlying sums are exactly equal). */
  private def stripCast(e: Expression): Expression = e match {
    case c: Cast => stripCast(c.child)
    case other => other
  }

  private def aggOk(ne: NamedExpression, gs: Seq[Expression]): Boolean =
    ne match {
      case a: AttributeReference => true // grouping column passthrough
      case Alias(child, _) =>
        val stripped = stripCast(child)
        gs.exists(_.semanticEquals(stripped)) || (stripped match {
          case ae: AggregateExpression =>
            !ae.isDistinct && ae.filter.isEmpty && (ae.aggregateFunction match {
              case Sum(attr: AttributeReference, _) =>
                // only EXACT types compose across grains — double
                // addition is non-associative, so sum-of-day-sums can
                // differ in the last ulps from sum-over-hours
                attr.name != "bucket_us" && (attr.dataType match {
                  case org.apache.spark.sql.types.LongType |
                       org.apache.spark.sql.types.IntegerType |
                       (_: org.apache.spark.sql.types.DecimalType) => true
                  case _ => false
                })
              case _ => false
            })
          case _ => false
        })
      case _ => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (mappings.isEmpty) return plan
    plan.transform {
      case agg @ Aggregate(gs, aes, child0, _) =>
        // the optimizer's PullOutGroupingExpressions has already hoisted
        // non-trivial grouping keys into a child Project as
        // `TimeBucket(...) AS _groupingexpression` — inline those aliases
        // back so the match sees the original shape
        val (aliasMap, child) = child0 match {
          case Project(list, c) if list.forall {
                case _: AttributeReference => true
                case Alias(_: TimeBucket, _) => true
                case _ => false
              } =>
            (list.collect {
              case a @ Alias(tb: TimeBucket, _) => a.exprId -> (tb: Expression)
            }.toMap, c)
          case c =>
            (Map.empty[org.apache.spark.sql.catalyst.expressions.ExprId, Expression], c)
        }
        def inline(e: Expression): Expression = e.transform {
          case a: AttributeReference if aliasMap.contains(a.exprId) =>
            aliasMap(a.exprId)
        }
        val gsIn = gs.map(inline)
        val aesIn: Seq[NamedExpression] = aes.map {
          case attr: AttributeReference if aliasMap.contains(attr.exprId) =>
            Alias(aliasMap(attr.exprId), attr.name)(exprId = attr.exprId)
          case a: Alias =>
            a.withNewChildren(Seq(inline(a.child))).asInstanceOf[NamedExpression]
          case other => other
        }
        (for {
          root <- relationRoot(child)
          target <- Option(mappings.get(root))
          if groupingOk(gsIn, target.dims) && aesIn.forall(aggOk(_, gsIn))
          session <- SparkSession.getActiveSession
          dayPlan = session.read.parquet(target.dayPath).queryExecution.analyzed
          attrMap <- {
            val m = child.output.flatMap { a =>
              dayPlan.output.find(d => d.name == a.name && d.dataType == a.dataType)
                .map(a.exprId -> _)
            }.toMap
            val referenced = (gsIn ++ aesIn).flatMap(_.collect {
              case a: AttributeReference => a
            })
            // every referenced hour attribute must have a day counterpart
            if (referenced.forall(a => m.contains(a.exprId))) Some(m) else None
          }
        } yield {
          logInfo(s"RollupRewrite: answering day-grain aggregate over $root " +
            "from the registered day rollup")
          def remap(e: Expression): Expression = e.transform {
            case a: AttributeReference => attrMap.getOrElse(a.exprId, a)
          }
          agg.copy(
            groupingExpressions = gsIn.map(remap),
            aggregateExpressions = aesIn.map {
              // a bare passthrough column must KEEP its output exprId —
              // downstream operators reference it — so alias the day
              // attribute back to the original id
              case attr: AttributeReference if attrMap.contains(attr.exprId) =>
                Alias(attrMap(attr.exprId), attr.name)(exprId = attr.exprId)
              case other => remap(other).asInstanceOf[NamedExpression]
            },
            child = dayPlan)
        }).getOrElse(agg)
    }
  }
}
