package graft.plans

import graft.functions.TopKRows
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Optimizer rule: rewrite the sort-based window top-k idiom
  *
  * {{{ Filter(rnk <= k, Window(rnk := row_number() OVER (PARTITION BY p ORDER BY o), child)) }}}
  *
  * into the bounded-heap aggregate pipeline
  *
  * {{{ Project(restore, Generate(posexplode(top), Aggregate(p, topk_rows(struct(o, payload), k), child))) }}}
  *
  * The window form shuffles EVERY row to its partition's reducer and
  * sorts there just to keep k; the aggregate form partial-aggregates
  * map-side (ObjectHashAggregate), so the exchange carries at most
  * k rows per key per map task — [[graft.functions.TopKRows]]'s scale
  * story applied to every query that spells top-k the window way,
  * without touching the query.
  *
  * The rewrite fires only on the exact conservative pattern:
  *   - a single `row_number()` window expression with the standard
  *     (UnboundedPreceding, CurrentRow) row frame;
  *   - filter `rnk <= lit` / `rnk < lit` (k ≥ 1 after normalization)
  *     directly above the Window, referencing only that rnk;
  *   - partition keys are plain attributes; order keys are Ascending /
  *     Descending with their DEFAULT null ordering;
  *   - every column involved (order keys and carried payload) has an
  *     atomic, heap-comparable type ([[TopKRows]]'s constraint).
  * Anything else is left untouched.
  *
  * Tie semantics: `row_number()` over a non-unique order is already
  * nondeterministic (partition-sort ties break by arrival order); the
  * heap breaks the same ties by the remaining struct fields instead —
  * a DIFFERENT deterministic choice among the window form's admissible
  * outputs. Queries that need hash-stable output (every oracle-checked
  * query in this engine) must order by a unique key anyway, and for
  * them the two forms are bit-identical — re-verified by running the
  * full 200+-query DuckDB sweep with this rule enabled.
  *
  * Install: `spark.sql.extensions=graft.functions.GraftSparkExtensions`
  * (injectOptimizerRule) or at runtime via
  * [[graft.functions.GraftFunctions.installOptimizations]]
  * (`spark.experimental.extraOptimizations` — how the engine's own
  * mains enable it).
  */
object TopKRewrite extends Rule[LogicalPlan] {

  private def comparable(dt: DataType): Boolean = dt match {
    case LongType | IntegerType | ShortType | ByteType | DoubleType | FloatType | StringType |
        BooleanType | DateType | TimestampType | TimestampNTZType =>
      true
    case _: DecimalType => true
    case _              => false
  }

  private def defaultNullOrdering(so: SortOrder): Boolean = (so.direction, so.nullOrdering) match {
    case (Ascending, NullsFirst) => true
    case (Descending, NullsLast) => true
    case _                       => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, w: Window) =>
      rewrite(cond, w).getOrElse(f)
  }

  private def rewrite(cond: Expression, w: Window): Option[LogicalPlan] = {
    // single row_number() window expression with the standard frame
    val (rnkAlias, spec) = w.windowExpressions match {
      case Seq(a @ Alias(WindowExpression(RowNumber(), s: WindowSpecDefinition), _)) => (a, s)
      case _                                                                         => return None
    }
    spec.frameSpecification match {
      case SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow) => ()
      case _                                                              => return None
    }
    val rnkAttr = rnkAlias.toAttribute
    // filter is rnk <= k / rnk < k with a literal bound, nothing else;
    // the common `.cast("long")` idiom arrives here as Cast(rnk) <= 8L
    // after predicate pushdown substitutes the projection alias —
    // widening int -> long never changes the comparison, so strip it
    def rnkRef(e: Expression): Boolean = e match {
      case r: AttributeReference                              => r.exprId == rnkAttr.exprId
      case c: Cast if c.dataType == LongType                  => rnkRef(c.child)
      case _                                                  => false
    }
    def bound(e: Expression): Option[Long] = e match {
      case Literal(v: Int, IntegerType) => Some(v.toLong)
      case Literal(v: Long, LongType)   => Some(v)
      case _                            => None
    }
    val k = cond match {
      case LessThanOrEqual(l, r) if rnkRef(l) => bound(r).getOrElse(return None)
      case LessThan(l, r) if rnkRef(l)        => bound(r).map(_ - 1).getOrElse(return None)
      case _                                  => return None
    }
    // heap memory per (key × map task) is O(k): stay a clear win and
    // bounded — past this, keep the sort-based window plan
    if (k < 1L || k > 1024L) return None
    // partition keys: plain attributes; order: default null ordering,
    // deterministic expressions
    val partAttrs = spec.partitionSpec.map {
      case a: AttributeReference => a
      case _                     => return None
    }
    val orders = spec.orderSpec
    if (orders.isEmpty || !orders.forall(o => defaultNullOrdering(o) && o.child.deterministic))
      return None
    if (!orders.forall(o => comparable(o.child.dataType))) return None

    // Spark's InferWindowGroupLimit has usually already inserted a
    // WindowGroupLimit below the Window by the time extraOptimizations
    // run; the bounded heap subsumes that per-partition pre-limit, so
    // strip it when it belongs to this same window (leaving it would
    // keep a redundant per-partition sort under the aggregate)
    val child = w.child match {
      case wgl: WindowGroupLimit
          if wgl.partitionSpec == spec.partitionSpec && wgl.orderSpec == spec.orderSpec &&
            wgl.limit >= k =>
        wgl.child
      case other => other
    }
    val partSet = AttributeSet(partAttrs)
    // payload = child columns not restored from the grouping keys; all
    // must ride in the struct, so all must be heap-comparable
    val payload = child.output.filterNot(partSet.contains)
    if (!payload.forall(a => comparable(a.dataType))) return None
    if (payload.exists(a => a.nullable && orders.isEmpty)) () // struct handles nulls per-field

    // struct = order expressions first (heap comparison order), then
    // any payload attrs not already present as a plain order key
    val orderChildren = orders.map(_.child)
    val orderAttrIds = orderChildren.collect { case a: AttributeReference => a.exprId }.toSet
    val extraPayload = payload.filterNot(a => orderAttrIds.contains(a.exprId))
    val structFields: Seq[Expression] = orderChildren ++ extraPayload
    val descFlags = orders.map(_.direction == Descending) ++ Seq.fill(extraPayload.size)(false)

    val item = CreateStruct(
      structFields.zipWithIndex.map { case (e, i) =>
        Alias(e, s"f$i")()
      }
    )
    val topAgg =
      Alias(TopKRows(item, k.toInt, descFlags).toAggregateExpression(), "graft_topk_buf")()
    val agg = Aggregate(partAttrs, partAttrs ++ Seq(topAgg), child)

    val bufAttr = topAgg.toAttribute
    val elemType = item.dataType.asInstanceOf[StructType]
    val posAttr = AttributeReference("graft_topk_pos", IntegerType, nullable = false)()
    val colAttr = AttributeReference("graft_topk_item", elemType, nullable = false)()
    val gen = Generate(
      PosExplode(bufAttr),
      unrequiredChildIndex = Nil,
      outer = false,
      qualifier = None,
      generatorOutput = Seq(posAttr, colAttr),
      agg
    )

    // restore the original output: every child attr under its ORIGINAL
    // exprId (payload from the struct, partition keys pass through),
    // plus rnk = pos + 1 under the window alias's exprId
    val fieldIndex: Map[ExprId, Int] = structFields.zipWithIndex.collect {
      case (a: AttributeReference, i) => a.exprId -> i
    }.toMap
    val restored: Seq[NamedExpression] = w.output.map { out =>
      if (out.exprId == rnkAttr.exprId) {
        Alias(Add(posAttr, Literal(1)), rnkAlias.name)(exprId = rnkAttr.exprId)
      } else if (partSet.contains(out)) {
        out
      } else {
        fieldIndex.get(out.exprId) match {
          case Some(i) =>
            Alias(GetStructField(colAttr, i, Some(s"f$i")), out.name)(exprId = out.exprId)
          case None => return None // output attr we cannot restore — bail
        }
      }
    }
    Some(Project(restored, gen))
  }
}
