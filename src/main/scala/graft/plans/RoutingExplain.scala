package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.planning.PhysicalOperation
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}

/** "Why wasn't my materialized view used?" — the diagnosis surface of
  * the summary router. [[SummaryRewrite]] fails CLOSED by design:
  * any unmapped shape silently leaves the query on the raw table,
  * which is correct and, at 100 TB, invisible — a dashboard goes 100×
  * slower and nothing says why. `RoutingExplain.explain(df)` re-plans
  * the query with the router disabled, finds every aggregate the
  * router would consider, and reports per aggregate either the
  * summary it routes onto (fresh, or delta-compensated with the
  * appended-file count) or the FIRST gate that refused it, named
  * concretely: the unregistered source, the partial build, the
  * in-place source drift, the non-grain grouping column, the
  * undeclared measure, the double AVG, the Welford stddev, the
  * DISTINCT/FILTER shape. The warehouse parallel is BigQuery's
  * materialized-view "rejected reason" — fail-closed routing is only
  * operable when the refusal is one call away from a name.
  *
  * Read-only: no conf survives the call, nothing is registered or
  * touched; the report is built from the same gates the rule runs.
  */
object RoutingExplain {

  /** One aggregate's verdict: where it sits, whether it routes, and
    * the reasons when it does not.
    */
  final case class Verdict(
      over: String,
      routes: Boolean,
      summary: Option[String],
      deltaFiles: Int,
      reasons: Seq[String],
      deletedFiles: Int = 0) {
    def render: String = {
      val head = if (routes)
        s"ROUTES onto '${summary.get}'" +
          (if (deltaFiles > 0 && deletedFiles > 0)
             s" (mixed-compensated, -$deletedFiles/+$deltaFiles " +
               "file(s) — fold with Summaries.refreshDelta if all " +
               "measures are invertible, else re-create)"
           else if (deletedFiles > 0)
             s" (delete-compensated, $deletedFiles removed file(s) — " +
               "fold with Summaries.refreshDelta if all measures are " +
               "invertible, else re-create)"
           else if (deltaFiles > 0)
             s" (delta-compensated, $deltaFiles appended file(s) — " +
               "fold with Summaries.refreshDelta)"
           else " (fresh)")
      else "stays RAW"
      (s"aggregate over $over: $head" +:
        reasons.map(r => s"  - $r")).mkString("\n")
    }
  }

  /** Human-readable routing report for every aggregate in `df` the
    * router would consider (aggregates over non-file sources are out
    * of scope and unlisted).
    */
  def explain(df: DataFrame): String = {
    val vs = verdicts(df)
    if (vs.isEmpty)
      "no summary-routable aggregates found (the router considers " +
        "Aggregate over a file scan, an inner equi-join of file " +
        "scans, or a rollup/cube over a file scan)"
    else vs.map(_.render).mkString("\n")
  }

  /** The structured form of [[explain]]. */
  def verdicts(df: DataFrame): Seq[Verdict] = {
    val spark = df.sparkSession
    if (!spark.conf.get(SummaryRewrite.ConfKey, "true").toBoolean)
      return Seq(Verdict("(query)", routes = false, None, 0,
        Seq(s"the router is disabled (${SummaryRewrite.ConfKey}=false)")))
    // re-optimize with the router OFF so the aggregates the rule
    // would see (alias-inlined, constant-folded, pushed-down shapes)
    // are present instead of already rewritten away — via the
    // thread-confined bypass, so a query planned concurrently on the
    // same session still routes (a session-conf flip here would leak)
    val unrouted: LogicalPlan = SummaryRewrite.withBypass {
      org.apache.spark.sql.GraftColumnBridge
        .ofPlan(spark, df.queryExecution.analyzed)
        .queryExecution.optimizedPlan
    }
    unrouted.collect {
      case agg: Aggregate => diagnose(agg)
    }.flatten
  }

  private def diagnose(agg: Aggregate): Option[Verdict] = {
    // what the rule would actually do settles "routes" — the reason
    // walk below only runs for the refusals
    val routed = SummaryRewrite.tryRewrite(agg)
    agg.child match {
      // projects may carry Aliases (derived grouping keys like
      // date_trunc(day) AS mo) — the rule inlines them, and so do
      // verdictFor's cost lines and reasonsFor's gate walk, so the
      // diagnosis covers the same aggregates the rewrite does
      case PhysicalOperation(projects, filters,
          lr: org.apache.spark.sql.execution.datasources.LogicalRelation) =>
        Summaries.pathOf(lr).map { path =>
          verdictFor(agg, routed, path, Summaries.rawLookupAll(path),
            lr.output, filters, projects, AttributeSet.empty)
        }
      case PhysicalOperation(projects, topFilters,
          j: org.apache.spark.sql.catalyst.plans.logical.Join) =>
        SummaryRewrite.collectJoinTree(j).map {
          case (leaves, conds, sideFilters) =>
            val paths = leaves.map(_._1)
            val rawOut = leaves.flatMap(_._2.output)
            Summaries.resolveEdges(conds, leaves) match {
              case None =>
                Verdict(paths.mkString(" ⋈ "), routes = false, None, 0,
                  Seq("the join is not a connected tree of cross-leaf " +
                    "column equalities (non-equi or disconnected " +
                    "conditions cannot key a summary)"))
              case Some((edges, _)) if paths.distinct.length != paths.length =>
                Verdict(paths.mkString(" ⋈ "), routes = false, None, 0,
                  Seq("self-joins are out of summary scope"))
              case Some((edges, keyAttrs)) =>
                val key = Summaries.joinSourceKey(paths, edges)
                // IS NOT NULL on join keys is implied by the inner
                // join — the rule drops them, so the diagnosis must
                // not report them as non-grain filters
                val fs = (topFilters ++ sideFilters).filterNot {
                  case IsNotNull(ar: AttributeReference) =>
                    keyAttrs.contains(ar)
                  case _ => false
                }
                verdictFor(agg, routed, paths.mkString(" ⋈ "),
                  Summaries.rawLookupAll(key), rawOut, fs, projects,
                  SummaryRewrite.unsafeDupAttrs(rawOut, conds))
            }
        }
      case PhysicalOperation(_, _,
          ex: org.apache.spark.sql.catalyst.plans.logical.Expand) =>
        // rollup/cube: the Expand substrate has its own gate set;
        // report route/refusal without per-gate attribution
        ex.child match {
          case PhysicalOperation(_, _,
              lr: org.apache.spark.sql.execution.datasources
                .LogicalRelation) =>
            Summaries.pathOf(lr).map { path =>
              val specs = Summaries.rawLookupAll(path)
              if (routed.isDefined)
                Verdict(s"rollup/cube of $path", routes = true,
                  chosenSpec(routed.get, specs).map(_.name)
                    .orElse(specs.headOption.map(_.name)), 0, Nil)
              else Verdict(s"rollup/cube of $path", routes = false, None, 0,
                if (specs.isEmpty)
                  Seq(s"no summary registered for $path")
                else specs.flatMap(s => registrationReasons(s)
                  .map(r => s"[${s.name}] $r")) :+
                  ("the rollup/cube gates refused (grouping-id, " +
                    "grain, or measure mapping — see the " +
                    "SummaryRewrite.rewriteRollup contract)"))
            }
          case _ => None
        }
      case _ => None
    }
  }

  /** Reasons attributable to the registration/freshness state alone
    * (empty when the spec is routable and fresh or compensable).
    */
  private def registrationReasons(spec: Summaries.Spec): Seq[String] = {
    val b = Seq.newBuilder[String]
    if (!spec.routable)
      b += s"summary '${spec.name}' is a PARTIAL build — unroutable " +
        "until a refresh(complete = true) folds in the rest"
    else if (!Summaries.isFresh(spec)) {
      Summaries.deltaProbe(spec)
        .orElse(Summaries.deleteProbe(spec))
        .orElse(Summaries.mixedProbe(spec).map(_._1)) match {
        case Some(_) => // compensable (append/delete/mixed): no refusal
        case None =>
          val deltaOff = org.apache.spark.sql.SparkSession.getActiveSession
            .exists(s => !s.conf.get(Summaries.DeltaReadKey, "true")
              .toBoolean)
          if (deltaOff)
            b += s"source of '${spec.name}' changed and the delta " +
              s"read is disabled (${Summaries.DeltaReadKey}=false) — " +
              "refresh or re-create to resume routing"
          else if (spec.builtFiles.isEmpty)
            b += s"source of '${spec.name}' changed and the spec " +
              "predates delta reads (no built-file listing) — " +
              "re-create to record one"
          else if (spec.fileCubePath.isEmpty && spec.cubeNote.nonEmpty)
            b += s"source of '${spec.name}' changed and its file " +
              s"cube is absent (${spec.cubeNote}) — deletes cannot " +
              "compensate; routing is suspended until a refresh or " +
              "re-create"
          else
            b += s"source of '${spec.name}' drifted IN PLACE " +
              "(a built file was rewritten, files were both added " +
              "and removed in one window, a file landed outside the " +
              "registered leaves, or a delete has no cube sidecar " +
              "to subtract) — routing is suspended; rebless after a " +
              "compaction, refresh/re-create after a data change"
      }
    }
    b.result()
  }

  private def fnName(ae: AggregateExpression): String =
    ae.aggregateFunction.prettyName

  /** The rewrite's projection-alias inlining, shared by the cost
    * lines and the gate walk so both always see the same expressions
    * the router ranked/gated on.
    */
  private def inliner(
      projects: Seq[NamedExpression]): Expression => Expression = {
    val aliasMap = projects.collect {
      case a: Alias => a.exprId -> a.child
    }.toMap
    e => e.transformUp {
      case ar: AttributeReference if aliasMap.contains(ar.exprId) =>
        aliasMap(ar.exprId)
    }
  }

  /** The expression-level gate walk for a single-table or joined
    * aggregate whose registration exists.
    */
  /** Which registered candidate a ROUTED plan actually reads — by
    * matching the routed plan's relations against each candidate's
    * summary directory (several summaries may serve one source).
    */
  private def chosenSpec(routed: Aggregate,
      specs: Seq[Summaries.Spec]): Option[Summaries.Spec] = {
    val paths = routed.collect {
      case lr: org.apache.spark.sql.execution.datasources
            .LogicalRelation =>
        Summaries.pathOf(lr)
    }.flatten
    specs.find(s => Option(s.summaryPath)
      .exists(p => paths.contains(Summaries.canon(p))))
  }

  private def verdictFor(agg: Aggregate, routed: Option[Aggregate],
      over: String, specs: Seq[Summaries.Spec],
      rawOut: Seq[Attribute], filters0: Seq[Expression],
      projects: Seq[NamedExpression],
      unsafeDups: AttributeSet): Verdict = {
    if (routed.isDefined) {
      val chosen = chosenSpec(routed.get, specs)
      val stale = chosen.filterNot(Summaries.isFresh)
      val delta = stale.flatMap(Summaries.deltaProbe).map(_.length)
      val deleted = stale.flatMap(Summaries.deleteProbe).map(_.length)
      val mixed = stale.flatMap(Summaries.mixedProbe)
      // with several candidates on the source, show each one's
      // effective cost (sel × bytes + compensation) — the number the
      // best-match ranking compared, so a surprising choice is
      // diagnosable from the same surface that names it. Selectivity
      // is estimated over the ALIAS-INLINED filters, exactly what
      // rankBySelectivity saw — a grain predicate behind a projection
      // alias must not display as selectivity 1.0
      lazy val inlined = filters0.map(inliner(projects))
      val costLines =
        if (specs.length < 2) Nil
        else specs.map { s0 =>
          // cost the spec as the ROUTER sees it: a stale candidate
          // carries its measured compensation-scan bytes
          val s = Summaries.routedViewFor(s0).getOrElse(s0)
          val sel = Summaries.estimateSelectivity(s, inlined)
          val cost =
            if (s.bytes >= 0) (sel * s.bytes).toLong + s.compBytes
            else -1L
          s"candidate '${s.name}': est cost $cost bytes" +
            (if (s.compBytes > 0)
               s" (incl ${s.compBytes} compensation-scan bytes)"
             else "") +
            f" at selectivity $sel%.4f"
        }
      return Verdict(over, routes = true,
        chosen.map(_.name).orElse(specs.headOption.map(_.name)),
        delta.orElse(mixed.map(_._2.length)).getOrElse(0), costLines,
        deletedFiles =
          deleted.orElse(mixed.map(_._1.length)).getOrElse(0))
    }
    if (specs.isEmpty)
      return Verdict(over, routes = false, None, 0, Seq(
        s"no summary registered for $over" + {
          val ks = Summaries.registeredKeys
          if (ks.isEmpty) " (none registered at all)"
          else s" (registered: ${ks.mkString("; ")})"
        }))
    // a refusal names every candidate's gates (several summaries may
    // sit on the source; each refused for its own reason)
    val perSpec = specs.map(s => s.name -> reasonsFor(s, agg, rawOut,
      filters0, projects, unsafeDups))
    val reasons =
      if (perSpec.length == 1) perSpec.head._2
      else perSpec.flatMap { case (n, rs) => rs.map(r => s"[$n] $r") }
    Verdict(over, routes = false, Some(specs.head.name), 0, reasons)
  }

  /** The per-candidate gate walk (registration state, then the
    * expression gates).
    */
  private def reasonsFor(spec: Summaries.Spec, agg: Aggregate,
      rawOut: Seq[Attribute], filters0: Seq[Expression],
      projects: Seq[NamedExpression],
      unsafeDups: AttributeSet): Seq[String] = {
    val regReasons = registrationReasons(spec)
    if (regReasons.nonEmpty) return regReasons
    // expression gates — mirror the rewrite's alias inlining so the
    // named columns are the query's own
    val inline = inliner(projects)
    val filters = filters0.map(inline)
    val groupings = agg.groupingExpressions.map(inline)
    val aggExprs = agg.aggregateExpressions.map(e => inline(e))
    val grain = spec.grain.toSet
    val b = Seq.newBuilder[String]
    val nonGrain = (filters ++ groupings).flatMap(_.references)
      .filterNot(a => grain.contains(a.name)).map(_.name).distinct
    if (nonGrain.nonEmpty)
      b += s"grouping/filter references non-grain column(s): " +
        s"${nonGrain.mkString(", ")} (grain is ${spec.grain.mkString(", ")})"
    if (!(filters ++ groupings ++ aggExprs).forall(_.deterministic))
      b += "a non-deterministic expression (rand(), monotonic ids…) " +
        "would act per grain row instead of per raw row"
    val dupRefs = (filters ++ groupings ++ aggExprs)
      .flatMap(_.references).filter(unsafeDups.contains).map(_.name)
      .distinct
    if (dupRefs.nonEmpty)
      b += s"column name(s) duplicated across join leaves without a " +
        s"join equality: ${dupRefs.mkString(", ")}"
    if (spec.filterSql.nonEmpty &&
        !SummaryRewrite.filterSubsumed(spec, filters, rawOut))
      b += s"summary '${spec.name}' is FILTERED (WHERE " +
        s"${spec.filterSql}) and the query's filters do not imply " +
        "the declaration — add the subsuming predicate or query the " +
        "raw table"
    // per-aggregate-function classification via the real Surgeon —
    // against the spec AS THE ROUTER SEES IT: a delete-compensated
    // candidate serves only its invertible measures, so a min/max/
    // sketch query gets the delete-window reason, not silence
    val deleteComp = !Summaries.isFresh(spec) &&
      (Summaries.deleteProbe(spec).isDefined ||
        Summaries.mixedProbe(spec).isDefined)
    val effSpec =
      if (deleteComp) Summaries.pruneForDeleteView(spec) else spec
    val surgeon = SummaryRewrite.surgeonFor(effSpec, rawOut)
    aggExprs.foreach(_.foreach {
      case ae: AggregateExpression if surgeon.rewriteAgg(ae).isEmpty =>
        b += (if (deleteComp &&
            SummaryRewrite.surgeonFor(spec, rawOut).rewriteAgg(ae)
              .isDefined)
          s"${fnName(ae)} is declared on '${spec.name}' but its " +
            "source is serving DELETE-compensated (files were " +
            "removed): min/max/sketch measures cannot subtract — " +
            "re-create the summary or query count/sum/avg legs"
        else classify(ae, effSpec))
      case _ =>
    })
    val reasons = b.result()
    if (reasons.nonEmpty) reasons
    else Seq("no single gate identified — likely a grain/measure " +
      "reference the summary's columns cannot serve (the rewrite's " +
      "completeness gate)")
  }

  private def classify(ae: AggregateExpression,
      spec: Summaries.Spec): String = {
    val fn = fnName(ae)
    if (ae.filter.isDefined)
      return s"$fn(... ) FILTER (WHERE …) is not routable"
    if (ae.isDistinct)
      return s"$fn(DISTINCT …) routes only when every input is a " +
        "grain column expression"
    ae.aggregateFunction match {
      case a: Average if !a.child.dataType
          .isInstanceOf[org.apache.spark.sql.types.DecimalType] =>
        s"avg over a ${a.child.dataType.simpleString} input cannot " +
          "route (double/integral sums re-order under re-aggregation " +
          "— cast the measure to decimal and declare it)"
      case _: StddevSamp | _: StddevPop | _: VarianceSamp | _: VariancePop =>
        s"$fn uses Spark's double Welford buffer, whose low bits are " +
          "partition-order dependent — use stddev_samp_exact / " +
          "var_samp_exact over a decimal measure with a declared sumsq"
      case s: Sum =>
        Summaries.measureKey(s.child) match {
          case None => s"sum over an unsupported expression shape " +
            s"(only column/cast/literal/arithmetic compose measures)"
          case Some(k) => s"sum measure not declared on " +
            s"'${spec.name}': $k (declare it in sums=… or make the " +
            "input grain-only)"
        }
      case _: Min =>
        s"min measure not declared on '${spec.name}' and its input " +
          "is not grain-only"
      case _: Max =>
        s"max measure not declared on '${spec.name}' and its input " +
          "is not grain-only"
      case _: Percentile =>
        "exact percentile routes only over grain-only inputs with " +
          "unit frequency (declare the value column in the grain — " +
          "the histogram route) — or use quantile_sketch_est over a " +
          "declared quantile-sketch measure for approximate " +
          "percentiles on coarse grains"
      case ap: org.apache.spark.sql.catalyst.expressions.aggregate
            .ApproximatePercentile =>
        val vKey = Summaries.measureKey(ap.child)
        val declared = vKey.exists(k => spec.qsks.keys
          .exists(_.split("§", 2).lift(1).contains(k)))
        val gateOff = org.apache.spark.sql.SparkSession.getActiveSession
          .forall(s => !s.conf.get(
            SummaryRewrite.ApproxPercentileKey, "false").toBoolean)
        if (declared && gateOff)
          s"a quantile-sketch measure on '${spec.name}' matches this " +
            "percentile_approx value expression, but the substitution " +
            s"is gated off — set ${SummaryRewrite.ApproxPercentileKey}" +
            "=true to serve it from the sketch (answers are " +
            "approximate either way, within the sketch's k; the " +
            "accuracy argument is superseded)"
        else if (declared)
          "percentile_approx routes only with a scalar percentage " +
            "literal in (0, 1]"
        else
          s"no quantile-sketch measure on '${spec.name}' matches " +
            "this percentile_approx value expression (declare it in " +
            "qsks=… with the same value expression)"
      case qq: graft.functions.QskQuantile =>
        if (qq.k != spec.qskK)
          s"quantile_sketch_est k=${qq.k} does not match the " +
            s"declared sketch k=${spec.qskK} on '${spec.name}'"
        else
          s"quantile-sketch measure not declared on '${spec.name}' " +
            "for this (priority, value) expression pair (declare it " +
            "in qsks=… with the same two expressions the query uses)"
      case other =>
        s"no summary mapping for ${other.prettyName}"
    }
  }
}
