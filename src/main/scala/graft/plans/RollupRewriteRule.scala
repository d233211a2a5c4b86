package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions.{col, count => fcount, lit, max => fmax, min => fmin, sum => fsum}

/** AGGREGATE NAVIGATION over rollup folios (the materialized-view
  * rewrite classic): a `GROUP BY`/global aggregate whose scan reads
  * EXACTLY a registered rollup folio's manifested batch dirs, and whose
  * aggregates are the mergeable five (count(*) / count(c) / sum(c) /
  * min(c) / max(c) / avg(c)) over tracked value columns grouped by a
  * SUBSET of the rollup keys, is rewritten to re-aggregate the
  * vocab-sized MAINTAINED rollup instead of scanning the history — the
  * 100 TB corpus never moves for a dashboard query.
  *
  * Soundness gates (anything else leaves the plan untouched):
  *  - opt-in per session: `spark.graft.rollup.rewrite=true`;
  *  - the child is the bare (possibly column-pruned) file scan whose
  *    root paths equal the CURRENT manifest's batch dirs exactly — a
  *    filtered scan, a subset of batches, or extra files disable it
  *    (the rollup covers exactly the manifested rows, nothing else);
  *  - no DISTINCT, no FILTER clauses, group keys are plain key columns.
  *
  * Numbers note: the rewrite returns sums from the rollup's EXACT
  * DECIMAL(38,6) partials cast to the original aggregate type — the
  * deterministic value the oracle discipline prescribes. A raw fp scan
  * may differ in the last ulp depending on partitioning; the rewrite's
  * answer is the partition-order-free one (hence opt-in). Scale 6 IS
  * the maintained rollup's resolution contract: double values carrying
  * signal below 1e-6 per row are quantized in the stored partials (a
  * property of appendWithRollup, not of this rule), and DECIMAL source
  * columns finer than scale 6 — where the quantization is provable
  * from the type alone — never rewrite (nor does avg over any decimal
  * column, whose native Spark semantics is exact decimal division).
  *
  * Same (c)-tier machinery as [[AsOfRewriteRule]]: the replacement
  * subtree is built with the DataFrame API, optimized eagerly, and
  * grafted in under a Project that re-aliases onto the ORIGINAL output
  * exprIds, so parent operators rebind seamlessly. */
object RollupRewriteRule extends Rule[LogicalPlan] {

  case class Info(path: String, keys: Set[String], valCols: Set[String])

  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, Info]()

  /** Register a rollup folio for navigation; keys/valCols derive from
    * the STORED rollup schema (no caller mis-declaration possible). */
  def register(spark: SparkSession, path: String): Info = {
    val v = graft.io.Folio.currentVersion(s"$path/meta").getOrElse(
      throw new IllegalArgumentException(s"no rollup published at $path"))
    val cols = spark.read.parquet(s"$path/meta/$v/rollup").schema.map(_.name)
    val vals = cols.filter(_.endsWith("_sum")).map(_.stripSuffix("_sum")).toSet
    val keys = cols.filterNot(c => c == "n_rows" ||
      vals.exists(vc => c == s"${vc}_cnt" || c == s"${vc}_sum" ||
                        c == s"${vc}_min" || c == s"${vc}_max")).toSet
    val info = Info(path, keys, vals)
    registry.put(new java.io.File(path, "batches").getCanonicalPath, info)
    info
  }

  def clear(): Unit = registry.clear()

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (registry.isEmpty ||
        !conf.getConfString("spark.graft.rollup.rewrite", "false").toBoolean) plan
    else plan.transformUp {
      case agg @ Aggregate(groups, aggExprs, child, _) =>
        rewrite(agg, groups, aggExprs, child).getOrElse(agg)
    }
  }

  private def scanInfo(p: LogicalPlan): Option[(Info, String)] = p match {
    case SubqueryAlias(_, c) => scanInfo(c)
    case Project(pl, c) if pl.forall(_.isInstanceOf[AttributeReference]) => scanInfo(c)
    case l: LogicalRelation => l.relation match {
      case fs: HadoopFsRelation =>
        val roots = fs.location.rootPaths
          .map(r => new java.io.File(r.toUri.getPath).getCanonicalFile)
        if (roots.isEmpty) None
        else {
          val parents = roots.map(_.getParentFile.getCanonicalPath).distinct
          if (parents.lengthCompare(1) != 0) None
          else Option(registry.get(parents.head)).flatMap { info =>
            // the scan must cover EXACTLY the live manifest — re-read
            // it now so a concurrent append invalidates the match, and
            // PIN the matched version: the rewrite must read THIS
            // version's rollup, not whatever is current by the time it
            // builds the replacement (a concurrent append between here
            // and there would graft a rollup covering MORE batches than
            // the scan — silently inflated aggregates)
            try {
              val meta = s"${info.path}/meta"
              graft.io.Folio.currentVersion(meta).flatMap { v =>
                val f = new java.io.File(s"$meta/$v", "_MANIFEST")
                val manifested =
                  new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
                    .split("\n").map(_.trim).filter(_.nonEmpty)
                    .map(d => new java.io.File(d).getCanonicalPath).toSet
                if (manifested.nonEmpty &&
                    roots.map(_.getCanonicalPath).toSet == manifested)
                  Some((info, v))
                else None
              }
            } catch { case _: Exception => None }
          }
      }
      case _ => None
    }
    case _ => None
  }

  private def rewrite(agg: Aggregate, groups: Seq[Expression],
                      aggExprs: Seq[NamedExpression],
                      child: LogicalPlan): Option[LogicalPlan] = {
    val (info, pinnedV) = scanInfo(child).getOrElse(return None)
    val groupNames = groups.map {
      case a: AttributeReference if info.keys.contains(a.name) => a.name
      case _ => return None
    }
    // one mergeable rollup column expression per ORIGINAL output slot
    def mapAgg(ae: AggregateExpression): Option[org.apache.spark.sql.Column] = {
      if (ae.isDistinct || ae.filter.isDefined) return None
      // the rollup stores value partials at DECIMAL(38,6): a source
      // column FINER than that (decimal scale > 6) was quantized on
      // append, so its sum/avg from the rollup could differ from the
      // raw scan by far more than an ulp — those columns never rewrite
      def finerThanPartials(dt: org.apache.spark.sql.types.DataType) =
        dt match {
          case d: org.apache.spark.sql.types.DecimalType => d.scale > 6
          case _ => false
        }
      ae.aggregateFunction match {
        case Sum(a: AttributeReference, _)
            if info.valCols.contains(a.name) && !finerThanPartials(a.dataType) =>
          Some(fsum(col(s"${a.name}_sum")).cast(ae.dataType))
        case Min(a: AttributeReference) if info.valCols.contains(a.name) =>
          Some(fmin(col(s"${a.name}_min")).cast(ae.dataType))
        case Max(a: AttributeReference) if info.valCols.contains(a.name) =>
          Some(fmax(col(s"${a.name}_max")).cast(ae.dataType))
        // counts coalesce to 0: a GLOBAL count over an empty rollup
        // (manifested batches with zero rows) must answer 0 like the
        // raw scan would, not sum's empty-input NULL
        case Count(Seq(Literal(1, _))) =>
          Some(org.apache.spark.sql.functions.coalesce(
            fsum(col("n_rows")), lit(0L)).cast(ae.dataType))
        case Count(Seq(a: AttributeReference)) if info.valCols.contains(a.name) =>
          Some(org.apache.spark.sql.functions.coalesce(
            fsum(col(s"${a.name}_cnt")), lit(0L)).cast(ae.dataType))
        case Average(a: AttributeReference, _) if info.valCols.contains(a.name)
            && !a.dataType.isInstanceOf[org.apache.spark.sql.types.DecimalType] =>
          // divide in DOUBLES (a decimal quotient would round at scale
          // 6): exact decimal sum → correctly-rounded double, exact
          // long count → exact double, one IEEE division — the q158
          // rim discipline. DECIMAL source columns never take this
          // branch: Spark's native decimal Average divides exactly in
          // decimal, and this double quotient loses integer units once
          // the exact sum passes 2^53
          Some((fsum(col(s"${a.name}_sum")).cast("double") /
                fsum(col(s"${a.name}_cnt")).cast("double"))
            .cast(ae.dataType))
        case _ => None
      }
    }
    // each output slot is either a group-key passthrough or one
    // mergeable aggregate; anything else leaves the plan untouched
    val slots: Seq[scala.util.Either[String, org.apache.spark.sql.Column]] = aggExprs.map {
      case a: AttributeReference if groupNames.contains(a.name) =>
        scala.util.Left(a.name)
      case Alias(ae: AggregateExpression, _) =>
        scala.util.Right(mapAgg(ae).getOrElse(return None))
      case _ => return None
    }
    val aggCols = slots.zipWithIndex.collect {
      case (scala.util.Right(c), i) => c.as(s"__m$i") }
    if (aggCols.isEmpty) return None // bare DISTINCT-shaped aggregate
    val spark = SparkSession.active
    // the version scanInfo MATCHED, never re-resolved (TOCTOU guard);
    // a vacuumed pin falls back to no rewrite
    val ru = try spark.read.parquet(s"${info.path}/meta/$pinnedV/rollup")
             catch { case _: Exception => return None }
    val grouped =
      if (groupNames.isEmpty) ru.agg(aggCols.head, aggCols.tail: _*)
      else ru.groupBy(groupNames.distinct.map(col): _*)
        .agg(aggCols.head, aggCols.tail: _*)
    val positional = grouped
      .select(slots.zipWithIndex.map {
        case (scala.util.Left(k), _)  => col(k)
        case (scala.util.Right(_), i) => col(s"__m$i")
      }: _*)
      .toDF(aggExprs.indices.map(i => s"__c$i"): _*)
    val newPlan = positional.queryExecution.optimizedPlan
    if (newPlan.output.lengthCompare(aggExprs.length) != 0) return None
    // types must line up exactly or parents would miscompile
    if (agg.output.zip(newPlan.output).exists { case (o, n) => o.dataType != n.dataType })
      return None
    Some(Project(agg.output.zip(newPlan.output).map { case (o, n) =>
      Alias(n, o.name)(exprId = o.exprId, qualifier = o.qualifier)
    }, newPlan))
  }
}
