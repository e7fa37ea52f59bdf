package graft.route

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.model.Model

/** Routing predicates (SURVEY.md §2.2, F1-F4).
  *
  * EventBridge rules in the reference are declarative conjunctive equality
  * predicates over envelope fields — the pipeline's only WHERE clauses.
  * Pattern semantics (stack.ts:203-212, 243-252, 276-281): each key is an
  * IN-list of allowed values; keys AND together; nesting descends into the
  * JSON detail. The reference only ever uses single-element exact matches.
  *
  * Spark-first: each rule is a reusable `Column` predicate. Catalyst pushes
  * these into the scan (`PushDownPredicates`), which is the moral
  * equivalent of the bus filtering events *before* invoking a consumer.
  */
object Rules {

  /** General EventBridge-style pattern: every field is an IN-list; fields
    * conjoin. `Map(field -> allowedValues)`; nested fields use dotted paths
    * (e.g. "detail.status"), mirroring pattern nesting into `detail`.
    */
  def pattern(fields: Map[String, Seq[String]]): Column =
    fields
      .map { case (path, allowed) =>
        if (allowed.size == 1) col(path) === allowed.head
        else col(path).isin(allowed: _*)
      }
      .reduceOption(_ && _)
      .getOrElse(lit(true))

  /** F1 `transformRule` (stack.ts:203-212): route extraction events to the
    * transform stage.
    */
  val transformRule: Column = pattern(Map(
    "source"        -> Seq(Model.Source),
    "detailType"    -> Seq(Model.DetailTypes.Extraction),
    "detail.status" -> Seq(Model.Status.Extracted)))

  /** F2 `loadRule` (stack.ts:243-252): route transformed events to load. */
  val loadRule: Column = pattern(Map(
    "source"        -> Seq(Model.Source),
    "detailType"    -> Seq(Model.DetailTypes.Transform),
    "detail.status" -> Seq(Model.Status.Transformed)))

  /** F3 `observeRule` (stack.ts:276-281): catch-all audit tap — matches
    * every event on the bus from this pipeline.
    */
  val observeRule: Column = col("source") === Model.Source

  /** F4 not-an-s3-event guard (extract/s3SqsEventConsumer.ts:144-148,
    * 189-191): null-safe presence check on required nested fields.
    */
  def presenceGuard(requiredPaths: Seq[String]): Column =
    requiredPaths.map(col(_).isNotNull).reduce(_ && _)

  /** Multicast routing (SURVEY.md §2.2): one bus, many rules; an event may
    * match several rules (every stage event also matches the observe rule).
    * NOT an exclusive split — each branch filters the shared source
    * independently, exactly like N EventBridge rules on one bus.
    */
  def multicast(bus: DataFrame, rules: Map[String, Column]): Map[String, DataFrame] =
    rules.map { case (name, predicate) => name -> bus.filter(predicate) }
}
