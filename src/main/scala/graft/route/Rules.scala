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

  // ────────────────────────────── general EventBridge matchers ──
  // The reference only ever uses single-element exact matches, but the
  // EventBridge pattern language (public AWS event-pattern docs) also has
  // prefix / suffix / anything-but / numeric-range / exists / wildcard
  // matchers. Modeled as a small ADT so rules stay declarative Columns
  // that Catalyst pushes into the scan.

  /** One matcher for one field. EventBridge semantics: the matchers given
    * for a field OR together; fields AND together (see [[matches]]).
    */
  sealed trait Match
  object Match {
    /** Exact membership: `"field": ["a", "b"]`. */
    final case class AnyOf(values: String*) extends Match
    /** `{"prefix": "..."}`. */
    final case class Prefix(p: String) extends Match
    /** `{"suffix": "..."}`. */
    final case class Suffix(s: String) extends Match
    /** `{"anything-but": [...]}` — present AND not in the list. */
    final case class AnythingBut(values: String*) extends Match
    /** `{"numeric": ["&gt;", 0, "&lt;=", 100]}` — bounds conjoin. Ops:
      * `<`, `<=`, `>`, `>=`, `=`.
      */
    final case class Numeric(bounds: (String, Double)*) extends Match
    /** `{"exists": true|false}`. */
    final case class Exists(present: Boolean) extends Match
    /** `{"wildcard": "a*b"}` — `*` matches any run of characters. */
    final case class Wildcard(pattern: String) extends Match
  }

  private def matchOne(c: Column, m: Match): Column = m match {
    case Match.AnyOf(vs @ _*) =>
      if (vs.size == 1) c === vs.head else c.isin(vs: _*)
    case Match.Prefix(p) => c.startsWith(p)
    case Match.Suffix(s) => c.endsWith(s)
    // anything-but only matches events that HAVE the field (a missing
    // field matches no value-based pattern in EventBridge)
    case Match.AnythingBut(vs @ _*) => c.isNotNull && !c.isin(vs: _*)
    case Match.Numeric(bounds @ _*) =>
      bounds.map {
        case ("<", v)  => c.cast("double") < v
        case ("<=", v) => c.cast("double") <= v
        case (">", v)  => c.cast("double") > v
        case (">=", v) => c.cast("double") >= v
        case ("=", v)  => c.cast("double") === v
        case (op, _)   => throw new IllegalArgumentException(s"bad numeric op: $op")
      }.reduce(_ && _)
    case Match.Exists(true)  => c.isNotNull
    case Match.Exists(false) => c.isNull
    case Match.Wildcard(p) =>
      // quote every literal segment, splice '.*' where the '*'s were
      val rx = p.split("\\*", -1).map(java.util.regex.Pattern.quote).mkString(".*")
      c.rlike("^" + rx + "$")
  }

  /** Full pattern matcher: per field, matchers OR; across fields, AND —
    * exactly the EventBridge composition. [[pattern]] remains the
    * exact-match fast path the reference's own rules use.
    */
  def matches(fields: Map[String, Seq[Match]]): Column =
    fields
      .map { case (path, ms) =>
        ms.map(matchOne(col(path), _)).reduceOption(_ || _).getOrElse(lit(true))
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
    // no required paths = nothing to guard (the pattern/matches
    // combinators above use the same reduceOption + neutral default,
    // instead of reduce's opaque empty-collection throw)
    requiredPaths.map(col(_).isNotNull).reduceOption(_ && _).getOrElse(lit(true))

  /** Multicast routing (SURVEY.md §2.2): one bus, many rules; an event may
    * match several rules (every stage event also matches the observe rule).
    * NOT an exclusive split — each branch filters the shared source
    * independently, exactly like N EventBridge rules on one bus.
    */
  def multicast(bus: DataFrame, rules: Map[String, Column]): Map[String, DataFrame] =
    rules.map { case (name, predicate) => name -> bus.filter(predicate) }
}
