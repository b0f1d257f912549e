package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.DateTimeUtils
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.{DateType, TimestampNTZType, TimestampType}

/** Generated-column partition-predicate inference: the optimizer rule
  * that makes a DATE-partitioned layout prune on the TIMESTAMP
  * predicates queries actually write.
  *
  * The problem it solves: the time-series serving layout
  * (`graft.storage.Layout.partitionedEvents`) partitions by a derived
  * column `ts_date = to_date(ts)`, because a date is the right
  * directory granularity at 100 TB (one directory per day; a
  * high-cardinality partition column is death by small files). But
  * queries filter on `ts` — `ts >= TIMESTAMP '2024-01-08'` — and Spark
  * does not derive `ts_date >= DATE '2024-01-08'` from it on its own,
  * so the scan would list and read every partition despite the layout.
  * This rule closes that gap, the same move engines with generated
  * columns make (the lakehouse "partition predicate derivation"
  * pattern).
  *
  * Mechanics: for a `Filter` directly above a file-source relation
  * (predicate pushdown has already run inside the same fixed-point
  * batch, so pushed filters sit in exactly this shape) whose partition
  * schema contains a DateType column named `<c>_date` for a timestamp
  * column `c` in the relation output — the NAMING CONVENTION the layout
  * writer guarantees — every conjunct comparing `c` against a timestamp
  * literal yields a derived conjunct on `<c>_date`:
  *
  *   ts >= L, ts > L       →  ts_date >= date(L)
  *   ts <= U               →  ts_date <= date(U)
  *   ts < U                →  ts_date <= date(U), SHARPENED to date(U)-1
  *                            when U is an exact midnight — the universal
  *                            half-open-range spelling lists no trailing
  *                            empty directory
  *   ts = V, ts <=> V      →  ts_date = date(V)
  *   ts IN (t1..tn)        →  ts_date IN (their days)  (In and InSet forms)
  *   to_date(ts) IN (d..)  →  ts_date IN (d..)         (EXACT; gated on a
  *                            UTC-zoned cast of TimestampType or any cast
  *                            of NTZ. The COMPARISON cast spellings need no
  *                            case here: Spark's own cast-unwrap lowers
  *                            `to_date(ts) op D` to half-open ts ranges
  *                            before this rule, and the midnight-sharp
  *                            upper bound recovers exactness — a cast
  *                            equality prunes to exactly one directory)
  *   l OR r                →  derive(l) OR derive(r)   (both sides or nothing)
  *   l AND r               →  whatever of derive(l)/derive(r) exists
  *
  * All derivations are IMPLICATION-PRESERVING (day truncation is
  * monotone non-decreasing; a strict bound widens to the inclusive day
  * except at the exact-midnight boundary, where the sharp form is still
  * implied), so the derived predicate can never drop a qualifying row —
  * it only lets `FileSourceStrategy` classify it as a partition filter
  * and skip whole directories at listing time. Day conversion is the
  * UTC calendar day on BOTH timestamp flavors — the `<col>_date`
  * contract `graft.storage.Layout.utcDate` pins on the write side.
  * Session-tz conversion on either side would be worse than no
  * pruning: a writer-UTC/reader-PST pair's off-by-one-day bounds
  * silently DROP qualifying rows. With both sides pinned, any session
  * time zone writes and prunes consistently (spec: the same fixture
  * prunes correctly under a Pacific-time session). For TimestampNTZ
  * the wall-clock micros ARE the day basis (matching `to_date` on NTZ,
  * which is tz-free).
  *
  * The rule is idempotent — a derived conjunct that is already present
  * (semantically) is not re-added — so it is safe in a fixed-point
  * batch, whether injected via `GraftExtensions` (operator-optimization
  * rules) or appended at runtime to `spark.experimental
  * .extraOptimizations` for harness-owned sessions.
  *
  * PROVENANCE GATE: the naming convention alone is NOT proof of the
  * UTC-day contract. An external table partitioned by session-tz
  * `to_date(ts)` — the common lakehouse idiom — read under a non-UTC
  * session would get UTC-day bounds derived against session-tz
  * directories and silently DROP qualifying rows (an LA-session row at
  * 23:00 lands in the prior day's directory). So the rule fires only on
  * relations whose every root path carries the
  * [[graft.storage.Layout.UtcDaysMarker]] provenance marker — written
  * by every graft layout/ingest path, and assertable for a user's own
  * contract-honoring table via [[graft.storage.Layout.markUtcDays]] —
  * or when the session opts into trusting the bare convention with
  * [[PartitionDateInference.TrustConventionKey]]. Positive marker
  * checks are cached per root path (a marker never disappears while a
  * layout is live); negative checks re-stat, so marking a path takes
  * effect on the next query without session surgery.
  */
object PartitionDateInference extends Rule[LogicalPlan] with PredicateHelper {

  /** Session conf: `true` trusts the `<c>_date` naming convention with
    * no provenance marker — only safe when every such table in the
    * session honors the UTC-day write contract. Default `false`. */
  val TrustConventionKey = "spark.graft.layout.inference.trustConvention"

  /** root-path → millis of the last SUCCESSFUL marker stat, positives
    * only (a negative can become positive when `seal`/`markUtcDays`
    * runs later in the JVM, so negatives always re-stat). */
  private val markerCache =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  /** Conf key overriding [[markerRevalidateMs]] per deployment: the
    * positive-marker cache window IS the pruning trust bound — a marked
    * directory replaced at the same path by a non-contract writer keeps
    * being pruned for at most this long. The 5-minute default trades
    * one stat per root per window against that staleness; a deployment
    * whose directories are rewritten by foreign jobs can tighten it
    * (ms), one on a high-latency object store can widen it. */
  val MarkerRevalidateKey = "spark.graft.pruning.markerRevalidateMs"

  /** Positive cache entries are re-verified after this long: a marked
    * directory deleted and recreated at the same path by a NON-contract
    * writer in the same JVM must stop being pruned — forever-cached
    * positives would keep deriving bounds against session-tz
    * directories, the exact silent-row-drop the gate exists to prevent.
    * The window bounds the staleness at one cheap stat per root per
    * window, instead of one per query. Default for
    * [[MarkerRevalidateKey]]; `private[graft] var` so the spec can pin
    * it to 0 and prove the revocation path. */
  @volatile private[graft] var markerRevalidateMs: Long = 5 * 60 * 1000L

  private def trusted(fs: HadoopFsRelation): Boolean = {
    val roots = fs.location.rootPaths
    val now = System.currentTimeMillis
    val window = fs.sparkSession.conf.getOption(MarkerRevalidateKey)
      .map(_.toLong).getOrElse(markerRevalidateMs)
    roots.nonEmpty && roots.forall { root =>
      val key = root.toString
      val verifiedAt = markerCache.get(key)
      (verifiedAt != null && now - verifiedAt < window) || {
        val ok =
          try {
            val p = new org.apache.hadoop.fs.Path(root,
              graft.storage.Layout.UtcDaysMarker)
            p.getFileSystem(fs.sparkSession.sparkContext.hadoopConfiguration)
              .exists(p)
          } catch { case scala.util.control.NonFatal(_) => false }
        if (ok) markerCache.put(key, now) else markerCache.remove(key)
        ok
      }
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, rel: LogicalRelation) =>
      rel.relation match {
        case fs: HadoopFsRelation if fs.partitionSchema.nonEmpty =>
          val derived = inferred(cond, rel.output, fs)
          if (derived.isEmpty) f
          else Filter(derived.foldLeft(cond)(And), rel)
        case _ => f
      }
  }

  private def inferred(cond: Expression, output: Seq[Attribute],
      fs: HadoopFsRelation): Seq[Expression] = {
    // timestamp attr -> its DateType partition attr, by the `<c>_date`
    // naming convention (case-insensitive resolution, like the analyzer)
    val partNames = fs.partitionSchema.filter(_.dataType == DateType)
      .map(_.name.toLowerCase(java.util.Locale.ROOT)).toSet
    val pairs: Map[ExprId, Attribute] = output.collect {
      case ts if (ts.dataType == TimestampType || ts.dataType == TimestampNTZType) &&
          partNames.contains(ts.name.toLowerCase(java.util.Locale.ROOT) + "_date") =>
        output.find(_.name.equalsIgnoreCase(ts.name + "_date"))
          .map(d => ts.exprId -> d)
    }.flatten.toMap
    if (pairs.isEmpty) return Nil
    // provenance gate AFTER the convention check: the marker stat runs
    // only for tables that would actually be inferred on (positives are
    // cached, so a served layout pays one stat per JVM, not per query)
    if (!conf.getConfString(TrustConventionKey, "false").toBoolean &&
        !trusted(fs)) return Nil

    val conjuncts = splitConjunctivePredicates(cond)
    // `to_date(ts)` / `CAST(ts AS DATE)` — the dashboard spelling of a
    // day predicate (ParseToDate lowers to Cast before optimization).
    // The cast IS the partition value exactly when its day basis matches
    // the UTC write contract: a UTC-zoned cast of TimestampType, or any
    // cast of TimestampNTZ (tz-free wall-clock day — utcDate's NTZ
    // basis). A session-tz cast under any other zone is a DIFFERENT day
    // function than the directory values, so it derives nothing (the
    // same silent-row-drop the provenance gate exists to prevent).
    // Because the derived quantity is IDENTICAL (not a widening), each
    // comparison carries over with its ORIGINAL operator, strict forms
    // included.
    object UtcDayOf {
      def unapply(e: Expression): Option[Attribute] = e match {
        case Cast(a: Attribute, DateType, _, _) if a.dataType == TimestampNTZType =>
          Some(a)
        case c @ Cast(a: Attribute, DateType, _, _) if a.dataType == TimestampType &&
            c.timeZoneId.exists(id => DateTimeUtils.getZoneId(id).normalized ==
              java.time.ZoneOffset.UTC) =>
          Some(a)
        case _ => None
      }
    }
    // UTC day for TimestampType (epoch micros), wall-clock day for NTZ —
    // both are microsToDays at UTC, the utcDate write-side contract
    def day(micros: Long): Int =
      DateTimeUtils.microsToDays(micros, java.time.ZoneOffset.UTC)
    def lower(a: Attribute, micros: Long): Option[Expression] = pairs.get(a.exprId)
      .map(d => GreaterThanOrEqual(d, Literal(day(micros), DateType)))
    // strict upper bounds sharpen at exact midnights: `ts < U` with U on
    // a day boundary implies ts_date <= day(U) - 1 — and U-on-boundary
    // is the UNIVERSAL case, because half-open day/week/month ranges are
    // how day predicates are written AND what Spark's own cast-unwrap
    // lowers `to_date(ts) = D` / `CAST(ts AS DATE) op D` into (ts >= D,
    // ts < D+1). Without the sharp bound every such range lists one
    // trailing EMPTY directory — for a single-day dashboard equality
    // that is 2 directories instead of 1, double the scan I/O on a
    // dense table. floorMod keeps the boundary test exact pre-1970.
    def upper(a: Attribute, micros: Long, strict: Boolean = false): Option[Expression] = {
      val bound = if (strict && Math.floorMod(micros, 86400000000L) == 0L)
        day(micros) - 1 else day(micros)
      pairs.get(a.exprId).map(d => LessThanOrEqual(d, Literal(bound, DateType)))
    }
    def eq(a: Attribute, micros: Long): Option[Expression] = pairs.get(a.exprId)
      .map(d => EqualTo(d, Literal(day(micros), DateType)))

    // derive(e): a partition-column predicate IMPLIED by e, if any —
    // each leaf derivation is a conservative day-widening, and the
    // connective cases preserve implication (rows passing And(l, r)
    // pass both sides, so the And of whatever either side derives
    // holds; rows passing Or(l, r) pass one side, so only the Or of
    // BOTH sides' derivations holds — an Or with one underivable
    // branch derives nothing). The Or case is the disjoint-ranges
    // dashboard spelling — "this week OR the same week last year" —
    // which derives the union of both day ranges and prunes to them.
    def derive(e: Expression): Option[Expression] = e match {
      case GreaterThanOrEqual(a: Attribute, Literal(m: Long, TimestampType | TimestampNTZType)) => lower(a, m)
      case GreaterThan(a: Attribute, Literal(m: Long, TimestampType | TimestampNTZType))        => lower(a, m)
      case LessThanOrEqual(a: Attribute, Literal(m: Long, TimestampType | TimestampNTZType))    => upper(a, m)
      case LessThan(a: Attribute, Literal(m: Long, TimestampType | TimestampNTZType))           => upper(a, m, strict = true)
      case EqualTo(a: Attribute, Literal(m: Long, TimestampType | TimestampNTZType))            => eq(a, m)
      // literal-first spellings
      case LessThanOrEqual(Literal(m: Long, TimestampType | TimestampNTZType), a: Attribute)    => lower(a, m)
      case LessThan(Literal(m: Long, TimestampType | TimestampNTZType), a: Attribute)           => lower(a, m)
      case GreaterThanOrEqual(Literal(m: Long, TimestampType | TimestampNTZType), a: Attribute) => upper(a, m)
      case GreaterThan(Literal(m: Long, TimestampType | TimestampNTZType), a: Attribute)        => upper(a, m, strict = true)
      case EqualTo(Literal(m: Long, TimestampType | TimestampNTZType), a: Attribute)            => eq(a, m)
      // null-safe equality against a NON-NULL literal is plain equality
      // (`ts <=> NULL` matches only null ts, whose ts_date is also null —
      // no day to derive; the typed pattern rejects null values)
      case EqualNullSafe(a: Attribute, Literal(m: Long, TimestampType | TimestampNTZType))      => eq(a, m)
      case EqualNullSafe(Literal(m: Long, TimestampType | TimestampNTZType), a: Attribute)      => eq(a, m)
      // IN-lists (the pivoted-dashboard spelling): every row passing
      // `ts IN (t1..tn)` has ts_date in the literals' UTC days — null
      // list elements never MATCH extra rows, so dropping them from the
      // derived day set is still a conservative superset. Both the
      // pre-OptimizeIn `In` form and the converted `InSet` (value set of
      // epoch micros) appear here depending on batch ordering.
      case In(a: Attribute, list) if list.nonEmpty && list.forall {
            case Literal(_, TimestampType | TimestampNTZType) => true
            case _ => false } =>
        val days = list.collect { case Literal(m: Long, _) => day(m) }.distinct
        if (days.isEmpty) None // all-null list: matches nothing, derive nothing
        else pairs.get(a.exprId).map(d => In(d, days.map(Literal(_, DateType))))
      case InSet(a: Attribute, hset)
          if (a.dataType == TimestampType || a.dataType == TimestampNTZType) &&
            hset.nonEmpty =>
        val days = hset.collect { case m: java.lang.Long => day(m.longValue) }
        if (days.isEmpty) None
        else pairs.get(a.exprId).map(d => InSet(d, days.map(x => x: Any)))
      // IN over a cast-to-date (`to_date(ts) IN (d1..dn)`): the one cast
      // spelling Spark's own unwrap does NOT lower to ts ranges, so the
      // day set carries over here, verbatim and exact (UtcDayOf gate)
      case In(UtcDayOf(a), list) if list.nonEmpty && list.forall {
            case Literal(v, DateType) => v != null
            case _ => false } =>
        pairs.get(a.exprId).map(d => In(d, list))
      case InSet(UtcDayOf(a), hset) if hset.nonEmpty =>
        pairs.get(a.exprId).map(d => InSet(d, hset))
      case And(l, r) => (derive(l), derive(r)) match {
        case (Some(dl), Some(dr)) => Some(And(dl, dr))
        case (some @ Some(_), None) => some
        case (None, some) => some
      }
      case Or(l, r) => for (dl <- derive(l); dr <- derive(r)) yield Or(dl, dr)
      case _ => None
    }
    val candidates = conjuncts.flatMap(derive)
    // idempotence: never re-add a conjunct that is already there
    candidates.filterNot(c => conjuncts.exists(_.semanticEquals(c))).distinct
  }
}
