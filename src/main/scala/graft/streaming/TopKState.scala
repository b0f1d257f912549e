package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming per-key heavy hitters via SpaceSaving counters in
  * GroupState — the streaming twin of the batch `heavy_hitters` query
  * (CMS-gated exact counts): the batch form answers "which n-grams are
  * frequent in the corpus" after the fact; this form maintains the
  * running answer per stream key with HARD-BOUNDED state, the only
  * honest frequency contract on an unbounded stream (exact per-item
  * maps grow with the item space).
  *
  * SpaceSaving (Metwally et al., ICDT 2005) keeps [[Capacity]] counters
  * per key. A tracked item increments; an untracked item steals the
  * minimum counter, inheriting its count as the new entry's maximum
  * possible over-estimate (`err`). Invariants the spec pins:
  *   - `count` never under-estimates: true ≤ count ≤ true + err;
  *   - any item whose true frequency exceeds n/Capacity is tracked —
  *     no false negatives above the support threshold;
  *   - with fewer distinct items than Capacity, counts are EXACT.
  *
  * Eviction ties break on (count, item) so replays reproduce the same
  * counter table bit-for-bit — determinism matches the engine's
  * replay-based fault tolerance. */
object TopKState {

  final case class In(key: String, item: String)
  final case class Counter(item: String, count: Long, err: Long)
  final case class Tab(counters: List[Counter], n: Long, batches: Long)
  final case class Out(key: String, rank: Long, item: String,
                       count: Long, err: Long, n: Long, batches: Long)

  /** Counters per key — the fixed state budget. */
  val Capacity = 8
  /** Rows emitted per key per trigger. */
  val EmitK = 3

  /** Fold one item into a SpaceSaving table (pure core). */
  def add(tab: Tab, item: String): Tab = {
    val cs = tab.counters
    cs.find(_.item == item) match {
      case Some(c) =>
        Tab(Counter(item, c.count + 1, c.err) :: cs.filterNot(_.item == item),
          tab.n + 1, tab.batches)
      case None if cs.length < Capacity =>
        Tab(Counter(item, 1L, 0L) :: cs, tab.n + 1, tab.batches)
      case None =>
        // evict the deterministic minimum; inherit its count as error
        val victim = cs.minBy(c => (c.count, c.item))
        Tab(Counter(item, victim.count + 1, victim.count) ::
          cs.filterNot(_.item == victim.item), tab.n + 1, tab.batches)
    }
  }

  /** Merge two SpaceSaving tables (Agarwal et al., "Mergeable
    * Summaries", PODS 2012): shared items sum counts and errs; an item
    * tracked on one side only could have occurred up to the OTHER
    * side's minimum counter times without being tracked there (only if
    * that side is full), so it absorbs that minimum into both count and
    * err — the never-under-estimate invariant survives the merge. The
    * union is then truncated back to [[Capacity]] under the same
    * deterministic (count desc, err asc, item) order eviction uses, so
    * merged state keeps the hard bound and replays reproduce it
    * bit-for-bit. This is what lets session windows merge their sketch
    * tables when a bridging event fuses two sessions. */
  def merge(a: Tab, b: Tab): Tab = {
    def floorOf(t: Tab) =
      if (t.counters.length >= Capacity) t.counters.map(_.count).min else 0L
    val (minA, minB) = (floorOf(a), floorOf(b))
    val bByItem = b.counters.map(c => c.item -> c).toMap
    val aItems = a.counters.map(_.item).toSet
    val merged =
      a.counters.map { x =>
        bByItem.get(x.item) match {
          case Some(y) => Counter(x.item, x.count + y.count, x.err + y.err)
          case None    => Counter(x.item, x.count + minB, x.err + minB)
        }
      } ++ b.counters.collect {
        case y if !aItems(y.item) => Counter(y.item, y.count + minA, y.err + minA)
      }
    Tab(merged.sortBy(c => (-c.count, c.err, c.item)).take(Capacity),
      a.n + b.n, a.batches + b.batches)
  }

  /** Top-[[EmitK]] of a table under (count desc, err asc, item) order. */
  def top(tab: Tab): Seq[Counter] =
    tab.counters.sortBy(c => (-c.count, c.err, c.item)).take(EmitK)

  def handle(key: String, items: Iterator[In],
      state: GroupState[Tab]): Iterator[Out] = {
    val prev = state.getOption.getOrElse(Tab(Nil, 0L, 0L))
    val folded = items.foldLeft(prev)((t, in) => add(t, in.item))
    val next = folded.copy(batches = prev.batches + 1)
    state.update(next)
    top(next).zipWithIndex.iterator.map { case (c, i) =>
      Out(key, i + 1L, c.item, c.count, c.err, next.n, next.batches)
    }
  }

  /** Per-trigger running top-K per key (Update mode). */
  def apply(ds: Dataset[In]): Dataset[Out] = {
    implicit val o = Encoders.product[Out]
    implicit val t = Encoders.product[Tab]
    implicit val k = Encoders.STRING
    ds.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Update(),
        GroupStateTimeout.NoTimeout())(handle)
  }

  val outputMode: OutputMode = OutputMode.Update()
}
