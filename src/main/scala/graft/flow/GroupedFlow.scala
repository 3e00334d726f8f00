package graft.flow

import org.apache.spark.sql.{Dataset, Encoder, Encoders, KeyValueGroupedDataset}

/** Keyed collection — the reference's `Grouped<K, V>` surface (reference
  * flow.rs:476-595) over `KeyValueGroupedDataset`.
  *
  * The reference's arrangement stores each group's values **sorted
  * ascending** and its `reduce` contract exposes that order (reference
  * flow.rs:522-528; exploited for causal/lamport ordering,
  * machine-usage/logic.rs:9). Spark makes no in-group order guarantee, so
  * [[reduceSorted]] sorts explicitly inside each group — same contract,
  * made visible.
  *
  * Scale: every constructor of this class implies one hash-partition
  * shuffle on K. All per-key reductions (`count`/`min`/`max`/`maxBy`)
  * compile to Spark aggregates with map-side partial aggregation — state
  * per key is O(1), groups never materialize. Only `reduceSorted` (the
  * general UDAF, reference G3) materializes one group at a time per task.
  */
final class GroupedFlow[K, V](val kv: KeyValueGroupedDataset[K, V]) {

  /** G3 `reduce` — general per-key reduction over the whole group,
    * presented in ascending `ord` order (reference flow.rs:522-528).
    * Emits arbitrarily many outputs per key. */
  def reduceSorted[W: Encoder](f: (K, Seq[V]) => IterableOnce[W])(
      implicit ord: Ordering[V]): Flow[W] =
    Flow(kv.flatMapGroups { (k: K, it: Iterator[V]) =>
      f(k, it.toVector.sorted(ord)).iterator
    })

  /** G3 without the sorted-group contract (order-insensitive reductions;
    * avoids the per-group sort). */
  def reduceGroupsWith[W: Encoder](f: (K, Iterator[V]) => IterableOnce[W]): Flow[W] =
    Flow(kv.flatMapGroups { (k: K, it: Iterator[V]) => f(k, it).iterator })

  /** G4 `count` (reference flow.rs:541-543). Typed aggregate → map-side
    * partial counts, not a group materialization. */
  def count(): Flow[(K, Long)] = Flow(kv.count())

  /** G5 `min` (reference flow.rs:546-548). */
  def min()(implicit ord: Ordering[V], e: Encoder[(K, V)]): Flow[(K, V)] =
    Flow(kv.reduceGroups((a: V, b: V) => if (ord.lteq(a, b)) a else b))

  /** G6 `max` (reference flow.rs:551-553). */
  def max()(implicit ord: Ordering[V], e: Encoder[(K, V)]): Flow[(K, V)] =
    Flow(kv.reduceGroups((a: V, b: V) => if (ord.gteq(a, b)) a else b))

  /** G7 `max_by` — argmax: the whole record maximizing `f` (reference
    * flow.rs:556-567). Implemented as a commutative pairwise reduce →
    * partial-aggregates on the map side, O(1) state per key.
    * Ties resolve toward the full-record maximum, mirroring the
    * reference's sorted-arrangement "last" pick. */
  def maxBy[O](f: V => O)(implicit ordO: Ordering[O], ordV: Ordering[V],
      e: Encoder[(K, V)]): Flow[(K, V)] =
    Flow(kv.reduceGroups { (a: V, b: V) =>
      val c = ordO.compare(f(a), f(b))
      if (c > 0 || (c == 0 && ordV.gteq(a, b))) a else b
    })

  /** G7 dual: argmin. */
  def minBy[O](f: V => O)(implicit ordO: Ordering[O], ordV: Ordering[V],
      e: Encoder[(K, V)]): Flow[(K, V)] =
    Flow(kv.reduceGroups { (a: V, b: V) =>
      val c = ordO.compare(f(a), f(b))
      if (c < 0 || (c == 0 && ordV.lteq(a, b))) a else b
    })

  /** G9 `distinct` — multiplicity 1 per (k, v) (reference flow.rs:536-538). */
  def distinct()(implicit ke: Encoder[K], ve: Encoder[V],
      e: Encoder[(K, V)]): Flow[(K, V)] =
    Flow(kv.flatMapGroups { (k: K, it: Iterator[V]) =>
      it.toVector.distinct.map((k, _)).iterator
    })

  /** G10 `ungroup` — drop key, emit values (reference flow.rs:570-572). */
  def ungroup()(implicit ve: Encoder[V]): Flow[V] =
    Flow(kv.flatMapGroups { (_: K, it: Iterator[V]) => it })

  /** G11 `ungroup_with` (reference flow.rs:575-580). */
  def ungroupWith[W: Encoder](f: (K, V) => W): Flow[W] =
    Flow(kv.flatMapGroups { (k: K, it: Iterator[V]) => it.map(f(k, _)) })

  /** G12 `ungroup_both` (reference flow.rs:583-585). */
  def ungroupBoth()(implicit e: Encoder[(K, V)]): Flow[(K, V)] =
    ungroupWith((k, v) => (k, v))

  /** G13 `regroup` — re-key (new shuffle, reference flow.rs:588-595). */
  def regroup[K2: Encoder, V2: Encoder](f: (K, V) => (K2, V2))(
      implicit e: Encoder[(K2, V2)]): GroupedFlow[K2, V2] =
    new GroupedFlow(ungroupWith(f).ds.groupByKey(_._1).mapValues(_._2))

  /** J1 `join` — equi inner join on the shared key; `f` emits 0..n outputs
    * per matching pair (reference flow.rs:493-501). Uses `cogroup`: one
    * co-partitioned shuffle, groups streamed pairwise. For joins where one
    * side is small, the query layer uses DataFrame `join(broadcast(...))`
    * instead — this typed form is the semantic-parity path. */
  def join[V2, W: Encoder](other: GroupedFlow[K, V2])(
      f: (K, V, V2) => IterableOnce[W]): Flow[W] =
    Flow(kv.cogroup(other.kv) { (k: K, l: Iterator[V], r: Iterator[V2]) =>
      val rs = r.toVector
      if (rs.isEmpty) Iterator.empty
      else l.flatMap(a => rs.iterator.flatMap(b => f(k, a, b).iterator))
    })

  /** J2 `join_single` — 1:1 output per pair (reference flow.rs:504-519). */
  def joinSingle[V2, W: Encoder](other: GroupedFlow[K, V2])(
      f: (K, V, V2) => W): Flow[W] =
    join(other)((k, a, b) => Iterator.single(f(k, a, b)))
}
