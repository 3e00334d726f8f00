package graft.flow

import org.apache.spark.sql.{Column, Dataset, Encoder}

/** Typed multiset collection — the reference's `Flow<T>` surface
  * (reference flow.rs:210-213) re-expressed over `Dataset[T]`.
  *
  * Semantics: a `Flow` is a bag of records; operators are the reference's
  * stateless combinators (flow.rs:236-284, 364-462). Where the reference
  * runs closures record-at-a-time on one thread, here each closure runs
  * data-parallel inside Spark tasks; `groupBy` introduces the shuffle that
  * replaces the reference's arrangement build (flow.rs:372-380).
  *
  * Two profiles share this surface:
  *   - snapshot profile: the Dataset IS the current multiset;
  *   - delta profile: use [[graft.core.Deltas]] on `toDF` for signed
  *     multiplicities (negate/threshold/consolidate).
  *
  * Note for performance-critical pipelines: closure-based ops (`map`,
  * `filter` on Scala functions) serialize/deserialize rows at the closure
  * boundary. The query layer (graft.queries) therefore prefers Column
  * expressions; this facade is the semantic-parity API, matching the
  * reference's host-language-closure programming model (SURVEY.md §2.10).
  */
final case class Flow[T](ds: Dataset[T]) {

  /** P1 `filter` (reference flow.rs:236-238). */
  def filter(p: T => Boolean): Flow[T] = Flow(ds.filter(p))

  /** P3 `map` (reference flow.rs:246-248). */
  def map[U: Encoder](f: T => U): Flow[U] = Flow(ds.map(f))

  /** P5 `map_in_place` — type-preserving map (reference flow.rs:259-266). */
  def mapInPlace(f: T => T)(implicit e: Encoder[T]): Flow[T] = Flow(ds.map(f))

  /** P6 `flat_map` (reference flow.rs:269-275). */
  def flatMap[U: Encoder](f: T => IterableOnce[U]): Flow[U] =
    Flow(ds.flatMap(f(_).iterator))

  /** P8 `inspect` — side-effecting peek, pass-through (reference
    * flow.rs:383-394). Runs on executors; for debugging/metrics only. */
  def inspect(f: T => Unit)(implicit e: Encoder[T]): Flow[T] =
    Flow(ds.map { t => f(t); t })

  /** P8's engine-native form: named aggregate metrics collected as a
    * side effect of the normal pass (no extra job, no executor
    * callback) — delivered per action via `QueryExecutionListener` /
    * per micro-batch in `StreamingQueryProgress.observedMetrics`.
    * Prefer this over [[inspect]] for production counters: `inspect`
    * pays a per-row closure; an observation is a codegen'd aggregate. */
  def observe(name: String, metric: Column, metrics: Column*): Flow[T] =
    Flow(ds.observe(name, metric, metrics: _*))

  /** G3 `reduce` for UNBOUNDED groups — the sorted-group contract with
    * the ENGINE doing the sort: repartition-and-sort-within-partitions
    * puts each key's values in ascending order via the spillable
    * shuffle sort, and `f` receives each group as a one-pass
    * `Iterator[T]` — the group never materializes in task memory (the
    * `toVector.sorted` in [[GroupedFlow.reduceSorted]] is simpler and
    * fine for bounded groups; THIS is the hot-key path at 100 TB).
    *
    * RDD-level on purpose: secondary sort over an arbitrary Scala
    * `Ordering` has no Dataset equivalent (`sortWithinPartitions`
    * takes columns only) — the one genuinely per-partition-imperative
    * op in the engine. `f`'s output per key is materialized before the
    * next group starts (outputs are reductions — small by contract);
    * any unconsumed remainder of the group is drained automatically. */
  def reduceSortedStreaming[K, W: Encoder](key: T => K, numPartitions: Int = -1)(
      f: (K, Iterator[T]) => IterableOnce[W])(
      implicit ordT: Ordering[T], ordK: Ordering[K],
      ctK: scala.reflect.ClassTag[K], ctT: scala.reflect.ClassTag[T],
      ctW: scala.reflect.ClassTag[W]): Flow[W] = {
    val spark = ds.sparkSession
    val parts = if (numPartitions > 0) numPartitions
      else math.max(ds.rdd.getNumPartitions, 1)
    val partitioner = new org.apache.spark.Partitioner {
      override def numPartitions: Int = parts
      override def getPartition(composite: Any): Int = {
        val h = composite.asInstanceOf[(K, T)]._1.hashCode()
        java.lang.Math.floorMod(h, parts) // partition by KEY only
      }
    }
    implicit val compositeOrd: Ordering[(K, T)] = Ordering.Tuple2(ordK, ordT)
    val sorted = ds.rdd.map(t => ((key(t), t), null))
      .repartitionAndSortWithinPartitions(partitioner)
    val out = sorted.mapPartitions { pairs =>
      val base = pairs.map(_._1).buffered
      new Iterator[W] {
        private var cur: Iterator[W] = Iterator.empty
        private def advance(): Unit =
          while (!cur.hasNext && base.hasNext) {
            val k = base.head._1
            val run = new Iterator[T] {
              override def hasNext: Boolean =
                base.hasNext && ordK.equiv(base.head._1, k)
              override def next(): T = base.next()._2
            }
            // force the output BEFORE draining, then skip what f left
            val produced = f(k, run).iterator.toVector
            while (run.hasNext) run.next()
            cur = produced.iterator
          }
        override def hasNext: Boolean = { advance(); cur.hasNext }
        override def next(): W = { advance(); cur.next() }
      }
    }
    Flow(spark.createDataset(out))
  }

  /** U1 `concat` — multiset union / UNION ALL (reference flow.rs:411-431). */
  def concat(other: Flow[T]): Flow[T] = Flow(ds.union(other.ds))

  /** A1 `distinct` (reference flow.rs:447-449). */
  def distinct(): Flow[T] = Flow(ds.distinct())

  /** G1 `group_by` — key by computed key; the shuffle this implies is the
    * analog of the reference's arrangement build (flow.rs:372-380). */
  def groupBy[K: Encoder](f: T => K): GroupedFlow[K, T] =
    new GroupedFlow(ds.groupByKey(f))

  def union(other: Flow[T]): Flow[T] = concat(other)

  /** U1+U3 composition as a direct op: bag difference
    * (`concat(other.negate)` + consolidation, reference flow.rs:364-366
    * doc). */
  def exceptAll(other: Flow[T]): Flow[T] = Flow(ds.exceptAll(other.ds))

  /** Set difference (EXCEPT): A1 distinct of the bag difference. */
  def except(other: Flow[T]): Flow[T] = Flow(ds.except(other.ds))

  /** INTERSECT (absent from the reference surface, composable from
    * threshold — SURVEY §2.5; native here). */
  def intersect(other: Flow[T]): Flow[T] = Flow(ds.intersect(other.ds))

  /** P2/P4/P7 `filter_mut`/`map_mut`/`flat_map_mut` escape hatch: an
    * arbitrary cross-record stateful closure over the ENTIRE flow in one
    * partition — the reference's execution model made explicit (its
    * worker is single-threaded by construction, machine.rs:136; an
    * unkeyed mutable closure is inherently sequential). `order` pins the
    * traversal order the closure observes (the reference gets lamport
    * order from its sorted arrangements). O(data) on ONE core — prefer
    * the keyed equivalents (`GroupedFlow.reduceSorted`,
    * `flatMapGroupsWithState`) wherever a key exists. */
  def statefulSequential[U: Encoder](order: Ordering[T])(
      f: Iterator[T] => Iterator[U])(implicit te: Encoder[T]): Flow[U] = {
    implicit val ord: Ordering[T] = order
    Flow(ds.coalesce(1).mapPartitions { it =>
      val buf = it.to(scala.collection.mutable.ArrayBuffer)
      f(buf.sortInPlace().iterator)
    })
  }
}

object Flow {
  /** U2 `concat_many` — n-ary union (reference flow.rs:416-442). */
  def concatMany[T](flows: Seq[Flow[T]]): Flow[T] =
    flows.reduce(_ concat _)
}
