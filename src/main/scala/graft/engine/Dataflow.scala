package graft.engine

import graft.engine.approx.{BoundedDouble, PartialResult}
import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.storage.StorageLevel

import scala.reflect.ClassTag

/** vega-parity typed collection (reference: `trait Rdd`, src/rdd/rdd.rs).
  *
  * Backed by `Dataset[T]` so relational ops stay visible to Catalyst
  * (distinct/sample/union/intersect/except/limit are all planned, not
  * hand-rolled). Ops whose semantics are inherently positional or
  * partition-imperative (zip, glom, cartesian with arbitrary T, approx
  * actions) drop to the underlying RDD — exactly the cases SURVEY §1.3
  * reserves for the RDD path.
  *
  * vega edge semantics preserved:
  *  - `reduce` returns Option (src/rdd/rdd.rs:274-290);
  *  - `keyBy` emits (item, key), not (key, item) (src/rdd/rdd.rs:1059-1069);
  *  - `intersection`/`subtract` are set-semantic, `union` keeps duplicates
  *    (src/rdd/rdd.rs:805-946).
  */
class Dataflow[T](val ds: Dataset[T]) extends Serializable {

  private def spark = ds.sparkSession
  private implicit def enc: Encoder[T] = ds.encoder

  // ---- §2.3 per-row transforms ----

  /** map (src/rdd/rdd.rs:199-205) */
  def map[U: Encoder](f: T => U): Dataflow[U] = new Dataflow(ds.map(f))

  /** flat_map (src/rdd/rdd.rs:207-213) */
  def flatMap[U: Encoder](f: T => IterableOnce[U]): Dataflow[U] =
    new Dataflow(ds.flatMap(f(_).iterator))

  /** filter (src/rdd/rdd.rs:186-197) */
  def filter(p: T => Boolean): Dataflow[T] = new Dataflow(ds.filter(p))

  /** map_partitions (src/rdd/rdd.rs:216-224) */
  def mapPartitions[U: Encoder](f: Iterator[T] => Iterator[U]): Dataflow[U] =
    new Dataflow(ds.mapPartitions(f))

  /** map_partitions_with_index (src/rdd/rdd.rs:226-235) */
  def mapPartitionsWithIndex[U: Encoder : ClassTag](f: (Int, Iterator[T]) => Iterator[U]): Dataflow[U] =
    new Dataflow(spark.createDataset(ds.rdd.mapPartitionsWithIndex((i, it) => f(i, it))))

  /** glom (src/rdd/rdd.rs:239-252) */
  def glom()(implicit e: Encoder[Seq[T]]): Dataflow[Seq[T]] =
    new Dataflow(ds.mapPartitions(it => Iterator.single(it.toSeq)))

  /** key_by — vega order (item, key) (src/rdd/rdd.rs:1059-1069) */
  def keyBy[K](f: T => K)(implicit e: Encoder[(T, K)]): Dataflow[(T, K)] =
    new Dataflow(ds.map(t => (t, f(t))))

  // ---- §2.4 joins / pairing ----

  /** cartesian (src/rdd/cartesian_rdd.rs) */
  def cartesian[U](other: Dataflow[U])(implicit ct: ClassTag[T], cu: ClassTag[U],
      e: Encoder[(T, U)]): Dataflow[(T, U)] =
    new Dataflow(spark.createDataset(ds.rdd.cartesian(other.ds.rdd)))

  /** zip — positional, equal length/partitioning (src/rdd/zip_rdd.rs) */
  def zip[U](other: Dataflow[U])(implicit ct: ClassTag[T], cu: ClassTag[U],
      e: Encoder[(T, U)]): Dataflow[(T, U)] =
    new Dataflow(spark.createDataset(ds.rdd.zip(other.ds.rdd)))

  // ---- §2.5 grouping ----

  /** group_by (src/rdd/rdd.rs:957-1016) */
  def groupBy[K](f: T => K)(implicit k: Encoder[K], ek: Encoder[(K, T)],
      er: Encoder[(K, Seq[T])]): Dataflow[(K, Seq[T])] =
    new Dataflow(ds.map(t => (f(t), t)).groupByKey(_._1)
      .mapGroups((k, it) => (k, it.map(_._2).toSeq)))

  // ---- §2.6 set ops ----

  /** union — keeps duplicates (src/rdd/rdd.rs:805-816) */
  def union(other: Dataflow[T]): Dataflow[T] = new Dataflow(ds.union(other.ds))

  /** intersection — set semantics (src/rdd/rdd.rs:901-946) */
  def intersection(other: Dataflow[T]): Dataflow[T] =
    new Dataflow(ds.intersect(other.ds))

  /** subtract — set semantics (src/rdd/rdd.rs:843-899) */
  def subtract(other: Dataflow[T]): Dataflow[T] = new Dataflow(ds.except(other.ds))

  /** distinct (src/rdd/rdd.rs:501-531) */
  def distinct(): Dataflow[T] = new Dataflow(ds.distinct())
  def distinct(numPartitions: Int): Dataflow[T] =
    new Dataflow(ds.repartition(numPartitions).distinct())

  // ---- §2.7 sampling ----

  /** sample (src/rdd/partitionwise_sampled_rdd.rs) */
  def sample(withReplacement: Boolean, fraction: Double, seed: Long = 42L): Dataflow[T] =
    new Dataflow(ds.sample(withReplacement, fraction, seed))

  /** take_sample — exact-size (src/rdd/rdd.rs:717-783) */
  def takeSample(withReplacement: Boolean, num: Int, seed: Long = 42L)(implicit ct: ClassTag[T]): Array[T] =
    ds.rdd.takeSample(withReplacement, num, seed)

  /** random_split (src/rdd/rdd.rs:623-672) */
  def randomSplit(weights: Array[Double], seed: Long = 42L): Array[Dataflow[T]] =
    ds.randomSplit(weights, seed).map(new Dataflow(_))

  // ---- §2.8 layout ----

  /** coalesce — narrow shrink (src/rdd/coalesced_rdd.rs) */
  def coalesce(numPartitions: Int): Dataflow[T] = new Dataflow(ds.coalesce(numPartitions))

  /** repartition — shuffle=true coalesce (src/rdd/rdd.rs:552-557) */
  def repartition(numPartitions: Int): Dataflow[T] = new Dataflow(ds.repartition(numPartitions))

  /** Global sort — extension beyond parity (vega has no sort, SURVEY §2.9).
    * Routed through Catalyst `orderBy` (not `rdd.sortBy`) so the range-
    * partitioned sort stays visible to the optimizer: a following limit
    * fuses to TakeOrderedAndProject, and AQE can re-plan the exchange.
    */
  def sortBy[K](f: T => K, ascending: Boolean = true)(
      implicit kte: Encoder[(K, T)]): Dataflow[T] = {
    import org.apache.spark.sql.functions.col
    val keyed = ds.map(t => (f(t), t))
    val sorted = keyed.orderBy(if (ascending) col("_1") else col("_1").desc)
    new Dataflow(sorted.map(_._2))
  }

  /** cache (src/rdd/rdd.rs:72-75, src/cache.rs) */
  def cache(): Dataflow[T] = { ds.cache(); this }
  def persist(level: StorageLevel): Dataflow[T] = { ds.persist(level); this }

  def numPartitions: Int = ds.rdd.getNumPartitions

  // ---- §2.2 actions ----

  /** collect — partition-order preserving (src/rdd/rdd.rs:420-434) */
  def collect(): Seq[T] = ds.collect().toSeq

  /** count (src/rdd/rdd.rs:436-447) */
  def count(): Long = ds.count()

  /** reduce — Option on empty, unlike Spark's throw (src/rdd/rdd.rs:274-290).
    * Single pass: per-partition reduce, driver-side combine — the same shape
    * as the reference; an isEmpty pre-check would execute the lineage twice.
    */
  def reduce(f: (T, T) => T): Option[T] = {
    implicit val ct: ClassTag[T] = enc.clsTag
    val parts = ds.rdd.mapPartitions(it =>
      if (it.hasNext) Iterator.single(it.reduce(f)) else Iterator.empty).collect()
    if (parts.isEmpty) None else Some(parts.reduce(f))
  }

  /** fold (src/rdd/rdd.rs:311-322) */
  def fold(zero: T)(f: (T, T) => T)(implicit ct: ClassTag[T]): T = ds.rdd.fold(zero)(f)

  /** aggregate — result type != item type (src/rdd/rdd.rs:339-350) */
  def aggregate[U: ClassTag](zero: U)(seqOp: (U, T) => U, combOp: (U, U) => U): U =
    ds.rdd.aggregate(zero)(seqOp, combOp)

  /** take — incremental partition scan (src/rdd/rdd.rs:559-620) */
  def take(num: Int): Seq[T] = ds.take(num).toSeq

  /** first (src/rdd/rdd.rs:534-543) */
  def first(): T = ds.head()

  /** top — largest k (src/rdd/rdd.rs:1106-1117) */
  def top(num: Int)(implicit ord: Ordering[T], ct: ClassTag[T]): Seq[T] =
    ds.rdd.top(num).toSeq

  /** take_ordered — smallest k, bounded heap (src/rdd/rdd.rs:1124-1153) */
  def takeOrdered(num: Int)(implicit ord: Ordering[T], ct: ClassTag[T]): Seq[T] =
    ds.rdd.takeOrdered(num).toSeq

  /** max / min (src/rdd/rdd.rs:1081-1099) */
  def max()(implicit ord: Ordering[T]): Option[T] = reduce(ord.max)
  def min()(implicit ord: Ordering[T]): Option[T] = reduce(ord.min)

  /** for_each / for_each_partition (src/rdd/rdd.rs:786-803) */
  def foreach(f: T => Unit): Unit = ds.foreach(f)
  def foreachPartition(f: Iterator[T] => Unit): Unit = ds.foreachPartition(f)

  /** is_empty (src/rdd/rdd.rs:1073-1078) */
  def isEmpty: Boolean = ds.isEmpty

  /** save_as_text_file — one part file per partition (src/rdd/rdd.rs:254-272) */
  def saveAsTextFile(path: String): Unit =
    ds.map(_.toString)(Encoders.STRING).write.text(path)

  /** count_by_value — returns a FLOW of (value, count), like the reference
    * (src/rdd/rdd.rs:450-459 returns an Rdd, not a map).
    */
  def countByValue()(implicit e: Encoder[(T, Long)]): Dataflow[(T, Long)] =
    new Dataflow(ds.groupByKey(identity).count().map(identity))

  // ---- §2.9 approximate actions ----

  /** count_approx (src/rdd/rdd.rs:1030-1056) */
  def countApprox(timeoutMs: Long, confidence: Double = 0.95): PartialResult[BoundedDouble] =
    new PartialResult(ds.rdd.countApprox(timeoutMs, confidence), BoundedDouble.fromSpark)

  /** count_by_value_approx (src/rdd/rdd.rs:466-499) */
  def countByValueApprox(timeoutMs: Long, confidence: Double = 0.95)(
      implicit ct: ClassTag[T]): scala.collection.Map[T, BoundedDouble] =
    ds.rdd.countByValueApprox(timeoutMs, confidence).getFinalValue()
      .map { case (k, v) => k -> BoundedDouble.fromSpark(v) }

  /** count_by_value_approx, PARTIAL-result form — exposes the grouped
    * initialValue/isInitialValueFinal contract the reference's
    * approximate_action_listener carries (partial/grouped_count_evaluator.rs).
    */
  def countByValueApproxPartial(timeoutMs: Long, confidence: Double = 0.95)(
      implicit ct: ClassTag[T]): approx.GroupedPartialResult[T] =
    new approx.GroupedPartialResult(ds.rdd.countByValueApprox(timeoutMs, confidence))

  // ---- pair-op entry ----

  /** View a Dataflow of pairs as a PairDataflow (blanket impl in the
    * reference: src/rdd/pair_rdd.rs:175-176).
    */
  def pairs[K, V](implicit ev: T <:< (K, V), ek: Encoder[(K, V)]): PairDataflow[K, V] =
    new PairDataflow(ds.map(ev(_)))
}
