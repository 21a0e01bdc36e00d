package graft.engine

import org.apache.spark.HashPartitioner
import org.apache.spark.sql.{Dataset, Encoder}

import scala.reflect.ClassTag

/** vega-parity pair operations (reference: `trait PairRdd`,
  * src/rdd/pair_rdd.rs).
  *
  * Grouping/joining goes through `KeyValueGroupedDataset` / `Dataset.joinWith`
  * so Catalyst plans the shuffle (partial aggregation, broadcast/SMJ choice,
  * AQE). `combineByKey` with arbitrary non-encodable combiners keeps an RDD
  * path — the one case SURVEY §7.3 flags as requiring it.
  */
class PairDataflow[K, V](val ds: Dataset[(K, V)]) extends Serializable {

  private def spark = ds.sparkSession
  private implicit def enc: Encoder[(K, V)] = ds.encoder

  /** combine_by_key — the universal shuffle aggregate (pair_rdd.rs:20-33,
    * dependency.rs:164-230): createCombiner/mergeValue run map-side,
    * mergeCombiners reduce-side, exactly vega's Aggregator contract.
    */
  def combineByKey[C](createCombiner: V => C, mergeValue: (C, V) => C,
      mergeCombiners: (C, C) => C, numPartitions: Int = 0)(
      implicit kt: ClassTag[K], vt: ClassTag[V], ct: ClassTag[C],
      e: Encoder[(K, C)]): Dataflow[(K, C)] = {
    val rdd = ds.rdd
    val part = new HashPartitioner(
      if (numPartitions > 0) numPartitions else rdd.getNumPartitions)
    new Dataflow(spark.createDataset(
      rdd.combineByKey(createCombiner, mergeValue, mergeCombiners, part)))
  }

  /** reduce_by_key (pair_rdd.rs:54-80) — partial/final aggregation planned
    * by Catalyst (reduceGroups lowers to a typed Aggregator with map-side
    * combine, matching vega's identity-combiner Aggregator).
    */
  def reduceByKey(f: (V, V) => V)(implicit ek: Encoder[K]): Dataflow[(K, V)] =
    new Dataflow(ds.groupByKey(_._1)
      .reduceGroups((a: (K, V), b: (K, V)) => (a._1, f(a._2, b._2)))
      .map(_._2))

  /** group_by_key (pair_rdd.rs:35-52) */
  def groupByKey()(implicit ek: Encoder[K], er: Encoder[(K, Seq[V])]): Dataflow[(K, Seq[V])] =
    new Dataflow(ds.groupByKey(_._1).mapGroups((k, it) => (k, it.map(_._2).toSeq)))

  /** map_values — keeps partitioning (pair_rdd.rs:82-91) */
  def mapValues[U](f: V => U)(implicit e: Encoder[(K, U)]): PairDataflow[K, U] =
    new PairDataflow(ds.map { case (k, v) => (k, f(v)) })

  /** flat_map_values (pair_rdd.rs:93-102) */
  def flatMapValues[U](f: V => IterableOnce[U])(implicit e: Encoder[(K, U)]): PairDataflow[K, U] =
    new PairDataflow(ds.flatMap { case (k, v) => f(v).iterator.map(k -> _) })

  /** join — inner equi-join built exactly as the reference builds it:
    * cogroup then cross-product of the value groups (pair_rdd.rs:104-121).
    * The cogroup form is also self-join-safe — `p.join(p)` with shared
    * lineage would trip Spark's ambiguous-self-join check under a raw
    * column-equality joinWith.
    *
    * Hot keys: the right side's per-key group goes through a
    * [[SpillableBuffer]] — up to `maxBufferedPerKey` values on heap, the
    * remainder spilled to executor-local disk and streamed once per left
    * row (the same discipline as SMJ's ExternalAppendOnlyUnsafeRowArray, so
    * a key with millions of right rows costs disk I/O proportional to its
    * — inherently quadratic — output instead of an executor OOM). The spill
    * path serializes values with Java serialization: a key's right-side
    * group larger than `maxBufferedPerKey` requires `W` to be
    * java.io.Serializable (case classes/tuples/primitives are; the error if
    * not is immediate and names the type). For relational workloads prefer
    * DataFrame `join`; for known-skewed keys `operators.Skew.saltedJoin`
    * spreads the key across reducers too.
    */
  def join[W](other: PairDataflow[K, W],
      maxBufferedPerKey: Int = PairDataflow.MaxBufferedPerKey)(
      implicit ek: Encoder[K], e: Encoder[(K, (V, W))]): Dataflow[(K, (V, W))] = {
    val joined = ds.groupByKey(_._1)
      .cogroup(other.ds.groupByKey(_._1)) { (k, vs, ws) =>
        val buf = new SpillableBuffer[W](maxBufferedPerKey)
        ws.foreach(w => buf.append(w._2))
        buf.seal()
        if (buf.spilled) // backstop for consumers that stop mid-key (limit/take)
          Option(org.apache.spark.TaskContext.get())
            .foreach(_.addTaskCompletionListener[Unit](_ => buf.close()))
        val out = vs.flatMap(v => buf.iterator.map(w => (k, (v._2, w))))
        // free the heap prefix + spill file as soon as THIS key's cross
        // product drains — a task with many hot keys must not accumulate
        // every key's buffer until task end
        new Iterator[(K, (V, W))] {
          def hasNext: Boolean = { val h = out.hasNext; if (!h) buf.close(); h }
          def next(): (K, (V, W)) = out.next()
        }
      }
    new Dataflow(joined)
  }

  /** cogroup (co_grouped_rdd.rs): (K, (Seq[V], Seq[W])) for every key on
    * either side.
    */
  def cogroup[W](other: PairDataflow[K, W])(
      implicit ek: Encoder[K],
      e: Encoder[(K, (Seq[V], Seq[W]))]): Dataflow[(K, (Seq[V], Seq[W]))] = {
    val grouped = ds.groupByKey(_._1)
      .cogroup(other.ds.groupByKey(_._1)) { (k, vs, ws) =>
        Iterator.single((k, (vs.map(_._2).toSeq, ws.map(_._2).toSeq)))
      }
    new Dataflow(grouped)
  }

  /** partition_by_key (pair_rdd.rs:157-171). The key column is `_1` when
    * the schema carries tuple names (the encoder binds tuple fields BY NAME
    * when `_1`/`_2` are present, even if their physical order is reversed);
    * otherwise binding is positional and the first column is the key.
    */
  def partitionByKey(numPartitions: Int): PairDataflow[K, V] = {
    val keyColumn = if (ds.columns.contains("_1")) "_1" else ds.columns.head
    new PairDataflow(ds.repartition(numPartitions, ds(keyColumn)))
  }

  def toDataflow: Dataflow[(K, V)] = new Dataflow(ds)
}

object PairDataflow {
  /** Per-key heap bound for the cogroup join's right-side buffer; beyond
    * this the group spills to executor-local disk (SpillableBuffer).
    */
  val MaxBufferedPerKey: Int = 1 << 17
}
