package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Exact linear-interpolated percentiles (quantile_cont semantics) via the
  * two-pass bucketed quantile algorithm.
  *
  * Why not the alternatives at 100 TB:
  *  - Spark's builtin exact `percentile` buffers EVERY value per group in a
  *    map serialized through partial/final aggregation — with few huge
  *    groups the buffer IS the dataset.
  *  - `Window.partitionBy(group).orderBy(value)` ranks exactly, but each
  *    group lands on ONE reducer — few huge groups means a handful of tasks
  *    sorting terabytes while the cluster idles.
  *
  * This plan: pass 0 computes per-group (n, min, max); pass 1 builds a
  * per-group histogram over `buckets` equal-width value buckets (map-side
  * combined, tiny exchange); the driver locates, for each requested rank,
  * the bucket containing it and the rank offset inside that bucket; pass 2
  * ranks ONLY the candidate buckets (each ~n/buckets rows, window-partitioned
  * by (group, bucket) so work spreads across the cluster) and picks the two
  * boundary rows per percentile. Every exchange is aggregate-sized; no task
  * ever sorts more than a bucket.
  *
  * Skewed distributions are handled by ONE level of refinement: a candidate
  * bucket holding more than `hotBucketFraction` of its group's mass is
  * re-histogrammed over its own value extent at the full `buckets`
  * resolution (effective resolution = pass-1 buckets × `buckets` — up to
  * ~67M cells at the 8192 default), and a bucket whose values are all
  * IDENTICAL is answered directly from its extent — no sort at all. Only a
  * distribution that packs >hotBucketFraction of a group inside one
  * refined cell (values identical up to ~1e-8 of the group's range
  * but not equal) still degrades pass 2 toward a single-reducer sort.
  *
  * The driver holds per-group stats and the candidate-bucket histogram, so
  * the operator targets the few-huge-groups regime: it FAILS LOUDLY past
  * `maxGroups` distinct keys (the high-cardinality regime belongs to
  * approx_percentile or a grouped sketch, not an exact rank locator), and
  * the groups × buckets product is additionally capped at `maxHistCells`
  * by scaling the pass-1 bucket count down as group count grows — the
  * worst-case driver collect is ~maxHistCells tuples, never the
  * multi-GB groups × 8192 the raw defaults would imply.
  *
  * Interpolation is `lower + (upper - lower) * frac` — the SAME
  * floating-point expression DuckDB's quantile_cont and Spark's builtin
  * use, so results are bit-identical (an algebraically equal reordering can
  * differ in the last ulp and flip a rounded digit).
  */
object Percentiles {

  def exact(df: DataFrame, keyCol: String, valCol: String,
      ps: Seq[Double], buckets: Int = 8192, maxGroups: Int = 10000,
      hotBucketFraction: Double = 0.25, maxHistCells: Long = 2000000L): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 0.0 && p <= 1.0))
    val spark = df.sparkSession
    def name(p: Double) = s"p${math.round(p * 100)}"
    require(ps.map(name).distinct.size == ps.size,
      s"percentiles ${ps.mkString(",")} collide after rounding to column names " +
        s"${ps.map(name).mkString(",")} — request values that differ at 1% granularity")

    val keyType = df.schema(keyCol).dataType
    def keyedDf(rows: Seq[Row], rest: StructField*): DataFrame =
      spark.createDataFrame(java.util.Arrays.asList(rows: _*),
        StructType(StructField("__k", keyType) +: rest))

    // vals feeds the extent pass, the histogram pass and the candidate pass —
    // persist so the source isn't scanned three times; released at the end.
    val vals = df.select(col(keyCol).as("__k"),
      col(valCol).cast("double").as("__v"))
      .where(col("__v").isNotNull)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // ---- pass 0: per-group extent. The collect is capped at
      // maxGroups + 1 rows — the aggregation itself is distributed, so a
      // 10M-group key costs a shuffle but can never OOM the driver; seeing
      // the +1th row proves the bound is exceeded and fails loudly.
      val statRows = vals.groupBy("__k")
        .agg(count(lit(1)).as("__n"), min("__v").as("__min"), max("__v").as("__max"))
        .limit(maxGroups + 1)
        .collect()
        .map(r => r.get(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
      require(statRows.size <= maxGroups,
        s">$maxGroups distinct '$keyCol' groups exceed maxGroups=$maxGroups: " +
          "exact bucketed percentiles hold O(groups x buckets) driver state — " +
          "use approx_percentile / a grouped sketch for high-cardinality keys")

      // Bound the DRIVER-side histogram product, not just the group count:
      // pass 1 collects up to groups × buckets (key, bucket, count) tuples,
      // and at the old defaults (10000 × 8192) that is ~80M tuples — several
      // GB of heap — before anything fails. Scale buckets down as group
      // count grows, capping the worst-case collect at maxHistCells (~2M
      // tuples ≈ 100 MB); hot-bucket refinement restores resolution where a
      // rank actually lands, so accuracy is unchanged and pass 2 stays
      // bucket-sized.
      val eb: Int = math.max(128, math.min(buckets,
        (maxHistCells / math.max(1, statRows.size)).toInt))

      // Rebuild the (tiny) stats frame from the collected rows so later uses
      // are a local relation, not a re-executed full-input aggregation.
      val statsDf = broadcast(keyedDf(
        statRows.toSeq.map { case (k, (n, mn, mx)) => Row(k, n, mn, mx) },
        StructField("__n", LongType), StructField("__min", DoubleType),
        StructField("__max", DoubleType)))
      def withBucket(v: DataFrame): DataFrame = v.join(statsDf, "__k")
        .withColumn("__b",
          when(col("__max") === col("__min"), lit(0L))
            .otherwise(least(
              floor((col("__v") - col("__min")) / (col("__max") - col("__min")) * eb),
              lit(eb - 1L))))

      // ---- pass 1: per-(group, bucket) histogram (map-side combined) ----
      val hist = withBucket(vals).groupBy("__k", "__b").agg(count(lit(1)).as("__c"))
        .collect().map(r => (r.get(0), r.getLong(1), r.getLong(2)))

      // ---- driver: locate each target rank's bucket + offset ----
      val histByKey = hist.groupBy(_._1).map { case (k, rows) =>
        k -> rows.map(r => (r._2, r._3)).sortBy(_._1)
      }
      // targets: (key, bucket, rank-within-bucket, "<pXX>_<lo|hi>")
      val targets = statRows.toSeq.flatMap { case (k, (n, _, _)) =>
        val cum = histByKey(k).scanLeft((Long.MinValue, 0L)) {
          case ((_, acc), (b, c)) => (b, acc + c)
        }.tail // (bucket, cumulative count through bucket)
        def locate(rank: Long): (Long, Long) = {
          val i = cum.indexWhere(_._2 >= rank)
          val before = if (i == 0) 0L else cum(i - 1)._2
          (cum(i)._1, rank - before)
        }
        ps.flatMap { p =>
          val x = (n - 1) * p
          Seq(("lo", math.floor(x).toLong + 1), ("hi", math.ceil(x).toLong + 1))
            .map { case (side, r) =>
              val (b, off) = locate(r)
              (k, b, off, s"${name(p)}_$side")
            }
        }
      }.distinct
      val bucketCount = hist.map(r => (r._1, r._2) -> r._3).toMap

      // ---- hot-bucket refinement: a candidate bucket holding more than
      // hotBucketFraction of its group (and more than one pass-1 bucket's
      // fair share) would drag pass 2 toward the single-reducer sort this
      // operator exists to avoid. Re-histogram those buckets over their own
      // extent; answer identical-valued buckets directly from the extent.
      val hotKeys = targets.map(t => (t._1, t._2)).distinct.filter { case (k, b) =>
        val c = bucketCount((k, b))
        c > hotBucketFraction * statRows(k)._1 && c > eb
      }
      val (directPicks, refined, hotExtDf) = if (hotKeys.isEmpty)
        (Seq.empty[(Any, String, Double)], Map.empty[(Any, Long), Seq[(Long, Long)]], None)
      else {
        val hotDf = broadcast(keyedDf(
          hotKeys.map { case (k, b) => Row(k, b) }, StructField("__b", LongType)))
        val hotExt = withBucket(vals).join(hotDf, Seq("__k", "__b"))
          .groupBy("__k", "__b")
          .agg(min("__v").as("__hmin"), max("__v").as("__hmax"))
          .collect().map(r => (r.get(0), r.getLong(1)) -> ((r.getDouble(2), r.getDouble(3))))
          .toMap
        // identical-valued hot bucket: every rank inside it IS the extent value
        val direct = targets.filter { case (k, b, _, _) =>
          hotExt.get((k, b)).exists { case (mn, mx) => mn == mx }
        }.map { case (k, b, _, which) => (k, which, hotExt((k, b))._1) }
        val splitKeys = hotKeys.filter(kb => hotExt(kb)._1 < hotExt(kb)._2)
        val extDf = broadcast(keyedDf(
          splitKeys.map { case (k, b) =>
            Row(k, b, hotExt((k, b))._1, hotExt((k, b))._2) },
          StructField("__b", LongType), StructField("__hmin", DoubleType),
          StructField("__hmax", DoubleType)))
        val subHist =
          if (splitKeys.isEmpty) Map.empty[(Any, Long), Seq[(Long, Long)]]
          else withBucket(vals).join(extDf, Seq("__k", "__b"))
            .withColumn("__b2", least(
              floor((col("__v") - col("__hmin")) / (col("__hmax") - col("__hmin")) * buckets),
              lit(buckets - 1L)))
            .groupBy("__k", "__b", "__b2").agg(count(lit(1)).as("__c"))
            .collect()
            .map(r => (r.get(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3))))
            .groupBy(_._1).map { case (kb, rows) => kb -> rows.map(_._2).sortBy(_._1).toSeq }
        (direct, subHist, if (splitKeys.isEmpty) None else Some(extDf))
      }
      // Re-locate targets in refined buckets to (sub-bucket, sub-offset);
      // non-refined targets keep __b2 = 0 and their pass-1 offset (matching
      // the constant __b2 their rows get in pass 2).
      val finalTargets = targets.flatMap { case (k, b, off, which) =>
        if (directPicks.exists(d => d._1 == k && d._2 == which)) None
        else refined.get((k, b)) match {
          case None => Some((k, b, 0L, off, which))
          case Some(sub) =>
            val cum = sub.scanLeft((Long.MinValue, 0L)) {
              case ((_, acc), (b2, c)) => (b2, acc + c)
            }.tail
            val i = cum.indexWhere(_._2 >= off)
            val before = if (i == 0) 0L else cum(i - 1)._2
            Some((k, b, cum(i)._1, off - before, which))
        }
      }
      val targetsDf = broadcast(keyedDf(
        finalTargets.map { case (k, b, b2, off, which) => Row(k, b, b2, off, which) },
        StructField("__b", LongType), StructField("__b2", LongType),
        StructField("__off", LongType), StructField("__which", StringType))
        .dropDuplicates())

      // ---- pass 2: rank candidate (sub-)buckets only, pick boundary rows ----
      val cand0 = withBucket(vals)
        .join(targetsDf.select("__k", "__b").dropDuplicates(), Seq("__k", "__b"))
      val cand = hotExtDf match {
        case None => cand0.withColumn("__b2", lit(0L))
        case Some(ext) => cand0.join(ext, Seq("__k", "__b"), "left")
          .withColumn("__b2",
            when(col("__hmin").isNull, lit(0L)).otherwise(least(
              floor((col("__v") - col("__hmin")) / (col("__hmax") - col("__hmin")) * buckets),
              lit(buckets - 1L))))
          .drop("__hmin", "__hmax")
      }
      val wb = Window.partitionBy("__k", "__b", "__b2").orderBy("__v")
      val picked = cand
        .withColumn("__rn", row_number().over(wb))
        .join(targetsDf, Seq("__k", "__b", "__b2"))
        .where(col("__rn") === col("__off"))
        .select(col("__k"), col("__which"), col("__v"))
      val pickedAll = if (directPicks.isEmpty) picked
        else picked.unionByName(keyedDf(
          directPicks.map { case (k, which, v) => Row(k, which, v) },
          StructField("__which", StringType), StructField("__v", DoubleType)))
      val whichNames = ps.flatMap(p => Seq(s"${name(p)}_lo", s"${name(p)}_hi"))
      val pivoted = pickedAll.groupBy("__k")
        .pivot("__which", whichNames).agg(first("__v"))
        .join(statsDf.select(col("__k"), col("__n")), "__k")

      val outCols: Seq[Column] = col("__k").as(keyCol) +: ps.map { p =>
        val x = (col("__n") - 1) * lit(p)
        val frac = x - floor(x)
        val lo = col(s"${name(p)}_lo")
        val hi = col(s"${name(p)}_hi")
        (lo + (hi - lo) * frac).as(name(p))
      }
      // Result is one row per group — materialize it and release the cache.
      pivoted.select(outCols: _*).localCheckpoint(true)
    } finally vals.unpersist()
  }
}
