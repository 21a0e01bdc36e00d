package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

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
  * Interpolation is `lower + (upper - lower) * frac` — the SAME
  * floating-point expression DuckDB's quantile_cont and Spark's builtin
  * use, so results are bit-identical (an algebraically equal reordering can
  * differ in the last ulp and flip a rounded digit).
  *
  * Pathological distributions (nearly all mass in one bucket) degrade pass 2
  * toward the window-per-group shape; a production variant would recurse
  * into the hot bucket. Group keys are compared via their string form.
  */
object Percentiles {

  def exact(df: DataFrame, keyCol: String, valCol: String,
      ps: Seq[Double], buckets: Int = 8192): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 0.0 && p <= 1.0))
    val spark = df.sparkSession
    import spark.implicits._
    def name(p: Double) = s"p${math.round(p * 100)}"
    require(ps.map(name).distinct.size == ps.size,
      s"percentiles ${ps.mkString(",")} collide after rounding to column names " +
        s"${ps.map(name).mkString(",")} — request values that differ at 1% granularity")

    // vals feeds the extent pass, the histogram pass and the candidate pass —
    // persist so the source isn't scanned three times; released at the end.
    val vals = df.select(col(keyCol).cast("string").as("__k"),
      col(valCol).cast("double").as("__v"))
      .where(col("__v").isNotNull)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // ---- pass 0: per-group extent ----
    val statRows = vals.groupBy("__k")
      .agg(count(lit(1)).as("__n"), min("__v").as("__min"), max("__v").as("__max"))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap

    // Rebuild the (tiny) stats frame from the collected rows so later uses
    // are a local relation, not a re-executed full-input aggregation.
    val statsDf = broadcast(
      statRows.toSeq.map { case (k, (n, mn, mx)) => (k, n, mn, mx) }
        .toDF("__k", "__n", "__min", "__max"))
    def withBucket(v: DataFrame): DataFrame = v.join(statsDf, "__k")
      .withColumn("__b",
        when(col("__max") === col("__min"), lit(0L))
          .otherwise(least(
            floor((col("__v") - col("__min")) / (col("__max") - col("__min")) * buckets),
            lit(buckets - 1L))))

    // ---- pass 1: per-(group, bucket) histogram (map-side combined) ----
    val hist = withBucket(vals).groupBy("__k", "__b").agg(count(lit(1)).as("__c"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))

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
    }
    val targetsDf = broadcast(
      targets.toDF("__k", "__b", "__off", "__which").dropDuplicates())

    // ---- pass 2: rank candidate buckets only, pick the boundary rows ----
    val wb = Window.partitionBy("__k", "__b").orderBy("__v")
    val picked = withBucket(vals)
      .join(targetsDf.select("__k", "__b").dropDuplicates(), Seq("__k", "__b"))
      .withColumn("__rn", row_number().over(wb))
      .join(targetsDf, Seq("__k", "__b"))
      .where(col("__rn") === col("__off"))
      .select(col("__k"), col("__which"), col("__v"))
    val whichNames = ps.flatMap(p => Seq(s"${name(p)}_lo", s"${name(p)}_hi"))
    val pivoted = picked.groupBy("__k")
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
    val out = pivoted.select(outCols: _*).localCheckpoint(true)
    vals.unpersist()
    out
  }
}
