package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** 2D skyline (Pareto front, minimize both coordinates): the points not
  * DOMINATED by any other — no point with x' <= x AND y' <= y that is
  * strictly smaller in at least one. The multi-objective shortlist
  * primitive (cheapest-earliest, smallest-fastest, ...).
  *
  * The textbook SQL form is a running min over ONE global sort — an
  * unpartitioned window, exactly what dies at 100 TB. This is the
  * distributed decomposition:
  *   1. minimal y per x (one hash aggregate — dominance within a column
  *      is just min),
  *   2. range-partition by x, sort within partitions, one mapPartitions
  *      pass emitting each partition's LOCAL skyline (strict running
  *      min of y) plus, per partition, its final running min,
  *   3. driver folds the P partition minima into an exclusive prefix-min
  *      (P doubles of driver state — the zipWithIndex discipline, never
  *      rows), broadcast back,
  *   4. a local-skyline point survives iff its y is strictly below every
  *      preceding partition's minimum.
  * Steps 2-4 add up to: one range exchange, one narrow pass, one O(P)
  * driver fold — the global sort never happens on one task.
  *
  * Ties: equal (x, y) duplicates collapse to one row (a point does not
  * dominate its twin — both survive as the same output row).
  */
object Skyline {

  /** Pareto front of (xCol, yCol), both minimized. Returns (x, y) rows. */
  def skyline2D(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // nulls and NaNs drop: dominance is undefined against NaN (every
    // comparison is false, so a NaN row would silently survive every
    // filter and pollute the front)
    val pts = df.select(col(xCol).cast("double").as("x"),
      col(yCol).cast("double").as("y"))
      .where(col("x").isNotNull && col("y").isNotNull &&
        !isnan(col("x")) && !isnan(col("y")))
      .groupBy("x").agg(min("y").as("y"))
    val sorted = pts.as[(Double, Double)]
      .repartitionByRange(col("x"))
      .sortWithinPartitions("x")
    // local skyline per partition: strict running min of y in x order
    val local = sorted.rdd.mapPartitionsWithIndex { (pid, it) =>
      var runMin = Double.PositiveInfinity
      it.flatMap { case (x, y) =>
        if (y < runMin) { runMin = y; Iterator.single((pid, x, y)) }
        else Iterator.empty
      }
    }.toDF("pid", "x", "y")
      .localCheckpoint(true) // two consumers below read ONE evaluation
    // exclusive prefix-min of each partition's best y — P doubles through
    // the driver, never points
    val partMins = local.groupBy("pid").agg(min("y").as("m"))
      .collect().map(r => (r.getInt(0), r.getDouble(1))).sortBy(_._1)
    val prefix = scala.collection.mutable.Map[Int, Double]()
    var acc = Double.PositiveInfinity
    partMins.foreach { case (pid, m) =>
      prefix(pid) = acc
      acc = math.min(acc, m)
    }
    val prefixDf = prefix.toSeq.toDF("pid", "bound")
    local.join(broadcast(prefixDf), "pid")
      .where(col("y") < col("bound"))
      .select("x", "y")
  }

  /** d-dimensional skyline (Pareto front, MAXIMIZE every dimension): the
    * rows not dominated by any other — no row that is >= in every listed
    * dim and strictly > in at least one. The multi-criteria curation
    * primitive (quality x novelty x recency shortlists).
    *
    * The 2D prefix-min trick does not generalize past two dims (there is
    * no single sort order in which "already seen" implies "dominates on
    * the rest"), so this is the honest d>2 decomposition — grid partition
    * + local fronts + cross-partition dominance pruning (the BNL/D&C
    * family's distributed form; cf. Borzsony/Kossmann/Stocker ICDE'01,
    * the skyline operator paper):
    *   1. per-dim quantile boundaries split the space into g^d cells
    *      (g = 2^gridBits; quantiles, not fixed widths, so cells stay
    *      balanced under any marginal distribution),
    *   2. CELL-level pruning on the driver: cell A dies if some occupied
    *      cell B has coord(B)_k >= coord(A)_k + 1 in EVERY dim — then any
    *      B-point's floor beats any A-point's ceiling strictly everywhere,
    *      so all of A is dominated without reading a row (on correlated
    *      data this discards most of the corpus; the driver handles cell
    *      COUNTS only, <= g^d entries, never rows),
    *   3. surviving cells compute LOCAL fronts in one exchange: hash
    *      repartition by cell, sort d1-descending within partitions, one
    *      streaming pass holding only the front-so-far per cell (memory
    *      O(local front), not O(cell)),
    *   4. the union of local fronts (front-sized, output-bound) makes one
    *      broadcast LEFT ANTI self-join on the dominance predicate — the
    *      global front is a subset of the local-front union because
    *      dominance is transitive, so any dominated candidate has a
    *      dominating WITNESS inside the union.
    * Worst case (fully anti-correlated dims: everything on the front) is
    * output-bound for ANY skyline algorithm — the grid's job is to make
    * the common correlated case cheap, and the spec pins that with a
    * pruned-cell-count assertion.
    *
    * Ties: exact duplicates dominate nothing (no strict dim) — all copies
    * survive, matching the brute-force NOT EXISTS oracle. Nulls/NaNs drop
    * (dominance is undefined against NaN — every comparison is false, so
    * a NaN row would silently survive every filter).
    */
  def skylineGrid(df: DataFrame, idCol: String, dims: Seq[String],
      gridBits: Int = 2): DataFrame = {
    require(dims.size >= 2 && dims.size <= 6,
      s"skylineGrid supports 2-6 dims, got ${dims.size}")
    require(gridBits >= 1 && gridBits <= 4, s"gridBits $gridBits out of [1,4]")
    // g^d bounds BOTH the driver's dominance-DP array and the broadcast
    // alive-cell frame; 2^16 cells keeps each under a megabyte no matter
    // how the (gridBits, d) budget is spent
    require(gridBits * dims.size <= 16,
      s"grid too fine: g^d = ${1L << (gridBits * dims.size)} cells " +
        s"exceeds 65536 (need gridBits*dims <= 16)")
    val spark = df.sparkSession
    import spark.implicits._
    val g = 1 << gridBits
    val d = dims.size
    // Materialize the projected points ONCE (r15 optimization, guide
    // §1.2): the frame feeds the quantile pass, the occupied-cell
    // aggregate and the local-front exchange, and the caller's dim
    // expressions are routinely the expensive part (regex / tokenize per
    // row) — without the cut each downstream pass re-evaluated them.
    // The checkpoint holds (8 + 8d) bytes per row — small relative to the
    // input, but multi-GB at 100x+ corpora, so it is explicitly released
    // once the front is materialized below (r15 advice).
    val pts0 = df.select(
      (col(idCol).cast("long").as("sk_id") +:
        dims.zipWithIndex.map { case (c, i) => col(c).cast("double").as(s"sk_d$i") }): _*)
      .where((0 until d).map(i =>
        col(s"sk_d$i").isNotNull && !isnan(col(s"sk_d$i"))).reduce(_ && _))
      .localCheckpoint(true)
    // per-dim quantile boundaries (approx is fine: boundaries steer
    // PARTITIONING, never correctness — every point keeps its exact value).
    // ONE multi-column pass, not one pass per dim (r15: d separate
    // approxQuantile calls were d full evaluations of the input).
    val probs = (1 until g).map(_.toDouble / g).toArray
    val bounds: Array[Array[Double]] = pts0.stat.approxQuantile(
      (0 until d).map(i => s"sk_d$i").toArray, probs, 0.01)
    // cell coordinate per dim: #boundaries <= value (a codegen'd when-sum,
    // no UDF), packed into one long cell id
    def coordExpr(i: Int) = bounds(i).foldLeft(lit(0)) { (acc, b) =>
      acc + when(col(s"sk_d$i") >= b, 1).otherwise(0)
    }
    val withCell = pts0.withColumn("sk_cell",
      (0 until d).map(i => coordExpr(i).cast("long") * math.pow(g, i).toLong)
        .reduce(_ + _))
    def unpack(cell: Long): Array[Int] = {
      val out = new Array[Int](d)
      var c = cell
      var i = 0
      while (i < d) { out(i) = (c % g).toInt; c /= g; i += 1 }
      out
    }
    // driver-side cell pruning over occupied-cell IDs (<= g^d entries).
    // Cell A dies iff some occupied B sits strictly above it in EVERY dim
    // (cb(k) >= ca(k)+1 ∀k) — i.e. iff the occupied set intersects the
    // closed upper-corner region at ca+1. Computed exactly with a
    // suffix-OR sum-over-supersets DP: one in-place high-to-low pass per
    // dim turns "occupied at c" into "occupied anywhere >= c", O(g^d * d)
    // total — never the O(occupied^2) pairwise scan, which at the g^d cap
    // could be 4B driver comparisons.
    val occupied = withCell.groupBy("sk_cell").count()
      .collect().map(r => r.getLong(0)).toSeq
    val nCells = 1 << (gridBits * d)
    val suffix = new Array[Boolean](nCells)
    occupied.foreach(c => suffix(c.toInt) = true)
    var k = 0
    var stride = 1
    while (k < d) {
      var c = nCells - 1 - stride
      while (c >= 0) {
        if ((c / stride) % g != g - 1) suffix(c) |= suffix(c + stride)
        c -= 1
      }
      stride *= g
      k += 1
    }
    // pack(ca + 1) = a + sum_k g^k when every coord has headroom
    val cornerOff = (nCells - 1) / (g - 1)
    val alive = occupied.filter { a =>
      val ca = unpack(a)
      !((0 until d).forall(i => ca(i) < g - 1) && suffix(a.toInt + cornerOff))
    }
    val pruned = occupied.size - alive.size
    // broadcast semi-join, not isin: an In over thousands of literals is
    // a giant non-codegen predicate; a broadcast hash semi-join on the
    // cell id stays inside whole-stage codegen
    val aliveDf = alive.toDF("sk_cell")
    val survivors = withCell.join(broadcast(aliveDf), Seq("sk_cell"), "left_semi")
    // local fronts: one hash exchange on the cell, d0-descending scan per
    // cell holding only the front-so-far (a later row can invalidate a
    // buffered one only on d0 ties, so the buffer prunes both ways)
    val localFront = survivors
      .repartition(col("sk_cell"))
      .sortWithinPartitions(col("sk_cell"), col("sk_d0").desc)
      .select(col("sk_cell"), col("sk_id"),
        array((0 until d).map(i => col(s"sk_d$i")): _*).as("sk_v"))
      .rdd.mapPartitions { it =>
        def dominates(a: Array[Double], b: Array[Double]): Boolean = {
          var ge = true; var gt = false; var k = 0
          while (ge && k < a.length) {
            if (a(k) < b(k)) ge = false
            else if (a(k) > b(k)) gt = true
            k += 1
          }
          ge && gt
        }
        val out = scala.collection.mutable.Buffer[(Long, scala.collection.Seq[Double])]()
        val front = scala.collection.mutable.ArrayBuffer[(Long, Array[Double])]()
        var cur = Long.MinValue
        def flush(): Unit = {
          out ++= front.map { case (id, v) => (id, v.toSeq) }
          front.clear()
        }
        it.foreach { r =>
          val cell = r.getLong(0)
          if (cell != cur) { flush(); cur = cell }
          val id = r.getLong(1)
          val v = r.getSeq[Double](2).toArray
          if (!front.exists(q => dominates(q._2, v))) {
            val kept = front.filterNot(q => dominates(v, q._2))
            if (kept.length != front.length) {
              front.clear(); front ++= kept
            }
            front += ((id, v))
          }
        }
        flush()
        out.iterator
      }.toDF("sk_id", "sk_v")
    // global verify: the front union is output-bound — broadcast it and
    // LEFT ANTI on the dominance predicate (any dominated candidate has a
    // dominating witness in the union, by transitivity)
    val cand = localFront.select(
      (col("sk_id") +:
        (0 until d).map(i => col("sk_v")(i).as(s"sk_d$i"))): _*)
      .localCheckpoint(true) // one evaluation feeds both join sides
    val rhs = cand.select(cand.columns.map(c => col(c).as(s"b_$c")).toSeq: _*)
    val domCond = (0 until d).map(i =>
        col(s"b_sk_d$i") >= col(s"sk_d$i")).reduce(_ && _) &&
      (0 until d).map(i => col(s"b_sk_d$i") > col(s"sk_d$i")).reduce(_ || _)
    val result = cand.join(broadcast(rhs), domCond, "left_anti")
      .select((col("sk_id").as(idCol) +:
        dims.zipWithIndex.map { case (c, i) => col(s"sk_d$i").as(c) }): _*)
      // materialize the (skyline-sized) front eagerly so the two upstream
      // checkpoint blocks can be RELEASED here instead of squatting until
      // ContextCleaner GC (r15 advice: pts0 is (8 + 8d) bytes/row — NOT
      // tiny at ScaleCheck's 100x+ corpora, where sessions are already
      // memory-tight). A locally-checkpointed block must never be
      // unpersisted before its dependents run, hence the eager cut first.
      .localCheckpoint(true)
    pts0.unpersist(blocking = false)
    cand.unpersist(blocking = false)
    lastPrunedCells.set((pruned, occupied.size))
    result
  }

  /** Cell-pruning stats of the LAST skylineGrid call on this thread —
    * (prunedCells, occupiedCells); the spec's grid-effectiveness gate.
    */
  private[graft] val lastPrunedCells =
    new ThreadLocal[(Int, Int)] { override def initialValue() = (0, 0) }
}
