package graft

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}

/** Dev diagnostics main (not part of the driver contract): single-thread
  * microbenchmark of the top-2 centroid kernel against a 4096-codebook —
  * pruned (coarse index) vs brute — isolated from all Spark machinery, to
  * split SemDiag's assign wall into kernel vs plan overhead.
  * Usage: runMain graft.KernelDiag [nRows] [nlist] [dim]
  */
object KernelDiag {
  def main(args: Array[String]): Unit = {
    val n = args.lift(0).map(_.toInt).getOrElse(5000)
    val nlist = args.lift(1).map(_.toInt).getOrElse(4096)
    val dim = args.lift(2).map(_.toInt).getOrElse(64)
    val rnd = new java.util.Random(42)
    def vec(): Array[Double] = Array.fill(dim)(rnd.nextGaussian())
    val centroids: ArrayData = new GenericArrayData(
      Array.fill[Any](nlist)(new GenericArrayData(
        vec().map(x => x: Any))))
    val rows = Array.fill(n)(new GenericArrayData(vec().map(x => x: Any)))
    def round(label: String): Unit = {
      var acc = 0L
      val t0 = System.nanoTime()
      var i = 0
      while (i < n) {
        val r = graft.functions.VectorOps.nearest2Centroids(rows(i), centroids)
        acc += r.getInt(0)
        i += 1
      }
      val us = (System.nanoTime() - t0) / 1e3 / n
      println(f"KERNELDIAG $label $us%.1f us/row ($acc)")
    }
    round("warmup")
    round("pruned1")
    round("pruned2")

    // batched twin: same math, codebook row loaded once per BATCH of
    // queries instead of once per query
    val flat = rows.map(_.toDoubleArray())
    val cb = Array.tabulate(nlist)(c =>
      centroids.getArray(c).toDoubleArray())
    val norms = cb.map { r =>
      var s = 0.0; var d = 0
      while (d < dim) { s += r(d) * r(d); d += 1 }
      math.sqrt(s)
    }
    def roundBatched(label: String, batch: Int): Unit = {
      var acc = 0L
      val t0 = System.nanoTime()
      val best = new Array[Int](batch)
      val bestSim = new Array[Double](batch)
      val second = new Array[Int](batch)
      val secondSim = new Array[Double](batch)
      val qn = new Array[Double](batch)
      var i = 0
      while (i < n) {
        val m = math.min(batch, n - i)
        var b = 0
        while (b < m) {
          best(b) = -1; bestSim(b) = Double.NegativeInfinity
          second(b) = -1; secondSim(b) = Double.NegativeInfinity
          val v = flat(i + b)
          var s = 0.0; var d = 0
          while (d < dim) { s += v(d) * v(d); d += 1 }
          qn(b) = math.sqrt(s)
          b += 1
        }
        var c = 0
        while (c < nlist) {
          val r = cb(c)
          val nc = norms(c)
          b = 0
          while (b < m) {
            val v = flat(i + b)
            var dot = 0.0; var d = 0
            while (d < dim) { dot += v(d) * r(d); d += 1 }
            val sim = if (qn(b) == 0.0 || nc == 0.0) 0.0
              else dot / (qn(b) * nc)
            if (sim > bestSim(b)) {
              secondSim(b) = bestSim(b); second(b) = best(b)
              bestSim(b) = sim; best(b) = c
            } else if (sim > secondSim(b)) { secondSim(b) = sim; second(b) = c }
            b += 1
          }
          c += 1
        }
        b = 0
        while (b < m) { acc += best(b); b += 1 }
        i += m
      }
      val us = (System.nanoTime() - t0) / 1e3 / n
      println(f"KERNELDIAG $label $us%.1f us/row ($acc)")
    }
    roundBatched("batch16_warm", 16)
    roundBatched("batch8", 8)
    roundBatched("batch16", 16)
    roundBatched("batch32", 32)

    // 4-accumulator dot (different FP order — diagnostic only)
    def roundSplit(label: String, batch: Int): Unit = {
      var acc = 0L
      val t0 = System.nanoTime()
      val best = new Array[Int](batch)
      val bestSim = new Array[Double](batch)
      val secondSim = new Array[Double](batch)
      val qn = new Array[Double](batch)
      var i = 0
      while (i < n) {
        val m = math.min(batch, n - i)
        var b = 0
        while (b < m) {
          best(b) = -1; bestSim(b) = Double.NegativeInfinity
          secondSim(b) = Double.NegativeInfinity
          val v = flat(i + b)
          var s = 0.0; var d = 0
          while (d < dim) { s += v(d) * v(d); d += 1 }
          qn(b) = math.sqrt(s)
          b += 1
        }
        var c = 0
        while (c < nlist) {
          val r = cb(c)
          val nc = norms(c)
          b = 0
          while (b < m) {
            val v = flat(i + b)
            var d0 = 0.0; var d1 = 0.0; var d2 = 0.0; var d3 = 0.0
            var d = 0
            val lim = dim - 3
            while (d < lim) {
              d0 += v(d) * r(d); d1 += v(d + 1) * r(d + 1)
              d2 += v(d + 2) * r(d + 2); d3 += v(d + 3) * r(d + 3)
              d += 4
            }
            var dot = d0 + d1 + d2 + d3
            while (d < dim) { dot += v(d) * r(d); d += 1 }
            val sim = if (qn(b) == 0.0 || nc == 0.0) 0.0
              else dot / (qn(b) * nc)
            if (sim > bestSim(b)) {
              secondSim(b) = bestSim(b)
              bestSim(b) = sim; best(b) = c
            } else if (sim > secondSim(b)) { secondSim(b) = sim }
            b += 1
          }
          c += 1
        }
        b = 0
        while (b < m) { acc += best(b); b += 1 }
        i += m
      }
      val us = (System.nanoTime() - t0) / 1e3 / n
      println(f"KERNELDIAG $label $us%.1f us/row ($acc)")
    }
    roundSplit("split16_warm", 16)
    roundSplit("split16", 16)
  }
}
