package graft.functions

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.unsafe.types.UTF8String

/** Tight-loop kernels behind graft's native expressions. Catalyst's
  * higher-order functions (transform/aggregate/zip_with) are CodegenFallback
  * — interpreted per element — which makes them the bottleneck for
  * vector/sketch math at scale. These run as single JIT'd loops; the
  * expressions in NativeExpressions call them from both eval and codegen.
  */
object VectorOps {

  /** Cosine similarity of two double arrays (sequential accumulation, so
    * results are bit-stable and match a single-threaded oracle).
    */
  def cosine(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      // null elements are treated as absent dimensions (the return type must
      // stay primitive so the codegen call site assigns into a double)
      if (!a.isNullAt(i) && !b.isNullAt(i)) {
        val x = a.getDouble(i); val y = b.getDouble(i)
        dot += x * y; na += x * x; nb += y * y
      }
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** MinHash signature via double hashing (Kirsch-Mitzenmacher): per
    * shingle, TWO XXH64 string hashes (h1, h2) — hash family i is the
    * wrapping combination h1 + i*h2, and the signature keeps the per-family
    * minimum over the shingle set. The r5 kernel hashed every shingle
    * numHashes TIMES (64 full string passes per shingle): at 100 TB the
    * signature pass IS the minhash cost, and the combined family cuts the
    * string-hash work 32x while keeping the collision property
    * Pr[min_i(A) == min_i(B)] ~= J(A,B) that banding needs (the standard
    * construction for multi-hash sketches; h2 is forced odd so families
    * stay distinct mod 2^64). Empty set => Long.MaxValue sentinel (matches
    * TextFunctions.minhashSignature's coalesce).
    */
  def minhashSig(shingles: ArrayData, numHashes: Int): ArrayData = {
    val m = shingles.numElements()
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var j = 0
    while (j < m) {
      val s = if (shingles.isNullAt(j)) null else shingles.getUTF8String(j)
      if (s == null) { j += 1 } else {
      val base = s.getBaseObject; val off = s.getBaseOffset; val len = s.numBytes
      val h1 = XXH64.hashUnsafeBytes(base, off, len, 0L)
      val h2 = XXH64.hashUnsafeBytes(base, off, len, 0x9E3779B97F4A7C15L) | 1L
      var i = 0
      var h = h1
      while (i < numHashes) {
        if (h < sig(i)) sig(i) = h
        h += h2
        i += 1
      }
      j += 1
      }
    }
    new GenericArrayData(sig)
  }

  /** 64-bit SimHash from pre-hashed tokens: majority vote per bit. */
  def simhash64(tokenHashes: ArrayData): Long = {
    val n = tokenHashes.numElements()
    val votes = new Array[Int](64)
    var j = 0
    var nonNull = 0
    while (j < n) {
      if (tokenHashes.isNullAt(j)) { j += 1 }
      else {
      nonNull += 1
      val h = tokenHashes.getLong(j)
      var i = 0
      while (i < 64) {
        if (((h >>> i) & 1L) == 1L) votes(i) += 1
        i += 1
      }
      j += 1
      }
    }
    var out = 0L
    var i = 0
    while (i < 64) {
      if (votes(i) * 2 > nonNull) out |= (1L << i)
      i += 1
    }
    out
  }

  /** Deterministic hyperplane-LSH bucket: sign bits of numPlanes ±1-weight
    * projections; weights derived from XXH64(plane*65536+dim) — stateless,
    * identical on every executor.
    */
  def hyperplaneSig(vec: ArrayData, numPlanes: Int): Long =
    sigForTable(vec, numPlanes, 0L)

  /** One table's signature: sign bits of numPlanes projections whose
    * +-1 weights come from XXH64(plane*65536+dim, table). Shared by the
    * single-signature and OR-amplified variants.
    */
  private def sigForTable(vec: ArrayData, numPlanes: Int, table: Long): Long = {
    val n = vec.numElements()
    var sig = 0L
    var p = 0
    while (p < numPlanes) {
      var proj = 0.0
      var d = 0
      while (d < n) {
        if (!vec.isNullAt(d)) {
          val w = if ((XXH64.hashLong(p.toLong * 65536 + d, table) & 8L) == 8L) 1.0 else -1.0
          proj += vec.getDouble(d) * w
        }
        d += 1
      }
      if (proj > 0) sig |= (1L << p)
      p += 1
    }
    sig
  }

  /** Index (0-based) of the centroid with the highest cosine similarity to
    * `vec`; ties break to the lowest index. Centroids arrive as an
    * array<array<double>> literal, so the k-means assignment step is a
    * narrow per-row projection — no replication of the corpus, no shuffle
    * (the fix for the crossJoin+window argmin the round-1 review flagged:
    * that plan exchanged the whole corpus once per Lloyd's iteration).
    */
  def nearestCentroid(vec: ArrayData, centroids: ArrayData): Int = {
    val m = centroids.numElements()
    var best = -1
    var bestSim = Double.NegativeInfinity
    var c = 0
    while (c < m) {
      if (!centroids.isNullAt(c)) {
        val sim = cosine(vec, centroids.getArray(c))
        if (sim > bestSim) { bestSim = sim; best = c }
      }
      c += 1
    }
    best
  }

  /** numTables independent hyperplane-LSH signatures (OR-amplification):
    * signature t draws its ±1 plane weights from XXH64 seeded by t, so
    * element 0 is bit-identical to hyperplaneSig (seed 0). Candidate
    * generation ORs over the tables — at cosine 0.95 a single 8-plane
    * signature collides with probability ~0.4; eight OR'd tables push
    * recall past 0.98 while each bucket join stays shuffle-linear.
    */
  def hyperplaneSigs(vec: ArrayData, numPlanes: Int, numTables: Int): ArrayData = {
    val sigs = new Array[Long](numTables)
    var t = 0
    while (t < numTables) {
      sigs(t) = sigForTable(vec, numPlanes, t.toLong)
      t += 1
    }
    new GenericArrayData(sigs)
  }

  /** Multi-probe LSH probe set (Lv et al., VLDB'07): per table, the base
    * signature plus the (nProbes-1) CHEAPEST sign perturbations, where
    * flipping a set of planes costs the sum of their |projection| margins —
    * the planes whose sign decision was closest to the boundary are the
    * ones a true near neighbor most likely landed on the other side of.
    * Perturbation sets are enumerated cheapest-first with the shift/expand
    * successor heap over margin-ascending plane ranks (each set generated
    * exactly once; successors never cost less than their parent).
    *
    * Why it matters at scale: recall that OR-amplification buys with MORE
    * TABLES, multi-probe buys with more lookups into the SAME table — the
    * corpus-side cost (tables x hashes per vector, tables x index copies
    * for a persisted index) drops by the table ratio while only the
    * driver-small query side fans out. lshTopK with (T=2, probes=4)
    * matches the recall of (T=8, probes=1) at a quarter of the corpus
    * hashing/explode work (measured in LshScheduleSpec).
    *
    * Layout: table-major — element t*nProbes+j is table t's j-th probe;
    * j=0 is the base signature, bit-identical to hyperplaneSigs' element t.
    * If nProbes exceeds the 2^numPlanes-1 possible perturbations the tail
    * repeats the base signature (harmless duplicate lookups).
    */
  def hyperplaneProbes(vec: ArrayData, numPlanes: Int, numTables: Int,
      nProbes: Int): ArrayData = {
    val out = new Array[Long](numTables * nProbes)
    val n = vec.numElements()
    val proj = new Array[Double](numPlanes)
    var t = 0
    while (t < numTables) {
      // projections + signature for this table (same weights as sigForTable)
      var sig = 0L
      var p = 0
      while (p < numPlanes) {
        var pr = 0.0
        var d = 0
        while (d < n) {
          if (!vec.isNullAt(d)) {
            val w = if ((XXH64.hashLong(p.toLong * 65536 + d, t.toLong) & 8L) == 8L) 1.0 else -1.0
            pr += vec.getDouble(d) * w
          }
          d += 1
        }
        proj(p) = pr
        if (pr > 0) sig |= (1L << p)
        p += 1
      }
      out(t * nProbes) = sig
      if (nProbes > 1) {
        // plane indices in ascending |margin| order (insertion sort — ≤63)
        val order = new Array[Int](numPlanes)
        var i = 0
        while (i < numPlanes) { order(i) = i; i += 1 }
        i = 1
        while (i < numPlanes) {
          val v = order(i); val mv = math.abs(proj(v))
          var j = i - 1
          while (j >= 0 && math.abs(proj(order(j))) > mv) {
            order(j + 1) = order(j); j -= 1
          }
          order(j + 1) = v
          i += 1
        }
        val margin = new Array[Double](numPlanes)
        i = 0
        while (i < numPlanes) { margin(i) = math.abs(proj(order(i))); i += 1 }
        // cheapest-first enumeration: sets over RANKS as a Long bitmask;
        // successors of a set whose max rank is m: shift (m -> m+1) and
        // expand (add m+1)
        // heap entries: {costBits (raw double bits — cost is finite
        // non-negative, safe to round-trip), rank-set bitmask, max rank}
        val heap = new java.util.PriorityQueue[Array[Long]](
          (a: Array[Long], b: Array[Long]) => java.lang.Double.compare(
            java.lang.Double.longBitsToDouble(a(0)),
            java.lang.Double.longBitsToDouble(b(0))))
        heap.add(Array(java.lang.Double.doubleToRawLongBits(margin(0)), 1L, 0L))
        var emitted = 1
        while (emitted < nProbes && !heap.isEmpty) {
          val top = heap.poll()
          val cost = java.lang.Double.longBitsToDouble(top(0))
          val set = top(1)
          val maxRank = top(2).toInt
          var probe = sig
          var s = set
          var r = 0
          while (s != 0L) {
            if ((s & 1L) != 0L) probe ^= (1L << order(r))
            s >>>= 1; r += 1
          }
          out(t * nProbes + emitted) = probe
          emitted += 1
          if (maxRank + 1 < numPlanes) {
            heap.add(Array(java.lang.Double.doubleToRawLongBits(
              cost - margin(maxRank) + margin(maxRank + 1)),
              (set ^ (1L << maxRank)) | (1L << (maxRank + 1)),
              (maxRank + 1).toLong))
            heap.add(Array(java.lang.Double.doubleToRawLongBits(
              cost + margin(maxRank + 1)),
              set | (1L << (maxRank + 1)),
              (maxRank + 1).toLong))
          }
        }
        while (emitted < nProbes) { out(t * nProbes + emitted) = sig; emitted += 1 }
      }
      t += 1
    }
    new GenericArrayData(out)
  }

  /** Plain-array cosine (for RDD-side k-means partials; same math as the
    * ArrayData overload).
    */
  def cosineArr(a: Array[Double], b: Array[Double]): Double = {
    val n = math.min(a.length, b.length)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i)
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Plain-array nearest centroid (ties -> lowest index), matching the
    * ArrayData overload bit-for-bit.
    */
  def nearestCentroidArr(vec: Array[Double], centroids: Array[Array[Double]]): Int = {
    var best = -1
    var bestSim = Double.NegativeInfinity
    var c = 0
    while (c < centroids.length) {
      val sim = cosineArr(vec, centroids(c))
      if (sim > bestSim) { bestSim = sim; best = c }
      c += 1
    }
    best
  }

  /** Squared L2 distance (missing/null dims contribute 0 — same absent-
    * dimension convention as cosine above).
    */
  def sqDist(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i)) {
        val d = a.getDouble(i) - b.getDouble(i)
        acc += d * d
      }
      i += 1
    }
    acc
  }

  def sqDistArr(a: Array[Double], b: Array[Double]): Double = {
    val n = math.min(a.length, b.length)
    var acc = 0.0
    var i = 0
    while (i < n) { val d = a(i) - b(i); acc += d * d; i += 1 }
    acc
  }

  /** Index of the min-squared-L2 centroid (ties -> lowest index) — the
    * assignment metric PQ codebooks use (Jégou TPAMI'11 / FAISS fit each
    * subspace's k-means in L2): cosine assignment would discard subvector
    * MAGNITUDE, merging codes for subvectors that differ only in norm and
    * leaving the ADC reconstruction error unbounded when energy varies
    * across subspaces. Cosine remains the final full-vector search metric;
    * only the per-subspace quantizer is Euclidean.
    */
  def nearestCentroidL2(vec: ArrayData, centroids: ArrayData): Int = {
    val m = centroids.numElements()
    var best = -1
    var bestDist = Double.PositiveInfinity
    var c = 0
    while (c < m) {
      if (!centroids.isNullAt(c)) {
        val d = sqDist(vec, centroids.getArray(c))
        if (d < bestDist) { bestDist = d; best = c }
      }
      c += 1
    }
    best
  }

  /** Indices of the TWO max-cosine centroids, best first (ties -> lowest
    * index; a 1-centroid codebook repeats the winner). Multi-assignment is
    * the boundary fix for cluster-bucketed semantic dedup (SemDeDup,
    * Abbas et al. arXiv:2303.09540 §B notes near-dups straddling a k-means
    * face are invisible to a single-cluster pass): a pair split by the
    * Voronoi boundary still meets if EITHER point's runner-up list reaches
    * across it, at exactly 2x the bucket-join work — the same cost shape
    * as IVF's nprobe on the query side.
    */
  def nearest2Centroids(vec: ArrayData, centroids: ArrayData): ArrayData = {
    val cm = centroidMatrix(centroids)
    if (cm != null && cm.clean) {
      // Fast path: the centroid literal is one ArrayData instance reused
      // for EVERY row (a folded typedlit), so the matrix is converted to
      // primitive arrays once per executor, not once per row, and the
      // query vector's norm is hoisted out of the per-centroid loop —
      // together ~3x on the n x nlist assignment pass that dominates
      // semantic dedup at large n (SemDiag, 100x ScaleCheck corpus).
      // Bit-identical to the general path on clean input: same ascending
      // accumulation order, same dot/(sqrt(na)*sqrt(nb)) expression.
      val len = vec.numElements()
      var hasNull = false
      var i = 0
      while (i < len && !hasNull) { hasNull = vec.isNullAt(i); i += 1 }
      if (!hasNull && len == cm.dim) {
        val v = vec.toDoubleArray()
        var na = 0.0
        i = 0
        while (i < len) { val x = v(i); na += x * x; i += 1 }
        val sqNa = math.sqrt(na)
        val rows = cm.rows
        var best = -1; var bestSim = Double.NegativeInfinity
        var second = -1; var secondSim = Double.NegativeInfinity
        var c = 0
        while (c < rows.length) {
          val r = rows(c)
          var dot = 0.0
          var d = 0
          while (d < len) { dot += v(d) * r(d); d += 1 }
          val sim =
            if (na == 0.0 || cm.norms(c) == 0.0) 0.0
            else dot / (sqNa * cm.norms(c))
          if (sim > bestSim) {
            secondSim = bestSim; second = best
            bestSim = sim; best = c
          } else if (sim > secondSim) { secondSim = sim; second = c }
          c += 1
        }
        if (second < 0) second = best
        return new GenericArrayData(Array(best, second))
      }
    }
    nearest2CentroidsGeneral(vec, centroids)
  }

  private def nearest2CentroidsGeneral(vec: ArrayData, centroids: ArrayData): ArrayData = {
    val m = centroids.numElements()
    var best = -1; var bestSim = Double.NegativeInfinity
    var second = -1; var secondSim = Double.NegativeInfinity
    var c = 0
    while (c < m) {
      if (!centroids.isNullAt(c)) {
        val sim = cosine(vec, centroids.getArray(c))
        if (sim > bestSim) {
          secondSim = bestSim; second = best
          bestSim = sim; best = c
        } else if (sim > secondSim) { secondSim = sim; second = c }
      }
      c += 1
    }
    if (second < 0) second = best
    new GenericArrayData(Array(best, second))
  }

  /** Memoized primitive conversion of a centroid-matrix literal. `clean`
    * means: no null rows, no null elements, uniform dimension — the fast
    * path's preconditions (null elements carry "absent dimension"
    * semantics the hoisted-norm loop can't honor; mixed dims make the
    * query norm centroid-dependent). Single-entry identity cache holding
    * the key INSIDE the value so publication is one volatile write — two
    * separate key/value fields can interleave under concurrent queries
    * with different codebooks and pair one query's key with the other's
    * matrix (a silent wrong-assignment race). A racy miss-streak counter
    * turns the cache off when the argument is not a reused literal
    * (per-row centroid column, or concurrent literals ping-ponging):
    * past the streak bound callers fall back to the general path instead
    * of paying an O(nlist*dim) conversion per row.
    */
  private final class CentroidMatrix(val key: ArrayData,
      val rows: Array[Array[Double]],
      val norms: Array[Double], val dim: Int, val clean: Boolean)
  @volatile private var n2cCache: CentroidMatrix = null
  @volatile private var n2cMisses: Int = 0
  private final val N2cMissBail = 64

  /** Returns null when the access pattern defeated the cache (see above)
    * — callers must then use the general per-row path.
    */
  private def centroidMatrix(c: ArrayData): CentroidMatrix = {
    val cached = n2cCache
    if (cached != null && (cached.key eq c)) {
      // Literal is stable again: cheaply re-arm the streak counter
      // (write only when non-zero so the hot hit path stays read-only).
      if (n2cMisses != 0) n2cMisses = 0
      return cached
    }
    if (n2cMisses >= N2cMissBail) return null
    n2cMisses += 1 // racy increment — a heuristic, not a correctness guard
    val m = c.numElements()
    val rows = new Array[Array[Double]](m)
    val norms = new Array[Double](m)
    var clean = m > 0
    var dim = -1
    var i = 0
    while (i < m && clean) {
      if (c.isNullAt(i)) clean = false
      else {
        val r = c.getArray(i)
        val len = r.numElements()
        if (dim < 0) dim = len
        if (len != dim) clean = false
        else {
          var j = 0
          while (j < len && clean) { clean = !r.isNullAt(j); j += 1 }
          if (clean) {
            val arr = r.toDoubleArray()
            rows(i) = arr
            var nb = 0.0
            j = 0
            while (j < len) { val x = arr(j); nb += x * x; j += 1 }
            norms(i) = math.sqrt(nb)
          }
        }
      }
      i += 1
    }
    val res = new CentroidMatrix(c, rows, norms, dim, clean)
    n2cCache = res
    res
  }

  /** Plain-array twin of nearestCentroidL2 (RDD-side k-means partials). */
  def nearestCentroidL2Arr(vec: Array[Double], centroids: Array[Array[Double]]): Int = {
    var best = -1
    var bestDist = Double.PositiveInfinity
    var c = 0
    while (c < centroids.length) {
      val d = sqDistArr(vec, centroids(c))
      if (d < bestDist) { bestDist = d; best = c }
      c += 1
    }
    best
  }

  /** Deterministic Johnson-Lindenstrauss random projection to outDim
    * dimensions: +-1/sqrt(outDim) weights drawn from XXH64(j*65536+d, 7777)
    * — stateless, identical on every executor, no fitted model to ship.
    * Pairwise cosines/distances are preserved within the JL distortion
    * bound, which the x_dim_reduce query measures in-row.
    */
  def project(vec: ArrayData, outDim: Int): ArrayData = {
    val n = vec.numElements()
    val out = new Array[Double](outDim)
    val scale = 1.0 / math.sqrt(outDim)
    var j = 0
    while (j < outDim) {
      var acc = 0.0
      var d = 0
      while (d < n) {
        if (!vec.isNullAt(d)) {
          val w = if ((XXH64.hashLong(j.toLong * 65536 + d, 7777L) & 8L) == 8L) 1.0 else -1.0
          acc += vec.getDouble(d) * w
        }
        d += 1
      }
      out(j) = acc * scale
      j += 1
    }
    new GenericArrayData(out)
  }

  /** XXH64 of a UTF8String with seed (shared by expressions/tests). */
  def hashString(s: UTF8String, seed: Long): Long =
    XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, seed)

  private val ShingleSep = UTF8String.fromString(" ")

  /** Distinct word k-shingles from a token array. Short docs (< k tokens)
    * yield the whole text as one shingle — mirrors
    * TextFunctions.shingles' guard branch.
    */
  def shingleSet(tokens: ArrayData, k: Int): ArrayData = {
    val n = tokens.numElements()
    val toks = new Array[UTF8String](n)
    var i = 0
    while (i < n) {
      toks(i) = if (tokens.isNullAt(i)) UTF8String.EMPTY_UTF8 else tokens.getUTF8String(i)
      i += 1
    }
    val seen = new java.util.LinkedHashSet[UTF8String]()
    if (n < k) {
      seen.add(UTF8String.concatWs(ShingleSep, toks: _*))
    } else {
      i = 0
      val window = new Array[UTF8String](k)
      while (i <= n - k) {
        var j = 0
        while (j < k) { window(j) = toks(i + j); j += 1 }
        seen.add(UTF8String.concatWs(ShingleSep, window: _*))
        i += 1
      }
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[AnyRef]])
  }
}
