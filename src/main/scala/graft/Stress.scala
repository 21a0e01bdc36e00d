package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale sanity check (dev main, not part of the driver contract):
  * synthesizes a corpus ~40x the sf0.1 documents table and pushes it
  * through the heaviest pipeline operators, verifying wall-time grows
  * roughly linearly (the LSH paths are shuffle-linear by design).
  *
  * Run: sbt "runMain graft.Stress [nDocs] [nVecs]"
  */
object Stress {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toInt).getOrElse(200000)
    val nVecs = args.lift(1).map(_.toInt).getOrElse(100000)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"STRESS $label ${(System.nanoTime() - t0) / 1e9}%.1fs"); r
    }

    // synthetic docs: ~50 pseudo-words from a 500-word vocab, deterministic
    val docs = spark.range(nDocs).select(col("id").as("doc_id"),
      concat_ws(" ", transform(sequence(lit(0), lit(49)),
        i => concat(lit("w"), pmod(xxhash64(col("id"), i), lit(500))))).as("text"))
      .repartition(64).cache()
    println(s"DOCS=${docs.count()}")

    time(s"minhashPairs over $nDocs docs") {
      val pairs = operators.Dedup.minhashPairs(docs, "doc_id", "text")
      println("MINHASH_DUPS=" + pairs.count())
    }
    time(s"simhashPairs over $nDocs docs") {
      println("SIMHASH_DUPS=" +
        operators.Dedup.simhashPairs(docs, "doc_id", "text").count())
    }
    time(s"exact dedup over $nDocs docs") {
      println("SURVIVORS=" + operators.Dedup.exact(docs, "doc_id", "text").count())
    }

    // synthetic embeddings: 64-dim deterministic pseudo-random doubles
    val vecs = spark.range(nVecs).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(63)),
        d => (pmod(xxhash64(col("id"), d), lit(2000)).cast("double") - 1000) / 1000.0)
        .as("embedding"))
      .repartition(64).cache()
    println(s"VECS=${vecs.count()}")

    // the production sizing (x_dedup_embedding's): planes from occupancy-2,
    // tables from the recall contract — a FIXED 12-plane schedule at 1M
    // vectors leaves occupancy ~244 and a cap-bounded ~128M-pair stream
    // (measured 157s; adaptive: the pair stream stays ~linear)
    time(s"embeddingNearDup over $nVecs vecs (adaptive schedule)") {
      val planes = operators.Similarity.adaptivePlanes(nVecs, targetOccupancy = 2)
      val tables = operators.Similarity.tablesForRecall(planes, cosine = 0.95)
      println("EMB_DUPS=" + operators.Dedup.embeddingNearDup(
        vecs, "vec_id", "embedding", threshold = 0.95, numPlanes = planes,
        numTables = tables).count())
    }
    // the broadcast-codebook batched assignment + cached sampled fit at a
    // scale the ScaleCheck corpora never reach (nlist caps at 4096, so
    // past ~200k vectors the per-vector assignment cost is the flat
    // 4096-codebook batch kernel — this row is the evidence)
    time(s"semanticNearDup over $nVecs vecs (nlist capped)") {
      val nlist = math.max(16L, math.min(4096L, nVecs / 48L)).toInt
      println("SEM_DUPS=" + operators.Dedup.semanticNearDup(
        vecs, "vec_id", "embedding", threshold = 0.99, nlist = nlist,
        iterations = 3, maxOccupancy = 384).count())
    }
    time(s"bruteForceTopK 10 queries x $nVecs corpus") {
      println("TOPK=" + operators.Similarity.bruteForceTopK(
        vecs, vecs.where(col("vec_id") < 10), "vec_id", "embedding", 10).count())
    }
    time(s"lshTopK (8 tables) 10 queries x $nVecs corpus") {
      println("LSH_TOPK=" + operators.Similarity.lshTopK(
        vecs, vecs.where(col("vec_id") < 10), "vec_id", "embedding", 10,
        numPlanes = 12, numTables = 8).count())
    }
    time(s"ivfTopK (nlist=64, nprobe=8) 10 queries x $nVecs corpus") {
      println("IVF_TOPK=" + operators.Similarity.ivfTopK(
        vecs, vecs.where(col("vec_id") < 10), "vec_id", "embedding", 10,
        nlist = 64, nprobe = 8, iterations = 2).count())
    }

    // synthetic events for the temporal joins: ~4x nDocs events across
    // nDocs/100 users over a simulated week
    val nEvents = nDocs * 4
    val events = spark.range(nEvents).select(
      pmod(xxhash64(col("id")), lit(nDocs / 100)).as("user_id"),
      (lit(1767225600000L) + pmod(xxhash64(col("id"), lit(1)), lit(604800000L)))
        .as("ms"),
      when(pmod(xxhash64(col("id"), lit(2)), lit(10)) < 7, "click")
        .otherwise("purchase").as("event_type"))
      .select(col("user_id"), col("ms"), col("event_type"),
        timestamp_millis(col("ms")).as("ts"))
      .repartition(64).cache()
    println(s"EVENTS=${events.count()}")

    time(s"asofBackward over $nEvents events") {
      val p = events.where(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"))
      val c = events.where(col("event_type") === "click")
        .groupBy("user_id", "ts").agg(max(col("ms")).cast("double").as("v"))
      println("ASOF=" + operators.AsofJoin
        .asofBackward(p, c, "user_id", "ts", Seq("v")).count())
    }
    time(s"rangeJoin over $nEvents events (30min windows)") {
      val c = events.where(col("event_type") === "click")
        .select(col("user_id"), col("ms").as("pt"))
      val w = events.where(col("event_type") === "purchase")
        .select(col("user_id"), (col("ms") - 1800000L).as("w_start"),
          col("ms").as("w_end"))
      println("RANGE=" + operators.RangeJoin.pointInInterval(
        c, w, "user_id", "pt", "w_start", "w_end", Seq.empty, 1800000L).count())
    }

    // connected components: nDocs nodes in chains of 100 (the slow-converging
    // shape — LSH dup clusters are near-cliques and converge much faster)
    time(s"connectedComponents over $nDocs-node chain graph") {
      val edges = spark.range(nDocs)
        .where(pmod(col("id"), lit(100)) =!= 99)
        .select(col("id").as("a"), (col("id") + 1).as("b"))
      println("CC_LABELS=" + operators.ConnectedComponents
        .clusters(edges, "a", "b").count())
    }

    // grouped quantile sketch at true high cardinality: nDocs rows across
    // nDocs/10 groups — the regime the exact rank locator refuses. The
    // exchange carries ~k doubles per group; the driver sees one row.
    time(s"graft_qsketch p50/p99 over ${nDocs / 10} groups") {
      functions.GraftFunctions.register(spark)
      val vals = spark.range(nDocs.toLong * 5)
        .select(pmod(col("id"), lit(nDocs / 10)).as("g"),
          (xxhash64(col("id")) % 10000).cast("double").as("v"))
      println("QSKETCH_GROUPS=" + vals.groupBy("g")
        .agg(functions.GraftFunctions
          .graft_qsketch(col("v"), 128, Seq(0.5, 0.99)).as("qs"))
        .where(element_at(col("qs"), 1).isNotNull).count())
    }

    // hot-key spill join: ONE key owns half the right side; per-key heap
    // capped far below it, so most of the group streams from spill
    time(s"spill join, ${nDocs / 2}-row hot key @10k heap bound") {
      import spark.implicits._
      val left = new engine.PairDataflow(
        Seq((0L, "hot"), (1L, "cold")).toDS())
      val right = new engine.PairDataflow(
        spark.range(nDocs / 2).map(i => (0L, i.longValue()))
          .union(spark.range(100).map(i => (1L, i.longValue()))))
      println("SPILL_JOIN=" + left.join(right, maxBufferedPerKey = 10000)
        .ds.count())
    }

    // repeated-text skew (r9 verdict #1): the exact set-join's worst
    // corpus — a 2000-member exact-copy block whose C(2000,2) ~ 2M pairs
    // are ALL true output, so no filter may prune them and the prefix-
    // inverted lists for the block's shingles are 2000 deep. A/B: the
    // production identity-collapse path vs the pre-collapse per-doc path
    // reconstructed from the SAME stage functions (each doc its own
    // 1-member group), so the delta is the collapse and nothing else.
    {
      functions.GraftFunctions.register(spark)
      val hot = spark.range(2000).select(
        (lit(5000000L) + col("id")).as("doc_id"),
        lit((0 until 60).map(i => s"hot$i").mkString(" ")).as("text"))
      val corpus = docs.where(col("doc_id") < nDocs / 4).unionByName(hot)
        .repartition(64).cache()
      println(s"PPJOIN_SKEW_DOCS=${corpus.count()}")
      time(s"ppjoinPairs repeated-text skew WITH collapse") {
        println("PPJOIN_SKEW_COLLAPSED=" + operators.Dedup.ppjoinPairs(
          corpus, "doc_id", "text", shingleK = 3, threshold = 0.8).count())
      }
      time(s"ppjoinPairs repeated-text skew WITHOUT collapse (A/B)") {
        val sh = corpus.select(col("doc_id").as("id"),
          functions.GraftFunctions.graft_shingles(
            functions.TextFunctions.tokens(col("text")), 3).as("s"))
        val agg = operators.Dedup.ppjoinAgg(sh)
        val perDoc = agg.withColumn("members", array(col("id")))
        val cand = operators.Dedup.ppjoinCandidatesFromAgg(perDoc, 0.8)
          .localCheckpoint(true)
        println("PPJOIN_SKEW_PERDOC=" + operators.Dedup
          .ppjoinVerifyExpand(perDoc, cand, 0.8).count())
      }
      corpus.unpersist()
    }

    // exact bipartite decontamination at corpus scale: the benchmark side
    // stays fixed (1000 refs) while the corpus is the full synthetic set —
    // candidate volume is bounded by the refs' prefixes, so this is the
    // pair-constancy claim from the x_cross_dedup scale row at 5-10x that
    // corpus
    time(s"crossJaccardJoin $nDocs docs x 1000 refs") {
      val refs = docs.where(col("doc_id") < 1000)
        .select(col("doc_id").as("rid"), col("text").as("rtext"))
      println("CROSS_PAIRS=" + operators.Dedup.crossJaccardJoin(
        docs, "doc_id", "text", refs, "rid", "rtext",
        shingleK = 3, threshold = 0.8).count())
    }
    // k-core peeling over the clique+tendril fixture shape at nDocs nodes:
    // rounds stay bounded by the 4-deep tendril regardless of node count
    time(s"kcore (k=2) over $nDocs-node clique+tendril graph") {
      val groups = spark.range(nDocs / 8).select((col("id") * 8).as("b"))
      val pairs = (for (a <- 0 until 4; c <- (a + 1) until 4)
        yield (a, c)) ++ Seq((0, 4), (4, 5), (5, 6), (6, 7))
      val offsets = array(pairs.map { case (a, c) =>
        struct(lit(a).as("a"), lit(c).as("c")) }: _*)
      val edges = groups.select(col("b"), explode(offsets).as("o"))
        .select((col("b") + col("o.a")).as("src"),
          (col("b") + col("o.c")).as("dst"))
      println("KCORE=" + operators.KCore.kcore(edges, 2).count())
    }
    // skyline over 5x nDocs points with a small dominance front: per-x
    // minima shrink the exchange, the driver folds P partition minima
    time(s"skyline2D over ${nDocs * 5} points") {
      val pts = spark.range(nDocs.toLong * 5).select(
        pmod(xxhash64(col("id")), lit(100000)).cast("double").as("x"),
        pmod(xxhash64(col("id"), lit(1)), lit(100000)).cast("double").as("y"))
      println("SKYLINE=" + operators.Skyline.skyline2D(pts, "x", "y").count())
    }
    // Misra-Gries at 5x nDocs increments into one merged summary: the
    // decrement-all path amortizes, the merged bound (n-m)/(k+1) holds
    time(s"graft_mg over ${nDocs * 5} skewed increments") {
      functions.GraftFunctions.register(spark)
      val keys = spark.range(nDocs.toLong * 5).select(
        when(pmod(col("id"), lit(4)) === 0, pmod(col("id"), lit(8)))
          .otherwise(lit(1000L) + pmod(xxhash64(col("id")), lit(50000)))
          .as("k"), pmod(col("id"), lit(64)).as("shard"))
      val merged = keys.groupBy("shard")
        .agg(functions.GraftFunctions.graft_mg(col("k")).as("mg"))
        .agg(functions.GraftFunctions.graft_mg_merge(col("mg")).as("sk"))
        .select(functions.GraftFunctions.graft_mg_stats(col("sk")).as("st"))
        .first().getAs[scala.collection.Seq[Long]](0)
      println(s"MG_N=${merged(0)} MG_M=${merged(1)}")
    }
    // one-pass Gram + eigensolve + projection at nVecs
    time(s"pca fit+project over $nVecs vecs") {
      val (values, comps, n) = operators.Pca.fit(vecs, "embedding", 8)
      println("PCA_N=" + n + " TOP=" + f"${values(0)}%.3f" +
        " PROJ=" + operators.Pca.project(vecs, "embedding", comps).count())
    }
    // interval overlap over per-user windows derived from the event set
    time(s"intervalOverlap over $nEvents-event windows") {
      val v = events.where(col("event_type") === "click")
        .groupBy("user_id").agg(min("ms").as("ls"), max("ms").as("le"))
      val p = events.where(col("event_type") === "purchase")
        .groupBy("user_id").agg(min("ms").as("rs"), max("ms").as("re"))
      println("OVERLAP=" + operators.RangeJoin.intervalOverlap(
        v, p, "user_id", "ls", "le", "rs", "re", 3600000L).count())
    }
    spark.stop()
  }
}
