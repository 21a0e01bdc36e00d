package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev diagnostics main (not part of the driver contract): decompose
  * ppjoinPairs' cost at a corpus — shingle df aggregate, prefix window,
  * candidate volume, verify join — the MinhashDiag discipline for the new
  * x_jaccard_join scale row. Usage: runMain graft.PpjoinDiag [sfDir]
  */
object PpjoinDiag {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf100")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    import graft.functions.GraftFunctions.graft_shingles
    import graft.functions.TextFunctions.tokens

    def t[A](what: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"PPJDIAG $what ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }

    val threshold = 0.8
    // --skew: the repeated-text A/B (r9 verdict #1) on a synthetic corpus —
    // production identity-collapse path vs the pre-collapse per-doc path
    // rebuilt from the same stage functions. Usage:
    //   runMain graft.PpjoinDiag --skew [nBase] [nHot]
    if (args.contains("--skew")) {
      val rest = args.filterNot(_ == "--skew")
      val nBase = rest.headOption.map(_.toInt).getOrElse(50000)
      val nHot = rest.lift(1).map(_.toInt).getOrElse(2000)
      val base = spark.range(nBase).select(col("id").as("doc_id"),
        concat_ws(" ", transform(sequence(lit(0), lit(49)),
          i => concat(lit("w"), pmod(xxhash64(col("id"), i), lit(500)))))
          .as("text"))
      val hot = spark.range(nHot).select(
        (lit(5000000L) + col("id")).as("doc_id"),
        lit((0 until 60).map(i => s"hot$i").mkString(" ")).as("text"))
      val corpus = base.unionByName(hot).repartition(64)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      println(s"PPJDIAG skew docs=${corpus.count()}")
      t("skew_collapsed")(println("PPJDIAG collapsed_pairs=" +
        graft.operators.Dedup.ppjoinPairs(
          corpus, "doc_id", "text", 3, threshold).count()))
      t("skew_perdoc") {
        val shk = corpus.select(col("doc_id").as("id"),
          graft_shingles(tokens(col("text")), 3).as("s"))
        val agg = graft.operators.Dedup.ppjoinAgg(shk)
        val perDoc = agg.withColumn("members", array(col("id")))
        val cand = graft.operators.Dedup
          .ppjoinCandidatesFromAgg(perDoc, threshold).localCheckpoint(true)
        println("PPJDIAG perdoc_pairs=" + graft.operators.Dedup
          .ppjoinVerifyExpand(perDoc, cand, threshold).count())
      }
      corpus.unpersist()
      spark.stop(); return
    }
    // --plan: print the interior (un-checkpointed) rank-frame plan — is
    // the ex-by-g exchange reused between the df aggregate and the
    // df-attach join, or paid twice?
    if (args.contains("--plan")) {
      val docs0 = Tables(spark, dir, "documents").select("doc_id", "text")
      val sh0 = docs0.select(col("doc_id").as("id"),
        graft_shingles(tokens(col("text")), 3).as("s"))
      val ex0 = sh0.select(col("id"), size(col("s")).as("len"),
        explode(col("s")).as("g"))
        .repartition(col("g"))
      val dfreq0 = ex0.groupBy("g").agg(count(lit(1)).as("df"))
        .withColumn("gid", monotonically_increasing_id())
      ex0.join(dfreq0.hint("shuffle_hash"), "g")
        .groupBy("id").agg(count(lit(1)).as("n"))
        .explain("formatted")
      spark.stop(); return
    }
    val docs = Tables(spark, dir, "documents").select("doc_id", "text")
    val injected = docs.where(col("doc_id") < 20)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        concat(col("text"), lit(" graftdup")).as("text"))
    val all = docs.unionByName(injected)

    val sh = all.select(col("doc_id").as("id"),
      graft_shingles(tokens(col("text")), 3).as("s"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(s"PPJDIAG docs=${sh.count()}")
    val ex = sh.select(col("id"), size(col("s")).as("len"),
      explode(col("s")).as("g"))
    t("explode_count")(ex.count())
    val dfreq = ex.groupBy("g").agg(count(lit(1)).as("df"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    t("dfreq")(println(s"PPJDIAG distinct_shingles=${dfreq.count()}"))
    t("join_only")(ex.join(dfreq, "g").count())
    val dfreqGid = dfreq.withColumn("gid", monotonically_increasing_id())
    val prefix = ex.join(dfreqGid, "g")
      .groupBy("id").agg(
        array_sort(collect_list(struct(col("df"), col("gid")))).as("sorted"),
        first(col("len")).as("len"))
      .select(col("id"), col("len"),
        posexplode(slice(col("sorted"), lit(1),
          col("len") - floor(lit(threshold) * col("len")).cast("int") + 1)))
      .select(col("col.gid").as("gid"), col("id"), col("len"),
        (col("pos") + 1).as("rank"))
      .localCheckpoint(true)
    t("prefix_agg")(println(s"PPJDIAG prefix_rows=${prefix.count()}"))
    val a = prefix.select(col("gid"), col("id").as("id1"),
      col("len").as("len1"), col("rank").as("rank1"))
    val b = prefix.select(col("gid"), col("id").as("id2"),
      col("len").as("len2"), col("rank").as("rank2"))
    val lengthOk = col("id1") < col("id2") &&
      least(col("len1"), col("len2")).cast("double") >=
        lit(threshold) * greatest(col("len1"), col("len2")) - lit(1e-9)
    val needed = lit(threshold / (1.0 + threshold)) *
      (col("len1") + col("len2")) - lit(1e-9)
    val positionalOk = (lit(1) + least(col("len1") - col("rank1"),
      col("len2") - col("rank2"))).cast("double") >= needed
    t("raw_join_count")(println("PPJDIAG raw_pairs=" +
      a.join(b, Seq("gid")).where(lengthOk).count()))
    val cand = a.join(b, Seq("gid")).where(lengthOk && positionalOk)
      .select("id1", "id2")
    t("positional_count")(println(s"PPJDIAG positional_pairs=${cand.count()}"))
    val dedup = cand.dropDuplicates("id1", "id2")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    t("distinct_pairs")(println(s"PPJDIAG candidates=${dedup.count()}"))
    val verified = dedup
      .join(sh.select(col("id").as("id1"), col("s").as("s1")), "id1")
      .join(sh.select(col("id").as("id2"), col("s").as("s2")), "id2")
      .withColumn("u", size(array_union(col("s1"), col("s2"))).cast("double"))
      .withColumn("jaccard",
        (size(col("s1")) + size(col("s2")) - col("u")) / col("u"))
      .where(col("jaccard") >= threshold)
    t("verify")(println(s"PPJDIAG survivors=${verified.count()}"))
    t("end_to_end")(graft.operators.Dedup.ppjoinPairs(
      all, "doc_id", "text", 3, threshold).count())
    spark.stop()
  }
}
