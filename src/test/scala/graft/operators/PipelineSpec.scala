package graft.operators

import graft.{SparkSpec, Tables}
import graft.functions.{GraftFunctions, TextFunctions}
import org.apache.spark.sql.functions._

class PipelineSpec extends SparkSpec {

  import spark.implicits._

  lazy val docs = Tables(spark, sf0001, "documents").cache()
  lazy val emb = Tables(spark, sf0001, "embeddings").cache()

  test("exact dedup removes injected duplicates, keeps lowest id") {
    val dup = docs.limit(5).withColumn("doc_id", col("doc_id") + 1000000)
    val withDups = docs.unionByName(dup)
    val deduped = Dedup.exact(withDups, "doc_id", "text")
    assert(deduped.count() == docs.count())
    // survivors are the original (low) ids
    assert(deduped.where(col("doc_id") >= 1000000).count() == 0)
  }

  test("minhash LSH finds exact and near duplicates") {
    // inject: 3 exact copies + 1 near copy (one token changed)
    val base = docs.limit(3).select(col("doc_id") + 2000000 as "doc_id", col("text"))
    val near = docs.limit(1).select(col("doc_id") + 3000000 as "doc_id",
      concat(col("text"), lit(" perturbed")).as("text"))
    val corpus = docs.select("doc_id", "text").unionByName(base).unionByName(near)
    val pairs = Dedup.minhashPairs(corpus, "doc_id", "text", threshold = 0.5).collect()
    val pairSet = pairs.map(r => (r.getLong(0), r.getLong(1))).toSet
    // exact copies must be found with jaccard 1.0
    assert((0 until 3).forall(i => pairSet.contains((i.toLong, i + 2000000L))),
      s"missing exact-dup pairs in $pairSet")
    // the near-dup pair should also surface (high shingle overlap)
    assert(pairSet.contains((0L, 3000000L)), s"missing near-dup pair in $pairSet")
    assert(pairs.forall(_.getDouble(2) >= 0.5))
  }

  test("minhash signature is deterministic across runs") {
    val sig = docs.select(TextFunctions.minhashSignature(
      TextFunctions.shingles(TextFunctions.tokens(col("text")), 3), 16).as("sig"))
    assert(sig.collect().map(_.getSeq[Long](0)) sameElements
      sig.collect().map(_.getSeq[Long](0)))
  }

  test("simhash: identical docs collide, perturbed docs are close") {
    val copy = docs.limit(2).select(col("doc_id") + 5000000 as "doc_id", col("text"))
    val corpus = docs.select("doc_id", "text").unionByName(copy)
    val pairs = Dedup.simhashPairs(corpus, "doc_id", "text", maxHamming = 3).collect()
    val pairSet = pairs.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert((0 until 2).forall(i => pairSet.contains((i.toLong, i + 5000000L))))
    assert(pairs.filter(r => r.getLong(1) >= 5000000).forall(_.getInt(2) == 0))
  }

  test("ngram jaccard of a doc with itself is 1.0") {
    val pairs = docs.select(col("doc_id").as("id1"), col("doc_id").as("id2"))
    val j = Dedup.jaccardOfPairs(pairs, docs, "doc_id", "text")
    assert(j.where(col("jaccard") =!= 1.0).count() == 0)
  }

  test("brute-force cosine top-k: self is rank 1 with sim 1.0") {
    val topk = Similarity.bruteForceTopK(emb, emb.where(col("vec_id") < 3),
      "vec_id", "embedding", k = 5)
    val rows = topk.collect()
    assert(rows.length == 15)
    val top1 = rows.filter(r => r.getDouble(2) >= 0.9999)
    assert(top1.map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((0L, 0L), (1L, 1L), (2L, 2L)))
  }

  test("int8-quantized top-k: tiny cosine error, dims preserved, recall vs exact") {
    // quantization error bound: cos(quant(v), v) >= 0.999 for every corpus
    // vector (max-abs scaling, 1/254 rounding step per dimension)
    import graft.functions.GraftFunctions.graft_cosine
    val err = emb.select(graft_cosine(
      Similarity.quantizeInt8(col("embedding").cast("array<double>"))
        .cast("array<double>"),
      col("embedding").cast("array<double>")).as("c"))
      .where(col("c") < 0.999).count()
    assert(err == 0)
    // dimension count survives quantization exactly
    val dimMismatch = emb.where(
      size(Similarity.quantizeInt8(col("embedding").cast("array<double>")))
        =!= size(col("embedding"))).count()
    assert(dimMismatch == 0)
    // asymmetric quantized search reproduces the exact top-10 on the fixture
    val queries = emb.where(col("vec_id") < 3)
    val qt = Similarity.quantizedTopK(emb, queries, "vec_id", "embedding", 10)
      .select("qid", "vid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val bf = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 10)
      .select("qid", "vid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(bf.intersect(qt).size >= 27, s"recall ${bf.intersect(qt).size}/30")
    // self is still rank-1 with sim ~1.0 through the quantized path
    assert(Set(0L, 1L, 2L).subsetOf(
      Similarity.quantizedTopK(emb, queries, "vec_id", "embedding", 1)
        .where(col("vid") === col("qid")).collect().map(_.getLong(0)).toSet))
    // composed path: IVF lists over int8 storage — recall vs exact truth
    // within the same bound the full-precision IVF path meets
    val ivfq = Similarity.ivfTopK(emb, queries, "vec_id", "embedding", 10,
      nlist = 8, nprobe = 4, iterations = 2, quantizeStorage = true)
      .select("qid", "vid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(bf.intersect(ivfq).size >= 24, s"IVF+int8 ${bf.intersect(ivfq).size}/30")
  }

  test("product quantization: deterministic fit, valid codes, planted-pair ADC recall") {
    import graft.operators.ProductQuantizer
    // fit is deterministic: same corpus, same seeding -> identical codebooks
    val cb1 = ProductQuantizer.fit(emb, "embedding", "vec_id", m = 8, kCodes = 16, iterations = 2)
    val cb2 = ProductQuantizer.fit(emb, "embedding", "vec_id", m = 8, kCodes = 16, iterations = 2)
    assert(cb1.m == 8 && cb1.subDim == 8)
    assert(cb1.codes.flatten.flatten.toSeq == cb2.codes.flatten.flatten.toSeq)
    // every code id is a valid tinyint index into its codebook
    val coded = emb.select(ProductQuantizer.encode(col("embedding"), cb1).as("c"))
    assert(coded.where(exists(col("c"),
      x => x < 0 || x >= cb1.codes(0).length)).count() == 0)
    assert(coded.where(size(col("c")) =!= 8).count() == 0)
    // ADC retrieval: perturbed copies (cosine ~0.97) must find their source
    // in the top-10 — the 0.97-vs-0.3 margin dwarfs PQ quantization error
    val perturbed = emb.where(col("vec_id") < 10)
      .select((col("vec_id") + 1000000L).as("vec_id"),
        transform(col("embedding").cast("array<double>"),
          (x, i) => x * (lit(1.0) + lit(0.1) * sin(i.cast("double")))).as("embedding"))
    val found = ProductQuantizer.adcTopK(emb, perturbed, "vec_id", "embedding", 10)
      .where(col("vid") === col("qid") - 1000000L).count()
    assert(found >= 8, s"ADC recovered only $found/10 planted neighbors")
  }

  test("ivf-pq: composed lists + codes keep planted-pair recall and prune candidates") {
    import graft.operators.ProductQuantizer
    val perturbed = emb.where(col("vec_id") < 10)
      .select((col("vec_id") + 1000000L).as("vec_id"),
        transform(col("embedding").cast("array<double>"),
          (x, i) => x * (lit(1.0) + lit(0.1) * sin(i.cast("double")))).as("embedding"))
    val found = ProductQuantizer.ivfAdcTopK(emb, perturbed, "vec_id", "embedding",
      k = 10, nlist = 8, nprobe = 4, iterations = 2)
      .where(col("vid") === col("qid") - 1000000L).count()
    assert(found >= 8, s"IVF-PQ recovered only $found/10 planted neighbors")
    // the coarse lists actually prune: with nprobe=4 of nlist=8 lists each
    // query scores a strict subset of the corpus (<= ~70% even under skewed
    // list sizes on the tiny fixture), never the full cross product
    val nCand = ProductQuantizer.candidateCount(emb, perturbed,
      "vec_id", "embedding", nlist = 8, nprobe = 4, iterations = 2)
    val full = emb.count() * perturbed.count()
    assert(nCand < full * 7 / 10, s"IVF-PQ scored $nCand of $full pairs — no pruning")
    // candidateCount recomputes the deterministic layout, so a second call
    // agrees with the first — the attestation attests the searched lists
    assert(nCand == ProductQuantizer.candidateCount(emb, perturbed,
      "vec_id", "embedding", nlist = 8, nprobe = 4, iterations = 2))
  }

  test("ivf-pq residual A/B: same bytes, raw vs residual encoding recall") {
    import graft.operators.ProductQuantizer
    val perturbed = emb.where(col("vec_id") < 10)
      .select((col("vec_id") + 1000000L).as("vec_id"),
        transform(col("embedding").cast("array<double>"),
          (x, i) => x * (lit(1.0) + lit(0.1) * sin(i.cast("double")))).as("embedding"))
    def recall(m: Int, kCodes: Int, residual: Boolean): Long =
      ProductQuantizer.ivfAdcTopK(emb, perturbed, "vec_id", "embedding",
        k = 10, m = m, kCodes = kCodes, nlist = 8, nprobe = 4, iterations = 2,
        residual = residual)
        .where(col("vid") === col("qid") - 1000000L).count()
    // planted-pair gate (8 bytes/vector): both encodings must recover the
    // cosine-0.97 copies — the 0.97-vs-0.3 margin dwarfs either encoding's
    // quantization error, so this is a floor, not a discriminator
    val raw8 = recall(8, 16, residual = false)
    val res8 = recall(8, 16, residual = true)
    info(s"planted m=8,k=16: raw $raw8/10, residual $res8/10")
    assert(raw8 >= 8 && res8 >= 8,
      s"comfortable-budget recall raw $raw8/10 residual $res8/10")
    // the discriminating measurement: exact-top-10 agreement vs brute-force
    // truth at a starved budget (4 bytes/vector, 3-bit codes), where ADC
    // table fidelity actually binds. Same deterministic coarse lists both
    // arms (fitCentroids is seeded + fixed-iteration), so the delta
    // isolates the ENCODING: residual codebooks spend their 8 entries on
    // within-list variation instead of the coarse structure the cid
    // already captures.
    def agree(m: Int, kCodes: Int, residual: Boolean): Int = {
      val approx = ProductQuantizer.ivfAdcTopK(emb, perturbed, "vec_id",
        "embedding", k = 10, m = m, kCodes = kCodes, nlist = 8, nprobe = 4,
        iterations = 2, residual = residual)
        .select("qid", "vid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val truth = Similarity.bruteForceTopK(emb, perturbed, "vec_id",
        "embedding", 10)
        .select("qid", "vid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      truth.intersect(approx).size
    }
    val rawAgree = agree(4, 8, residual = false)
    val resAgree = agree(4, 8, residual = true)
    info(s"truth-agreement m=4,k=8: raw $rawAgree/100, residual $resAgree/100")
    assert(resAgree >= rawAgree,
      s"starved-budget residual $resAgree/100 trails raw $rawAgree/100 — " +
        "the FAISS construction should concentrate precision, not lose it")
  }

  test("knn join: planted pairs are mutual top-1, no self edges, k bound holds") {
    val perturbed = emb.where(col("vec_id") < 10)
      .select((col("vec_id") + 1000000L).as("vec_id"),
        transform(col("embedding").cast("array<double>"),
          (x, i) => x * (lit(1.0) + lit(0.1) * sin(i.cast("double")))).as("embedding"))
    val corpus = emb.select(col("vec_id"), col("embedding").cast("array<double>"))
      .unionByName(perturbed)
    val knn = Similarity.knnJoin(corpus, "vec_id", "embedding", k = 5)
    val rows = knn.collect()
    assert(rows.forall(r => r.getLong(0) != r.getLong(1)), "self edge present")
    assert(rows.groupBy(_.getLong(0)).forall(_._2.length <= 5), "row exceeds k")
    // best neighbor per row; deterministic tie-break on lowest vid
    val top1 = rows.groupBy(_.getLong(0)).map { case (q, rs) =>
      q -> rs.minBy(r => (-r.getDouble(2), r.getLong(1))).getLong(1)
    }
    // the cosine-0.97 planted pair dominates organic similarity in BOTH
    // directions — the pair is scored once but must feed both heaps
    val fwd = (0 until 10).count(i => top1.get(i + 1000000L).contains(i.toLong))
    val bwd = (0 until 10).count(i => top1.get(i.toLong).contains(i + 1000000L))
    assert(fwd >= 8, s"only $fwd/10 planted rows see their source as top-1")
    assert(bwd >= 8, s"only $bwd/10 sources see their planted copy as top-1")
    // edge sims are exact full-precision cosine (verified join-back): the
    // planted edges' sim must sit at the analytic perturbation cosine
    val planted = rows.filter(r =>
      r.getLong(0) < 10 && r.getLong(1) == r.getLong(0) + 1000000L)
    assert(planted.forall(r => r.getDouble(2) > 0.9 && r.getDouble(2) < 1.0))
  }

  test("lsh top-k returns same-bucket candidates incl. self") {
    val topk = Similarity.lshTopK(emb, emb.where(col("vec_id") < 3),
      "vec_id", "embedding", k = 5, numPlanes = 4)
    val rows = topk.collect()
    // self always shares its own bucket => present with sim 1.0
    assert(Set(0L, 1L, 2L).subsetOf(
      rows.filter(_.getDouble(2) >= 0.9999).map(_.getLong(0)).toSet))
  }

  test("lsh top-k retrieves organic-direction neighbors at cosine 0.90") {
    // The planted-pair fixtures perturb a vector per-dimension; this one
    // builds ORGANIC pairs: the query is rotated from its source TOWARD A
    // REAL CORPUS DIRECTION (Gram-Schmidt of another corpus vector), with
    // the cosine pinned analytically at exactly 0.90 — the neighbor regime
    // LSH is specced for. Expected recall over 8 OR-ed tables of 8 planes:
    // p_plane = 1 - acos(0.9)/pi ~ 0.856, p_table ~ 0.856^8 ~ 0.29,
    // 1-(1-0.29)^8 ~ 0.93 => ~18-19/20; a broken kernel scores ~0.
    val vecs = emb.where(col("vec_id") < 40).orderBy("vec_id")
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    assert(vecs.length == 40)
    def dot(a: Array[Double], b: Array[Double]): Double =
      a.iterator.zip(b.iterator).map { case (x, y) => x * y }.sum
    def unit(a: Array[Double]): Array[Double] = {
      val n = math.sqrt(dot(a, a)); a.map(_ / n)
    }
    val c = 0.9
    val queries = (0 until 20).map { i =>
      val vhat = unit(vecs(i)._2)
      val u = vecs(i + 20)._2
      val proj = dot(u, vhat)
      val what = unit(u.iterator.zip(vhat.iterator)
        .map { case (ui, vi) => ui - proj * vi }.toArray)
      val q = vhat.iterator.zip(what.iterator)
        .map { case (a, b) => c * a + math.sqrt(1 - c * c) * b }.toSeq
      (vecs(i)._1 + 1000000L, q)
    }
    val corpus = emb.select(col("vec_id"),
      col("embedding").cast("array<double>").as("embedding"))
    val topk = Similarity.lshTopK(corpus, queries.toDF("vec_id", "embedding"),
      "vec_id", "embedding", k = 10, numPlanes = 8, numTables = 8)
    val hits = topk.where(col("vid") === col("qid") - 1000000L).collect()
    assert(hits.length >= 14,
      s"organic cosine-0.9 recall ${hits.length}/20 below bound")
    // the retrieved similarity must be the constructed 0.90, bit-near
    assert(hits.forall(r => math.abs(r.getDouble(2) - 0.9) < 1e-6),
      s"retrieved sims off 0.90: ${hits.map(_.getDouble(2)).mkString(",")}")
  }

  test("ivf top-k: deterministic, self-found, reasonable recall vs brute force") {
    val queries = emb.where(col("vec_id") < 10)
    val ivf = Similarity.ivfTopK(emb, queries, "vec_id", "embedding",
      k = 10, nlist = 8, nprobe = 4, iterations = 2)
    val rows = ivf.collect()
    // deterministic across runs
    val rows2 = Similarity.ivfTopK(emb, queries, "vec_id", "embedding",
      k = 10, nlist = 8, nprobe = 4, iterations = 2).collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      rows2.map(r => (r.getLong(0), r.getLong(1))).toSeq)
    // each query finds itself (its own list is always probed first)
    val self = rows.filter(r => r.getDouble(2) >= 0.9999)
    assert((0L until 10L).forall(q => self.exists(r => r.getLong(0) == q)))
    // recall@10 vs brute force: with nprobe/nlist = 1/2, expect > 0.4
    val bf = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = bf.intersect(got).size.toDouble / bf.size
    info(s"ivf recall@10 = $recall")
    assert(recall > 0.4, s"recall too low: $recall")
  }

  test("embedding near-dup finds injected duplicate vector") {
    val dup = emb.limit(1).select(col("vec_id") + 900000 as "vec_id", col("embedding"))
    val corpus = emb.select("vec_id", "embedding").unionByName(dup)
    val pairs = Dedup.embeddingNearDup(corpus, "vec_id", "embedding",
      threshold = 0.999, numPlanes = 6).collect()
    assert(pairs.exists(r => r.getLong(0) == 0L && r.getLong(1) == 900000L))
  }

  test("language id picks marker-dominant language") {
    val samples = Seq(
      ("the cat is on the mat and it is happy", "en"),
      ("der hund ist nicht das problem und die katze", "de"),
      ("el perro y la casa es un lugar que", "es"),
      ("le chien est une belle chose et les chats", "fr"),
      ("的 是 了 在 我 有 和 不", "zh"),
      ("zzz qqq xxx", "und")).toDF("text", "expected")
    val pred = samples.withColumn("got", TextFunctions.langId(col("text")))
    assert(pred.where(col("got") =!= col("expected")).count() == 0)
  }

  test("quality score in [0,1], monotone-ish in stopword presence") {
    val scored = docs.select(TextFunctions.qualityScore(col("text")).as("q")).collect()
    assert(scored.forall(r => r.getDouble(0) >= 0 && r.getDouble(0) <= 1))
  }

  test("rolling_hash: interpreted eval == codegen result, registered in SQL") {
    GraftFunctions.register(spark)
    val viaSql = docs.selectExpr("rolling_hash(text) AS h").collect().map(_.getLong(0))
    // interpreted reference implementation
    val expected = docs.select("text").collect().map { r =>
      r.getString(0).getBytes("UTF-8").foldLeft(1469598103934665603L)(
        (acc, b) => (acc ^ (b & 0xffL)) * 1099511628211L)
    }
    assert(viaSql.toSeq == expected.toSeq)
  }

  test("multimodal: media table schema + REAL png decode determinism") {
    val media = Multimodal.asMediaTable(docs)
    assert(media.schema.fieldNames.toSeq ==
      Seq("doc_id", "source", "mime", "n_bytes", "payload"))
    val imgs = Multimodal.asImageTable(docs.limit(50))
    val feats = Multimodal.extractImageFeatures(imgs)
    val a = feats.collect().map(f => (f.doc_id, f.ok, f.width, f.height, f.features.toSeq))
    val b = feats.collect().map(f => (f.doc_id, f.ok, f.width, f.height, f.features.toSeq))
    assert(a.toSeq == b.toSeq)
    // every rendered PNG must decode through the real ImageIO codec at the
    // renderer's dimensions, with a well-formed normalized feature vector
    assert(a.forall(_._2), "some PNG payloads failed to decode")
    assert(a.forall(f => f._3 == 24 && f._4 == 16))
    assert(a.forall(f => f._5.length == 7 && f._5.forall(v => v >= 0f && v <= 1f)))
    // histogram mass sums to ~1
    assert(a.forall(f => math.abs(f._5.drop(3).sum - 1f) < 1e-3))
  }

  test("multimodal: png decode rejects corrupt bytes instead of throwing") {
    assert(Multimodal.decodeImage("not a png".getBytes).isEmpty)
    assert(Multimodal.decodeWav("not a wav".getBytes).isEmpty)
  }

  test("multimodal: REAL resize round-trips through the codec at target dims") {
    val png = Multimodal.renderPng(7L, "the quick brown fox")
    val resized = Multimodal.resizePng(png, 8, 8)
    assert(resized.isDefined)
    val back = Multimodal.decodeImage(resized.get)
    assert(back.isDefined && back.get._1 == 8 && back.get._2 == 8)
  }

  test("multimodal: REAL gif frame sampling decodes only every k-th frame") {
    val gif = Multimodal.renderGif(11L, "some document text for frames", nFrames = 8)
    val all = Multimodal.sampleFrames(gif, everyK = 1)
    assert(all.length == 8)
    assert(all.forall { case (_, w, h, _) => w == 16 && h == 12 })
    val sampled = Multimodal.sampleFrames(gif, everyK = 3)
    assert(sampled.map(_._1) == Seq(0, 3, 6))
    // frames differ (the renderer shifts the pattern per frame)
    assert(all.map(_._4).distinct.length > 1, "frames are identical")
    // sampled luma values match the corresponding full-decode frames
    val byIdx = all.map(f => f._1 -> f._4).toMap
    assert(sampled.forall { case (i, _, _, l) => math.abs(byIdx(i) - l) < 1e-9 })
    assert(Multimodal.sampleFrames("junk".getBytes, 2).isEmpty)
  }

  test("multimodal: REAL wav decode recovers format, duration and amplitude") {
    val wav = Multimodal.renderWav(docId = 3L, nChars = 250L)
    val Some((sr, frames, ms, rms)) = Multimodal.decodeWav(wav)
    assert(sr == 8000)
    assert(frames == 400 + 250) // renderer contract: 400 + nChars mod 400
    assert(math.abs(ms - frames * 1000.0 / 8000) < 1e-9)
    // a 12000-amplitude sine has RMS ~ 12000/sqrt(2) ~ 8485
    assert(rms > 7000 && rms < 10000, s"rms=$rms")
  }
}
