package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.llm._

class LlmSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2L, "the quick brown fox jumps over the lazy dog near the river bank today"), // exact dup of 1
    (3L, "the quick brown fox jumps over the lazy dog near the river bank yesterday evening"), // near dup
    (4L, "completely different words about spark catalyst optimizer plans and shuffles here"),
    (5L, "short text")
  ).toDF("doc_id", "text")

  test("exact dedup groups by content hash; canonical id is min") {
    val g = TextDedup.exactGroups(corpus, "doc_id", "text")
      .filter(col("n_copies") > 1).collect()
    assert(g.length == 1)
    assert(g(0).getAs[Long]("n_copies") == 2)
    assert(g(0).getAs[Long]("canonical_id") == 1)
    assert(TextDedup.exactDedup(corpus, "doc_id", "text").count() == 4)
  }

  test("ngram jaccard finds exact and near dup pairs, nothing else") {
    val pairs = TextDedup.ngramJaccardPairs(corpus, "doc_id", "text", 5, 0.3)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(pairs.contains((1L, 3L)) && pairs.contains((2L, 3L)))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("minhash LSH recovers exact duplicates with jaccard 1.0") {
    val pairs = TextDedup.minhashLshPairs(corpus, "doc_id", "text", 5, 16, 4, 0.5)
      .as[(Long, Long, Double)].collect()
    val exact = pairs.find(p => p._1 == 1L && p._2 == 2L)
    assert(exact.isDefined && exact.get._3 == 1.0)
  }

  test("native simhash expression is bit-identical to the HOF reference implementation") {
    graft.functions.TextHashFunctions.register(spark)
    val docs = graft.core.Tables(spark, sf(), "documents")
    val diff = docs.select(
        TextDedup.simhash64(col("text")).as("hof"),
        call_function("graft_simhash64", col("text")).as("native"))
      .filter(col("hof") =!= col("native")).count()
    assert(diff == 0)
  }

  test("portable simhash kernel is bit-identical to the md5-lane HOF formulation") {
    // the oracle replays the HOF math in SQL, so the fast kernel must
    // agree on every document (first 8 md5 bytes big-endian == the
    // first 16 hex chars parsed as two 32-bit halves)
    graft.functions.TextHashFunctions.register(spark)
    val docs = graft.core.Tables(spark, sf(), "documents")
    val diff = docs.select(
        TextDedup.simhashOfHashes(
          TextDedup.portableTokenHashes(col("text"))).as("hof"),
        call_function("graft_portable_simhash64", col("text")).as("native"))
      .filter(col("hof") =!= col("native")).count()
    assert(diff == 0)
  }

  test("native dot-product kernel is bit-identical to the HOF fold, nulls and all") {
    // every embedding query's cosine routes through Similarity.dot, and
    // the DuckDB oracles replay the HOF math — the kernel must agree on
    // EVERY pair bit for bit (same in-order f64 adds)
    val e = graft.core.Tables(spark, sf(), "embeddings")
      .select(col("vec_id"), col("embedding"))
    val pairs = e.limit(40).crossJoin(
      e.limit(40).select(col("embedding").as("emb_b")))
    val diff = pairs.select(
        Similarity.hofDot(col("embedding"), col("emb_b")).as("hof"),
        graft.functions.VectorKernels.dot(spark, col("embedding"), col("emb_b")).as("native"))
      .filter(col("hof") =!= col("native")).count()
    assert(diff == 0)
    // null law mirrors the HOF: null array, null element, length mismatch
    val odd = Seq(
      (1L, Seq[java.lang.Double](1.0, 2.0), Seq[java.lang.Double](3.0, 4.0)),
      (2L, null, Seq[java.lang.Double](3.0, 4.0)),
      (3L, Seq[java.lang.Double](1.0, null), Seq[java.lang.Double](3.0, 4.0)),
      (4L, Seq[java.lang.Double](1.0), Seq[java.lang.Double](3.0, 4.0))
    ).toDF("id", "a", "b")
    val got = odd.select(col("id"),
        Similarity.hofDot(col("a"), col("b")).as("hof"),
        graft.functions.VectorKernels.dot(spark, col("a"), col("b")).as("native"))
      .collect().map(r => (r.getLong(0), r.isNullAt(1), r.isNullAt(2),
        if (r.isNullAt(2)) 0.0 else r.getDouble(2)))
    got.foreach { case (id, hofNull, natNull, v) =>
      assert(hofNull == natNull, s"null-law divergence at id=$id")
      if (id == 1) assert(!natNull && v == 11.0)
    }
  }

  test("max-cosine kernel is bit-identical to the crossJoin + round + max formulation") {
    val e = graft.core.Tables(spark, sf(), "embeddings")
      .select(col("vec_id"), col("embedding"))
    val ev = e.filter(col("vec_id") % 20 === 0)
    val evalVecs = ev.select("embedding").collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val viaJoin = e.select(col("vec_id"), col("embedding").as("emb_t"),
        Similarity.norm(col("embedding")).as("nrm_t"))
      .crossJoin(broadcast(ev.select(col("embedding").as("emb_e"),
        Similarity.norm(col("embedding")).as("nrm_e"))))
      .select(col("vec_id"),
        round(Similarity.dot(col("emb_t"), col("emb_e")) /
          (col("nrm_t") * col("nrm_e")), 4).as("cos"))
      .groupBy("vec_id").agg(max(col("cos")).as("join_max"))
    val viaKernel = e.select(col("vec_id"),
      graft.functions.VectorKernels.maxCosine(spark, col("embedding"), evalVecs)
        .as("kernel_max"))
    val diff = viaJoin.join(viaKernel, Seq("vec_id"))
      .filter(col("join_max") =!= col("kernel_max")).count()
    assert(diff == 0)
  }

  test("max-cosine edge law: zero vector, null element, dim mismatch, zero-norm ref") {
    // the join+round+max formulation's law (non-ANSI Spark = DuckDB:
    // x/0 is NULL; under ANSI Spark's own double/0 CRASHES, so the
    // well-defined reference semantics is the non-ANSI one): zero-norm
    // divisor → null cosine; null element / dim mismatch → null dot →
    // null cosine; max skips nulls, all-null → null. The kernel must
    // mirror each case, not throw
    val prevAnsi = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try {
    val refs = Array(Array(1.0, 2.0), Array(0.0, 0.0)) // 2nd ref: zero norm
    val odd = Seq(
      (1L, Seq[java.lang.Double](1.0, 1.0)),     // plain row (zero-norm ref skipped)
      (2L, Seq[java.lang.Double](0.0, 0.0)),     // zero vector → all-null cosines → null
      (3L, Seq[java.lang.Double](1.0, null)),    // null element → null
      (4L, Seq[java.lang.Double](1.0, 2.0, 3.0)) // dim mismatch vs every ref → null
    ).toDF("id", "emb")
    val refDf = Seq(Tuple1(Seq(1.0, 2.0)), Tuple1(Seq(0.0, 0.0))).toDF("emb_e")
      .select(col("emb_e"), Similarity.norm(col("emb_e")).as("nrm_e"))
    val viaJoin = odd.select(col("id"), col("emb").as("emb_t"),
        Similarity.norm(col("emb")).as("nrm_t"))
      .crossJoin(broadcast(refDf))
      .select(col("id"), round(Similarity.dot(col("emb_t"), col("emb_e")) /
        (col("nrm_t") * col("nrm_e")), 4).as("cos"))
      .groupBy("id").agg(max(col("cos")).as("join_max"))
    val viaKernel = odd.select(col("id"),
      graft.functions.VectorKernels.maxCosine(spark, col("emb"), refs).as("kernel_max"))
    val rows = viaJoin.join(viaKernel, Seq("id"))
      // null-safe compare: =!= hides null-vs-value divergence
      .filter(!(col("join_max") <=> col("kernel_max"))).collect()
    assert(rows.isEmpty, rows.mkString(", "))
    // and pin the expectations themselves, not just agreement
    val k = viaKernel.collect().map(r =>
      r.getLong(0) -> (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
    assert(k(1L) != null)
    assert(k(2L) == null && k(3L) == null && k(4L) == null)
    } finally spark.conf.set("spark.sql.ansi.enabled", prevAnsi)
  }

  test("real image decode: PNG round trip matches the closed-form pixel rule; " +
      "corrupt bytes yield null stats, not a crash") {
    import graft.llm.Multimodal
    val rows = Seq(
      Row(1L, Multimodal.syntheticPng(1L, 16, 12), "image"),
      Row(2L, Multimodal.syntheticPng(2L, 7, 9), "image"),   // non-default size
      Row(3L, "definitely not a png".getBytes("UTF-8"), "image"))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), Multimodal.mediaSchema)
    val got = Multimodal.imageFeatures(df).collect().map(r => r.getLong(0) -> r).toMap
    def sums(id: Long, w: Int, h: Int): (Long, Long, Long) = {
      var sr = 0L; var sg = 0L; var sb = 0L
      for (y <- 0 until h; x <- 0 until w) {
        val (r, g, b) = Multimodal.syntheticRgb(id, x, y)
        sr += r; sg += g; sb += b
      }
      (sr, sg, sb)
    }
    val r1 = got(1L)
    assert((r1.getInt(1), r1.getInt(2), r1.getInt(3)) == ((16, 12, 3)))
    assert((r1.getLong(4), r1.getLong(5), r1.getLong(6)) == sums(1L, 16, 12))
    val r2 = got(2L) // width/height come from the DECODED image
    assert((r2.getInt(1), r2.getInt(2)) == ((7, 9)))
    assert((r2.getLong(4), r2.getLong(5), r2.getLong(6)) == sums(2L, 7, 9))
    val r3 = got(3L)
    assert(r3.isNullAt(1) && r3.isNullAt(4), "undecodable payload must yield null stats")
  }

  test("real audio decode: WAV round trip matches the closed-form sample rule; " +
      "non-audio bytes yield null stats") {
    import graft.llm.Multimodal
    val rows = Seq(
      Row(5L, Multimodal.syntheticWav(5L, 256), "audio"),
      Row(6L, Multimodal.syntheticWav(6L, 100, sampleRate = 16000), "audio"),
      Row(7L, "not a wav at all".getBytes("UTF-8"), "audio"))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), Multimodal.mediaSchema)
    val got = Multimodal.audioFeatures(df).collect().map(r => r.getLong(0) -> r).toMap
    def stats(id: Long, n: Int): (Long, Long, Int) = {
      var sum = 0L; var sabs = 0L; var mx = 0
      (0 until n).foreach { i =>
        val s = Multimodal.syntheticPcm(id, i)
        sum += s; sabs += math.abs(s); mx = math.max(mx, math.abs(s))
      }
      (sum, sabs, mx)
    }
    val r5 = got(5L)
    assert(r5.getLong(1) == 256L && r5.getInt(2) == 8000 && r5.getInt(3) == 1)
    assert((r5.getLong(4), r5.getLong(5), r5.getInt(6)) == stats(5L, 256))
    val r6 = got(6L) // decoded header drives the reported rate/length
    assert(r6.getLong(1) == 100L && r6.getInt(2) == 16000)
    assert((r6.getLong(4), r6.getLong(5), r6.getInt(6)) == stats(6L, 100))
    assert(got(7L).isNullAt(1), "undecodable payload must yield null stats")
  }

  test("url canonicalization: case/port/www/fragment/tracking rules, path case preserved") {
    val cases = Seq(
      ("HTTPS://WWW.Example.COM:443/A/B?x=1#top", "https://example.com/A/B?x=1"),
      ("http://Example.com:80/path", "http://example.com/path"),
      ("https://example.com/p?utm_source=a&x=1&utm_medium=b", "https://example.com/p?x=1"),
      ("https://example.com/p?utm_source=a", "https://example.com/p"),
      ("https://example.com/p?utm_a=1&utm_b=2&c=3", "https://example.com/p?c=3"),
      ("https://example.com/p?gclid=z&fbclid=y&keep=1", "https://example.com/p?keep=1"),
      ("https://sub.example.com:8080/q", "https://sub.example.com:8080/q"), // non-default port kept
      ("https://example.com", "https://example.com"))                      // no path at all
    val df = cases.map(_._1).toDF("url")
      .select(col("url"), UrlOps.canonicalUrl(col("url")).as("canon"))
    val got = df.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    cases.foreach { case (in, want) =>
      assert(got(in) == want, s"canonical($in) = ${got(in)}, want $want")
    }
  }

  test("knn classify: planted geometry votes deterministically, ties to the smaller label") {
    // three clusters on axes; probes sit exactly on each axis
    def vec(axis: Int, mag: Double): Seq[Double] =
      Seq.tabulate(4)(i => if (i == axis) mag else 0.01 * (i + 1))
    val rows =
      (1 to 5).map(i => (100L + i, vec(0, 1.0 + i * 0.1), 7)) ++   // label 7 cluster on axis 0
      (1 to 5).map(i => (200L + i, vec(1, 1.0 + i * 0.1), 3)) ++   // label 3 cluster on axis 1
      Seq((0L, vec(0, 2.0), -1), (25L, vec(1, 2.0), -1))           // probes (id % 25 == 0)
    val df = rows.toDF("vec_id", "embedding", "label")
    val got = Similarity.knnClassify(df, "vec_id", "embedding", "label",
        isQuery = col("vec_id") % 25 === 0, k = 5)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got(0L) == 7 && got(25L) == 3, got.toString)
    // exact 2-2 vote tie at k=4 resolves to the SMALLER label
    val tieRows =
      Seq((0L, vec(0, 1.0), -1),
        (1L, vec(0, 1.1), 9), (2L, vec(0, 1.2), 9),
        (3L, vec(0, 1.3), 4), (4L, vec(0, 1.4), 4))
    val tie = Similarity.knnClassify(tieRows.toDF("vec_id", "embedding", "label"),
        "vec_id", "embedding", "label", isQuery = col("vec_id") === 0L, k = 4)
      .head()
    assert(tie.getInt(1) == 4, s"tie must resolve to the smaller label, got $tie")
  }

  test("lsh bucket kernel matches the HOF chain for a LONG-typed plane offset") {
    // xxhash64(j + planeOffset, i) hashes its first arg with hashLong
    // when the offset widens to BIGINT — the kernel must branch the same
    val e = graft.core.Tables(spark, sf(), "embeddings")
    val diff = e.select(
        Similarity.hofLshBucket(col("embedding"), 8, lit(3L)).as("h"),
        graft.functions.VectorKernels.lshBucketXxh(spark, col("embedding"), 8, lit(3L)).as("n"))
      .filter(col("h") =!= col("n")).count()
    assert(diff == 0)
  }

  test("native lsh bucket kernels are bit-identical to both HOF plane schemes") {
    val e = graft.core.Tables(spark, sf(), "embeddings")
    val diff = e.select(
        Similarity.hofLshBucket(col("embedding"), 8, lit(3)).as("h_xxh"),
        graft.functions.VectorKernels.lshBucketXxh(spark, col("embedding"), 8, lit(3)).as("n_xxh"),
        Similarity.hofLshBucketLcg(col("embedding"), 6).as("h_lcg"),
        graft.functions.VectorKernels.lshBucketLcg(spark, col("embedding"), 6).as("n_lcg"))
      .filter(col("h_xxh") =!= col("n_xxh") || col("h_lcg") =!= col("n_lcg"))
      .count()
    assert(diff == 0)
    // banded composition (kernel inside the transform lambda, offset =
    // the lambda variable) agrees with the banded HOF end to end
    val bandDiff = e.select(
        Similarity.lshBandKeys(col("embedding"), 4, 8).as("native"),
        transform(sequence(lit(0), lit(3)), b =>
          concat_ws(":", b.cast("string"),
            Similarity.hofLshBucket(col("embedding"), 8, b * lit(8)).cast("string")))
          .as("hof"))
      .filter(col("native") =!= col("hof")).count()
    assert(bandDiff == 0)
  }

  test("native minhash signature: one pass, k mins, stable under array order") {
    graft.functions.TextHashFunctions.register(spark)
    val df = Seq(
      (1L, Seq("a b c", "d e f", "g h i")),
      (2L, Seq("g h i", "a b c", "d e f")), // same set, different order
      (3L, Seq("x y z"))).toDF("id", "grams")
    val sigs = df.select(col("id"), call_function("graft_minhash16", col("grams")).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(sigs(1L).length == 16)
    assert(sigs(1L) == sigs(2L)) // set semantics: order-invariant
    assert(sigs(1L) != sigs(3L))
  }

  test("native word-ngram kernel is set-equal to the HOF reference") {
    graft.functions.TextHashFunctions.register(spark)
    val docs = graft.core.Tables(spark, sf(), "documents")
    val diff = docs.select(
        array_sort(TextAnalysis.wordNgrams(col("text"), 5)).as("hof"),
        array_sort(call_function("graft_ngrams5", col("text"))).as("native"))
      .filter(col("hof") =!= col("native")).count()
    assert(diff == 0)
    // short-text guard: fewer than n words → empty set in both
    val short = Seq(Tuple1("a b c")).toDF("text")
    assert(short.select(call_function("graft_ngrams5", col("text")).as("g"))
      .head().getSeq[String](0).isEmpty)
  }

  test("simhash: identical docs at hamming 0; near dups close; distinct docs far") {
    val sigs = corpus.select(col("doc_id"),
      TextDedup.simhash64(col("text")).as("sig"))
      .as[(Long, Long)].collect().toMap
    assert(sigs(1L) == sigs(2L))
    assert(java.lang.Long.bitCount(sigs(1L) ^ sigs(3L)) <= 16)
    assert(java.lang.Long.bitCount(sigs(1L) ^ sigs(4L)) > 16)
    val pairs = TextDedup.simhashPairs(corpus, "doc_id", "text", 3)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
  }

  test("banded embed near-dup: recall 1.0 on planted dups; candidate set stays far below n²") {
    val e = graft.core.Tables(spark, sf(), "embeddings").select("vec_id", "embedding")
    // plant exact copies: every 25th vector re-appears under id+100000
    val planted = e.filter(col("vec_id") % 25 === 0)
      .withColumn("vec_id", col("vec_id") + 100000)
    val corpus = e.unionByName(planted)
    val n = corpus.count()
    val pairs = Similarity.cosineNearDupPairs(corpus, "vec_id", "embedding",
        numBands = 8, planesPerBand = 12, threshold = 0.99)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // recall 1.0 on the planted exact dups: θ=0 ⇒ every band agrees by
    // construction, so banding can never lose them
    val expected = planted.select((col("vec_id") - 100000).as("a"), col("vec_id").as("b"))
      .as[(Long, Long)].collect()
    expected.foreach { case (a, bId) =>
      assert(pairs.contains((a, bId)), s"planted dup ($a,$bId) missed")
    }
    // scale audit: OR-composed 12-plane bands must keep candidates ≪ n²/2
    // (the old single 4-plane family degenerated to ~n²/16; banded
    // density is bands/2^planes = 8/4096 ≈ 0.2% of the pair space)
    val cands = Similarity.cosineNearDupCandidateCount(corpus, "vec_id", "embedding", 8, 12)
    assert(cands < n * n / 2 / 20,
      s"candidate pairs $cands not ≪ n²/2 = ${n * n / 2} (n=$n)")
  }

  test("cosine top-k: identical vector ranks first with cosine 1") {
    val emb = graft.core.Tables(spark, sf(), "embeddings")
    val withDup = emb.select("vec_id", "embedding").unionByName(
      emb.filter(col("vec_id") === 0).select(
        (col("vec_id") + 100000).as("vec_id"), col("embedding")))
    val top = Similarity.cosineTopK(withDup, "vec_id", "embedding", 0L, 5)
      .as[(Long, Double)].collect()
    assert(top.head._1 == 100000L && top.head._2 == 1.0)
    assert(top.map(_._2).sliding(2).forall(w => w(0) >= w(1))) // sorted desc
  }

  test("lsh bucket assigns identical vectors to identical buckets") {
    val emb = graft.core.Tables(spark, sf(), "embeddings")
    val b = emb.select(col("vec_id"),
      Similarity.lshBucket(col("embedding"), 4).as("bucket"))
    val n = b.select("bucket").distinct().count()
    assert(n > 1 && n <= 16) // 4 planes → ≤16 buckets, actually split
  }

  test("ivf: assignment total and deterministic; top-k achieves recall vs brute force") {
    val emb = graft.core.Tables(spark, sf(), "embeddings").select("vec_id", "embedding")
    val centroids = Similarity.trainCentroids(emb, "vec_id", "embedding", k = 8)
    assert(centroids.length == 8)
    // training is deterministic (no RNG anywhere)
    val again = Similarity.trainCentroids(emb, "vec_id", "embedding", k = 8)
    assert(centroids.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
    // every vector lands in exactly one cluster; all clusters in range
    val assigned = Similarity.ivfAssign(emb, "embedding", centroids)
    assert(assigned.count() == emb.count())
    val clusters = assigned.select("_ivf_cluster").distinct()
      .collect().map(_.getInt(0)).toSet
    assert(clusters.subsetOf((0 until 8).toSet) && clusters.size > 1)
    // probing half the clusters recovers most of the exact top-10
    val exact = Similarity.cosineTopK(emb, "vec_id", "embedding", 0L, 10)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val ivf = Similarity.ivfTopK(emb, "vec_id", "embedding", 0L,
      kClusters = 8, nProbe = 4, k = 10)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val recall = (exact & ivf).size.toDouble / exact.size
    assert(recall >= 0.5, s"recall@10 = $recall")
    // an identical vector is always found (it shares the query's cluster)
    val withDup = emb.unionByName(
      emb.filter(col("vec_id") === 0).select((col("vec_id") + 100000).as("vec_id"), col("embedding")))
    val top = Similarity.ivfTopK(withDup, "vec_id", "embedding", 0L, 8, 2, 5)
      .as[(Long, Double)].collect()
    assert(top.head._1 == 100000L && top.head._2 == 1.0)
  }

  test("ivf re-rank is EXACT: emitted cosines equal the brute-force cosine for the same ids") {
    val emb = graft.core.Tables(spark, sf(), "embeddings").select("vec_id", "embedding")
    val ivf = Similarity.ivfTopK(emb, "vec_id", "embedding", 0L,
      kClusters = 8, nProbe = 4, k = 10)
      .as[(Long, Double)].collect().toMap
    // brute-force cosine over the whole corpus; restrict to emitted ids —
    // bucket membership decides WHICH ids surface (engine-specific), but
    // each emitted cosine value must be the exact brute-force number
    val brute = Similarity.cosineTopK(emb, "vec_id", "embedding", 0L, Int.MaxValue)
      .as[(Long, Double)].collect().toMap
    ivf.foreach { case (id, c) =>
      assert(brute(id) == c, s"ivf re-rank cosine for $id: $c != brute ${brute(id)}") }
  }

  test("simhash verified emission: every emitted pair is in the brute-force jaccard set; band recall pinned") {
    // the REAL corpus (sf0.001 documents ∪ exact copies) — the same shape
    // q_simhash runs on; this pins the measured evidence recorded in the
    // q_simhash doc: emission precision is 1.0 (jaccard-verified), band
    // recall is high but intrinsically < 1.0 (why the query is rows-only)
    val docs = graft.core.Tables(spark, sf(), "documents").select("doc_id", "text")
    val corpus = docs.unionByName(
      docs.filter(col("doc_id") % 50 === 0).withColumn("doc_id", col("doc_id") + 100000))
    val emitted = TextDedup.simhashPairs(corpus, "doc_id", "text", maxHamming = 3,
        verifyJaccard = Some((5, 0.5)))
      .select("doc_a", "doc_b", "jaccard").as[(Long, Long, Double)].collect()
    val truth = TextDedup.ngramJaccardPairs(corpus, "doc_id", "text", 5, 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    // precision 1.0: every emitted pair is a true jaccard-0.5 near-dup
    emitted.foreach { case (a, b, j) =>
      assert(truth((a, b)), s"emitted pair ($a,$b) not in the exact jaccard set")
      assert(j >= 0.5) }
    // recall: bands surface most true pairs but intrinsically not all —
    // measured 32/44 (0.73) at sf0.001, 34/36 (0.94) at sf0.01; this
    // floor guards against a band-construction regression, and the
    // gap is exactly why q_simhash cannot carry a full jaccard oracle
    val recall = emitted.map(p => (p._1, p._2)).toSet.size.toDouble / truth.size
    assert(recall >= 0.7, s"simhash band recall $recall vs exact pair set ${truth.size}")
  }

  test("multimodal: metadata + stubbed feature extraction preserve ids and shape") {
    val media = Multimodal.asMedia(corpus, "doc_id", "text", "text")
    val meta = Multimodal.metadata(media).collect()
    assert(meta.length == 5)
    assert(meta.forall(_.getAs[String]("payload_sha256").length == 64))
    val feats = Multimodal.extractFeatures(media)
    assert(feats.count() == 5)
    val row = feats.filter(col("media_id") === 1L).head()
    val f = row.getSeq[Double](1)
    assert(f.length == Multimodal.FeatureDim && f.exists(_ != 0.0))
  }

  test("language id votes deterministically with priority tie-break") {
    val df = Seq(
      (1L, "the cat and the dog of a to house"),
      (2L, "der hund und die katze ist hier"),
      (3L, "xyzzy plugh")).toDF("doc_id", "text")
    val got = df.select(col("doc_id"), TextAnalysis.langId(col("text")).as("l"))
      .as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "en", 2L -> "de", 3L -> "und"))
  }

  test("connected components: chain transitivity, component = min id, singletons " +
      "omitted, convergence independent of partitioning") {
    // path graph 1-2-3-4 (diameter 3: needs >1 propagation round),
    // triangle 10-11-12, isolated pair 20-21; node 99 appears nowhere
    val pairs = Seq(
      (2L, 1L), (2L, 3L), (3L, 4L),   // path, mixed edge orientation
      (10L, 11L), (11L, 12L), (10L, 12L),
      (21L, 20L)
    ).toDF("doc_a", "doc_b")
    val cc = TextDedup.connectedComponents(pairs, "doc_a", "doc_b")
      .as[(Long, Long)].collect().toMap
    assert(cc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
    // determinism under a different partitioning of the same edges
    val cc2 = TextDedup.connectedComponents(pairs.repartition(7), "doc_a", "doc_b")
      .as[(Long, Long)].collect().toMap
    assert(cc2 == cc)
  }

  test("connected components: a long path exceeding maxIters fails typed, " +
      "not silently wrong") {
    val longPath = (1L until 12L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    // min-label propagation needs ~diameter rounds; cap below that
    val e = intercept[graft.core.GraftError.Plan] {
      TextDedup.connectedComponents(longPath, "doc_a", "doc_b", maxIters = 2)
    }
    assert(e.getMessage.contains("converge"))
    // and with the default cap the same graph settles to one component
    val cc = TextDedup.connectedComponents(longPath, "doc_a", "doc_b")
      .as[(Long, Long)].collect().toMap
    assert(cc.values.toSet == Set(1L) && cc.size == 12)
  }

  test("winnowing: shared passage of >= k+w-1 words guarantees a shared " +
      "fingerprint; short docs and disjoint docs emit none") {
    val passage = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    val docs = Seq(
      (1L, s"unrelated lead in words here $passage trailing content one two"),
      (2L, s"different opening entirely $passage other tail tokens"),
      (3L, "completely disjoint vocabulary nothing matching anything else at all here now"),
      (4L, "tiny doc") // below k+w-1 words: no fingerprints
    ).toDF("doc_id", "text")
    val fps = TextDedup.winnowFingerprints(docs, "doc_id", "text")
    assert(fps.filter(col("doc_id") === 4L).isEmpty, "short doc must emit no fingerprints")
    // coverage theorem: docs 1 and 2 share a 10-word passage (>= 8)
    val shared = fps.filter(col("doc_id") === 1L).select("fp").intersect(
      fps.filter(col("doc_id") === 2L).select("fp"))
    assert(!shared.isEmpty, "shared passage must yield a shared fingerprint")
    val pairs = TextDedup.winnowPassagePairs(docs, "doc_id", "text", minShared = 1)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L), "disjoint doc pairs with nobody")
    // compression: fingerprints are a strict subset of the gram hashes
    val nGrams1 = docs.filter(col("doc_id") === 1L)
      .select(size(split(trim(col("text")), "\\s+"))).as[Int].head() - 4
    val nFps1 = fps.filter(col("doc_id") === 1L).count()
    assert(nFps1 < nGrams1, s"winnowing must compress: $nFps1 fps vs $nGrams1 grams")
  }

  test("gopher quality filter: first-failing-rule verdict, priority order respected") {
    val docs = Seq(
      (1L, "too short"), // word_count (2 words) — fires before stopwords
      (2L, ("the quick brown fox jumps over a lazy dog and then rests " +
        "by the river of calm water that flows with ease onward today")), // keep
      (3L, Seq.fill(25)("spark").mkString(" ")), // 25 words, no stopwords → stopwords
      (4L, ("the a of to and that have with be in " +
        Seq.fill(15)("the a").mkString(" "))) // 40 words, 10 distinct → repetition
    ).toDF("doc_id", "text")
    val sigs = TextAnalysis.gopherSignals(TextAnalysis.wsTokens(col("text")))
    val out = docs.select(col("doc_id") +: sigs.map { case (n, c) => c.as(n) }: _*)
      .withColumn("verdict", TextAnalysis.gopherVerdict(
        col("n_words"), col("mean_word_len"), col("alpha_ratio"),
        col("stop_distinct"), col("uniq_ratio")))
      .select("doc_id", "verdict").as[(Long, String)].collect().toMap
    assert(out(1L) == "word_count")
    assert(out(2L) == "keep")
    assert(out(3L) == "stopwords")
    assert(out(4L) == "repetition", s"got ${out(4L)}")
  }

  test("product quantization: codes bounded by the codebook, identical vectors code " +
      "identically, and the kernel agrees with a naive rebuild") {
    val e = graft.core.Tables(spark, sf(), "embeddings").select("vec_id", "embedding")
    val m = 8; val k = 16
    val books = Similarity.pqCodebooks(e, "vec_id", "embedding", m, k) // trained default
    assert(books.length == m && books.forall(_.length == k))
    val coded = Similarity.pqEncode(e, "embedding", books)
      .select("vec_id", "embedding", "_pq_codes").collect()
    coded.foreach { r =>
      val codes = r.getSeq[Int](2)
      assert(codes.length == m && codes.forall(c => c >= 0 && c < k))
    }
    // kernel ≡ naive argmin per subspace (spot-check a deterministic slice)
    coded.take(25).foreach { r =>
      val v = r.getSeq[Float](1).map(_.toDouble).toArray
      val codes = r.getSeq[Int](2)
      val dSub = v.length / m
      (0 until m).foreach { sub =>
        val subv = v.slice(sub * dSub, (sub + 1) * dSub)
        val naive = books(sub).zipWithIndex.map { case (code, c) =>
          (subv.zip(code).map { case (a, b) => (a - b) * (a - b) }.sum, c)
        }.minBy(x => (x._1, x._2))._2
        assert(codes(sub) == naive, s"vec ${r.getLong(0)} sub $sub: kernel ${codes(sub)} != $naive")
      }
    }
    // identical vectors → identical codes (copies quantize together)
    val copyCodes = Similarity.pqEncode(
      e.orderBy("vec_id").limit(5).withColumn("vec_id", col("vec_id") + 7000),
      "embedding", books)
      .orderBy("vec_id").select("_pq_codes").collect().map(_.getSeq[Int](0))
    val origCodes = Similarity.pqEncode(e.orderBy("vec_id").limit(5), "embedding", books)
      .orderBy("vec_id").select("_pq_codes").collect().map(_.getSeq[Int](0))
    assert(copyCodes.toSeq == origCodes.toSeq)
  }

  test("ivf-pq: ADC distances equal a naive driver recompute; a planted exact copy " +
      "of the query ranks first at adist 0") {
    val e = graft.core.Tables(spark, sf(), "embeddings").select("vec_id", "embedding")
    // plant an exact copy of vec 0 so the metric has a known optimum:
    // the copy codes identically to the query, every ADC lookup is the
    // query-to-own-code distance, and no other vector can beat it
    val q0 = e.filter(col("vec_id") === 0L).withColumn("vec_id", lit(900000L))
    val corpus = e.unionByName(q0)
    val top = Similarity.ivfPqTopK(corpus, "vec_id", "embedding",
      queryId = 0L, kClusters = 16, nProbe = 4, m = 8, kCodes = 16, k = 10)
      .collect()
    assert(top.head.getLong(0) == 900000L, s"exact copy must rank first, got ${top.head}")
    // naive recompute of the winner's adist: encode the copy, sum the
    // exact subspace distances from the query to its codes
    val books = Similarity.pqCodebooks(corpus, "vec_id", "embedding", 8, 16)
    val qv = e.filter(col("vec_id") === 0L).select("embedding").head()
      .getSeq[Float](0).map(_.toDouble).toArray
    val copyCodes = Similarity.pqEncode(q0, "embedding", books)
      .select("_pq_codes").head().getSeq[Int](0)
    val dSub = qv.length / 8
    var naive = 0.0
    (0 until 8).foreach { sub =>
      val code = books(sub)(copyCodes(sub))
      var i = 0
      while (i < dSub) { val diff = qv(sub * dSub + i) - code(i); naive += diff * diff; i += 1 }
    }
    val naiveR = BigDecimal(naive).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(top.head.getDouble(1) - naiveR) < 1e-9,
      s"ADC ${top.head.getDouble(1)} != naive $naive")
    // distances are non-decreasing down the list
    val ds = top.map(_.getDouble(1)).toSeq
    assert(ds == ds.sorted)
  }

  test("semdedup: planted copies land in the original's cluster and are the dropped " +
      "side of the dominance rule; assignment is total") {
    val e = graft.core.Tables(spark, sf(), "embeddings").select("vec_id", "embedding")
    val planted = e.filter(col("vec_id") % 25 === 0)
      .withColumn("vec_id", col("vec_id") + 100000)
    val corpus = e.unionByName(planted)
    val n = corpus.count()
    // operator default: trained codebook (10 Lloyd rounds)
    val out = Similarity.semDedup(corpus, "vec_id", "embedding",
      kClusters = 8, threshold = 0.99).persist()
    assert(out.count() == n, "every vector must be assigned and emitted exactly once")
    val byId = out.select("id", "cluster", "is_dup")
      .as[(Long, Int, Int)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    val plantedIds = planted.select("vec_id").as[Long].collect()
    plantedIds.foreach { copy =>
      val orig = copy - 100000
      assert(byId(copy)._1 == byId(orig)._1,
        s"identical embeddings $orig/$copy split across clusters")
      // identical vectors tie on centroid cosine, so the id tie-break
      // drops the copy and keeps the original
      assert(byId(copy)._2 == 1, s"planted copy $copy not flagged dup")
      assert(byId(orig)._2 == 0, s"original $orig wrongly dropped for its own copy")
    }
    // soundness: a flagged dup must have a same-cluster neighbor at >= τ
    // with the dominance property — spot-check via the pair recompute
    val dups = out.filter(col("is_dup") === 1).count()
    assert(dups >= plantedIds.length, "at least the planted copies are dups")
    out.unpersist(); ()
  }
}
