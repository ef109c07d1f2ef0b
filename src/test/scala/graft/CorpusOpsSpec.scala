package graft

import org.apache.spark.sql.functions._

import graft.llm.CorpusOps

class CorpusOpsSpec extends SparkSpec {
  import spark.implicits._

  // 6-word "paragraphs"; the boilerplate chunk appears in docs 1, 2, 3.
  private val boiler = "subscribe to our newsletter for updates"
  private def paraCorpus = Seq(
    (1L, s"$boiler alpha beta gamma delta epsilon zeta"),
    (2L, s"one two three four five six $boiler"),
    (3L, boiler), // entire doc is boilerplate
    (4L, "seven eight nine ten eleven twelve thirteen fourteen fifteen sixteen seventeen eighteen")
  ).toDF("doc_id", "text")

  test("paragraph dedup removes corpus-frequent chunks and reassembles in order") {
    val r = CorpusOps.paragraphDedup(paraCorpus, "doc_id", "text",
        width = 6, minDocs = 3)
      .collect().map(x => x.getAs[Long]("doc_id") ->
        ((x.getAs[Int]("n_chunks"), x.getAs[Int]("n_dropped"),
          x.getAs[String]("clean_text")))).toMap
    assert(r(1L) == ((2, 1, "alpha beta gamma delta epsilon zeta")))
    assert(r(2L) == ((2, 1, "one two three four five six")))
    // fully-boilerplate doc: every chunk dropped, clean_text is NULL
    assert(r(3L) == ((1, 1, null)))
    // untouched doc keeps both chunks joined back in chunk order
    assert(r(4L) == ((2, 0,
      "seven eight nine ten eleven twelve thirteen fourteen fifteen sixteen seventeen eighteen")))
  }

  test("paragraph dedup below the doc-frequency threshold is the identity") {
    val r = CorpusOps.paragraphDedup(paraCorpus, "doc_id", "text",
        width = 6, minDocs = 4)
    assert(r.filter(col("n_dropped") > 0).count() == 0)
  }

  test("paragraph dedup frequency set arrives by broadcast, text never shuffles") {
    val plan = CorpusOps.paragraphDedup(paraCorpus, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"expected broadcast of the frequent-chunk hashes:\n$plan")
  }

  private def dedupBase = (1L to 40L).map(i => (i, s"document body number $i"))
    .toDF("doc_id", "text")

  test("incremental dedup admits exactly the novel rows, even at adversarial fpp") {
    val corpus = dedupBase.filter($"doc_id" % 3 =!= 0)
    val incoming = dedupBase.filter($"doc_id" % 3 === 0) // novel
      .unionByName(corpus.filter($"doc_id" <= 10) // re-ingested dups
        .withColumn("doc_id", $"doc_id" + 1000))
    // fpp 0.5 forces Bloom false positives through the exact-confirm
    // join — the result must still be the exact anti-join answer
    val got = CorpusOps.incrementalDedup(corpus, incoming, "text",
        expectedItems = 64, fpp = 0.5)
      .select("doc_id").as[Long].collect().sorted
    val want = incoming.join(corpus.select($"text"), Seq("text"), "left_anti")
      .select("doc_id").as[Long].collect().sorted
    assert(got.sameElements(want))
    assert(got.forall(_ < 1000)) // every re-ingested duplicate was dropped
  }

  test("incremental dedup membership gate is the codegen'd bloom predicate, not a UDF") {
    // parquet-backed so ConvertToLocalRelation can't fold the plan away
    val dir = java.nio.file.Files.createTempDirectory("graft_bloom").toString
    dedupBase.write.mode("overwrite").parquet(dir)
    val base = spark.read.parquet(dir)
    val corpus = base.filter($"doc_id" % 3 =!= 0)
    val incoming = base.filter($"doc_id" % 3 === 0)
    val plan = CorpusOps.incrementalDedup(corpus, incoming, "text",
        expectedItems = 64, fpp = 0.03)
      .queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), s"expected BloomFilterMightContain:\n$plan")
    assert(!plan.toLowerCase.contains("batchevalpython"))
  }

  test("paragraph dedup reassembly law: below threshold, clean_text IS the " +
      "whitespace-normalized original for every real document") {
    // chunks partition the token stream, so rejoining all of them with
    // single spaces must reproduce the ws-normalized text exactly —
    // any slicing/ordering bug in the rebuild breaks this identity
    val docs = graft.core.Tables(spark, sf(), "documents")
      .select(col("doc_id"), col("text"))
    val rebuilt = CorpusOps.paragraphDedup(docs, "doc_id", "text",
        width = 7, minDocs = Int.MaxValue)
      .join(docs, Seq("doc_id"))
      .withColumn("norm", concat_ws(" ",
        graft.llm.TextAnalysis.wsTokens(col("text"))))
    assert(rebuilt.filter(col("clean_text") =!= col("norm")).count() == 0)
    assert(rebuilt.filter(col("n_dropped") =!= 0).count() == 0)
  }

  test("temperature mix up-weights low-resource groups and bounds thresholds") {
    val df = ((1 to 900).map(i => (i.toLong, "big")) ++
      (1 to 100).map(i => (i.toLong + 1000, "small"))).toDF("doc_id", "lang")
    val r = CorpusOps.temperatureMix(df, "lang", "doc_id", targetFrac = 0.5)
      .collect().map(x => x.getAs[String]("lang") ->
        ((x.getAs[Long]("n_docs"), x.getAs[Int]("thr"), x.getAs[Long]("n_sampled"))))
      .toMap
    val (bigN, bigThr, _) = r("big")
    val (smallN, smallThr, _) = r("small")
    assert(bigN == 900 && smallN == 100)
    // alpha = 0.5: keep-rate ratio is sqrt(900/100) = 3x in favor of small
    assert(smallThr > bigThr)
    assert(smallThr <= 10000 && bigThr >= 0)
    // replay determinism: identical thresholds and samples on a second run
    val r2 = CorpusOps.temperatureMix(df, "lang", "doc_id", targetFrac = 0.5)
      .collect().map(x => x.getAs[String]("lang") ->
        ((x.getAs[Long]("n_docs"), x.getAs[Int]("thr"), x.getAs[Long]("n_sampled"))))
      .toMap
    assert(r == r2)
  }
}
