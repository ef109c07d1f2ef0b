package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Salting

class ExtensionsSpec extends AnyFunSuite {

  /** A session with GraftExtensions active. `getOrCreate` would reuse
    * the suite-shared session (extensions cannot be injected into an
    * existing one), so the active/default slots are cleared first; the
    * new session shares the SparkContext but has its own sessionState. */
  private lazy val sealedSpark: SparkSession = {
    val prevDefault = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[2]")
      .appName("graft-sealed")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      // spark.sql.extensions is a STATIC conf — ignored once a
      // SparkContext exists; withExtensions applies per-session
      .withExtensions(new graft.plans.GraftExtensions())
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    prevDefault.foreach { d =>
      SparkSession.setDefaultSession(d)
      SparkSession.setActiveSession(d)
    }
    s
  }

  test("determinism guard: non-deterministic exprs rejected over resource views only") {
    import sealedSpark.implicits._
    Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      .createOrReplaceTempView("graft_resource_t")
    Seq((1L, "a")).toDF("id", "v").createOrReplaceTempView("plain_t")

    // deterministic query over a resource view: fine
    assert(sealedSpark.sql("SELECT id, upper(v) FROM graft_resource_t").count() == 2)
    // rand()/uuid()/now() over a resource view: rejected at analysis
    for (bad <- Seq("rand()", "uuid()", "current_timestamp()")) {
      val e = intercept[Exception](
        sealedSpark.sql(s"SELECT id, $bad FROM graft_resource_t").collect())
      assert(e.getMessage.contains("rejected over a graft resource"), s"for $bad: ${e.getMessage}")
    }
    // ad-hoc SQL outside the load path stays unrestricted
    assert(sealedSpark.sql("SELECT id, rand() FROM plain_t").count() == 1)
  }

  test("extension-registered native functions resolve in SQL") {
    import sealedSpark.implicits._
    Seq(Tuple1("hello world")).toDF("text").createOrReplaceTempView("docs_t")
    val sig = sealedSpark.sql("SELECT graft_simhash64(text) AS s FROM docs_t")
      .as[Long].head()
    assert(sig != 0L)
    val mh = sealedSpark.sql(
      "SELECT graft_minhash16(array('a b c', 'd e f')) AS m").as[Seq[Long]].head()
    assert(mh.length == 16)
  }

  test("salted join equals plain join, with deterministic salt") {
    import sealedSpark.implicits._
    // skewed left: key 1 owns 90% of rows
    val left = (1 to 1000).map(i => (if (i <= 900) 1L else i.toLong, i.toLong))
      .toDF("k", "lv")
    val right = Seq((1L, "hot"), (950L, "cold")).toDF("k", "rv")
    val plain = left.join(right, "k")
    val salted = Salting.saltedJoin(left, right, "k", salts = 4, saltSource = Seq("lv"))
    assert(salted.count() == plain.count())
    assert(salted.select("k", "lv", "rv").except(plain.select("k", "lv", "rv")).count() == 0)
    assert(plain.select("k", "lv", "rv").except(salted.select("k", "lv", "rv")).count() == 0)
  }
}
