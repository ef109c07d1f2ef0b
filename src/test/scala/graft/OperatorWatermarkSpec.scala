package graft

import graft.streaming.{OperatorWatermarks, WatermarkClaims}
import graft.streaming.WatermarkClaims.Behavior

/** Per-node watermark behavior over analyzed Catalyst plans (cdf
  * execution_extent.rs:627-643). */
class OperatorWatermarkSpec extends SparkSpec {

  private def plan(sql: String) = {
    import spark.implicits._
    Seq((1L, 10L, "a")).toDF("ts_us", "v", "tag").createOrReplaceTempView("wm_src")
    spark.sql(sql).queryExecution.analyzed
  }

  test("filter + pass-through projection preserve the claim") {
    val p = plan("SELECT ts_us, v FROM wm_src WHERE v > 3")
    val nodes = OperatorWatermarks.derive(p, "ts_us")
    assert(nodes.last.behavior == Behavior.Preserve)
    assert(OperatorWatermarks.propagate(Some(1000L), p, "ts_us") == Some(1000L))
    assert(OperatorWatermarks.outputColumn(p, "ts_us") == Some("ts_us"))
  }

  test("rename keeps the claim and tracks the carrying column") {
    val p = plan("SELECT ts_us AS event_us, v FROM wm_src")
    assert(OperatorWatermarks.propagate(Some(77L), p, "ts_us") == Some(77L))
    assert(OperatorWatermarks.outputColumn(p, "ts_us") == Some("event_us"))
  }

  test("monotone shift is Transform: the claim shifts with the data") {
    val p = plan("SELECT ts_us + 3600000000 AS ts_local, v FROM wm_src")
    val nodes = OperatorWatermarks.derive(p, "ts_us")
    assert(nodes.last.behavior == Behavior.Transform(3600000000L))
    assert(OperatorWatermarks.propagate(Some(500L), p, "ts_us") == Some(3600000500L))
    assert(OperatorWatermarks.outputColumn(p, "ts_us") == Some("ts_local"))
  }

  test("subtraction shifts negative; cast stays monotone") {
    val p = plan("SELECT CAST(ts_us - 1000 AS BIGINT) AS t, v FROM wm_src")
    assert(OperatorWatermarks.propagate(Some(5000L), p, "ts_us") == Some(4000L))
  }

  test("dropping the event-time column drops the claim") {
    val p = plan("SELECT v, tag FROM wm_src WHERE v > 0")
    val nodes = OperatorWatermarks.derive(p, "ts_us")
    assert(nodes.last.behavior == Behavior.Drop)
    assert(OperatorWatermarks.propagate(Some(5000L), p, "ts_us") == None)
  }

  test("non-monotone rewrite is Drop, never a completeness lie") {
    // ts_us % 100 is not monotone: a Preserve/Transform here would
    // claim completeness the data can't honor
    val p = plan("SELECT ts_us % 100 AS t, v FROM wm_src")
    assert(OperatorWatermarks.propagate(Some(5000L), p, "ts_us") == None)
    // and a node outside the admitted subset (aggregate) is Drop too
    val agg = plan("SELECT max(ts_us) AS m FROM wm_src")
    assert(OperatorWatermarks.propagate(Some(5000L), agg, "ts_us") == None)
  }

  test("claims fold with the per-partition min law downstream") {
    val p = plan("SELECT ts_us + 10 AS t, v FROM wm_src")
    // two partitions claim through the same pipeline; stream watermark
    // = min of the transformed claims
    val claims = Seq("p0" -> 100L, "p1" -> 40L).map { case (part, wm) =>
      part -> OperatorWatermarks.propagate(Some(wm), p, "ts_us").get
    }
    val st = claims.foldLeft(WatermarkClaims.State.empty) { case (s, (part, wm)) =>
      s.advance(WatermarkClaims.Claim(part, wm)).toOption.get
    }
    assert(st.combined(Set("p0", "p1")) == Some(50L))
  }
}
