package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.types._

import graft.core.{Ledger, Position}
import graft.sources.PythonResource

/** Tier-2 Python resource conformance: declaration, typed records,
  * typed cursor position, ledger resume (cdf: crates/cdf-python/,
  * python/cdf_sdk/resource.py). Uses the real python3 + the repo SDK. */
class PythonResourceSpec extends SparkSpec {

  private def script(body: String): String = {
    val p = Files.createTempFile("graft_t2_", ".py")
    Files.write(p, body.getBytes(StandardCharsets.UTF_8))
    p.toString
  }

  private val incrementalSrc =
    """from graft_sdk import resource, resume_cursor_value, run
      |
      |@resource(name="clicks", primary_key=["id"], cursor="ts",
      |          schema={"id": ("long", False), "ts": "long", "score": "double",
      |                  "tag": "string", "ok": "boolean"})
      |def clicks():
      |    start = resume_cursor_value(default=-1)
      |    for i in range(10):
      |        ts = 1000 + i
      |        if ts > start:
      |            yield {"id": i, "ts": ts, "score": i / 4.0,
      |                   "tag": "t%d" % (i % 3), "ok": i % 2 == 0}
      |
      |run(clicks)
      |""".stripMargin

  test("declaration + typed records + auto cursor position") {
    val r = PythonResource.run(spark, script(incrementalSrc))
    assert(r.declared.name == "clicks")
    assert(r.declared.cursor.contains("ts"))
    assert(r.declared.bounded && r.declared.primaryKey == Seq("id"))
    assert(r.declared.schema == StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("ts", LongType), StructField("score", DoubleType),
      StructField("tag", StringType), StructField("ok", BooleanType))))
    assert(r.records == 10 && r.df.count() == 10)
    assert(r.position == Some(Position.Cursor("ts", 1009L)))
    val row = r.df.filter("id = 3").head()
    assert(row.getDouble(2) == 0.75 && row.getString(3) == "t0" && !row.getBoolean(4))
  }

  test("resume through the ledger: second run yields only past the cursor") {
    val out = tmpDir()
    val ledger = Ledger.at(out)
    val first = PythonResource.run(spark, script(incrementalSrc))
    ledger.propose("clicks", "t2", "p1", first.position)
    ledger.commit("clicks", "t2", "p1", """{"rows":10}""")

    // the committed typed position resumes the NEXT run; rows <= cursor
    // are never re-fetched (exactly-once at the source seam)
    val resume = ledger.resumePosition("clicks", "t2")
    assert(resume == Some(Position.Cursor("ts", 1009L)))
    val second = PythonResource.run(spark, script(incrementalSrc), resume = resume)
    assert(second.records == 0L, "nothing new after the committed cursor")

    // a later script version that has new data past the cursor
    val more = incrementalSrc.replace("range(10)", "range(14)")
    val third = PythonResource.run(spark, script(more), resume = resume)
    assert(third.records == 4)
    assert(third.position == Some(Position.Cursor("ts", 1013L)))
  }

  test("a failing resource surfaces its error, never partial-commits silently") {
    val bad = script(
      """from graft_sdk import resource, run
        |
        |@resource(name="boom", cursor="ts", schema={"ts": "long"})
        |def boom():
        |    yield {"ts": 1}
        |    raise ValueError("upstream exploded")
        |
        |run(boom)
        |""".stripMargin)
    val e = intercept[RuntimeException](PythonResource.run(spark, bad))
    assert(e.getMessage.contains("upstream exploded"))
  }

  test("driver intake budget: a runaway resource fails typed, never OOMs the driver") {
    val runaway = script(
      """from graft_sdk import resource, run
        |
        |@resource(name="flood", cursor="ts", schema={"ts": "long"})
        |def flood():
        |    for i in range(100000):
        |        yield {"ts": i}
        |
        |run(flood)
        |""".stripMargin)
    val e = intercept[graft.core.GraftError.Resource](
      PythonResource.run(spark, runaway,
        budget = PythonResource.Budget(maxRecords = 500)))
    assert(e.getMessage.contains("driver intake budget"))
    assert(!e.transient) // re-running cannot succeed; re-scope instead
    // the byte cap trips independently of the record cap
    val e2 = intercept[graft.core.GraftError.Resource](
      PythonResource.run(spark, runaway,
        budget = PythonResource.Budget(maxBytes = 4096)))
    assert(e2.getMessage.contains("driver intake budget"))
    // an explicit caller page bound still truncates WITHOUT error
    val page = PythonResource.run(spark, runaway, maxRecords = 100)
    assert(page.records == 100)

    // a resource emitting EXACTLY maxRecords records is within budget:
    // its trailing position/end metadata lines must not trip the record
    // cap (the cap guards the record-append branch, not every line)
    val exact = script(
      """from graft_sdk import resource, run
        |
        |@resource(name="exact", cursor="ts", schema={"ts": "long"})
        |def exact():
        |    for i in range(500):
        |        yield {"ts": i}
        |
        |run(exact)
        |""".stripMargin)
    val ok = PythonResource.run(spark, exact,
      budget = PythonResource.Budget(maxRecords = 500))
    assert(ok.records == 500)
    assert(ok.position.nonEmpty, "trailing position message must still be consumed")
  }

  test("records before a declaration are a protocol violation") {
    val rogue = script("""import json, sys
      |sys.stdout.write(json.dumps({"type":"record","data":{"x":1}}) + "\n")
      |""".stripMargin)
    intercept[IllegalStateException](PythonResource.run(spark, rogue))
  }
}
