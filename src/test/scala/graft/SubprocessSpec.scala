package graft

import java.nio.charset.StandardCharsets
import java.nio.file.Files

import graft.core.{Ledger, Position}
import graft.sources.Subprocess

/** Subprocess tap adapters against real child processes (cdf:
  * crates/cdf-subprocess/ — Singer / Airbyte / NDJSON over stdio). */
class SubprocessSpec extends SparkSpec {

  private def emitter(lines: Seq[String]): Seq[String] = {
    val f = Files.createTempFile("graft_tap_", ".txt")
    Files.write(f, lines.mkString("", "\n", "\n").getBytes(StandardCharsets.UTF_8))
    Seq("cat", f.toString)
  }

  test("singer tap: SCHEMA → RECORD → STATE over a real pipe") {
    val r = Subprocess.singer(spark, emitter(Seq(
      """{"type":"SCHEMA","stream":"users","schema":{"properties":{"id":{"type":"integer"},"name":{"type":["string","null"]}}}}""",
      """{"type":"RECORD","stream":"users","record":{"id":1,"name":"ada"}}""",
      """{"type":"RECORD","stream":"users","record":{"id":2,"name":null}}""",
      """{"type":"STATE","value":{"bookmark":{"users":2}}}""")))
    assert(r.recordCounts == Map("users" -> 2L))
    assert(r.streams("users").filter("id = 1").head().getString(1) == "ada")
    assert(r.state.exists(_.blob.contains("bookmark")))
  }

  test("airbyte source: CATALOG schemas, two streams, verbatim STATE through the ledger") {
    val r = Subprocess.airbyte(spark, emitter(Seq(
      """{"type":"CATALOG","catalog":{"streams":[
        |{"stream":{"name":"orders","json_schema":{"properties":{"oid":{"type":"integer"},"amt":{"type":"number"}}}}},
        |{"name":"users","json_schema":{"properties":{"uid":{"type":"integer"},"tag":{"type":["string","null"]}}}}]}}"""
        .stripMargin.replace("\n", ""),
      """{"type":"LOG","log":{"level":"INFO","message":"ignored"}}""",
      """{"type":"RECORD","record":{"stream":"orders","data":{"oid":10,"amt":99.5},"emitted_at":1700000000000}}""",
      """{"type":"RECORD","record":{"stream":"users","data":{"uid":7,"tag":"x"},"emitted_at":1700000000001}}""",
      """{"type":"RECORD","record":{"stream":"orders","data":{"oid":11,"amt":1.25},"emitted_at":1700000000002}}""",
      """{"type":"STATE","state":{"data":{"orders_cursor":11}}}""")))
    assert(r.recordCounts == Map("orders" -> 2L, "users" -> 1L))
    assert(r.streams("orders").filter("oid = 11").head().getDouble(1) == 1.25)
    assert(r.streams("users").schema.fieldNames.toSeq == Seq("uid", "tag"))

    // the foreign state blob resumes through the same ledger machinery
    val out = tmpDir()
    val ledger = Ledger.at(out)
    ledger.propose("ab", "root", "p1", r.state)
    ledger.commit("ab", "root", "p1", """{"rows":3}""")
    val resumed = ledger.resumePosition("ab", "root")
    assert(resumed == r.state)
    assert(resumed.collect { case Position.ForeignState("airbyte", b) => b }
      .exists(_.contains("orders_cursor")))
  }

  test("airbyte record for an undeclared stream is a contract error, not silent variant") {
    intercept[IllegalArgumentException] {
      Subprocess.airbyte(spark, emitter(Seq(
        """{"type":"RECORD","record":{"stream":"ghost","data":{"x":1}}}""")))
    }
  }
}
