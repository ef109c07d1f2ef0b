package graft

import org.apache.spark.sql.functions._

import graft.contract.{ContractPolicy, RowRule}
import graft.core.{Descriptor, Ledger, Position}
import graft.run.Runner

class PartitionedRunSpec extends SparkSpec {

  test("partition-scoped runs: independent scopes, composite resume position, union completeness") {
    val base = tmpDir()
    val ledger = Ledger.at(base)
    val ev = graft.core.Tables.eventsUs(spark, sf())
    val parts = (0 until 3).map(i =>
      s"p$i" -> ev.filter(col("user_id") % 3 === i))

    val cfg = Runner.RunConfig(
      descriptor = Descriptor.ResourceDescriptor(
        id = "ev_r", schemaSource = Descriptor.SchemaSource.Discover,
        primaryKey = Seq("event_id"),
        cursor = Some(Descriptor.CursorSpec("ts_us", lagMs = 0, Descriptor.OrderingClaim.Inexact)),
        disposition = Descriptor.Disposition.Append),
      policy = ContractPolicy(Seq(RowRule.Nullability("nn", "event_id"))))

    val (results, combined) = Runner.runPartitioned(spark, cfg, parts, base, ledger)
    assert(results.forall(_._2.committed))
    // union completeness: the three destinations cover the table exactly
    val union = (0 until 3).map(i => spark.read.parquet(s"$base/dest_p$i")).reduce(_ unionByName _)
    assert(union.count() == ev.count())
    assert(union.select("event_id").distinct().count() == ev.count())
    // composite position carries one typed cursor per partition
    val comp = combined.get.asInstanceOf[Position.Composite]
    assert(comp.parts.keySet == Set("p0", "p1", "p2"))
    for (i <- 0 until 3) {
      val expected = parts(i)._2.agg(max("ts_us")).head().getLong(0)
      assert(comp.parts(s"p$i") == Position.Cursor("ts_us", expected))
      // each scope independently resumable from the ledger
      assert(ledger.committedHead(s"ev_r/partition:p$i", "root").isDefined)
    }
  }
}
