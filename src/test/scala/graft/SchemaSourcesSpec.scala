package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.contract.{NestedActions, SchemaOps}
import graft.core.Position
import graft.sources.{FileSource, Paginators}

class SchemaSourcesSpec extends SparkSpec {
  import spark.implicits._

  test("schema fingerprint: order-sensitive, type-sensitive, metadata-insensitive") {
    val a = StructType(Seq(StructField("x", LongType), StructField("y", StringType)))
    val b = StructType(Seq(StructField("y", StringType), StructField("x", LongType)))
    val c = StructType(Seq(StructField("x", IntegerType), StructField("y", StringType)))
    val d = StructType(Seq(
      StructField("x", LongType, nullable = true,
        new MetadataBuilder().putString("cdf:source_name", "X").build()),
      StructField("y", StringType)))
    assert(SchemaOps.fingerprint(a) != SchemaOps.fingerprint(b))
    assert(SchemaOps.fingerprint(a) != SchemaOps.fingerprint(c))
    assert(SchemaOps.fingerprint(a) == SchemaOps.fingerprint(d))
  }

  test("drift admission: new col → variant; lossy type change → reject; lossless widens admit") {
    import SchemaOps.AdmissionVerdict._
    val auth = StructType(Seq(StructField("id", LongType), StructField("v", DoubleType)))
    assert(SchemaOps.admit(auth, auth) == Admit)
    val withNew = StructType(auth.fields :+ StructField("extra", StringType))
    assert(SchemaOps.admit(auth, withNew) == AdmitAsVariant(Seq("extra")))
    val lossy = StructType(Seq(StructField("id", StringType), StructField("v", DoubleType)))
    assert(SchemaOps.admit(auth, lossy).isInstanceOf[RejectBatch])
    // observed int where authority has long = lossless widening → admit
    val narrower = StructType(Seq(StructField("id", IntegerType), StructField("v", DoubleType)))
    assert(SchemaOps.admit(auth, narrower) == Admit)
    val missing = StructType(Seq(StructField("id", LongType)))
    assert(SchemaOps.admit(auth, missing).isInstanceOf[Quarantine])
  }

  test("schema aggregation: per-field verdicts, lossless-only merge, conflicts surfaced") {
    import SchemaOps.FieldVerdict._
    val a = StructType(Seq(StructField("id", IntegerType), StructField("x", StringType)))
    val b = StructType(Seq(StructField("id", LongType), StructField("y", DoubleType)))
    val verdicts = SchemaOps.aggregate(a, b).toMap
    assert(verdicts("id") == Widened(LongType, IntegerType))
    assert(verdicts("x") == OnlyLeft(StringType))
    assert(verdicts("y") == OnlyRight(DoubleType))
    val merged = SchemaOps.mergedSchema(SchemaOps.aggregate(a, b)).toOption.get
    assert(merged.fieldNames.toSeq == Seq("id", "x", "y"))
    val conflict = SchemaOps.aggregate(
      StructType(Seq(StructField("id", LongType))),
      StructType(Seq(StructField("id", StringType))))
    assert(SchemaOps.mergedSchema(conflict).isLeft)
  }

  test("nested actions: variant capture and child-table expansion") {
    import NestedActions.NestedAction._
    val df = Seq((1L, ("a", 10)), (2L, ("b", 20))).toDF("id", "payload")

    val (varDf, none) = NestedActions(df, "payload", CaptureVariant)
    assert(none.isEmpty)
    assert(varDf.columns.toSeq == Seq("id", NestedActions.VariantColumn))
    val vjson = varDf.filter(col("id") === 1).select(NestedActions.VariantColumn)
      .as[String].head()
    assert(vjson.contains("\"a\"") && vjson.contains("10"))

    val (parent, child) = NestedActions(df, "payload", ExpandToChildTable("payload_child", Seq("id")))
    assert(parent.columns.toSeq == Seq("id"))
    val (cname, cdf) = child.get
    assert(cname == "payload_child")
    assert(cdf.columns.toSeq == Seq("id", "_1", "_2"))
    assert(cdf.count() == 2)

    val arr = Seq((1L, Seq(("x", 1), ("y", 2)))).toDF("id", "items")
    val (_, arrChild) = NestedActions(arr, "items", ExpandToChildTable("items_child", Seq("id")))
    val acdf = arrChild.get._2
    assert(acdf.count() == 2)
    assert(acdf.columns.contains("_child_pos")) // ordinal preserved for replay
  }

  test("file source: discovery, manifest-incremental reads, csv+ndjson decode, gzip") {
    val dir = tmpDir()
    Files.writeString(Paths.get(dir, "a.csv"), "id,name\n1,x\n2,y\n")
    Files.writeString(Paths.get(dir, "b.csv"), "id,name\n3,z\n")
    val d1 = FileSource.discover(dir, "*.csv")
    assert(d1.files.map(_.path.split('/').last) == Seq("a.csv", "b.csv"))

    // first run: everything is new
    val new1 = FileSource.newFiles(d1, None)
    assert(new1.size == 2)
    val df1 = FileSource.read(spark, FileSource.Format.Csv(), new1.map(_.path))
    assert(df1.count() == 3)
    assert(df1.schema("id").dataType == IntegerType) // bounded inference typed it
    val pos1 = FileSource.advance(None, new1)

    // second run: only the appended file is new
    Files.writeString(Paths.get(dir, "c.csv"), "id,name\n4,w\n")
    val new2 = FileSource.newFiles(FileSource.discover(dir, "*.csv"), Some(pos1))
    assert(new2.map(_.path.split('/').last) == Seq("c.csv"))

    // ndjson + gzip decode (Hadoop codec transparent on extension)
    val jdir = tmpDir()
    Files.writeString(Paths.get(jdir, "d.json"), "{\"id\":1}\n{\"id\":2}\n")
    val gz = new java.util.zip.GZIPOutputStream(
      Files.newOutputStream(Paths.get(jdir, "e.json.gz")))
    gz.write("{\"id\":3}\n".getBytes("UTF-8")); gz.close()
    val jdf = FileSource.read(spark, FileSource.Format.Ndjson,
      Seq(s"$jdir/d.json", s"$jdir/e.json.gz"))
    assert(jdf.agg(sum(col("id"))).head().getLong(0) == 6L)
  }

  test("paginators: all five strategies drain correctly and record typed positions") {
    import Paginators._
    // fixture: 25 records, ids 1..25
    val all = (1 to 25).map(_.toString)

    val offset = Offset(10)
    val (op, opos) = drain(offset, req => {
      val o = req.params("offset").toInt
      PageResponse(all.slice(o, o + 10))
    }, None)
    assert(op.flatten == all && opos == Some(Position.Cursor("offset", 25)))

    val page = PageNumber()
    val (pp, ppos) = drain(page, req => {
      val p = req.params("page").toInt
      PageResponse(all.slice((p - 1) * 10, p * 10), totalPages = Some(3))
    }, None)
    assert(pp.flatten == all && ppos == Some(Position.PageToken("3")))

    val (tp, tpos) = drain(NextToken, req => {
      val start = req.params.get("token").map(_.toInt).getOrElse(0)
      val slice = all.slice(start, start + 10)
      PageResponse(slice, nextToken = if (start + 10 < 25) Some((start + 10).toString) else None)
    }, None)
    assert(tp.flatten == all && tpos == Some(Position.PageToken("")))

    val (lp, _) = drain(LinkHeader, req => {
      val start = req.params("url") match { case "" => 0; case u => u.toInt }
      PageResponse(all.slice(start, start + 10),
        linkNext = if (start + 10 < 25) Some((start + 10).toString) else None)
    }, None)
    assert(lp.flatten == all)

    val cursor = CursorParam("since", rs => rs.lastOption.map(_.toLong))
    val (cp, cpos) = drain(cursor, req => {
      val since = req.params.get("since").map(_.toInt).getOrElse(0)
      PageResponse(all.filter(_.toInt > since).take(10))
    }, None)
    assert(cp.flatten == all && cpos == Some(Position.Cursor("since", 25)))
    // resume from a typed position skips consumed records
    val (cp2, _) = drain(cursor, req => {
      val since = req.params.get("since").map(_.toInt).getOrElse(0)
      PageResponse(all.filter(_.toInt > since).take(10))
    }, Some(Position.Cursor("since", 20)))
    assert(cp2.flatten == (21 to 25).map(_.toString))

    // auto-detection recorded from response shape
    assert(detect(PageResponse(Nil, nextToken = Some("t"))).name == "next_token")
    assert(detect(PageResponse(Nil, linkNext = Some("u"))).name == "link_header")
    assert(detect(PageResponse(Nil, totalPages = Some(2))).name == "page")
    assert(detect(PageResponse(Nil)).name == "offset")
  }
}
