package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.Position
import graft.operators.MergeOps

/** MongoDB change-stream decode: canonical/relaxed Extended JSON v2
  * events → typed rows + resume-token positions + transaction-grouped
  * CDC apply (cdf: crates/cdf-source-mongodb/src/resource.rs:340-356 —
  * change-stream resources with resume tokens and multi-document
  * transaction settlement).
  *
  * No MongoDB server or driver exists in this container (zero egress),
  * so the live transport is out of scope; what IS here is everything
  * downstream of the wire: the public Extended JSON v2 spec decode
  * (`$oid`/`$date`/`$numberLong`/`$numberInt`/`$numberDouble`/
  * `$numberDecimal`/`$timestamp`), the change-event envelope
  * (operationType / documentKey / fullDocument / clusterTime / txn
  * identifiers), lexicographic resume-token ordering, and the bridge
  * into the shared settlement/apply machinery.
  *
  * 100 TB shape: every decode is a codegen'd `get_json_object` column
  * over the raw NDJSON (no UDFs, no driver parsing); events fan out
  * with the file/stream partitioning. Transaction ids derive from the
  * commit `clusterTime` (BSON timestamp = (secs, increment)), so
  * settlement planning needs no global window — `(t << 32) | i` is
  * already monotone in commit order.
  */
object MongoChangeStream {

  // ---------------------------------------- Extended JSON v2 scalars

  /** long: canonical {"$numberLong":"42"} / {"$numberInt":"7"} or
    * relaxed plain 42. */
  def extLong(j: Column, path: String): Column =
    coalesce(
      get_json_object(j, s"$path['$$numberLong']"),
      get_json_object(j, s"$path['$$numberInt']"),
      get_json_object(j, path)).cast(LongType)

  def extDouble(j: Column, path: String): Column =
    coalesce(
      get_json_object(j, s"$path['$$numberDouble']"),
      get_json_object(j, path)).cast(DoubleType)

  def extDecimal(j: Column, path: String, precision: Int = 28, scale: Int = 6): Column =
    coalesce(
      get_json_object(j, s"$path['$$numberDecimal']"),
      get_json_object(j, path)).cast(DecimalType(precision, scale))

  def extString(j: Column, path: String): Column = get_json_object(j, path)

  /** ObjectId: {"$oid":"64..."} */
  def extOid(j: Column, path: String): Column =
    get_json_object(j, s"$path['$$oid']")

  /** datetime → epoch millis: canonical {"$date":{"$numberLong":"ms"}},
    * relaxed {"$date":"ISO-8601"}. */
  def extDateMs(j: Column, path: String): Column =
    coalesce(
      get_json_object(j, s"$path['$$date']['$$numberLong']").cast(LongType),
      unix_millis(to_timestamp(get_json_object(j, s"$path['$$date']"))))

  /** BSON timestamp → (secs << 32) | increment: the change stream's
    * total commit order. */
  def extTimestampKey(j: Column, path: String): Column =
    (get_json_object(j, s"$path['$$timestamp'].t").cast(LongType) * lit(4294967296L)) +
      get_json_object(j, s"$path['$$timestamp'].i").cast(LongType)

  // ----------------------------------------------- envelope decode

  /** Change-event envelope → typed columns; `fullDocument` stays raw
    * JSON for the caller's schema projection. */
  def decodeEnvelope(events: DataFrame, jsonCol: String): DataFrame = {
    val j = col(jsonCol)
    events.select(
      get_json_object(j, "$._id._data").as("resume_token"),
      get_json_object(j, "$.operationType").as("op_type"),
      extTimestampKey(j, "$.clusterTime").as("commit_key"),
      get_json_object(j, "$.ns.db").as("db"),
      get_json_object(j, "$.ns.coll").as("coll"),
      coalesce(extOid(j, "$.documentKey._id"),
        get_json_object(j, "$.documentKey._id")).as("doc_key"),
      extLong(j, "$.txnNumber").as("txn_number"),
      get_json_object(j, "$.lsid.id['$binary'].base64").as("lsid"),
      get_json_object(j, "$.fullDocument").as("full_document"))
  }

  /** Project typed columns out of `full_document` per a declared field
    * list (the resource contract's schema, not inference). */
  def decodeDocument(decoded: DataFrame, fields: Seq[(String, DataType)]): DataFrame = {
    val j = col("full_document")
    val cols = fields.map {
      case (n, LongType | IntegerType) => extLong(j, s"$$.$n").as(n)
      case (n, DoubleType) => extDouble(j, s"$$.$n").as(n)
      case (n, d: DecimalType) => extDecimal(j, s"$$.$n", d.precision, d.scale).as(n)
      case (n, TimestampType) => timestamp_millis(extDateMs(j, s"$$.$n")).as(n)
      case (n, _) => extString(j, s"$$.$n").as(n)
    }
    decoded.select(col("*") +: cols: _*)
  }

  // ------------------------------------------------- resume tokens

  /** Resume tokens (`_id._data`) are hex KeyString encodings prefixed
    * by the cluster timestamp — lexicographic order IS stream order,
    * so resume = strictly-greater filter (pushable to any store that
    * can range-scan strings). */
  def afterToken(decoded: DataFrame, token: Option[String]): DataFrame =
    token.fold(decoded)(t => decoded.filter(col("resume_token") > t))

  def position(token: String): Position =
    Position.ForeignState("mongo_resume_token_v1", token)

  def resumeToken(p: Position): Option[String] = p match {
    case Position.ForeignState("mongo_resume_token_v1", blob) => Some(blob)
    case _ => None
  }

  /** Max observed token — the position to commit after a drained
    * batch. */
  def maxToken(decoded: DataFrame): Option[String] = {
    val r = decoded.agg(max("resume_token")).head()
    if (r.isNullAt(0)) None else Some(r.getString(0))
  }

  // ----------------------------------- transactions → cdc apply

  /** Transaction id for settlement packing: multi-document transaction
    * events carry the SAME commit clusterTime, and `commit_key` is
    * monotone in commit order — so this is a valid settlement `txId`
    * with no global window. Single-document writes are singleton
    * transactions, exactly like the reference's unit packing. */
  def withTxnId(decoded: DataFrame): DataFrame =
    decoded.withColumn("tx_id", col("commit_key"))

  /** Ordered apply of the decoded stream: operationType → op lattice
    * (insert/replace→insert, update→update, delete→delete), last op
    * per document key wins. */
  def applyOrdered(decoded: DataFrame, keyCols: Seq[String]): DataFrame = {
    val ops = decoded.withColumn("op",
      when(col("op_type") === "delete", "delete")
        .when(col("op_type") === "update", "update")
        .otherwise("insert"))
    MergeOps.cdcApply(ops, keyCols, "op", Seq("commit_key", "resume_token"))
  }
}
