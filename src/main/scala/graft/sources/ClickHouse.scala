package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** ClickHouse source/dest seam (cdf: crates/cdf-source-clickhouse/src/
  * resource.rs:284-300 capabilities; crates/cdf-dest-clickhouse/src/
  * plan.rs / session.rs staged atomic publish). No server or driver
  * exists in this container, so the transport is injected (a deployment
  * plugs the HTTP interface into the same seam — queries carry
  * `FORMAT JSONEachRow` and responses are NDJSON, which is exactly what
  * the fixture serves).
  *
  * What's faithfully modeled:
  *  - dialect: Spark↔ClickHouse type lattice, identifier quoting,
  *    literal rendering;
  *  - scan: Exact pushdown for { = > >= < <= } (the reference's
  *    declared operator set), projection pushdown, ORDER BY, LIMIT
  *    (refused when a cursor is declared — capability truth-telling),
  *    cursor-incremental WHERE from a typed position;
  *  - dest: the staged publish plan — `__incoming_<hash>` stage,
  *    insert, last-writer dedup into a publish stage, EXCHANGE TABLES
  *    atomic swap (never delete-then-insert), drop of the retired
  *    stage. Replay-safe: stage names derive from the package hash.
  */
object ClickHouse {

  // ------------------------------------------------------------ dialect

  def chType(dt: DataType, nullable: Boolean): String = {
    val base = dt match {
      case LongType => "Int64"
      case IntegerType => "Int32"
      case ShortType => "Int16"
      case ByteType => "Int8"
      case DoubleType => "Float64"
      case FloatType => "Float32"
      case BooleanType => "Bool"
      case StringType => "String"
      case BinaryType => "String"
      case DateType => "Date32"
      case TimestampType => "DateTime64(6)"
      case d: DecimalType => s"Decimal(${d.precision}, ${d.scale})"
      case other => throw new IllegalArgumentException(s"clickhouse surface: $other")
    }
    if (nullable) s"Nullable($base)" else base
  }

  def sparkType(ch: String): DataType = {
    val inner = if (ch.startsWith("Nullable(")) ch.stripPrefix("Nullable(").stripSuffix(")") else ch
    inner match {
      case "Int64" | "UInt32" => LongType
      case "Int32" | "UInt16" => IntegerType
      case "Int16" | "UInt8" => ShortType
      case "Int8" => ByteType
      case "Float64" => DoubleType
      case "Float32" => FloatType
      case "Bool" => BooleanType
      case "String" => StringType
      case "Date32" | "Date" => DateType
      case s if s.startsWith("DateTime") => TimestampType
      case s if s.startsWith("Decimal(") =>
        val Array(p, sc) = s.stripPrefix("Decimal(").stripSuffix(")").split(',').map(_.trim.toInt)
        DecimalType(p, sc)
      case other => throw new IllegalArgumentException(s"clickhouse type: $other")
    }
  }

  def ident(name: String): String = {
    require(!name.contains('`'), s"unquotable identifier: $name")
    s"`$name`"
  }

  def literal(v: Any): String = v match {
    case null => "NULL"
    case s: String => "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"
    case b: Boolean => if (b) "true" else "false"
    case n: java.math.BigDecimal => n.toPlainString
    case other => other.toString
  }

  // --------------------------------------------------------------- scan

  /** The reference's exact-fidelity operator set — anything else stays
    * engine-side (resource.rs:284-300). */
  final case class Pred(col: String, op: String, value: Any) {
    require(Set("=", ">", ">=", "<", "<=").contains(op), s"non-pushable operator $op")
    def sql: String = s"${ident(col)} $op ${literal(value)}"
  }

  /** One ORDER BY term. Null placement is rendered explicitly — Spark's
    * default (NULLS FIRST asc / NULLS LAST desc) happens to match
    * ClickHouse's, but an OrderBy forwarded from the engine carries its
    * own placement (cdf: crates/cdf-kernel/src/resource.rs:611-622) and
    * the dialect must say it, not assume it. */
  final case class Order(col: String, desc: Boolean = false, nullsLast: Boolean = false) {
    def sql: String =
      s"${ident(col)} ${if (desc) "DESC" else "ASC"} NULLS ${if (nullsLast) "LAST" else "FIRST"}"
  }

  final case class ScanSpec(
      table: String,
      columns: Seq[String],
      preds: Seq[Pred] = Seq.empty,
      orderBy: Seq[Order] = Seq.empty,
      limit: Option[Long] = None,
      cursor: Option[(String, Long)] = None,
      /** raw select items replacing the column list (aggregate scans);
        * each item must alias to the output field name. */
      selectItems: Seq[String] = Seq.empty,
      groupBy: Seq[String] = Seq.empty,
      offset: Option[Long] = None,
      /** raw shard/range predicates ANDed into the WHERE — how an
        * executor-side scan splits one logical read into one dialect
        * query per partition. */
      rawWheres: Seq[String] = Seq.empty) {

    /** limit + cursor cannot combine (capability truth-telling: a
      * limited incremental read could drop rows the cursor then skips
      * forever). */
    require(limit.isEmpty || cursor.isEmpty, "LIMIT unsupported on cursor resources")
    require(offset.isEmpty || cursor.isEmpty, "OFFSET unsupported on cursor resources")

    def sql: String = {
      val cols =
        if (selectItems.nonEmpty) selectItems.mkString(", ")
        else columns.map(ident).mkString(", ")
      // every conjunct is parenthesized: a shard/raw predicate may
      // legitimately contain OR ("id < 100 OR id IS NULL") and a bare
      // AND-join would let it escape the conjunction (AND binds
      // tighter than OR), returning wrong rows per shard
      val conds = (preds.map(_.sql) ++ rawWheres ++
        cursor.map { case (c, v) => s"${ident(c)} > $v" }.toSeq).map(c => s"($c)")
      val where = if (conds.isEmpty) "" else conds.mkString(" WHERE ", " AND ", "")
      val group = if (groupBy.isEmpty) "" else
        groupBy.map(ident).mkString(" GROUP BY ", ", ", "")
      val order = if (orderBy.isEmpty) "" else
        orderBy.map(_.sql).mkString(" ORDER BY ", ", ", "")
      val lim = limit.fold("")(l => s" LIMIT $l")
      val off = offset.fold("")(o => s" OFFSET $o")
      s"SELECT $cols FROM ${ident(table)}$where$group$order$lim$off FORMAT JSONEachRow"
    }
  }

  /** transport: sql → JSONEachRow response body. */
  type Transport = String => String

  /** Distributed parse of the NDJSON response: lines fan out, typed by
    * the declared schema (never inference). */
  def read(spark: SparkSession, t: Transport, spec: ScanSpec, schema: StructType): DataFrame = {
    val body = t(spec.sql)
    val lines = body.split('\n').iterator.map(_.trim).filter(_.nonEmpty).toSeq
    import spark.implicits._
    val raw = spark.createDataset(lines)(org.apache.spark.sql.Encoders.STRING).toDF("j")
    raw.select(from_json(col("j"), schema).as("r")).select(col("r.*"))
  }

  // ---------------------------------------------------------------- dest

  /** One statement of the staged publish plan. */
  final case class Stmt(sql: String)

  /** The atomic-merge publish plan (cdf-dest-clickhouse plan.rs:39-78,
    * session.rs:147-176): build a fresh publish stage from
    * current ∪ incoming with last-writer dedup on the merge keys, then
    * EXCHANGE TABLES — readers see old-or-new, never a gap, and a
    * replayed package recreates identical stage names (idempotent). */
  def publishPlan(table: String, schema: StructType, mergeKeys: Seq[String],
      orderCol: String, packageHash: String): Seq[Stmt] = {
    require(mergeKeys.nonEmpty, "merge keys required")
    val h = packageHash.take(16)
    val incoming = s"__incoming_$h"
    val stage = s"__publish_$h"
    val colsDdl = schema.fields.map(f =>
      s"${ident(f.name)} ${chType(f.dataType, f.nullable)}").mkString(", ")
    val keyList = mergeKeys.map(ident).mkString(", ")
    val allCols = schema.fieldNames.map(ident).mkString(", ")
    Seq(
      Stmt(s"CREATE TABLE ${ident(incoming)} ($colsDdl) ENGINE = MergeTree ORDER BY ($keyList)"),
      Stmt(s"INSERT INTO ${ident(incoming)} FORMAT JSONEachRow"),
      Stmt(s"CREATE TABLE ${ident(stage)} ($colsDdl) ENGINE = MergeTree ORDER BY ($keyList)"),
      // last-writer per key across current ∪ incoming; incoming wins ties
      Stmt(s"INSERT INTO ${ident(stage)} SELECT $allCols FROM (" +
        s"SELECT *, row_number() OVER (PARTITION BY $keyList " +
        s"ORDER BY ${ident(orderCol)} DESC, ${ident("__src")} DESC) AS __rn FROM (" +
        s"SELECT $allCols, 0 AS ${ident("__src")} FROM ${ident(table)} " +
        s"UNION ALL SELECT $allCols, 1 AS ${ident("__src")} FROM ${ident(incoming)})) WHERE __rn = 1"),
      Stmt(s"EXCHANGE TABLES ${ident(stage)} AND ${ident(table)}"),
      Stmt(s"DROP TABLE ${ident(stage)}"),
      Stmt(s"DROP TABLE ${ident(incoming)}"))
  }
}
