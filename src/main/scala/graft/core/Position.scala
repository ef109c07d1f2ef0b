package graft.core

import graft.core.CanonicalJson._

/** Typed incremental-state positions (cdf: crates/cdf-kernel/src/
  * position.rs:1-721, position/cdc.rs). This is exactly the part
  * Structured Streaming's opaque offsets do NOT give you: positions
  * are first-class, serializable, comparable values recorded in the
  * ledger, so any run can be replayed or resumed from a typed value
  * rather than an engine-private blob (SURVEY §1.4).
  */
sealed trait Position {
  def kind: String
  def toJson: J
}

object Position {
  /** Simple monotone cursor over a column (epoch micros, ints, …). */
  final case class Cursor(field: String, value: Long) extends Position {
    def kind = "cursor"
    def toJson: J = JObj.of("kind" -> JStr(kind), "field" -> JStr(field), "value" -> JInt(value))
  }

  /** Postgres WAL commit position (cdf position/cdc.rs:175-201). */
  final case class PostgresCommit(commitLsn: Long, endLsn: Long, xid: Long) extends Position {
    def kind = "postgres_commit"
    def toJson: J = JObj.of("kind" -> JStr(kind), "commit_lsn" -> JInt(commitLsn),
      "end_lsn" -> JInt(endLsn), "xid" -> JInt(xid))
  }

  /** MySQL binlog position (cdf position/cdc.rs:225-263). */
  final case class MySqlCommit(binlogFile: String, endLogPosition: Long, gtids: String) extends Position {
    def kind = "mysql_commit"
    def toJson: J = JObj.of("kind" -> JStr(kind), "binlog_file" -> JStr(binlogFile),
      "end_log_position" -> JInt(endLogPosition), "gtids" -> JStr(gtids))
  }

  /** Processed-file manifest for glob sources: (path, size, mtime) per
    * file already ingested (cdf FileManifest). */
  final case class FileManifest(files: Seq[FileEntry]) extends Position {
    def kind = "file_manifest"
    def toJson: J = JObj.of("kind" -> JStr(kind),
      "files" -> JArr(files.sortBy(_.path).map(_.toJson)))
  }
  final case class FileEntry(path: String, size: Long, mtimeMs: Long) {
    def toJson: J = JObj.of("path" -> JStr(path), "size" -> JInt(size), "mtime_ms" -> JInt(mtimeMs))
  }

  /** Opaque page token for REST paginators. */
  final case class PageToken(token: String) extends Position {
    def kind = "page_token"
    def toJson: J = JObj.of("kind" -> JStr(kind), "token" -> JStr(token))
  }

  /** Per-partition composite (cdf position_aggregation.rs). */
  final case class Composite(parts: Map[String, Position]) extends Position {
    def kind = "composite"
    def toJson: J = JObj(parts.toSeq.sortBy(_._1).map { case (k, p) => k -> p.toJson } :+
      ("kind" -> (JStr(kind): J)))
  }

  /** Foreign connector state blob (singer/airbyte), carried verbatim. */
  final case class ForeignState(format: String, blob: String) extends Position {
    def kind = "foreign_state"
    def toJson: J = JObj.of("kind" -> JStr(kind), "format" -> JStr(format), "blob" -> JStr(blob))
  }

  /** Merge algebra: the combined position of two sub-scans — the
    * monotone max for cursors, union for manifests, per-key merge for
    * composites (cdf position_aggregation.rs, segmentation.rs:922-1000
    * `join_positions`). Mixed kinds are a plan error. */
  def merge(a: Position, b: Position): Position = (a, b) match {
    case (Cursor(f1, v1), Cursor(f2, v2)) if f1 == f2 => Cursor(f1, math.max(v1, v2))
    case (PostgresCommit(c1, e1, x1), PostgresCommit(c2, e2, x2)) =>
      if (c1 >= c2) PostgresCommit(c1, math.max(e1, e2), x1) else PostgresCommit(c2, math.max(e1, e2), x2)
    case (FileManifest(f1), FileManifest(f2)) =>
      FileManifest((f1 ++ f2).groupBy(_.path).map(_._2.maxBy(e => (e.mtimeMs, e.size))).toSeq.sortBy(_.path))
    case (Composite(p1), Composite(p2)) =>
      Composite((p1.keySet ++ p2.keySet).map { k =>
        k -> ((p1.get(k), p2.get(k)) match {
          case (Some(x), Some(y)) => merge(x, y)
          case (Some(x), None) => x
          case (None, Some(y)) => y
          case _ => throw new IllegalStateException("unreachable")
        })
      }.toMap)
    case _ => throw new IllegalArgumentException(
      s"cannot merge positions of kinds ${a.kind} and ${b.kind}")
  }

  def fromJson(s: String): Position = {
    // minimal parser over our own canonical output (flat objects only)
    def field(k: String): Option[String] = {
      val m = ("\"" + k + "\":(\"(?:[^\"\\\\]|\\\\.)*\"|-?\\d+)").r.findFirstMatchIn(s)
      m.map(_.group(1)).map(v => if (v.startsWith("\"")) v.substring(1, v.length - 1) else v)
    }
    field("kind") match {
      case Some("cursor") => Cursor(field("field").get, field("value").get.toLong)
      case Some("postgres_commit") =>
        PostgresCommit(field("commit_lsn").get.toLong, field("end_lsn").get.toLong, field("xid").get.toLong)
      case Some("mysql_commit") =>
        MySqlCommit(field("binlog_file").get, field("end_log_position").get.toLong, field("gtids").get)
      case Some("page_token") => PageToken(field("token").get)
      case Some("foreign_state") => ForeignState(field("format").get, field("blob").get)
      case other => throw new IllegalArgumentException(s"unsupported position json: $other")
    }
  }
}
