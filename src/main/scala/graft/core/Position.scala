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

  def fromJson(s: String): Position = fromJ(CanonicalJson.parse(s))

  /** Structural decode — total inverse of `toJson` over every kind,
    * including nested `composite` and `file_manifest` (cdf positions
    * round-trip through the checkpoint store losslessly;
    * position.rs:1-721). A flat regex would mis-read nested JSON —
    * e.g. return one partition's cursor as the whole composite. */
  def fromJ(j: J): Position = {
    val f = CanonicalJson.objFields(j)
    def str(k: String): String = f(k) match {
      case JStr(v) => v
      case other => throw new IllegalArgumentException(s"position field $k: expected string, got $other")
    }
    def long(k: String): Long = f(k) match {
      case JInt(v) => v
      case other => throw new IllegalArgumentException(s"position field $k: expected int, got $other")
    }
    str("kind") match {
      case "cursor" => Cursor(str("field"), long("value"))
      case "postgres_commit" => PostgresCommit(long("commit_lsn"), long("end_lsn"), long("xid"))
      case "mysql_commit" => MySqlCommit(str("binlog_file"), long("end_log_position"), str("gtids"))
      case "page_token" => PageToken(str("token"))
      case "foreign_state" => ForeignState(str("format"), str("blob"))
      case "file_manifest" =>
        val files = f("files") match {
          case JArr(vs) => vs.map { e =>
            val ef = CanonicalJson.objFields(e)
            def es(k: String) = ef(k).asInstanceOf[JStr].v
            def el(k: String) = ef(k).asInstanceOf[JInt].v
            FileEntry(es("path"), el("size"), el("mtime_ms"))
          }
          case other => throw new IllegalArgumentException(s"file_manifest files: expected array, got $other")
        }
        FileManifest(files)
      case "composite" =>
        Composite(f.collect { case (k, v) if k != "kind" => k -> fromJ(v) })
      case other => throw new IllegalArgumentException(s"unsupported position kind: $other")
    }
  }
}
