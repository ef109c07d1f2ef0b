package graft.sources

import java.sql.DriverManager

import org.apache.spark.sql.{DataFrame, SparkSession}

/** JDBC source/destination (cdf: crates/cdf-source-postgres /
  * cdf-source-sqlite / cdf-dest-postgres — SURVEY §2.1/§2.2 JDBC
  * mapping: "JDBC reader with pushDownPredicate, partitioned by PK
  * ranges"; merge = stage table + merge_from_stage,
  * commit.rs:678-943).
  *
  * Exercised in-process against embedded Derby (the container has no
  * database server); the same code drives Postgres/MySQL by switching
  * the URL/driver. Key behaviors:
  *  - predicate + projection pushdown into the remote SQL (Exact
  *    fidelity — Spark drops pushed filters, no re-check)
  *  - range-partitioned parallel reads on a numeric key
  *  - merge disposition as stage-table + SQL MERGE, never row-by-row
  */
object Jdbc {

  final case class Conn(url: String, driver: String = "org.apache.derby.jdbc.EmbeddedDriver")

  /** Full pushdown surface enabled: predicates, LIMIT/OFFSET, and
    * AGGREGATES compile into the remote SQL where the dialect supports
    * them (Derby: FETCH FIRST for limit, standard aggregate functions)
    * — the reference's Postgres capability set (SELECT w/ pushed
    * projection/filter/order/limit, cdf-source-postgres
    * capabilities :395-430). */
  def read(spark: SparkSession, c: Conn, table: String): DataFrame =
    spark.read.format("jdbc")
      .option("url", c.url).option("driver", c.driver)
      .option("dbtable", table)
      .option("pushDownPredicate", "true")
      .option("pushDownLimit", "true")
      .option("pushDownOffset", "true")
      .option("pushDownAggregate", "true")
      .load()

  /** Range-partitioned parallel read: one JDBC cursor per partition
    * (the PK-range partitioning of the reference's table scans). */
  def readPartitioned(spark: SparkSession, c: Conn, table: String,
      partitionColumn: String, lower: Long, upper: Long, numPartitions: Int): DataFrame =
    spark.read.format("jdbc")
      .option("url", c.url).option("driver", c.driver)
      .option("dbtable", table)
      .option("partitionColumn", partitionColumn)
      .option("lowerBound", lower.toString)
      .option("upperBound", upper.toString)
      .option("numPartitions", numPartitions.toString)
      .load()

  def append(df: DataFrame, c: Conn, table: String): Unit =
    df.write.format("jdbc")
      .option("url", c.url).option("driver", c.driver)
      .option("dbtable", table)
      .mode("append").save()

  def createTable(c: Conn, ddl: String): Unit = withConn(c) { conn =>
    conn.createStatement().executeUpdate(ddl)
  }

  /** merge disposition: bulk-write the batch to a staging table, then
    * one set-based MERGE statement — insert-or-update on the key,
    * stage dropped after (cdf merge_from_stage, commit.rs:678-943).
    *
    * Crash-safety law (the commit path the reference proves e2e): the
    * destination mutates in exactly ONE atomic statement (the MERGE);
    * a crash before it leaves the destination untouched, a crash after
    * it leaves only the inert stage table behind, and REPLAYING the
    * whole merge from either point converges to the same final state
    * (stage is overwritten, MERGE is an upsert). `chaos` is the
    * kill-point hook: tests throw from it to simulate a crash between
    * steps ("staged" → after the stage write, "merged" → after the
    * MERGE, before the stage drop). */
  def mergeInto(df: DataFrame, c: Conn, table: String, key: String,
      chaos: String => Unit = _ => ()): Unit = {
    val stage = s"${table}_STAGE"
    val cols = df.columns
    df.write.format("jdbc")
      .option("url", c.url).option("driver", c.driver)
      .option("dbtable", stage)
      .mode("overwrite").save()
    chaos("staged")
    val sets = cols.filterNot(_ == key).map(x => s"t.$x = s.$x").mkString(", ")
    val insertCols = cols.mkString(", ")
    val insertVals = cols.map(x => s"s.$x").mkString(", ")
    withConn(c) { conn =>
      conn.createStatement().executeUpdate(
        s"""MERGE INTO $table t USING $stage s ON t.$key = s.$key
           |WHEN MATCHED THEN UPDATE SET $sets
           |WHEN NOT MATCHED THEN INSERT ($insertCols) VALUES ($insertVals)""".stripMargin)
      chaos("merged")
      conn.createStatement().executeUpdate(s"DROP TABLE $stage")
    }
  }

  /** Incremental cursor scan: the cursor predicate is pushed into the
    * remote SQL as a dbtable subquery (Exact fidelity — the source
    * evaluates it, nothing re-checked), reading only rows past the
    * committed position. */
  def readIncremental(spark: SparkSession, c: Conn, table: String,
      cursorColumn: String, after: Long): DataFrame =
    spark.read.format("jdbc")
      .option("url", c.url).option("driver", c.driver)
      .option("dbtable", s"(SELECT * FROM $table WHERE $cursorColumn > $after) cursor_scan")
      .load()

  /** Post-commit receipt probe: count via an independent connection. */
  def countProbe(c: Conn, table: String): Long = withConn(c) { conn =>
    val rs = conn.createStatement().executeQuery(s"SELECT COUNT(*) FROM $table")
    rs.next(); rs.getLong(1)
  }

  private def withConn[A](c: Conn)(f: java.sql.Connection => A): A = {
    Class.forName(c.driver)
    val conn = DriverManager.getConnection(c.url)
    try f(conn) finally conn.close()
  }
}
