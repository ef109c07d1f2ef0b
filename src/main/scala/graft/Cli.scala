package graft

import graft.core.{Ledger, SystemTables, Tables}
import graft.run.ResourceSql

/** Operator CLI — the `cdf` command-surface parity layer (cdf:
  * crates/cdf-cli; SURVEY §3.1/§3.2):
  *
  *   run <resource.sql> <sfDir> <baseDir>   compile + execute the spine
  *   preview <resource.sql> <sfDir> [n]     bounded read, nothing written
  *   compile <resource.sql> <sfDir>         envelope+admission check only
  *   sql <sfDir> <query>                    ad-hoc SQL over data tables
  *   doctor <baseDir>                       ledger/package drift report
  *
  * Each subcommand is a thin shell over the library; the library is
  * the product.
  */
object Cli {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"),
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
    try args.toList match {
      case "run" :: path :: sfDir :: baseDir :: Nil =>
        Tables.registerAll(spark, sfDir)
        val text = java.nio.file.Files.readString(java.nio.file.Paths.get(path))
        ResourceSql.run(spark, text, rules = Nil, baseDir, Ledger.at(baseDir)) match {
          case Left(err) => System.err.println(s"error: $err"); sys.exit(2)
          case Right(r) =>
            println(s"committed=${r.committed} duplicate=${r.duplicate} " +
              s"package=${r.packageHash} accepted=${r.accepted} quarantined=${r.quarantined}")
        }
      case "preview" :: path :: sfDir :: rest =>
        Tables.registerAll(spark, sfDir)
        val text = java.nio.file.Files.readString(java.nio.file.Paths.get(path))
        val n = rest.headOption.map(_.toInt).getOrElse(20)
        ResourceSql.compile(spark, text) match {
          case Left(err) => System.err.println(s"error: $err"); sys.exit(2)
          case Right(c) =>
            graft.run.Runner.preview(
              graft.run.Runner.RunConfig(c.descriptor,
                graft.contract.TrustPreset.policy(c.trust, Nil)),
              spark.sql(c.selectSql), n).show(n, false)
        }
      case "compile" :: path :: sfDir :: Nil =>
        Tables.registerAll(spark, sfDir)
        val text = java.nio.file.Files.readString(java.nio.file.Paths.get(path))
        ResourceSql.compile(spark, text) match {
          case Left(err) => System.err.println(s"error: $err"); sys.exit(2)
          case Right(c) => println(s"ok: ${c.descriptor}")
        }
      case "sql" :: sfDir :: query :: Nil =>
        Tables.registerAll(spark, sfDir)
        spark.sql(query).show(100, false)
      case "doctor" :: baseDir :: Nil =>
        val ledger = Ledger.at(baseDir)
        val pkgs = new java.io.File(baseDir).listFiles()
          .filter(f => f.isDirectory && new java.io.File(f, "manifest.json").exists())
          .map(_.getPath).toSeq
        SystemTables.mount(spark, ledger, pkgs)
        SystemTables.driftReport(spark).show(100, false)
        val dangling = ledger.danglingProposals()
        if (dangling.nonEmpty) {
          println(s"dangling proposals: ${dangling.map(_.packageHash).mkString(", ")}")
          sys.exit(1)
        } else println("ledger clean")
      case other =>
        System.err.println(
          "usage: run|preview|compile <resource.sql> <sfDir> [...] | sql <sfDir> <q> | doctor <baseDir>")
        sys.exit(2)
    } finally spark.stop()
  }
}
