package graft.tools

/** Prints the catalog size + any name/oracle bookkeeping drift —
  * driver-side sanity aid for README claims. */
object CatalogCount {
  def main(args: Array[String]): Unit = {
    val all = graft.catalog.Catalog.all
    val withOracle = all.count(_.oracle.isDefined)
    println(s"[catalog] queries=${all.size} with_oracle=$withOracle " +
      s"rows_only=${all.size - withOracle}")
  }
}
