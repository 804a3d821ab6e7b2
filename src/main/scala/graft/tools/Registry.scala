package graft.tools

/** Registry inventory printout — the mechanical-refactor safety net
  * for entry-trait splits (the r16 registry split was verified with
  * ad-hoc paren counting; this makes it a diffable artifact): prints
  * sorted query keys, oracle keys, and the rows-only (no-oracle)
  * remainder. Usage: `runMain graft.tools.Registry` */
object Registry {
  def main(args: Array[String]): Unit = {
    val q = graft.SparkEntry.queries.keySet
    val o = graft.SparkEntry.oracleSql.keySet
    println(s"[registry] queries=${q.size} oracles=${o.size} " +
      s"rows_only=${(q -- o).toSeq.sorted.mkString(",")}")
    val orphans = (o -- q).toSeq.sorted
    require(orphans.isEmpty, s"oracles without queries: $orphans")
    q.toSeq.sorted.foreach(k => println(s"[registry] q $k"))
  }
}
