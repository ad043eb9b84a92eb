package graft

/** Dev utility: prints authoritative registry counts (queries, oracles,
  * no-oracle set) so README/PARITY counts never go stale. Not part of the
  * driver contract; run with `sbt "runMain graft.RegistryStats"`. */
object RegistryStats {
  def main(args: Array[String]): Unit = {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    println(s"queries=${q.size}")
    println(s"oracles=${o.size}")
    println(s"no_oracle=${(q -- o).toSeq.sorted.mkString(",")}")
    println(s"orphan_oracle=${(o -- q).toSeq.sorted.mkString(",")}")
  }
}
