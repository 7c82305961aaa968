package graft.tools

/** Dev utility: print the registry key list (no SparkSession needed).
  * Keys without an oracle SQL entry are marked with a trailing `*`.
  */
object PrintKeys {
  def main(args: Array[String]): Unit = {
    val q = graft.SparkEntry.queries.keys.toSeq.sorted
    val o = graft.SparkEntry.oracleSql.keySet
    println("COUNT " + q.size + " ORACLES " + o.size)
    println(q.map(k => if (o(k)) k else k + "*").mkString(" "))
  }
}
