package graft.tools

/** Dev utility: print the registry key list (no SparkSession needed).
  * Keys whose oracle SQL is missing OR blank are marked with a trailing
  * `*` — queries and oracleSql are built from the same tuples, so only a
  * blank/placeholder SQL string can actually differ.
  */
object PrintKeys {
  def main(args: Array[String]): Unit = {
    val q = graft.SparkEntry.queries.keys.toSeq.sorted
    val o = graft.SparkEntry.oracleSql
    println("COUNT " + q.size + " ORACLES " + o.count(_._2.trim.nonEmpty))
    println(q.map(k => if (o.get(k).exists(_.trim.nonEmpty)) k else k + "*")
      .mkString(" "))
  }
}
