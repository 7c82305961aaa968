package graft.tools

/** Dev utility: print the registry key list (no SparkSession needed).
  * Keys whose oracle SQL is missing OR blank are marked with a trailing
  * `*` — queries and oracleSql are built from the same tuples, so only a
  * blank/placeholder SQL string can actually differ; [[marked]] is the
  * testable rule (`PrintKeysSpec` pins that a blanked entry fires it).
  */
object PrintKeys {

  /** Sorted key list with `*` appended to every key whose oracle SQL is
    * absent or blank.
    */
  private[graft] def marked(queries: Iterable[String],
      oracle: Map[String, String]): Seq[String] =
    queries.toSeq.sorted
      .map(k => if (oracle.get(k).exists(_.trim.nonEmpty)) k else k + "*")

  def main(args: Array[String]): Unit = {
    val q = graft.SparkEntry.queries.keys
    val o = graft.SparkEntry.oracleSql
    println("COUNT " + q.size + " ORACLES " + o.count(_._2.trim.nonEmpty))
    println(marked(q, o).mkString(" "))
  }
}
