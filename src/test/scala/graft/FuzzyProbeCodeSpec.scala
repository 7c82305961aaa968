package graft

import org.apache.spark.sql.functions._

/** The provably-≥3 replica code behind the depth-2 fuzzy-join probe
  * ([[ScaleProbe.bigNames3]]): EXHAUSTIVE verification that every
  * cross-replica name pair sits at Levenshtein ≥ 3 — the property that
  * makes the ≤2 pair graph per-replica, so the probe's output scales
  * linearly in replicas by corpus construction. All C(100,2) = 4,950
  * replica pairs are checked on real supplier names (the written
  * trace-counting proof lives on bigNames3's scaladoc; this spec is the
  * machine check that the chosen alphabets actually satisfy its
  * disjointness premises, name charset included).
  */
class FuzzyProbeCodeSpec extends SparkSpec {

  test("bigNames3: min cross-replica Levenshtein ≥ 3, within-replica unchanged") {
    val base = Tables.supplier(spark, "/root/testdata/sf0.001").limit(3)
    val named = ScaleProbe.bigNames3(base, 100)
      .select(col("id"), col("name"),
        (col("id") % 10000000L).as("base_id"), expr("id div 10000000").as("rep"))
      .localCheckpoint()
    // cross-replica, same base record: the tag is the ONLY difference,
    // so these pairs realize the code's minimum distance
    val minCross = named.as("a")
      .join(named.as("b"),
        col("a.base_id") === col("b.base_id") && col("a.rep") < col("b.rep"))
      .select(levenshtein(col("a.name"), col("b.name")).as("d"))
      .agg(min(col("d"))).collect()(0).getInt(0)
    assert(minCross >= 3, s"cross-replica distance must be ≥ 3, got $minCross")
    // within a replica the tag is a common prefix: pair distances equal
    // the base-name distances exactly (the ≤2 graph replicates verbatim)
    val withinDists = named.filter(col("rep") === 7).as("a")
      .join(named.filter(col("rep") === 7).as("b"), col("a.base_id") < col("b.base_id"))
      .select(col("a.base_id"), col("b.base_id"),
        levenshtein(col("a.name"), col("b.name")).as("d"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    val baseDists = base.as("a")
      .join(base.as("b"), col("a.s_suppkey") < col("b.s_suppkey"))
      .select(col("a.s_suppkey"), col("b.s_suppkey"),
        levenshtein(col("a.s_name"), col("b.s_name")).as("d"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(withinDists == baseDists)
    // alphabet premises of the written proof: 44 tag characters, all
    // distinct, none drawn from the name charset
    val tagChars = "abcdfghjknq" + "vwxyzABDEFG" + "HIJKLMNOPQR" + "TUVWXYZ!%&+"
    assert(tagChars.toSet.size == 44)
    val nameChars = base.select(col("s_name")).collect()
      .flatMap(_.getString(0)).toSet
    assert(tagChars.toSet.intersect(nameChars).isEmpty)
  }
}
