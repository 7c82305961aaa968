package graft.tools

import graft.similarity.JlProject
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Published tuning surface for the sign-JL tier: cosine distortion vs
  * projection width P on the real embeddings — the knob a user turns
  * when trading scan bytes for rank fidelity, swept the same way the
  * ANN tier published its nprobe×fetch surface.
  *
  * Usage: `runMain graft.tools.JlSweep [sfDir] [P,P,...]`
  * (defaults sf0.1 and 4,8,16,32). Prints one `JLSWEEP` line per P with
  * mean/p90/max |cos_q − cos_p| over the deterministic audit pairs.
  */
object JlSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val ps    = (if (args.length > 1) args(1) else "4,8,16,32")
      .split(",").map(_.trim.toInt).toSeq
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.constraintPropagation.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = graft.Tables.embeddings(spark, sfDir)
    ps.foreach { p =>
      val errs = JlProject.jlDistortionOn(emb, p)
        .filter(col("nsq1_q") > 0 && col("nsq2_q") > 0 &&
          col("nsq1_p") > 0 && col("nsq2_p") > 0)
        .select(abs(
          col("dot_q") / sqrt(col("nsq1_q") * col("nsq2_q")) -
            col("dot_p") / sqrt(col("nsq1_p") * col("nsq2_p"))).as("err"))
      val row = errs.agg(
        avg(col("err")).as("mean"),
        expr("percentile(err, 0.9)").as("p90"),
        max(col("err")).as("max"),
        count(lit(1)).as("pairs")).collect()(0)
      println(f"JLSWEEP p=$p%d mean=${row.getDouble(0)}%.3f " +
        f"p90=${row.getDouble(1)}%.3f max=${row.getDouble(2)}%.3f " +
        f"pairs=${row.getLong(3)}%d theory=${1.0 / math.sqrt(p)}%.3f")
    }
    spark.stop()
  }
}
