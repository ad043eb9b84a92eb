package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiling main (dev-only, not part of the library surface). */
object Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Long): Unit = {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val n = f
      System.err.println(f"[prof] $name%-30s ${(System.nanoTime() - t0) / 1e9}%8.2fs  ($n rows)")
    }
    val docs = Tables.documents(spark, sfDir)
    import graft.dedup.Dedup
    time("docs_scan")(docs.queryExecution.toRdd.count())
    val sh = docs
      .repartition(32)
      .select(col("doc_id"), Cols.tokens(col("text")).as("toks"))
      .select(col("doc_id"), explode(Cols.shinglesOfTokens(col("toks"), 3)).as("shingle"))
    time("shingle_rows")(sh.queryExecution.toRdd.count())
    time("shingle_rows_again")(sh.queryExecution.toRdd.count())
    val hashed1 = sh.select(col("doc_id"), Cols.hash60(0, col("shingle")).as("h0"))
    time("one_hash60")(hashed1.queryExecution.toRdd.count())
    val hashed16 = sh.select(
      col("doc_id") +: (0 until 16).map(i => Cols.hash60(i, col("shingle")).as(s"h$i")): _*)
    time("sixteen_hash60")(hashed16.queryExecution.toRdd.count())
    time("minhash_sigs")(Dedup.minhashSignatures(docs).queryExecution.toRdd.count())
    time("minhash_full")(Dedup.minhashLsh(docs).queryExecution.toRdd.count())
    time("ngram_full")(Dedup.ngramJaccard(docs).queryExecution.toRdd.count())
    spark.stop()
  }
}
