package graft

import org.apache.spark.sql.functions._

/** The idiom-recognition optimizer rule: SQL written in the portable
  * composed spelling of the 60-bit hash must silently run on the native
  * codegen'd Hash60 expression with identical results.
  */
class RewriteHash60Spec extends SparkSpec {
  import spark.implicits._

  private val composed = "cast(conv(substr(md5(s), 1, 15), 16, 10) as bigint)"

  test("composed conv/substr/md5 idiom is rewritten to native graft_hash60") {
    // parquet-backed input: a local Seq would fold to a LocalRelation
    // before the plan can be inspected
    val df = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("text").as("s")).selectExpr(s"$composed as h")
    val optimized = df.queryExecution.optimizedPlan.toString()
    assert(optimized.contains("graft_hash60"), s"rewrite missed:\n$optimized")
    assert(!optimized.contains("conv("), s"composed form survived:\n$optimized")
  }

  test("rewritten idiom returns bit-identical values to the native function") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("text").as("s")).limit(200)
    val viaIdiom = docs.selectExpr(s"$composed as h").as[Long].collect().toSeq
    val viaNative = docs.select(Cols.hash60(col("s")).as("h")).as[Long].collect().toSeq
    assert(viaIdiom === viaNative)
  }

  test("other conv/md5 uses are untouched") {
    // different substring width — must NOT be rewritten (different value)
    val other = Seq("x").toDF("s")
      .selectExpr("cast(conv(substr(md5(s), 1, 8), 16, 10) as bigint) as h")
    val optimized = other.queryExecution.optimizedPlan.toString()
    assert(!optimized.contains("graft_hash60"), s"over-eager rewrite:\n$optimized")
    // value sanity: 8 hex chars = 32 bits
    val v = other.as[Long].head()
    assert(v >= 0L && v < (1L << 32))
  }
}
