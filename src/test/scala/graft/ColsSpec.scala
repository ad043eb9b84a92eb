package graft

import org.apache.spark.sql.functions._

/** Pins the cross-engine determinism contracts: every constant here was
  * computed independently with DuckDB (see Cols doc comments) — if these
  * break, the oracle hash-match breaks.
  */
class ColsSpec extends SparkSpec {
  import spark.implicits._

  test("hash60 matches DuckDB ('0x' || substr(md5(s),1,15))::BIGINT") {
    // DuckDB: SELECT ('0x' || substr(md5('abc'),1,15))::BIGINT → 648541476951500027
    val got = Seq("abc").toDF("s").select(Cols.hash60(col("s"))).as[Long].head()
    assert(got === 648541476951500027L)
  }

  test("floorDiv floors exactly for positive and negative ns epochs") {
    val vals = Seq(1704067207179575000L, -1L, -1000001L, 999999L, 0L)
    val got = vals.toDF("v").select(Cols.floorDiv(col("v"), 1000000L)).as[Long].collect().toSeq
    assert(got === vals.map(v => Math.floorDiv(v, 1000000L)))
  }

  test("DuckDB remainder-corrected floor oracle form ≡ floorDiv on negatives") {
    // DuckDB `//` and `%` TRUNCATE toward zero (verified: -7 // 2 = -3,
    // -7 % 2 = -1) — exactly like Scala Long `/` and `%`. The oracle form
    // (x - ((x % n + n) % n)) // n is therefore a true floor: the
    // subtraction makes the dividend an exact multiple of n, so the
    // truncating division is exact. Oracles that floor-divide
    // (ev_props_json, emb_quantize_int8, ann_topk_ivf) rely on this.
    def oracleFloor(x: Long, n: Long): Long = (x - ((x % n + n) % n)) / n
    for (x <- Seq(-70001L, -7L, -1L, 0L, 1L, 7L, 70001L); n <- Seq(2L, 3L, 10000L))
      assert(oracleFloor(x, n) === Math.floorDiv(x, n), s"x=$x n=$n")
  }

  test("tumbleStart floors to window start (pmod semantics)") {
    val got = Seq(86400000L * 3 + 5, 86400000L * 3, -1L)
      .toDF("t").select(Cols.tumbleStart(col("t"), 86400000L)).as[Long].collect().toSeq
    assert(got === Seq(86400000L * 3, 86400000L * 3, -86400000L))
  }

  test("normalizeText collapses whitespace and lowercases") {
    val got = Seq("  A  b\t C \n").toDF("s")
      .select(Cols.normalizeText(col("s"))).as[String].head()
    assert(got === "a b c")
  }

  test("shingles produce distinct word n-grams; short docs yield empty") {
    val got = Seq("a b c d a b c").toDF("s")
      .select(Cols.shingles(col("s"), 3)).as[Seq[String]].head()
    assert(got.toSet === Set("a b c", "b c d", "c d a", "d a b"))
    val short = Seq("a b").toDF("s").select(Cols.shingles(col("s"), 3)).as[Seq[String]].head()
    assert(short.isEmpty)
  }

  test("sorted intersect count: merge walk equals size(array_intersect)") {
    val cases = Seq(
      (Seq("a", "b", "c"), Seq("b", "c", "d")), // overlap 2
      (Seq.empty[String], Seq("x")), // empty left
      (Seq("a"), Seq.empty[String]), // empty right
      (Seq("a", "b"), Seq("c", "d")), // disjoint
      (Seq("a", "b", "c"), Seq("a", "b", "c")), // identical
      (Seq("aa", "ab", "b"), Seq("ab", "ba"))) // shared prefixes
    val df = cases.toDF("a", "b")
    val got = df.select(
      Cols.sortedIntersectCount(col("a"), col("b")).as("walk"),
      size(array_intersect(col("a"), col("b"))).cast("long").as("ref"))
      .as[(Long, Long)].collect()
    got.foreach { case (walk, ref) => assert(walk === ref) }
    // seeded random sorted-distinct arrays — same equality must hold
    val rnd = new scala.util.Random(7)
    val vocab = ('a' to 'z').map(_.toString)
    val rand = (1 to 50).map { _ =>
      def arr() = rnd.shuffle(vocab).take(3 + rnd.nextInt(10)).sorted
      (arr(), arr())
    }
    rand.toDF("a", "b")
      .select(
        Cols.sortedIntersectCount(col("a"), col("b")).as("walk"),
        size(array_intersect(col("a"), col("b"))).cast("long").as("ref"))
      .as[(Long, Long)].collect()
      .foreach { case (walk, ref) => assert(walk === ref) }
  }
}
