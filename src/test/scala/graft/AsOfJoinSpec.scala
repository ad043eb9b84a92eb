package graft

import graft.ops.AsOfJoin

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  test("as-of left join: latest prior right row per key, inclusive ties, null when none") {
    val left = Seq(
      (1L, 100L, "p1"), (1L, 200L, "p2"), (2L, 50L, "p3"))
      .toDF("k", "ts", "lv")
    val right = Seq(
      (1L, 100L, "x"), (1L, 150L, "y"), (3L, 1L, "z"))
      .toDF("k", "ts", "rv")
    val got = AsOfJoin.asOfLeft(left, right, key = "k", tsCol = "ts", payload = Seq("rv"))
      .as[(Long, Long, String, String)].collect().toSet
    assert(got === Set(
      (1L, 100L, "p1", "x"), // inclusive: right at exactly left.ts matches
      (1L, 200L, "p2", "y"), // latest prior wins
      (2L, 50L, "p3", null))) // no right row for key 2
  }
}
