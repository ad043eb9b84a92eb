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

  test("forward as-of: earliest following right row, inclusive ties") {
    val left = Seq(
      (1L, 100L, "p1"), (1L, 200L, "p2"), (2L, 50L, "p3"))
      .toDF("k", "ts", "lv")
    val right = Seq(
      (1L, 100L, "x"), (1L, 150L, "y"), (2L, 10L, "z"))
      .toDF("k", "ts", "rv")
    val got = AsOfJoin
      .asOfLeft(left, right, key = "k", tsCol = "ts", payload = Seq("rv"), forward = true)
      .as[(Long, Long, String, String)].collect().toSet
    assert(got === Set(
      (1L, 100L, "p1", "x"), // inclusive: right at exactly left.ts matches
      (1L, 200L, "p2", null), // nothing after 200
      (2L, 50L, "p3", null))) // right at 10 is BEFORE — not visible forward
  }

  test("NULL payload value on the latest right row is carried as NULL") {
    // the most recent status has a null note: the result must show the
    // null, NOT fall back to the older row's non-null note (ADVICE r2)
    val left = Seq((1L, 300L, "p")).toDF("k", "ts", "lv")
    val right = Seq(
      (1L, 100L, Some("old-note"), "a"),
      (1L, 200L, None: Option[String], "b"))
      .toDF("k", "ts", "note", "tag")
    val got = AsOfJoin.asOfLeft(left, right, "k", "ts", Seq("note", "tag"))
      .as[(Long, Long, String, Option[String], String)].collect().toList
    assert(got === List((1L, 300L, "p", None, "b")))
  }

  test("payload columns are row-atomic (never mixed across right rows)") {
    val left = Seq((1L, 500L, "p")).toDF("k", "ts", "lv")
    // two right rows; the carried (status, status_ts) pair must come from
    // ONE row — a per-column carry could mix ("new", 100) if the newer
    // row had a null status
    val right = Seq(
      (1L, 100L, Some("old"), 100L),
      (1L, 400L, None: Option[String], 400L))
      .toDF("k", "ts", "status", "src_ts")
    val got = AsOfJoin.asOfLeft(left, right, "k", "ts", Seq("status", "src_ts"))
      .as[(Long, Long, String, Option[String], Long)].collect().toList
    assert(got === List((1L, 500L, "p", None, 400L)))
  }
}
