package graft

import graft.ops.RangeJoin
import org.apache.spark.sql.functions._

/** Bucketed interval join: results must equal the naive range join; the
  * point is the plan shape (equi-join on the bucket key, never a
  * nested-loop/cartesian), which the plan assertions pin.
  */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def points(ts: Long*) =
    ts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("pid", "t")

  private def intervals(rows: (Long, Long, Long)*) =
    rows.toDF("iid", "start_ms", "end_ms")

  test("matches the naive range join, boundaries half-open") {
    val p = points(0L, 99L, 100L, 150L, 199L, 200L, 1000L)
    val i = intervals((1L, 100L, 200L), (2L, 0L, 100L), (3L, 500L, 600L))
    val got = RangeJoin
      .pointsInIntervals(p, i, "t", "start_ms", "end_ms", bucketMs = 100L)
      .select($"iid", $"pid").as[(Long, Long)].collect().toSet
    // interval 1 = [100,200): pids at 100,150,199; interval 2 = [0,100): 0,99
    assert(got === Set((1L, 2L), (1L, 3L), (1L, 4L), (2L, 0L), (2L, 1L)))
  }

  test("interval spanning many buckets finds every contained point") {
    val p = points(50L, 250L, 950L, 1050L)
    val i = intervals((1L, 40L, 1000L)) // spans buckets 0..9 at bucketMs=100
    val got = RangeJoin
      .pointsInIntervals(p, i, "t", "start_ms", "end_ms", bucketMs = 100L)
      .select($"pid").as[Long].collect().toSet
    assert(got === Set(0L, 1L, 2L))
  }

  test("zero/negative-length intervals match nothing") {
    val p = points(100L)
    val i = intervals((1L, 100L, 100L), (2L, 200L, 100L))
    val got = RangeJoin
      .pointsInIntervals(p, i, "t", "start_ms", "end_ms", bucketMs = 100L)
    assert(got.count() === 0L)
  }

  test("plan: equi-join on the bucket, no nested loop / cartesian") {
    // the scale guarantee behind ev_range_join_bucketed: a pure range
    // predicate would plan BroadcastNestedLoopJoin; bucketing must turn it
    // into a hash/sort-merge equi-join on __bucket
    val p = points((0L until 100L).map(_ * 10): _*)
    val i = intervals((0L until 20L).map(k => (k, k * 50L, k * 50L + 100L)): _*)
    val plan = RangeJoin
      .pointsInIntervals(p, i, "t", "start_ms", "end_ms", bucketMs = 100L)
      .queryExecution.executedPlan.toString()
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"nested loop in plan:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"cartesian in plan:\n$plan")
    assert(
      plan.linesIterator.exists(l =>
        (l.contains("HashJoin") || l.contains("SortMergeJoin")) && l.contains("__bucket")),
      s"bucket equi-join missing:\n$plan")
  }
}
