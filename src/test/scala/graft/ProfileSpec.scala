package graft

import graft.ops.Profile

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  test("per-column nulls and exact distincts, one row per column") {
    val df = Seq(
      (Some(1L), Some("a")), (Some(1L), None), (Some(2L), Some("b")),
      (None, Some("b")))
      .toDF("id", "tag")
    val got = Profile.profile(df, Seq("id", "tag"))
      .as[(String, Long, Long, Long)].collect().sortBy(_._1).toList
    assert(got === List(
      ("id", 4L, 1L, 2L), // one null, distincts {1, 2}
      ("tag", 4L, 1L, 2L))) // one null, distincts {a, b}
  }

  test("one pass: a single Spark job profiles every column") {
    val df = (1 to 1000).map(i => (i.toLong, i % 7, s"s${i % 13}"))
      .toDF("a", "b", "c")
    val tracker = spark.sparkContext.statusTracker
    val before = tracker.getJobIdsForGroup(null).length
    Profile.profile(df, Seq("a", "b", "c")).collect()
    val jobs = tracker.getJobIdsForGroup(null).length - before
    // one aggregate plan → a couple of AQE stage jobs at most, never
    // one-job-per-column (the driver-loop profiler anti-pattern)
    assert(jobs <= 3, s"expected a single-pass profile, got $jobs jobs")
  }
}
