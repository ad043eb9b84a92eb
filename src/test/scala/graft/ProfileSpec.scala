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

  test("statsDrift: null-rate jump and distinct collapse report in signed e4") {
    import org.apache.spark.sql.functions.col
    // days 1..4, in-plan cut = (1+4)//2 = 2 → half A = days 1-2 (3 rows),
    // half B = days 3-4 (3 rows). In B, c1 goes 2/3 null and both
    // columns collapse to one distinct value — the two failure shapes
    // the screen exists to catch.
    val df = Seq(
      (1L, Option("a"), "x"), (1L, Option("b"), "y"), (2L, Option("c"), "z"),
      (3L, Option.empty[String], "x"), (3L, Option("a"), "x"),
      (4L, Option.empty[String], "x"))
      .toDF("day", "c1", "c2")
    val got = Profile.statsDrift(df, Seq("c1", "c2"), col("day"))
      .as[(String, Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().sortBy(_._1).toList
    assert(got === List(
      // null rate 0 → 6666 e4; distinct 3 → 1 = floor(-20000/3) = -6667
      ("c1", 3L, 3L, 0L, 2L, 3L, 1L, 6666L, -6667L),
      ("c2", 3L, 3L, 0L, 0L, 3L, 1L, 0L, -6667L)))
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

  test("histogram: global equi-width bins, max value closes into last bin") {
    val df = Seq(
      ("g1", 0.0), ("g1", 4.9), ("g1", 5.0), ("g2", 10.0), ("g2", 9.99))
      .toDF("grp", "v")
    val got = Profile.histogram(df, "grp", "v", bins = 10)
      .as[(String, Long, Long)].collect().sortBy(r => (r._1, r._2)).toList
    // range [0,10]: 0→bin0, 4.9→bin4, 5.0→bin5, 9.99→bin9, 10.0→bin9 (closed top)
    assert(got === List(
      ("g1", 0L, 1L), ("g1", 4L, 1L), ("g1", 5L, 1L), ("g2", 9L, 2L)))
  }

  test("benford: string leading digit of cents, fixed e4 expectations") {
    val df = Seq(1.23, 19.99, 0.92, 3.5, -4.0, 0.0).toDF("v") // -4 and 0 excluded
    val got = Profile.benford(df, "v")
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1).toList
    assert(got === List(
      // 1.23→"123", 19.99→"1999": digit 1 ×2 of 4 → 5000; |5000−3010| = 1990
      (1L, 2L, 5000L, 3010L, 1990L),
      // 3.5→"350"
      (3L, 1L, 2500L, 1249L, 1251L),
      // 0.92→"92"
      (9L, 1L, 2500L, 458L, 2042L)))
  }

  test("fk integrity: planted orphans counted, clean relationships report zero") {
    val child = Seq((1L, 10L), (2L, 20L), (3L, 99L)).toDF("id", "fk") // 99 is orphaned
    val parent = Seq((10L, "a"), (20L, "b")).toDF("pk", "name")
    val got = Profile.fkIntegrity(Seq(
      ("child->parent", child, "fk", parent, "pk"),
      ("parent->parent", parent, "pk", parent, "pk")))
      .as[(String, Long, Long)].collect().sortBy(_._1).toList
    assert(got === List(
      ("child->parent", 3L, 1L),
      ("parent->parent", 2L, 0L)))
  }

  test("histogram: degenerate range (constant column) lands in bin 0, no NaN") {
    val df = Seq(("g", 7.0), ("g", 7.0), ("h", 7.0)).toDF("grp", "v")
    val got = Profile.histogram(df, "grp", "v", bins = 10)
      .as[(String, Long, Long)].collect().sortBy(_._1).toList
    assert(got === List(("g", 0L, 2L), ("h", 0L, 1L)))
  }

  test("histogram: bounds are in-plan, no driver job at construction") {
    val df = Seq(("g", 1.0)).toDF("grp", "v")
    val tracker = spark.sparkContext.statusTracker
    val before = tracker.getJobIdsForGroup(null).length
    val h = Profile.histogram(df, "grp", "v")
    val after = tracker.getJobIdsForGroup(null).length
    assert(h.columns.toSeq === Seq("grp", "bin", "n_events"))
    assert(after === before, "plan construction ran Spark jobs")
  }

  test("equi-depth deciles: uniform data lands 10 rows per bucket") {
    val df = (1 to 100).map(_.toDouble).toDF("value")
    val got = Profile.equiDepthHistogram(df, "value")
      .as[(Long, Long, Double, Double)].collect().sortBy(_._1).toList
    assert(got.map(_._1) === (1L to 10L).toList)
    assert(got.forall(_._2 == 10L), s"expected 10 rows per bucket: $got")
    assert(got.head === (1L, 10L, 1.0, 10.0))
    assert(got.last === (10L, 10L, 91.0, 100.0))
  }

  test("equi-depth deciles: skewed data still splits evenly (vs equi-width)") {
    // 99 values at ~0 and one at 1e9 — equi-width puts 99 in bin 0;
    // equi-depth still cuts by count
    val df = ((1 to 99).map(_ * 0.001) :+ 1e9).toDF("value")
    val got = Profile.equiDepthHistogram(df, "value")
      .as[(Long, Long, Double, Double)].collect().sortBy(_._1).toList
    assert(got.map(_._2).sum === 100L)
    assert(got.size === 10, s"all ten buckets populated: $got")
  }

  test("MAD outliers: median/MAD robust to the outlier it flags") {
    // group g: 1,2,3,4,5 plus a wild 100 → median 3.5, MAD 1.5; only
    // the 100 is beyond 3×MAD (|100−3.5| = 96.5 > 4.5). A mean/σ test
    // over the same data would have σ≈36 and flag nothing.
    val df = (Seq(1.0, 2.0, 3.0, 4.0, 5.0, 100.0).map(("g", _)))
      .toDF("grp", "value")
    val got = Profile.madOutliers(df, "grp", "value")
      .as[(String, Long, Double, Double, Long)].collect().toList
    assert(got === List(("g", 6L, 3.5, 1.5, 1L)))
  }

  test("MAD outliers: constant group has MAD 0 and flags any deviation") {
    val df = (Seq.fill(5)(7.0) :+ 7.1).map(("c", _)).toDF("grp", "value")
    val got = Profile.madOutliers(df, "grp", "value")
      .as[(String, Long, Double, Double, Long)].collect().toList
    // median 7, MAD 0 → the single 7.1 is an outlier (0.1 > 3×0)
    assert(got === List(("c", 6L, 7.0, 0.0, 1L)))
  }

  test("chi2: independent contingency table scores zero") {
    // perfectly proportional 2×2: O = E in every cell → chi2 = 0
    val rows = Seq.fill(20)(("a", "x")) ++ Seq.fill(10)(("a", "y")) ++
      Seq.fill(40)(("b", "x")) ++ Seq.fill(20)(("b", "y"))
    val got = Profile.chi2Independence(rows.toDF("u", "v"), "u", "v")
      .as[(Long, Long, Long)].collect().toList
    assert(got === List((0L, 1L, 90L)))
  }

  test("chi2: a fully dependent table scores n (phi = 1)") {
    // diagonal 2×2: a↔x, b↔y only → chi2 = N exactly (50·1e4 in e4)
    val rows = Seq.fill(25)(("a", "x")) ++ Seq.fill(25)(("b", "y"))
    val got = Profile.chi2Independence(rows.toDF("u", "v"), "u", "v")
      .as[(Long, Long, Long)].collect().toList
    assert(got === List((500000L, 1L, 50L)))
  }

  test("join cardinality: exact fan-out and hottest-key share from key histograms") {
    val left = Seq("a", "a", "a", "b", "c").map((_, 1)).toDF("k", "v")
    val right = Seq("a", "a", "b", "b", "b", "d").map((_, 1)).toDF("k", "v")
    val got = Profile.joinCardinality(left, "k", right, "k")
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)].collect().toList
    // matched: a → 3·2 = 6, b → 1·3 = 3; total 9; top share 60000/9 = 6666
    assert(got === List((5L, 3L, 6L, 3L, 2L, 9L, 6L, 6666L)))
    // and the real join agrees with the prediction
    assert(left.join(right, Seq("k")).count() === 9L)
  }

  test("join cardinality: disjoint keys predict an empty join, no div-by-zero") {
    val left = Seq(("a", 1)).toDF("k", "v")
    val right = Seq(("b", 1)).toDF("k", "v")
    val got = Profile.joinCardinality(left, "k", right, "k")
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)].collect().toList
    assert(got === List((1L, 1L, 1L, 1L, 0L, 0L, 0L, 0L)))
  }

  test("snapshot diff: added/removed/changed/unchanged counts by key") {
    val oldSnap = Seq((1L, "A", 100L), (2L, "A", 100L), (3L, "B", 300L))
      .toDF("k", "status", "cents")
    val newSnap = Seq((2L, "A", 150L), (3L, "B", 300L), (4L, "C", 400L))
      .toDF("k", "status", "cents")
    val got = Profile.snapshotDiff(oldSnap, newSnap, "k", Seq("status", "cents"))
      .as[(String, Long)].collect().sortBy(_._1).toList
    assert(got === List(
      ("added", 1L), ("changed", 1L), ("removed", 1L), ("unchanged", 1L)))
  }

  test("snapshot diff: separator prevents cross-column value bleed") {
    // ("ab","c") vs ("a","bc") must NOT collide as unchanged
    val oldSnap = Seq((1L, "ab", "c")).toDF("k", "x", "y")
    val newSnap = Seq((1L, "a", "bc")).toDF("k", "x", "y")
    val got = Profile.snapshotDiff(oldSnap, newSnap, "k", Seq("x", "y"))
      .as[(String, Long)].collect().toList
    assert(got === List(("changed", 1L)))
  }

  test("pk audit: dup and null keys surface per table") {
    val clean = Seq(1L, 2L, 3L).map(k => (k, "v")).toDF("k", "v")
    val dirty = Seq(Some(1L), Some(1L), Some(2L), None)
      .map(k => (k, "v")).toDF("k", "v")
    val got = Profile.pkAudit(Seq(("clean", clean, "k"), ("dirty", dirty, "k")))
      .as[(String, Long, Long, Long, Long)].collect().sortBy(_._1).toList
    // dirty: 4 rows, 2 distinct non-null keys, 1 null, 1 repeating key
    assert(got === List(
      ("clean", 3L, 3L, 0L, 0L),
      ("dirty", 4L, 2L, 1L, 1L)))
  }
}
