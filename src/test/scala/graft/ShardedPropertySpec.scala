package graft

import graft.ops.Sharded
import org.apache.spark.sql.functions.col
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based equivalence for the range-sharded global rank/prefix
  * helper: on random (duplicate-heavy) inputs, `__i` must be exactly the
  * single-partition `row_number()` rank and `__cum_before` exactly the
  * strict prefix sum — for any shard count, including more shards than
  * rows. Seeded generators keep runs deterministic. The helper backs
  * gini, ABC classing, key-skew p99, and the exact-percentile query, so
  * a boundary off-by-one here would silently corrupt four oracles.
  */
class ShardedPropertySpec extends SparkSpec {
  import spark.implicits._

  private def sample[A](gen: Gen[A], seed: Long): A =
    gen.apply(Gen.Parameters.default, Seed(seed)).get

  test("rankAndPrefix ≡ single-partition rank and prefix sum on random inputs") {
    val gen = for {
      n <- Gen.choose(0, 400)
      // small value domain on purpose: heavy ties across shard boundaries
      vals <- Gen.listOfN(n, Gen.choose(-20L, 20L))
      shards <- Gen.oneOf(1, 3, 7, 32, 500)
    } yield (vals, shards)
    (1 to 10).foreach { i =>
      val (vals, shards) = sample(gen, i.toLong)
      val df = vals.zipWithIndex
        .map { case (v, id) => (id.toLong, v) }.toDF("id", "v")
      val got = Sharded
        .rankAndPrefix(df, Seq(col("v"), col("id")), col("v"), shards)
        .select(col("id"), col("v"), col("__i"), col("__cum_before"))
        .as[(Long, Long, Long, Long)].collect().sortBy(_._3).toList
      // brute reference: sort by (v, id) in plain Scala
      val sorted = vals.zipWithIndex.map { case (v, id) => (id.toLong, v) }
        .sortBy { case (id, v) => (v, id) }
      val prefix = sorted.scanLeft(0L)(_ + _._2).init
      val expect = sorted.zip(prefix).zipWithIndex.map {
        case (((id, v), cum), idx) => (id, v, idx + 1L, cum)
      }
      assert(got === expect, s"seed $i (n=${vals.size}, shards=$shards)")
    }
  }

  test("rankAndPrefix: descending sort order shards correctly too") {
    val df = (1 to 100).map(i => (i.toLong, (i % 9).toLong)).toDF("id", "v")
    val got = Sharded
      .rankAndPrefix(df, Seq(col("v").desc, col("id")), col("v"), 8)
      .select(col("id"), col("v"), col("__i"), col("__cum_before"))
      .as[(Long, Long, Long, Long)].collect().sortBy(_._3).toList
    val sorted = (1 to 100).map(i => (i.toLong, (i % 9).toLong))
      .sortBy { case (id, v) => (-v, id) }
    val prefix = sorted.scanLeft(0L)(_ + _._2).init
    val expect = sorted.zip(prefix).zipWithIndex.map {
      case (((id, v), cum), idx) => (id, v, idx + 1L, cum)
    }.toList
    assert(got === expect)
  }
}
