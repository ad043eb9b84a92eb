package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.scalatest.funsuite.AnyFunSuite

/** The declarative `spark.sql.extensions=graft.GraftExtensions` path must
  * install the same surface GraftSession.tune applies post-hoc: native SQL
  * functions resolving and the composed-hash rewrite firing — on a session
  * the library code never touched.
  *
  * The string conf is only read at SparkContext creation, which a shared
  * test JVM can't redo — so the spec instantiates the class REFLECTIVELY,
  * exactly as Spark's `applyExtensions` does (zero-arg constructor,
  * `SparkSessionExtensions => Unit`), and hands it to
  * `builder.withExtensions`, the same injection point.
  */
class GraftExtensionsSpec extends AnyFunSuite {

  private def withExtensionSession[A](f: SparkSession => A): A = {
    // reflective load: proves the class is usable from the config string
    val ext = Class.forName("graft.GraftExtensions")
      .getDeclaredConstructor().newInstance()
      .asInstanceOf[SparkSessionExtensions => Unit]
    val prev = SparkSpec.session
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[2]")
      .appName("graft-extensions-test")
      .withExtensions(ext)
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    try f(s)
    finally {
      SparkSession.setDefaultSession(prev)
      SparkSession.setActiveSession(prev)
    }
  }

  test("extensions class installs the native functions at session build") {
    withExtensionSession { s =>
      val viaSql = s.sql("SELECT graft_hash60('graft') AS h").collect()(0).getLong(0)
      // bit-identical to the composed built-in spelling
      val composed = s.sql(
        "SELECT cast(conv(substr(md5('graft'), 1, 15), 16, 10) AS bigint) AS h")
        .collect()(0).getLong(0)
      assert(viaSql === composed)
      val dot = s.sql("SELECT graft_long_dot(array(1L, 2L), array(3L, 4L)) AS d")
        .collect()(0).getLong(0)
      assert(dot === 11L)
      val ic = s.sql(
        "SELECT graft_sorted_intersect_count(array('a','b','c'), array('b','c','d')) AS c")
        .collect()(0).getLong(0)
      assert(ic === 2L)
    }
  }

  test("extensions class installs the composed-hash rewrite rule") {
    withExtensionSession { s =>
      val df = s.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .selectExpr("cast(conv(substr(md5(text), 1, 15), 16, 10) as bigint) as h")
      val optimized = df.queryExecution.optimizedPlan.toString()
      assert(optimized.contains("graft_hash60"), s"rewrite missed:\n$optimized")
    }
  }
}
