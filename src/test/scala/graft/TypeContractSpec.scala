package graft

import org.apache.spark.sql.types._

/** Cross-engine result-type contract — the Spark-side mirror of
  * scripts/check.py's oracle-type gate.
  *
  * The driver hashes each query's result through an arrow/pandas
  * materialization that renders int128/decimal (DuckDB HUGEINT,
  * DECIMAL(38,0)) differently from Spark's int64 even when every value is
  * identical — exactly the failure class behind all nine round-5 red rows.
  * The oracle side is gated in check.py (`rel.types` must be free of
  * HUGEINT/UHUGEINT/DECIMAL); this spec pins the engine side: every
  * registered query's schema must stay inside the hash-stable type set,
  * so nobody can reintroduce a DecimalType (or an int32 that DuckDB would
  * answer with an int64) without a test failure.
  */
class TypeContractSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  // the declared hash-stable set: 64-bit integers, IEEE doubles, UTF-8
  // strings, booleans, and arrays thereof. Notably ABSENT: DecimalType
  // (driver hash instability), IntegerType/ShortType/ByteType (DuckDB
  // answers BIGINT; a 32-bit Spark column would schema-mismatch),
  // FloatType (oracle doubles), TimestampType (queries emit epoch millis
  // as Long instead — integer-exact cross-engine).
  private def hashStable(dt: DataType): Boolean = dt match {
    case LongType | DoubleType | StringType | BooleanType => true
    case ArrayType(elem, _) => hashStable(elem)
    case _ => false
  }

  test("every registered query's result schema uses only hash-stable types") {
    val violations = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, q) =>
        q(spark, dir).schema.fields.collect {
          case f if !hashStable(f.dataType) => s"$name.${f.name}: ${f.dataType}"
        }
    }
    assert(violations.isEmpty,
      s"non-hash-stable result columns (driver hash would diverge):\n" +
        violations.mkString("\n"))
  }
}
