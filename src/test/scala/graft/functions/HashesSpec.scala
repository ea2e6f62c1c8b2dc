package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.testkit.{PropertyChecks, SparkTestSession}

/** The three polyHash forms (JVM loop, Column HOF fold, DuckDB SQL string)
  * must agree bit-for-bit — the oracle gate depends on it. This pins
  * JVM == Column on ASCII strings; Column == DuckDB is exercised by the
  * driver's correctness gate itself.
  */
class HashesSpec extends AnyFunSuite with PropertyChecks {
  private lazy val spark = SparkTestSession.spark

  test("polyHashJvm equals the Column fold on ASCII strings") {
    import spark.implicits._
    val rnd = new scala.util.Random(99)
    val strings = (1 to 500).map(_ =>
      (1 to (1 + rnd.nextInt(30))).map(_ => (32 + rnd.nextInt(95)).toChar).mkString)
    val df = strings.toDF("s")
      .withColumn("col_hash", Hashes.polyHash(col("s")))
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
    df.foreach { case (s, colHash) =>
      assert(Hashes.polyHashJvm(s) === colHash, s"mismatch for '$s'")
    }
  }

  test("graft_eqcount matches the zip_with form, with fold null semantics") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val rows = (1 to 100).map { _ =>
      val a = Array.fill(16)(rnd.nextInt(4).toLong)
      val b = Array.fill(16)(rnd.nextInt(4).toLong)
      (a, b)
    }
    val df = rows.toDF("a", "b")
      .withColumn("native", call_function("graft_eqcount", col("a"), col("b")))
      .withColumn("folded", size(filter(
        zip_with(col("a"), col("b"), (x, y) => when(x === y, 1).otherwise(0)),
        v => v === 1)).cast("long"))
    assert(df.where(col("native") =!= col("folded")).count() === 0)
    val edge = spark.sql(
      "SELECT graft_eqcount(array(1L, 2L), array(1L, 2L, 3L)) AS mism, " +
        "graft_eqcount(array(1L, CAST(NULL AS BIGINT)), array(1L, 2L)) AS nullel")
      .collect().head
    assert(edge.isNullAt(0), "length mismatch must be null")
    assert(edge.getLong(1) === 1L, "null element counts as not-equal, not null")
  }

  test("affine params stay in range for 64-bit safety") {
    Hashes.lcgParams(256, seed = 5L).foreach { case (a, b) =>
      assert(a >= 1 && a < Hashes.Prime)
      assert(b >= 0 && b < Hashes.Prime)
    }
  }
}
