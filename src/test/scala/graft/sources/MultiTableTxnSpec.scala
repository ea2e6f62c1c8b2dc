package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.testkit.SparkTestSession

/** Multi-table transactions: all-or-nothing across participants, with
  * two-phase crash recovery (intent alone rolls back, intent + marker
  * rolls forward) exercised against the pinned on-disk log format.
  */
class MultiTableTxnSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def mkTables(tag: String): (String, String, String) = {
    val root = Files.createTempDirectory(s"graft-txn-$tag").toString
    val a = s"$root/a"
    val b = s"$root/b"
    VersionedTable.create(Seq((1L, "p1")).toDF("id", "p"), a, "p")
    VersionedTable.create(Seq((10L, "p1")).toDF("id", "p"), b, "p")
    (s"$root/_txn", a, b)
  }
  private def ids(dir: String): Seq[Long] =
    VersionedTable.readLatest(spark, dir).select("id").as[Long]
      .collect().sorted.toSeq

  test("success commits both tables and leaves no log") {
    val (txn, a, b) = mkTables("ok")
    MultiTableTxn.run(spark, txn, Seq(a, b)) {
      VersionedTable.append(Seq((2L, "p1")).toDF("id", "p"), a, "p")
      VersionedTable.append(Seq((20L, "p1")).toDF("id", "p"), b, "p")
    }
    assert(ids(a) === Seq(1L, 2L) && ids(b) === Seq(10L, 20L))
    assert(Files.list(Paths.get(txn)).count() === 0, "log must be clean")
    assert(MultiTableTxn.recover(spark, txn) === ((0, 0)))
  }

  test("a body exception rolls back every participant and rethrows") {
    val (txn, a, b) = mkTables("boom")
    val e = intercept[RuntimeException] {
      MultiTableTxn.run(spark, txn, Seq(a, b)) {
        VersionedTable.append(Seq((2L, "p1")).toDF("id", "p"), a, "p")
        throw new RuntimeException("mid-txn failure")
      }
    }
    assert(e.getMessage === "mid-txn failure")
    assert(ids(a) === Seq(1L), "table a must roll back")
    assert(ids(b) === Seq(10L), "table b untouched stays untouched")
    assert(Files.list(Paths.get(txn)).count() === 0)
    // and the history shows the rollback flip, not an erased commit
    assert(VersionedTable.versions(spark, a).size === 3) // v0, append, flip
  }

  test("crash after a partial body: recover rolls both back (intent alone)") {
    val (txn, a, b) = mkTables("partial")
    // simulate the coordinator dying mid-body: intent on disk, only
    // table a mutated (the pinned log format: "<version>\t<dir>")
    Files.createDirectories(Paths.get(txn))
    Files.write(Paths.get(s"$txn/crash1.intent"),
      s"0\t$a\n0\t$b".getBytes("UTF-8"))
    VersionedTable.append(Seq((2L, "p1")).toDF("id", "p"), a, "p")
    // under the default grace the fresh intent is presumed LIVE — a
    // coordinator mid-run looks exactly like this — so recover must
    // NOT roll it back...
    assert(MultiTableTxn.recover(spark, txn) === ((0, 0)))
    assert(ids(a) === Seq(1L, 2L), "live-looking txn left untouched")
    // ...and only an explicit no-transactions-in-flight call heals it
    assert(MultiTableTxn.recover(spark, txn, intentGraceMs = 0) === ((0, 1)))
    assert(ids(a) === Seq(1L) && ids(b) === Seq(10L))
    assert(Files.list(Paths.get(txn)).count() === 0)
    // idempotent
    assert(MultiTableTxn.recover(spark, txn, intentGraceMs = 0) === ((0, 0)))
  }

  test("crash after the marker: recover rolls forward (mutations stand)") {
    val (txn, a, b) = mkTables("done")
    Files.createDirectories(Paths.get(txn))
    VersionedTable.append(Seq((2L, "p1")).toDF("id", "p"), a, "p")
    VersionedTable.append(Seq((20L, "p1")).toDF("id", "p"), b, "p")
    Files.write(Paths.get(s"$txn/crash2.intent"),
      s"0\t$a\n0\t$b".getBytes("UTF-8"))
    Files.write(Paths.get(s"$txn/crash2.done"),
      s"0\t$a\n0\t$b".getBytes("UTF-8"))
    assert(MultiTableTxn.recover(spark, txn) === ((1, 0)))
    assert(ids(a) === Seq(1L, 2L) && ids(b) === Seq(10L, 20L),
      "a completed transaction must survive recovery")
    assert(Files.list(Paths.get(txn)).count() === 0)
  }

  test("atomic takedown shape: base delete + derived-store delete move together") {
    val (txn, base, derived) = mkTables("takedown")
    VersionedTable.append(Seq((7L, "p1")).toDF("id", "p"), base, "p")
    VersionedTable.append(Seq((70L, "p1")).toDF("id", "p"), derived, "p")
    // the derived leg fails -> the base delete must NOT stand alone
    intercept[RuntimeException] {
      MultiTableTxn.run(spark, txn, Seq(base, derived)) {
        VersionedTable.delete(spark, base, "p", $"id" === 7L)
        throw new RuntimeException("derived store unavailable")
      }
    }
    assert(ids(base) === Seq(1L, 7L), "half-applied takedown rolled back")
    // retried when the store is back: both legs land
    MultiTableTxn.run(spark, txn, Seq(base, derived)) {
      VersionedTable.delete(spark, base, "p", $"id" === 7L)
      VersionedTable.delete(spark, derived, "p", $"id" === 70L)
    }
    assert(ids(base) === Seq(1L) && ids(derived) === Seq(10L))
  }
}
