package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.testkit.SparkTestSession

/** Named tables and namespaces — the Delta/Iceberg DEFAULT mode over
  * the same path machinery: with `spark.sql.catalog.graft.warehouse`
  * set, `graft.db.t` IS `<warehouse>/db/t`, namespaces are
  * directories, SHOW TABLES lists manifest-bearing subdirectories, and
  * the full DML/time-travel lifecycle runs against the named
  * identifier unchanged. The path spelling stays first-class.
  */
class GraftNamespaceSpec extends AnyFunSuite {
  private lazy val warehouseDir =
    Files.createTempDirectory("graft-ns-wh").toString
  private lazy val spark = {
    val s = SparkTestSession.isolated()
    s.conf.set("spark.sql.catalog.graft.warehouse", warehouseDir)
    s
  }
  import spark.implicits._

  private def ids(df: DataFrame): Seq[Long] =
    df.select("id").as[Long].collect().sorted.toSeq

  test("named-table lifecycle: CREATE NAMESPACE/TABLE, INSERT, DELETE, " +
      "UPDATE, MERGE, time travel, SHOW TABLES, metadata suffix — all " +
      "through graft.db.t") {
    spark.sql("CREATE NAMESPACE graft.ns1")
    spark.sql("CREATE TABLE graft.ns1.t " +
      "(id BIGINT, kind STRING, amount BIGINT) PARTITIONED BY (kind)")
    // the named identifier IS the warehouse path
    assert(VersionedTable.versions(spark, s"$warehouseDir/ns1/t")
      === Seq(0))
    spark.sql("INSERT INTO graft.ns1.t VALUES " +
      "(1, 'a', 10), (2, 'a', 20), (3, 'b', 30), (4, 'b', 40)")
    assert(ids(spark.sql("SELECT * FROM graft.ns1.t")) === (1L to 4L))
    spark.sql("DELETE FROM graft.ns1.t WHERE id = 2")
    assert(ids(spark.sql("SELECT * FROM graft.ns1.t")) === Seq(1L, 3L, 4L))
    spark.sql("UPDATE graft.ns1.t SET amount = 0 WHERE kind = 'b'")
    assert(spark.sql("SELECT sum(amount) FROM graft.ns1.t")
      .collect().head.getLong(0) === 10L)
    Seq((3L, "b", 300L), (5L, "a", 50L)).toDF("id", "kind", "amount")
      .createOrReplaceTempView("ns_src")
    spark.sql("MERGE INTO graft.ns1.t t USING ns_src s ON t.id = s.id " +
      "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *")
    assert(ids(spark.sql("SELECT * FROM graft.ns1.t"))
      === Seq(1L, 3L, 4L, 5L))
    // time travel through the named identifier
    assert(ids(spark.sql("SELECT * FROM graft.ns1.t VERSION AS OF 1"))
      === (1L to 4L))
    // SHOW TABLES sees exactly the manifest-bearing directory
    val shown = spark.sql("SHOW TABLES IN graft.ns1")
      .select("tableName").as[String].collect().toSeq
    assert(shown === Seq("t"))
    // metadata suffix on the named identifier
    val hist = spark.sql("SELECT version FROM graft.ns1.t.history")
      .as[Int].collect().sorted.toSeq
    assert(hist === (0 to 4))
    // the path spelling reads the SAME table
    assert(ids(spark.sql(s"SELECT * FROM graft.`$warehouseDir/ns1/t`"))
      === Seq(1L, 3L, 4L, 5L))
    // USE pins the current namespace: unqualified names resolve in it
    spark.sql("USE graft.ns1")
    try assert(ids(spark.sql("SELECT * FROM t")) === Seq(1L, 3L, 4L, 5L))
    finally spark.sql("USE spark_catalog.default")
  }

  test("maintenance statements take the named spelling: DESCRIBE " +
      "HISTORY, OPTIMIZE, VACUUM DRY RUN, RESTORE on graft.db.t") {
    spark.sql("CREATE NAMESPACE graft.nsm")
    spark.sql("CREATE TABLE graft.nsm.t (id BIGINT, kind STRING) " +
      "PARTITIONED BY (kind)")
    spark.sql("INSERT INTO graft.nsm.t VALUES (1, 'a'), (2, 'b')")
    spark.sql("DELETE FROM graft.nsm.t WHERE id = 1")
    val hist = spark.sql("DESCRIBE HISTORY graft.nsm.t")
      .select("version").as[Int].collect().sorted.toSeq
    assert(hist === Seq(0, 1, 2))
    val opt = spark.sql("OPTIMIZE graft.nsm.t").collect().head
    assert(opt.getString(1) === "binpack")
    val dry = spark.sql("VACUUM graft.nsm.t DRY RUN").collect().head
    assert(dry.getString(0) === s"$warehouseDir/nsm/t")
    val restored = spark.sql(
      "RESTORE TABLE graft.nsm.t TO VERSION AS OF 1").collect().head
    assert(ids(spark.sql("SELECT * FROM graft.nsm.t")) === Seq(1L, 2L))
    assert(restored.getAs[Int]("restored_from") === 1)
  }

  test("atomic CTAS and SHALLOW CLONE work against named identifiers") {
    spark.sql("CREATE NAMESPACE graft.nsc")
    spark.sql("CREATE TABLE graft.nsc.src (id BIGINT, kind STRING) " +
      "PARTITIONED BY (kind)")
    spark.sql("INSERT INTO graft.nsc.src VALUES (1, 'a'), (2, 'b')")
    spark.sql("CREATE TABLE graft.nsc.dst PARTITIONED BY (kind) " +
      "AS SELECT * FROM graft.nsc.src")
    assert(ids(spark.sql("SELECT * FROM graft.nsc.dst")) === Seq(1L, 2L))
    // atomic: the one observable version carries the data
    assert(VersionedTable.versions(spark, s"$warehouseDir/nsc/dst")
      === Seq(0))
    spark.sql("CREATE TABLE graft.nsc.branch SHALLOW CLONE graft.nsc.src")
    assert(ids(spark.sql("SELECT * FROM graft.nsc.branch"))
      === Seq(1L, 2L))
  }

  test("namespace listing, non-empty DROP NAMESPACE refusal, and " +
      "escape-proof identifier parts") {
    spark.sql("CREATE NAMESPACE graft.ns2")
    val namespaces = spark.sql("SHOW NAMESPACES IN graft")
      .select("namespace").as[String].collect().toSeq
    assert(namespaces.contains("ns2"), namespaces.toString)
    // empty namespace drops fine
    spark.sql("DROP NAMESPACE graft.ns2")
    assert(!spark.sql("SHOW NAMESPACES IN graft")
      .select("namespace").as[String].collect().contains("ns2"))
    // a namespace holding a table refuses the drop
    spark.sql("CREATE NAMESPACE graft.ns3")
    spark.sql("CREATE TABLE graft.ns3.t (id BIGINT, k STRING) " +
      "PARTITIONED BY (k)")
    val e = intercept[Exception] {
      spark.sql("DROP NAMESPACE graft.ns3 CASCADE")
    }
    assert(e.getMessage.contains("non-empty") ||
      e.getMessage.contains("not empty"), e.getMessage)
    // traversal parts refuse rather than escaping the warehouse
    val esc = intercept[Exception] {
      spark.sql("SELECT * FROM graft.ns3.`..`.t")
    }
    assert(esc.getMessage.nonEmpty)
  }

  test("with a warehouse root configured, metadata suffixes on " +
      "PATH-spelled tables still resolve (the path prefix must fall " +
      "through named resolution, not abort it)") {
    val dir = Files.createTempDirectory("graft-ns-pathmeta").toString
    VersionedTable.create(
      Seq((1L, "a"), (2L, "b")).toDF("id", "k"), dir, "k")
    spark.sql(s"DELETE FROM graft.`$dir` WHERE id = 1")
    // the path part '/tmp/…' is not a plain warehouse name — loadTable's
    // named-table probe throws on it and must fall through to the
    // metadata-suffix branch instead of propagating
    val hist = spark.sql(s"SELECT version FROM graft.`$dir`.history")
      .as[Int].collect().sorted.toSeq
    assert(hist === Seq(0, 1))
    val detail = spark.sql(s"SELECT * FROM graft.`$dir`.detail")
    assert(detail.count() > 0)
  }

  test("without a warehouse root, namespaced identifiers stay refused " +
      "and the path spelling is untouched") {
    val s2 = SparkTestSession.isolated()
    import s2.implicits._
    val dir = Files.createTempDirectory("graft-ns-path").toString
    VersionedTable.create(
      Seq((1L, "a")).toDF("id", "k"), dir, "k")
    assert(s2.sql(s"SELECT * FROM graft.`$dir`").count() === 1L)
    intercept[Exception] { s2.sql("SELECT * FROM graft.nodb.not") }
  }
}
