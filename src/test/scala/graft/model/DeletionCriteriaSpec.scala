package graft.model

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

/** Clause building + validation parity (reference:
  * config/DeletionCriteria.java; SURVEY.md §2.2 P1–P4). Pure — checks the
  * SQL-text surface; predicate-Column semantics are covered by the
  * integration suite.
  */
class DeletionCriteriaSpec extends AnyFunSuite {

  private val t9 = Timestamp.valueOf("2026-02-13 09:00:00")
  private val t18 = Timestamp.valueOf("2026-02-13 18:00:00")

  test("P1: complete clause is timeCol >= start AND timeCol < end AND (userWhere)") {
    val c = DeletionCriteria(Some("id = 5"), Some(t9), Some(t18))
    assert(c.completeWhereClauseSql.contains(
      "row_create_ts >= '2026-02-13 09:00:00.0' AND row_create_ts < '2026-02-13 18:00:00.0' AND (id = 5)"))
  }

  test("P1: partial criteria compose correctly") {
    assert(DeletionCriteria(whereClause = Some("id = 5")).completeWhereClauseSql.contains("(id = 5)"))
    assert(DeletionCriteria(startTime = Some(t9)).completeWhereClauseSql.contains(
      "row_create_ts >= '2026-02-13 09:00:00.0'"))
    assert(DeletionCriteria(endTime = Some(t18), timeColumn = "ts").completeWhereClauseSql.contains(
      "ts < '2026-02-13 18:00:00.0'"))
  }

  test("P2: retention clause is null-safe negation; None when empty") {
    val c = DeletionCriteria(Some("id = 5"))
    assert(c.retentionWhereClauseSql.contains("NOT coalesce(((id = 5)), false)"))
    assert(DeletionCriteria().retentionWhereClauseSql.isEmpty)
    assert(DeletionCriteria().deletePredicate.isEmpty)
  }

  test("P3: validation requires ≥1 condition, start <= end, non-blank time column") {
    assertThrows[IllegalArgumentException](DeletionCriteria().validate())
    assertThrows[IllegalArgumentException](
      DeletionCriteria(startTime = Some(t18), endTime = Some(t9)).validate())
    assertThrows[IllegalArgumentException](
      DeletionCriteria(Some("id = 5"), timeColumn = "  ").validate())
    DeletionCriteria(Some("id = 5"), Some(t9), Some(t18)).validate() // ok
    DeletionCriteria(startTime = Some(t9), endTime = Some(t9)).validate() // equal bounds ok
  }

  test("P4: injection blocklist rejects statements hidden in WHERE text") {
    val bad = Seq("id = 5; drop table x", "id = 5 -- comment", "1=1 /* x */",
      "exec sp_x", "id in (select 1); truncate t", "drop table t", "insert into x")
    bad.foreach { w =>
      assert(DeletionCriteria.containsSuspiciousPatterns(w), s"should flag: $w")
      assertThrows[IllegalArgumentException](DeletionCriteria(Some(w), Some(t9)).validate())
    }
    assert(!DeletionCriteria.containsSuspiciousPatterns("status = 'INACTIVE' AND id > 3"))
  }

  test("builder parity surface") {
    val c = DeletionCriteria.builder()
      .whereClause("status = 'INACTIVE'")
      .startTime("2026-02-13 09:00:00")
      .endTime("2026-02-13 18:00:00")
      .timeColumn("created")
      .build()
    assert(c.timeColumn == "created")
    assert(c.startTime.contains(t9) && c.endTime.contains(t18))
  }

  test("JobConfig validation + properties overlay") {
    val crit = DeletionCriteria(Some("id = 5"))
    val cfg = JobConfig("db", "t", crit)
    cfg.validate()
    assert(cfg.fullTableName == "db.t")
    assertThrows[IllegalArgumentException](JobConfig("", "t", crit).validate())
    assertThrows[IllegalArgumentException](
      JobConfig("db", "t", crit, partitionParallelism = 0).validate())

    val props = new java.util.Properties()
    props.setProperty("backup.strategy", "path")
    props.setProperty("partition.parallelism", "20")
    props.setProperty("dry.run.enabled", "true")
    val over = cfg.withProperties(props)
    assert(over.backupStrategy == "path" && over.partitionParallelism == 20 && over.dryRun)
  }

  test("builder time strings parse as UTC instants, independent of JVM zone") {
    // '2026-02-13 00:00:00' must mean midnight UTC — the session timezone
    // and the partition-date convention — not midnight in the driver's
    // default zone (Timestamp.valueOf semantics, which would shift the
    // date prune against the instant predicate on non-UTC hosts)
    val c = DeletionCriteria.builder()
      .whereClause("status = 'X'")
      .startTime("2026-02-13 00:00:00")
      .endTime("2026-02-14 12:30:00")
      .build()
    assert(c.startTime.get.toInstant == java.time.Instant.parse("2026-02-13T00:00:00Z"))
    assert(c.endTime.get.toInstant == java.time.Instant.parse("2026-02-14T12:30:00Z"))
  }

  test("DeletionOps fixture criteria hold UTC instants under a shifted JVM default zone") {
    // the fixture timestamps are defs through parseUtc, so this exercises
    // the parse itself under a non-UTC driver default — the regression
    // shape Timestamp.valueOf would fail (it reads the wall-clock string
    // in the default zone, drifting the constants vs the oracle's naive
    // TIMESTAMP literals)
    val saved = java.util.TimeZone.getDefault
    try {
      java.util.TimeZone.setDefault(java.util.TimeZone.getTimeZone("America/New_York"))
      val c = graft.operators.DeletionOps.criteria
      assert(c.startTime.get.toInstant == java.time.Instant.parse("2024-01-10T00:00:00Z"))
      assert(c.endTime.get.toInstant == java.time.Instant.parse("2024-01-20T00:00:00Z"))
    } finally java.util.TimeZone.setDefault(saved)
  }
}
