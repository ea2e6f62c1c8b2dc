package graft.operators

import java.sql.Timestamp

import org.scalacheck.Gen

import org.scalatest.funsuite.AnyFunSuite

import graft.testkit.{PropertyChecks, SparkTestSession}

/** Property check: the union+window as-of join equals the brute-force
  * definition ("the right row with the greatest ts <= left.ts, ties by
  * max tiebreak, same key") on random inputs — clustered timestamps force
  * plenty of exact ties, multiple keys force group isolation.
  */
class AsOfJoinPropertySpec extends AnyFunSuite with PropertyChecks {
  private lazy val spark = SparkTestSession.spark

  override protected val propertyIterations: Int = 25

  private case class L(key: Long, ts: Long, lid: Long)
  private case class R(key: Long, ts: Long, rid: Long)

  // small ts domain [0, 12) over 3 keys → dense collisions on (key, ts)
  private val leftGen: Gen[List[L]] = for {
    n <- Gen.choose(0, 12)
    rows <- Gen.listOfN(n, for {
      k <- Gen.choose(0L, 2L); t <- Gen.choose(0L, 11L)
    } yield (k, t))
  } yield rows.zipWithIndex.map { case ((k, t), i) => L(k, t, 100L + i) }

  private val rightGen: Gen[List[R]] = for {
    n <- Gen.choose(0, 12)
    rows <- Gen.listOfN(n, for {
      k <- Gen.choose(0L, 2L); t <- Gen.choose(0L, 11L)
    } yield (k, t))
  } yield rows.zipWithIndex.map { case ((k, t), i) => R(k, t, 500L + i) }

  private def reference(ls: List[L], rs: List[R]): Map[Long, Option[Long]] =
    ls.map { l =>
      val candidates = rs.filter(r => r.key == l.key && r.ts <= l.ts)
      val best = candidates.sortBy(r => (r.ts, r.rid)).lastOption
      l.lid -> best.map(_.rid)
    }.toMap

  test("asOf equals the brute-force latest-at-or-before reference on random inputs") {
    import spark.implicits._
    forAll(leftGen, rightGen) { (ls, rs) =>
      val left = ls.map(l => (l.key, new Timestamp(l.ts * 1000), l.lid))
        .toDF("user_id", "ts", "lid")
      val right = rs.map(r => (r.key, new Timestamp(r.ts * 1000), r.rid))
        .toDF("user_id", "ts", "event_id")
      val got = AsOfJoin.asOf(left, right, Seq("user_id"), "ts", "ts",
          payload = Seq("event_id"), tiebreak = "event_id")
        .select("lid", "asof_event_id").collect()
        .map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Long])).toMap
      assert(got === reference(ls, rs))
    }
  }
}
