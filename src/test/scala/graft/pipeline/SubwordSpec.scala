package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

import graft.testkit.SparkTestSession

/** The deterministic subword tokenizer's cross-engine contract: the
  * Spark column expression must tokenize exactly like an independent
  * JVM re-implementation of the definition (char-join, ranked global
  * replaces, split, drop separators), and the derived operators must
  * agree with driver-side recounts.
  */
class SubwordSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  /** Independent reference: literally the contract's three steps on JVM
    * strings (String.replace has the same left-to-right continue-after
    * semantics the contract specifies).
    */
  private def refTokens(text: String): Seq[String] = {
    val u = Subword.Joiner
    var s = text.flatMap(c => s"$c$u")
    for ((a, b) <- Subword.Merges) s = s.replace(a + u + b + u, a + b + u)
    s.split(u, -1).toSeq.filter(p => p != "" && p != " ")
  }

  test("column expression matches the JVM reference on every fixture doc") {
    import org.apache.spark.sql.functions.col
    val rows = graft.sources.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"),
        Subword.tokens(col("text")).as("t"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getSeq[String](2) === refTokens(r.getString(1)),
        s"doc ${r.getLong(0)}")
    }
  }

  test("known tokenizations: merged words, split tail, spaces dropped") {
    assert(refTokens("join hash batch") === Seq("join", "hash", "batch"))
    assert(refTokens("order") === Seq("or", "d", "er"))
    assert(refTokens("spark") === Seq("s", "par", "k"))
    // pin exact values so a merge-table edit can't slip through silently
    assert(refTokens("the") === Seq("t", "h", "e"))
    assert(refTokens("slow") === Seq("s", "low"))
    assert(refTokens("query") === Seq("q", "u", "er", "y"))
    assert(refTokens("customer") === Seq("customer"))
    // unknown characters fall through as single-char pieces
    assert(refTokens("zq9") === Seq("z", "q", "9"))
    assert(refTokens("") === Seq.empty)
  }

  test("stats: fertility ≥ 1 and word/piece sums match a driver recount") {
    val rows = Subword.stats(spark, sfDir).collect()
    val docs = graft.sources.Tables.documents(spark, sfDir)
      .select("lang", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val byLang = docs.groupBy(_._1)
    assert(rows.map(_.getString(0)).toSeq === byLang.keys.toSeq.sorted)
    rows.foreach { r =>
      val texts = byLang(r.getString(0)).map(_._2)
      assert(r.getLong(1) === texts.length.toLong)
      assert(r.getLong(2) === texts.map(_.split(" ", -1).length.toLong).sum)
      assert(r.getLong(3) === texts.map(refTokens(_).length.toLong).sum)
      assert(r.getDouble(4) >= 1.0) // a piece never spans words
    }
  }

  test("subword chunks: windows cover each doc's pieces exactly") {
    val window = Chunking.DefaultWindow
    val stride = Chunking.DefaultStride
    val chunks = Subword.chunk(spark, sfDir).collect()
      .groupBy(_.getLong(0))
    graft.sources.Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .foreach { r =>
        val t = refTokens(r.getString(1))
        val got = chunks(r.getLong(0)).sortBy(_.getLong(1))
        val expected = Iterator.range(0, t.length, stride).map { start =>
          val end = math.min(start + window, t.length)
          (start / stride, (end - start).toLong,
            t.slice(start, end).mkString(" "))
        }.toSeq
        assert(got.length === expected.length)
        got.zip(expected).foreach { case (g, (cid, n, c)) =>
          assert(g.getLong(1) === cid && g.getLong(2) === n
            && g.getString(3) === c)
        }
      }
  }

  test("piece coverage: monotone, matches driver recount, ends at 1") {
    val rows = Subword.coverage(spark, sfDir).collect()
    val counts = graft.sources.Tables.documents(spark, sfDir)
      .select("text").collect().flatMap(r => refTokens(r.getString(0)))
      .groupBy(identity).map { case (p, xs) => p -> xs.length.toLong }
    assert(rows.length === math.min(50, counts.size))
    val expect = counts.toSeq.sortBy { case (p, c) => (-c, p) }.take(50)
    var cum = 0L
    rows.sortBy(_.getInt(0)).zip(expect).foreach { case (r, (p, c)) =>
      cum += c
      assert(r.getString(1) === p && r.getLong(2) === c && r.getLong(3) === cum)
    }
    if (counts.size <= 50)
      assert(math.abs(rows.map(_.getDouble(4)).max - 1.0) < 1e-9)
  }

  test("training reproduces the frozen Merges table's prefix from its corpus") {
    // the frozen table's provenance corpus is the sf0.01 fixture: word
    // FREQUENCIES drive BPE, so each sf's distribution yields its own
    // (equally valid) table — the reproduction claim is sf-specific
    val rounds = 12
    val learned = Subword.train(spark, "/root/testdata/sf0.01", rounds)
      .collect().sortBy(_.getInt(0))
    assert(learned.map(_.getInt(0)).toSeq === (1 to rounds),
      "ranks must be contiguous from 1")
    learned.foreach(r => assert(r.getLong(3) > 0L, "non-positive pair count"))
    assert(learned.map(r => (r.getString(1), r.getString(2))).toSeq ===
      Subword.Merges.take(rounds),
      "learned merges diverge from the frozen table")
  }

  test("training is deterministic and rounds nest: R rounds prefix R+4 rounds") {
    val a = Subword.train(spark, sfDir, 8).collect().map(_.toSeq).toSeq
    val b = Subword.train(spark, sfDir, 12).collect().map(_.toSeq).toSeq
    assert(b.take(8) === a, "shorter training must be a prefix of longer")
  }

  test("replace semantics win the merge-application corner, in train AND apply") {
    // planted vocabulary (round-6 verdict #5): freq st=5, to=3, sto=2.
    //   round 1 merges (s,t) [count 7]  → "sto" segments as [st, o]
    //   round 2 merges (t,o) [count 3, counted boundary-aware from "to"]
    // The merge APPLICATION is an unanchored replace: "st∟o∟" contains
    // "t∟o∟", so "sto" FUSES to [sto] — textbook boundary-aware BPE would
    // keep [st, o]. This fixture pins that the replace semantics win.
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-bpe-corner")
    val corpus = Seq((1L, ("st " * 5 + "to " * 3 + "sto sto").trim))
      .toDF("doc_id", "text")
    corpus.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val learned = Subword.train(spark, dir.toString, rounds = 5)
      .collect().sortBy(_.getInt(0))
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    // training replays the replace: after round 2 "sto" is ONE symbol, so
    // no pairs remain and training exhausts at exactly 2 merges — under
    // boundary-aware apply a third merge (st,o) would exist
    assert(learned.toSeq === Seq((1, "s", "t", 7L), (2, "t", "o", 3L)))
    // and APPLY agrees with what training predicted: the learned table
    // tokenizes "sto" as the fused single piece
    val merges = learned.map(m => (m._2, m._3)).toSeq
    val pieces = Seq("sto", "to", "st", "stop").toDF("w")
      .select(Subword.tokens(
        org.apache.spark.sql.functions.col("w"), merges).as("p"))
      .as[Seq[String]].collect().toSeq
    assert(pieces === Seq(Seq("sto"), Seq("to"), Seq("st"), Seq("sto", "p")))
  }
}
