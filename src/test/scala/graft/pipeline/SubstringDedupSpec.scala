package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

import graft.testkit.SparkTestSession

/** Exact-substring span dedup: planted spans are found with exact
  * boundaries, the merge rule (gap ≤ L chains, > L splits) is pinned, the
  * boilerplate df-cap drops ubiquitous windows, and every reported span is
  * genuinely duplicated (precision audit against a driver recomputation).
  */
class SubstringDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def docsOf(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private def tok(n: Int, prefix: String): String =
    (0 until n).map(i => s"$prefix$i").mkString(" ")

  test("a planted shared span is reported with exact token boundaries") {
    // doc 1: 10 unique tokens + the 12-token shared span + 5 unique tokens
    // doc 2: 3 unique tokens + the same span + 8 unique tokens
    val span = tok(12, "shared")
    val docs = docsOf(
      1L -> s"${tok(10, "a")} $span ${tok(5, "b")}",
      2L -> s"${tok(3, "c")} $span ${tok(8, "d")}")
    val got = SubstringDedup.substringSpansOf(docs, l = 8)
      .collect().map(r => (r.getLong(0), r.getInt(2), r.getInt(3))).sorted
    // span occupies tokens [10, 22) in doc 1 and [3, 15) in doc 2
    assert(got.toSeq === Seq((1L, 10, 22), (2L, 3, 15)))
  }

  test("merge rule: duplicated windows chain at gap <= L and split at gap > L") {
    // doc 1 holds s1 immediately followed by s2; s1 is shared only with
    // doc 2 and s2 only with doc 3, so in doc 1 exactly the windows at
    // positions 0 and 8 are duplicated (straddling windows exist in doc 1
    // alone) — position gap exactly L, the merge rule's boundary: one span
    val s1 = tok(8, "x"); val s2 = tok(8, "y")
    val abut = docsOf(
      1L -> s"$s1 $s2",
      2L -> s"$s1 ${tok(9, "p")}",
      3L -> s"${tok(9, "q")} $s2")
    val merged = SubstringDedup.substringSpansOf(abut, l = 8)
      .where("doc_id = 1").collect()
    assert(merged.length === 1 &&
      merged.head.getInt(2) === 0 && merged.head.getInt(3) === 16,
      "duplicated windows at position gap = L must merge into one span")
    // one unique token between them in doc 1 pushes the gap to L + 1: split
    val split = SubstringDedup.substringSpansOf(docsOf(
      1L -> s"$s1 z0 $s2",
      2L -> s"$s1 ${tok(9, "p")}",
      3L -> s"${tok(9, "q")} $s2"), l = 8)
    assert(split.where("doc_id = 1").count() === 2L,
      "a position gap of L + 1 must split the spans")
  }

  test("boilerplate cap: a window above maxDf is not reported as a span") {
    // the same 8-token header in 6 docs, each otherwise unique
    val header = tok(8, "h")
    val docs = docsOf((1L to 6L).map(i => i -> s"$header ${tok(10, s"u$i")}"): _*)
    val capped = SubstringDedup.substringSpansOf(docs, l = 8, maxDf = 5)
    assert(capped.count() === 0L, "df-capped boilerplate must be dropped")
    val uncapped = SubstringDedup.substringSpansOf(docs, l = 8, maxDf = 50)
    assert(uncapped.count() === 6L, "below the cap the span is reported per doc")
  }

  test("precision on the fixture: every reported span's windows are shared") {
    import spark.implicits._
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val l = SubstringDedup.SpanTokens
    val spans = SubstringDedup.substringSpans(spark, sfDir).collect()
    assert(spans.length > 0, "fixture must exercise the operator")
    // driver recomputation: window text -> set of docs containing it
    val winDocs: Map[String, Set[Long]] = docs
      .select("doc_id", "text").as[(Long, String)].collect()
      .iterator
      .flatMap { case (id, text) =>
        val t = text.split(" ", -1)
        Iterator.range(0, t.length - l + 1)
          .map(p => t.slice(p, p + l).mkString(" ") -> id)
      }
      .toSeq.groupBy(_._1).map { case (w, xs) => w -> xs.map(_._2).toSet }
    val texts: Map[Long, Array[String]] = docs
      .select("doc_id", "text").as[(Long, String)].collect()
      .map { case (id, t) => id -> t.split(" ", -1) }.toMap
    // the operator keys windows by polyHash (P = 2^31 − 1), so a rare
    // collision can mark a unique window duplicated (in BOTH engines —
    // the oracle gate is unaffected); the precision audit is therefore a
    // ratio bound, not per-window strict
    var total = 0; var shared = 0
    spans.foreach { r =>
      val (id, start, end) = (r.getLong(0), r.getInt(2), r.getInt(3))
      val t = texts(id)
      Iterator.range(start, end - l + 1).foreach { p =>
        val w = t.slice(p, p + l).mkString(" ")
        total += 1
        if (winDocs(w).exists(_ != id)) shared += 1
      }
    }
    assert(shared.toDouble / total >= 0.99,
      s"only $shared of $total span windows are genuinely duplicated")
  }

  test("scrub: the canonical doc keeps the span, every other holder loses it") {
    val span = tok(12, "shared")
    val docs = docsOf(
      1L -> s"${tok(10, "a")} $span ${tok(5, "b")}",
      2L -> s"${tok(3, "c")} $span ${tok(8, "d")}")
    val got = SubstringDedup.substringScrubOf(docs, l = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    // doc 1 is canonical (min id): untouched; doc 2 loses the 12 span tokens
    assert(got === Seq(
      (1L, 0L, s"${tok(10, "a")} $span ${tok(5, "b")}"),
      (2L, 12L, s"${tok(3, "c")} ${tok(8, "d")}")))
  }

  test("scrub keep-one guarantee: overlapping cuts cannot erase a span's canonical copy") {
    // T (8 tokens) is shared by docs 1 and 2 (canonical: 1); S = last 4 of
    // T + v0..v3 is shared by docs 2 and 3 (canonical: 2). Doc 2's cut of
    // T overlaps S — without the protect clause it would remove S's first
    // half from S's OWN canonical doc while doc 3 cuts its copy, erasing S
    // from the whole corpus
    val tTok = tok(8, "t"); val u = tok(4, "u"); val v = tok(4, "v")
    val sTok = ((4 until 8).map(i => s"t$i") ++ (0 until 4).map(i => s"v$i")).mkString(" ")
    val docs = docsOf(
      1L -> tTok,
      2L -> s"$u $tTok $v",
      3L -> s"${tok(3, "w")} $sTok ${tok(2, "x")}")
    val got = SubstringDedup.substringScrubOf(docs, l = 8)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(got(2L).contains(sTok),
      s"S must survive in its canonical doc 2, got '${got(2L)}'")
    assert(!got(3L).contains(sTok), "doc 3's non-canonical copy of S is cut")
    assert(got(1L) === tTok, "doc 1 keeps T verbatim (canonical)")
    // doc 2 still cuts the part of T that no canonical-to-doc-2 window covers
    assert(got(2L) === s"$u $sTok",
      s"doc 2 cuts T's unprotected prefix only, got '${got(2L)}'")
  }

  test("scrub conservation on the fixture: kept + cut = original token count") {
    import spark.implicits._
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val orig: Map[Long, Int] = docs.select("doc_id", "text")
      .as[(Long, String)].collect()
      .map { case (id, t) => id -> t.split(" ", -1).length }.toMap
    val scrubbed = SubstringDedup.substringScrub(spark, sfDir).collect()
    assert(scrubbed.length === orig.size, "every document must pass through")
    var cutTotal = 0L
    scrubbed.foreach { r =>
      val (id, nCut, clean) = (r.getLong(0), r.getLong(1), r.getString(2))
      val keptLen = if (clean.isEmpty) 0 else clean.split(" ", -1).length
      assert(keptLen + nCut === orig(id).toLong,
        s"doc $id: kept $keptLen + cut $nCut != original ${orig(id)}")
      cutTotal += nCut
    }
    assert(cutTotal > 0L, "the fixture must exercise actual cutting")
    // canonical-keep guarantee: the corpus-wide cut is strictly less than
    // the total duplicated-span footprint (at least one copy survives)
    val spanTotal = SubstringDedup.substringSpans(spark, sfDir)
      .agg(org.apache.spark.sql.functions.sum("n_tokens")).collect()
      .head.getLong(0)
    assert(cutTotal < spanTotal, "at least one occurrence of a span survives")
  }

  test("dup-span profile aggregates the span report exactly") {
    import org.apache.spark.sql.functions._
    val profile = SubstringDedup.dupSpanProfile(spark, sfDir).collect()
    val spans = SubstringDedup.substringSpans(spark, sfDir)
    val spanTokens = spans.agg(sum("n_tokens")).collect().head.getLong(0)
    val spanDocs = spans.select("doc_id").distinct().count()
    assert(profile.map(_.getLong(3)).sum === spanTokens,
      "profile dup_tokens must sum to the span report's token total")
    assert(profile.map(_.getLong(2)).sum === spanDocs,
      "profile docs_with_dups must sum to the span report's distinct docs")
    profile.foreach { r =>
      val share = r.getDouble(5)
      assert(share >= 0.0 && share <= 1.0, s"share out of range: $share")
      assert(r.getLong(3) <= r.getLong(4), "dup tokens cannot exceed total")
    }
  }

  test("rolling window hashes are bit-identical to hashing each window from scratch") {
    import graft.functions.Hashes
    val rnd = new scala.util.Random(7)
    def randText(nTok: Int): String =
      // token lengths 0..9 — empty tokens (double spaces) included, the
      // split(" ", -1) contract's hardest case for the rolling removal
      (0 until nTok).map { _ =>
        val len = rnd.nextInt(10)
        (0 until len).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
      }.mkString(" ")
    val texts = Seq("", "one", "a b", "  ", tok(8, "z"), tok(40, "tok")) ++
      (0 until 20).map(_ => randText(1 + rnd.nextInt(60)))
    for (text <- texts; l <- Seq(1, 2, 3, 8)) {
      val t = text.split(" ", -1)
      val expect = Iterator.range(0, t.length - l + 1)
        .map(p => Hashes.polyHashJvm(t.slice(p, p + l).mkString(" ")))
        .toSeq
      assert(SubstringDedup.rollingWindowHashes(text, l).toSeq === expect,
        s"mismatch for l=$l text='${text.take(60)}…'")
    }
  }

  test("NULL text yields no windows and passes through the scrub untouched") {
    import spark.implicits._
    val docs = Seq((1L, s"${tok(8, "s")} end"), (2L, null: String),
        (3L, s"pre ${tok(8, "s")}"))
      .toDF("doc_id", "text")
    // no NPE, and the null doc contributes no spans
    val spans = SubstringDedup.substringSpansOf(docs, l = 8).collect()
    assert(spans.map(_.getLong(0)).toSet === Set(1L, 3L))
    // scrub: null doc passes through as an empty clean_text with zero cut
    val scrubbed = SubstringDedup.substringScrubOf(docs, l = 8)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(scrubbed(2L) === ((0L, "")))
    assert(scrubbed(1L)._1 === 0L, "doc 1 is canonical (min id) and keeps its span")
    assert(scrubbed(3L)._1 === 8L, "doc 3 loses its non-canonical copy")
  }

  test("span extent arithmetic: n_tokens and n_windows are consistent") {
    val spans = SubstringDedup.substringSpans(spark, sfDir).collect()
    val l = SubstringDedup.SpanTokens
    spans.foreach { r =>
      val (start, end, nTok, nWin) =
        (r.getInt(2), r.getInt(3), r.getInt(4), r.getLong(5))
      assert(nTok === end - start)
      assert(end - start >= l, "a span is at least one window long")
      // windows sit inside the span; a fully-duplicated contiguous span
      // has one window per start offset (the maximum)
      assert(nWin >= 1L && nWin <= (end - start - l + 1).toLong)
    }
  }
}
