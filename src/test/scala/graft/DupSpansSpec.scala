package graft

import org.apache.spark.sql.DataFrame

import graft.ops.Dedup

/** Duplicated-span detection (ExactSubstr / winnowing): differential
  * check against a plain-Scala reference, planted-copy detection, the
  * winnowing detection-length guarantee, and degenerate inputs. */
class DupSpansSpec extends SparkSpec {
  import spark.implicits._

  private def df(docs: Seq[(Long, String)]): DataFrame =
    docs.toDF("doc_id", "text")

  private def collect(out: DataFrame): Seq[(Long, Long, Long, Long)] =
    out.select("doc_id", "span_start", "span_end", "span_chars")
      .as[(Long, Long, Long, Long)].collect().toSeq.sorted

  /** Reference: brute-force gram count + mark + interval merge. */
  private def refSpans(docs: Seq[(Long, String)], spanLen: Int,
                       minOcc: Int = 2): Seq[(Long, Long, Long, Long)] = {
    val grams = for {
      (id, t) <- docs if t.length >= spanLen
      p <- 1 to (t.length - spanLen + 1)
    } yield (id, p, t.substring(p - 1, p - 1 + spanLen))
    val counts = grams.groupBy(_._3).view.mapValues(_.size).toMap
    val marks = grams.collect { case (id, p, g) if counts(g) >= minOcc => (id, p) }
    marks.groupBy(_._1).toSeq.flatMap { case (id, ps) =>
      val sorted = ps.map(_._2.toLong).sorted
      val islands = sorted.tail.foldLeft(List(List(sorted.head))) { (acc, p) =>
        if (p <= acc.head.head + spanLen) (p :: acc.head) :: acc.tail
        else List(p) :: acc
      }
      islands.map { isl =>
        val (s, e) = (isl.min, isl.max + spanLen - 1)
        (id, s, e, e - s + 1)
      }
    }.sorted
  }

  test("exact spans match the brute-force reference on a planted corpus") {
    val boiler = "SUBSCRIBE TO OUR NEWSLETTER FOR MORE GREAT CONTENT TODAY"
    val docs = Seq(
      1L -> s"alpha beta gamma delta $boiler and then unique tail one",
      2L -> s"$boiler completely different middle text follows here now",
      3L -> s"unrelated document with no shared content at all in it xyzw",
      4L -> s"prefix text $boiler suffix $boiler twice in one document!")
    val got = collect(Dedup.duplicatedSpans(df(docs), "doc_id", "text", spanLen = 20))
    assert(got == refSpans(docs, 20))
    assert(got.map(_._1).toSet == Set(1L, 2L, 4L)) // doc 3 untouched
  }

  test("exact spans: within-doc repetition alone is marked") {
    val rep = "0123456789abcdefghij" // 20 chars, repeated inside one doc
    val docs = Seq(1L -> s"start $rep middle $rep end",
      2L -> "nothing shared with the first document at all here")
    val got = collect(Dedup.duplicatedSpans(df(docs), "doc_id", "text", spanLen = 15))
    assert(got == refSpans(docs, 15))
    assert(got.nonEmpty && got.forall(_._1 == 1L))
  }

  test("exact spans: differential on a seeded random corpus with planted copies") {
    val rnd = new scala.util.Random(42)
    def txt(n: Int) = Seq.fill(n)(('a' + rnd.nextInt(4)).toChar).mkString // small alphabet → natural collisions
    val shared = txt(45)
    val docs = (0L until 30L).map { i =>
      val body = txt(120)
      val t = if (i % 5 == 0) body.take(40) + shared + body.drop(40) else body
      i -> t
    }
    for (spanLen <- Seq(12, 30)) {
      val got = collect(Dedup.duplicatedSpans(df(docs), "doc_id", "text", spanLen))
      assert(got == refSpans(docs, spanLen), s"spanLen=$spanLen")
    }
  }

  test("sampled spans (sampleMod dial): intervals nest in stride-1 spans; long planted dup found at any alignment") {
    val rnd = new scala.util.Random(13)
    def txt(n: Int) = Seq.fill(n)(('a' + rnd.nextInt(26)).toChar).mkString
    val spanLen = 30
    // planted region long enough that a mod-4 miss is ~(3/4)^171 — the
    // probabilistic recall contract is deterministic on a fixed seed
    val shared = txt(200)
    val docs = (0L until 10L).map { i =>
      val body = txt(250)
      val off = 15 + 13 * i.toInt // different alignment per doc
      i -> (body.take(off) + shared + body.drop(off))
    }
    val full = collect(Dedup.duplicatedSpans(df(docs), "doc_id", "text", spanLen))
    for (p <- Seq(4, 16)) {
      val sampled = collect(
        Dedup.duplicatedSpans(df(docs), "doc_id", "text", spanLen,
          sampleMod = p))
      // mark positions are a subset ⇒ every sampled interval nests
      // inside some stride-1 interval of the same doc
      sampled.foreach { case (id, s, e, _) =>
        assert(full.exists(f => f._1 == id && f._2 <= s && e <= f._3),
          s"p=$p: sampled [$s,$e] of doc $id not inside any exact span")
      }
      // alignment robustness: the planted region is found in EVERY doc
      // (content-defined keep decisions are shared by all copies; a
      // fixed-stride dial would miss docs whose offset differs mod p)
      val byDoc = sampled.groupBy(_._1)
      docs.foreach { case (id, t) =>
        val s = t.indexOf(shared) + 1L
        val e = s + shared.length - 1
        assert(byDoc.get(id).exists(_.exists(sp => sp._2 <= e && sp._3 >= s)),
          s"p=$p doc $id: planted region [$s,$e] missed: ${byDoc.get(id)}")
      }
    }
  }

  test("winnowed spans detect every duplicated region >= window+spanLen-1") {
    val rnd = new scala.util.Random(7)
    def txt(n: Int) = Seq.fill(n)(('a' + rnd.nextInt(26)).toChar).mkString
    val (spanLen, window) = (30, 8)
    val shared = txt(spanLen + window - 1) // exactly the guarantee floor
    val docs = (0L until 10L).map { i =>
      val body = txt(200)
      val off = 20 + 11 * i.toInt // different alignment per doc
      i -> (body.take(off) + shared + body.drop(off))
    }
    val got = collect(
      Dedup.duplicatedSpansWinnowed(df(docs), "doc_id", "text", spanLen, window))
    // every doc carries the planted region, so every doc must report a
    // span overlapping it (content-defined anchors survive the per-doc
    // alignment shift — the property fixed-stride sampling lacks)
    val byDoc = got.groupBy(_._1)
    docs.foreach { case (id, t) =>
      val s = t.indexOf(shared) + 1L
      val e = s + shared.length - 1
      assert(byDoc.get(id).exists(_.exists(sp => sp._2 <= e && sp._3 >= s)),
        s"doc $id: planted region [$s,$e] not covered by ${byDoc.get(id)}")
    }
  }

  test("winnowed marks are a subset of exact marks (reported regions nest)") {
    val boiler = "THE QUICK BROWN FOX JUMPS OVER THE LAZY DOG AGAIN AND AGAIN"
    val docs = Seq(
      1L -> s"intro $boiler outro padding text to make the document longer",
      2L -> s"different beginning $boiler and a different ending as well ok")
    val exact = collect(Dedup.duplicatedSpans(df(docs), "doc_id", "text", 20))
    val win = collect(Dedup.duplicatedSpansWinnowed(df(docs), "doc_id", "text", 20, 8))
    // every winnowed interval lies inside some exact interval: anchors
    // are a subset of the stride-1 grams, minus hash-collision noise
    // (none at these sizes)
    win.foreach { w =>
      assert(exact.exists(e => e._1 == w._1 && e._2 <= w._2 && e._3 >= w._3),
        s"winnowed $w not nested in any of $exact")
    }
    assert(win.nonEmpty)
  }

  test("degenerate inputs: short docs, empty corpus, no duplicates") {
    val short = df(Seq(1L -> "tiny", 2L -> "also small"))
    assert(collect(Dedup.duplicatedSpans(short, "doc_id", "text", 30)).isEmpty)
    assert(collect(Dedup.duplicatedSpansWinnowed(short, "doc_id", "text", 30)).isEmpty)
    val unique = df(Seq(
      1L -> "every document in this corpus is completely distinct text a",
      2L -> "and shares no thirty character window with any other one bbb"))
    assert(collect(Dedup.duplicatedSpans(unique, "doc_id", "text", 30)).isEmpty)
  }

  test("exact spans: mark join broadcasts the count side or reuses the gram exchange") {
    val docs = df(Seq(
      1L -> "shared window of text that repeats shared window of text that repeats",
      2L -> "shared window of text that repeats plus some unshared trailing text"))
    val out = Dedup.duplicatedSpans(docs, "doc_id", "text", 20)
    out.collect() // materialize so AQE finalizes the physical plan
    val plan = out.queryExecution.executedPlan.toString
    // production (default) shape: the gram stream is COMPUTED TWICE —
    // the deliberate, measured trade (spansFromGrams doc: recompute
    // beat a shared checkpoint materialization 3.11 vs 9.96 s at x10,
    // and the stream is ~28 B/char so materializing writes ~28× the
    // corpus bytes). The small dup-digest side broadcasts, so the gram
    // stream itself still pays only the count groupBy's shuffle.
    assert(plan.contains("BroadcastHashJoin") || plan.contains("ReusedExchange"),
      s"expected broadcast mark join or exchange reuse in:\n$plan")
    // opt-in materialized mode (for expensive-to-rescan inputs): the
    // gram frame is checkpoint-truncated once, both branches read the
    // blocks, no Generate survives in the final plan
    val mat = Dedup.duplicatedSpans(docs, "doc_id", "text", 20, materialize = true)
    mat.collect()
    val matPlan = mat.queryExecution.executedPlan.toString
    assert(matPlan.contains("ExistingRDD"),
      s"expected checkpoint scan of the materialized gram stream in:\n$matPlan")
    assert(!matPlan.contains("Generate"),
      s"gram explode recomputed in the materialized span tail:\n$matPlan")
    // same spans either way
    assert(collect(mat).toSet == collect(out).toSet)
  }

  test("removeSpans cuts mined intervals order-preserving; re-mining finds nothing") {
    val shared = "this exact thirty-plus character span is duplicated verbatim"
    val docs = df(Seq(
      1L -> s"prefix one $shared middle bit $shared suffix one",
      2L -> s"totally different opening here $shared and a different close",
      3L -> "this document shares no thirty character window with anything"))
    val spanLen = 30
    val spans = Dedup.duplicatedSpans(docs, "doc_id", "text", spanLen)
    val rewritten = Dedup.removeSpans(docs, spans, "doc_id", "text")
    val byId = rewritten.select("doc_id", "text").as[(Long, String)]
      .collect().toMap
    // untouched doc passes through byte-identical
    assert(byId(3L) == "this document shares no thirty character window with anything")
    // the cut equals reference substring surgery over the mined intervals
    val ivs = collect(spans).groupBy(_._1)
    val orig = Map(
      1L -> s"prefix one $shared middle bit $shared suffix one",
      2L -> s"totally different opening here $shared and a different close")
    for ((id, text) <- orig) {
      val merged = ivs(id).map { case (_, s, e, _) => (s.toInt, e.toInt) }.sorted
      val kept = new StringBuilder
      var cur = 1
      for ((s, e) <- merged) {
        kept ++= text.substring(cur - 1, math.max(s - 1, cur - 1))
        cur = math.max(e + 1, cur)
      }
      kept ++= text.substring(math.min(cur - 1, text.length))
      assert(byId(id) == kept.toString, s"doc $id cut mismatch")
      assert(byId(id).length < text.length, s"doc $id must actually shrink")
    }
    // the ExactSubstr fixpoint property: mining the rewritten corpus
    // again finds no duplicated span at the same spanLen/minOcc
    val again = Dedup.duplicatedSpans(
      rewritten.select("doc_id", "text"), "doc_id", "text", spanLen)
    assert(collect(again).isEmpty,
      s"rewritten corpus must be span-dup-free, got ${collect(again)}")
  }

  test("duplicatedSpansAgainst marks only cross-corpus spans; winnowed floor holds") {
    val leak = "this exact thirty-plus character span leaked from the reference set"
    val inner = "crawl-internal duplicate window repeated twice in one document!!"
    val crawl = df(Seq(
      1L -> s"crawl preamble $leak crawl tail",
      2L -> s"$inner and again $inner",                // internal dup, NOT in ref
      3L -> "clean document sharing nothing with the reference corpus at all"))
    val ref = df(Seq(
      100L -> s"reference context $leak reference tail"))
    val spanLen = 30
    val out = collect(Dedup.duplicatedSpansAgainst(crawl, ref, "doc_id", "text", spanLen))
    // only doc 1 is marked, and its interval covers exactly the leaked span
    assert(out.map(_._1).distinct == Seq(1L), s"only the leaking doc, got $out")
    val (_, s, e, _) = out.head
    // the maximal shared region includes the flanking spaces (both
    // corpora surround the leak with a space on each side)
    val text1 = s"crawl preamble $leak crawl tail"
    val shared = s" $leak "
    val start = text1.indexOf(shared) + 1
    assert(s == start && e == start + shared.length - 1,
      s"interval [$s,$e] must cover the shared region [$start,${start + shared.length - 1}]")
    // winnowed: the shared region is >= window+spanLen-1 chars, so the
    // content-defined anchors coincide across corpora and it is found
    val win = collect(Dedup.duplicatedSpansAgainst(crawl, ref, "doc_id", "text",
      spanLen, window = 8))
    assert(win.map(_._1).distinct == Seq(1L))
    val (_, ws, we, _) = win.head
    assert(ws >= s && we <= e && we - ws + 1 >= spanLen,
      s"winnowed interval [$ws,$we] must nest in exact [$s,$e]")
  }

  test("removeSpans equals boolean-mask removal on random interval soups") {
    val rnd = new scala.util.Random(20260814L)
    val docs = (1L to 30L).map { id =>
      val len = 5 + rnd.nextInt(60)
      (id, Seq.fill(len)(('a' + rnd.nextInt(4)).toChar).mkString)
    }
    // random intervals: unsorted, overlapping, touching, duplicated;
    // some docs get none
    val spans = docs.flatMap { case (id, text) =>
      Seq.fill(rnd.nextInt(4)) {
        val s = 1 + rnd.nextInt(text.length)
        val e = math.min(text.length, s + rnd.nextInt(10))
        (id, s.toLong, e.toLong)
      }
    }
    val got = Dedup.removeSpans(
        docs.toDF("doc_id", "text"),
        spans.toDF("doc_id", "span_start", "span_end"),
        "doc_id", "text")
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    val byDoc = spans.groupBy(_._1)
    docs.foreach { case (id, text) =>
      val keep = Array.fill(text.length)(true)
      byDoc.getOrElse(id, Nil).foreach { case (_, s, e) =>
        ((s - 1) until e).foreach(i => keep(i.toInt) = false)
      }
      val want = text.zip(keep).collect { case (c, true) => c }.mkString
      assert(got(id) == want, s"doc $id: got '${got(id)}' want '$want'")
    }
  }

  test("removeSpans handles overlapping and unsorted input intervals") {
    val docs = df(Seq(10L -> "abcdefghijklmnopqrstuvwxyz"))
    // overlapping + touching + out-of-order intervals: [4,9], [8,12], [13,15]
    // all collapse into one cut [4,15] -> keep "abc" + "pqrstuvwxyz"
    val spans = Seq((10L, 8L, 12L), (10L, 4L, 9L), (10L, 13L, 15L))
      .toDF("doc_id", "span_start", "span_end")
    val out = Dedup.removeSpans(docs, spans, "doc_id", "text")
      .select("text").as[String].collect()
    assert(out.toSeq == Seq("abc" + "pqrstuvwxyz"))
    // a span covering the document head and one covering the tail
    val edges = Seq((10L, 1L, 3L), (10L, 20L, 26L)).toDF("doc_id", "span_start", "span_end")
    val out2 = Dedup.removeSpans(docs, edges, "doc_id", "text")
      .select("text").as[String].collect()
    assert(out2.toSeq == Seq("defghijklmnopqrs"))
  }
}
