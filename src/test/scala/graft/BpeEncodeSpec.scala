package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.BpeEncodeMerges
import graft.ops.TextOps

/** Bit-equivalence of the compiled BPE encoder
  * ([[graft.functions.BpeEncodeMerges]]) against the literal replace
  * chain ([[TextOps.bpeApplyMerges]]) it replaces in production — on
  * the pinned catalog table, on a learned ~1k-merge table the chain
  * could never codegen, and on randomized adversarial tables that
  * exercise the chain's prefix-glue corner. */
class BpeEncodeSpec extends SparkSpec {
  import spark.implicits._

  private val Mark = "\u0001"

  /** Driver-local replay of the exact oracle chain: Java String.replace
    * is the same literal left-to-right non-overlapping scan as
    * Spark's / DuckDB's `replace`. */
  private def chainLocal(sym: String, merges: Seq[(String, String)]): String =
    merges.foldLeft(sym) { case (s, (l, r)) =>
      s.replace(Mark + l + Mark + r, Mark + l + r)
    }

  /** Driver-local bpeSymbolString (ASCII inputs in these tests). */
  private def symLocal(text: String): String =
    text.trim.toLowerCase.replaceAll("(\\S)", Mark + "$1")

  private def encodeDirect(sym: String, merges: Seq[(String, String)]): String =
    BpeEncodeMerges(org.apache.spark.sql.catalyst.expressions.Literal("x"),
        merges, countTokens = false)
      .encode(UTF8String.fromString(sym))

  /** Texts → driver-learned merge table via the production vocab-first
    * path ([[TextOps.bpeLearnFromVocab]]); the first test below pins
    * its round-for-round equivalence against the distributed
    * [[TextOps.bpeLearn]]. */
  private def learnLocal(texts: Seq[String], rounds: Int): Seq[(String, String)] =
    TextOps.bpeLearnFromVocab(
      texts.flatMap(t => t.trim.toLowerCase.split("\\s+").filter(_.nonEmpty))
        .groupBy(identity).toSeq
        .map { case (w, ws) => (w, ws.size.toLong) },
      rounds)

  private lazy val fixtureTexts: Seq[String] =
    spark.read.parquet(s"$sf/documents.parquet")
      .select("text").as[String].collect().toSeq

  test("compiled == Spark replace chain on the fixture (pinned 8-merge q116 table)") {
    val pinned = Seq( // CatalogML3.Q116Merges (private there; pinned twice on purpose)
      "e" -> "r", "i" -> "n", "o" -> "w", "o" -> "r",
      "s" -> "t", "m" -> "er", "a" -> "t", "l" -> "u")
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val out = docs.select(
        TextOps.bpeApplyMerges(TextOps.bpeSymbolString(col("text")), pinned).as("chain"),
        TextOps.bpeEncodeCompiled(col("text"), pinned).as("compiled"),
        TextOps.bpeTokenCount(col("text"), pinned).as("n_chain"),
        TextOps.bpeTokenCountCompiled(col("text"), pinned).as("n_compiled"))
    assert(out.where(col("chain") =!= col("compiled")).count() == 0L)
    assert(out.where(col("n_chain") =!= col("n_compiled")).count() == 0L)
    assert(out.where(col("n_compiled") > 0).count() > 0L, "fixture must exercise the encoder")
  }

  test("learnLocal replicates bpeLearn (8 rounds on the fixture)") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val sparkLearned = TextOps.bpeLearn(docs, "text", rounds = 8)
      .orderBy("merge_rank")
      .select("left", "right").as[(String, String)].collect().toSeq
    assert(learnLocal(fixtureTexts, 8) == sparkLearned)
  }

  test("compiled == chain on a learned ~1k-merge table (driver-replayed chain)") {
    // The synthetic fixture draws words from a small fixed list, so
    // plain learning exhausts after ~90 merges at ANY scale. Pairing
    // adjacent words into '_'-joined compounds squares the vocabulary
    // deterministically — the learner then sustains a genuinely deep
    // (~1k) table learned by the real algorithm.
    val texts = fixtureTexts.map(t =>
      t.trim.split("\\s+").grouped(2).map(_.mkString("_")).mkString(" "))
    val merges = learnLocal(texts, 1000)
    assert(merges.size >= 900, s"corpus too small to learn a deep table: ${merges.size}")
    info(s"learned ${merges.size} merges from ${texts.size} derived docs")
    val mismatches = texts.iterator.map { t =>
      val sym = symLocal(t)
      (chainLocal(sym, merges), encodeDirect(sym, merges))
    }.count { case (a, b) => a != b }
    assert(mismatches == 0)
    // and through the Spark expression path (codegen) for a sample
    val enc = texts.take(50).toDF("text")
      .select(col("text"), TextOps.bpeEncodeCompiled(col("text"), merges).as("e"))
      .as[(String, String)].collect()
    enc.foreach { case (t, e) => assert(e == chainLocal(symLocal(t), merges)) }
  }

  test("prefix-glue corner: replace chain glues l with the ENTIRE next symbol") {
    // pass 1 merges (b,c) -> [a, bc]; pass 2's pattern ␁a␁b matches the
    // PREFIX of "bc" and its replacement eats bc's mark -> one symbol "abc"
    val merges = Seq("b" -> "c", "a" -> "b")
    val sym = symLocal("abc")
    val expect = chainLocal(sym, merges)
    assert(expect == s"${Mark}abc", "chain itself must glue here")
    assert(encodeDirect(sym, merges) == expect)
  }

  test("randomized differential: arbitrary tables == chain (incl. glue + repeats)") {
    val rnd = new scala.util.Random(1234567)
    val alpha = "abc"
    def randSym(): String = {
      val words = (0 until (1 + rnd.nextInt(4))).map { _ =>
        (0 until (1 + rnd.nextInt(8))).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
      }
      symLocal(words.mkString(" "))
    }
    def randMerges(): Seq[(String, String)] =
      (0 until (1 + rnd.nextInt(12))).map { _ =>
        def op() = (0 until (1 + rnd.nextInt(2)))
          .map(_ => alpha(rnd.nextInt(alpha.length))).mkString
        (op(), op())
      }
    var i = 0
    while (i < 300) {
      val (sym, merges) = (randSym(), randMerges())
      val (a, b) = (chainLocal(sym, merges), encodeDirect(sym, merges))
      assert(a == b, s"diverged on sym=${sym.replace(Mark, "^")} merges=$merges")
      i += 1
    }
  }

  test("edge cases: empty, whitespace-only, lone trailing mark, null") {
    val merges = Seq("a" -> "b")
    assert(encodeDirect("", merges) == "")
    assert(encodeDirect("  \t ", merges) == "  \t ")
    assert(encodeDirect(Mark, merges) == Mark)
    assert(encodeDirect(s"${Mark}a${Mark}b$Mark", merges) ==
      chainLocal(s"${Mark}a${Mark}b$Mark", merges))
    val out = Seq((1L, null.asInstanceOf[String]), (2L, "ab"))
      .toDF("id", "text")
      .select(col("id"), TextOps.bpeTokenCountCompiled(col("text"), merges).as("n"))
      .as[(Long, Option[Long])].collect().sortBy(_._1)
    assert(out.toSeq == Seq((1L, None), (2L, Some(1L))))
  }
}
