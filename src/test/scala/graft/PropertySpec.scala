package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.ops.{AsOfJoin, Dedup}

/** Property-style differential tests: generated inputs (scalacheck Gen,
  * fixed seeds for reproducibility) checked against naive in-memory
  * reference implementations. */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def sample[T](g: Gen[T], seed: Long): T =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  test("asof join equals the naive per-row max-scan on random inputs") {
    val leftGen = Gen.listOfN(150, for {
      key <- Gen.choose(0L, 8L)
      t <- Gen.choose(0L, 1000L)
    } yield (key, t))
    val rightGen = Gen.listOfN(120, for {
      key <- Gen.choose(0L, 8L)
      t <- Gen.choose(0L, 1000L)
      p <- Gen.choose(0L, 1000000L)
    } yield (key, t, p))

    for (seed <- 1L to 5L) {
      val lRows = sample(leftGen, seed).zipWithIndex
        .map { case ((k, t), i) => (i.toLong, k, t) }
      val rRows = sample(rightGen, seed + 100)

      // naive: for each left row, the right row with max (time, payload)
      // among rows with same key and time <= left time
      val expected = lRows.map { case (id, k, t) =>
        val cands = rRows.filter(r => r._1 == k && r._2 <= t)
        id -> (if (cands.isEmpty) None else Some(cands.map(c => (c._2, c._3)).max._2))
      }.toMap

      val got = AsOfJoin.asof(
          lRows.toDF("id", "key", "t"),
          rRows.toDF("rkey", "rt", "payload"),
          "key", "rkey", "t", "rt", Seq("payload"), Some("payload"))
        .select("id", "payload").as[(Long, Option[Long])].collect().toMap

      assert(got == expected, s"seed $seed mismatch")
    }
  }

  test("exact dedup is idempotent and keeps one representative per text") {
    val docGen = Gen.listOfN(200, for {
      id <- Gen.choose(0L, 10000L)
      text <- Gen.oneOf("alpha", "beta", "gamma", "delta", "epsilon zeta")
    } yield (id, text))
    for (seed <- 1L to 3L) {
      val rows = sample(docGen, seed).distinctBy(_._1)
      val df = rows.toDF("doc_id", "text")
      val once = Dedup.dropExactDuplicates(df, "doc_id", "text")
      val twice = Dedup.dropExactDuplicates(once, "doc_id", "text")
      val o = once.as[(Long, String)].collect().toSet
      assert(o == twice.as[(Long, String)].collect().toSet, "idempotence")
      assert(o.map(_._2).size == o.size, "one row per distinct text")
      assert(o.map(_._2) == rows.map(_._2).toSet, "every text keeps a representative")
      val expectKeep = rows.groupBy(_._2).map { case (_, g) => g.map(_._1).min }.toSet
      assert(o.map(_._1) == expectKeep, "representative is the min id")
    }
  }

  test("tumbling window aggregation equals naive bucket recompute") {
    val evGen = Gen.listOfN(300, for {
      secs <- Gen.choose(0L, 86400L)
      v <- Gen.choose(1, 1000)
    } yield (secs, v))
    for (seed <- 1L to 3L) {
      val rows = sample(evGen, seed)
      val df = rows.map { case (s, v) =>
        (new Timestamp(s * 1000L), v.toDouble)
      }.toDF("ts", "value")
      val got = df.groupBy(window(col("ts"), "10 minutes"))
        .agg(count(lit(1)).as("n"), dsumLocal(col("value")).as("s"))
        .select(col("window.start").cast("long").as("w"), col("n"), col("s"))
        .as[(Long, Long, Double)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      val expected = rows
        .groupBy { case (s, _) => (s / 600) * 600 }
        .map { case (w, g) => w -> ((g.size.toLong, g.map(_._2.toDouble).sum)) }
      assert(got == expected, s"seed $seed mismatch")
    }
  }

  private def dsumLocal(c: org.apache.spark.sql.Column) =
    sum(c.cast(org.apache.spark.sql.types.DecimalType(18, 2))).cast("double")

  test("minhash-LSH finds every pair above threshold that brute force finds") {
    // corpus with controlled overlap: doc i shares a prefix pool with i+1
    val vocab = (0 until 60).map(i => s"w$i")
    val docGen = Gen.listOfN(40, Gen.choose(0, 39))
    for (seed <- 1L to 3L) {
      val starts = sample(docGen, seed)
      val docs = starts.zipWithIndex.map { case (st, i) =>
        (i.toLong, (st until st + 20).map(j => vocab(j % 60)).mkString(" "))
      }
      val df = docs.toDF("doc_id", "text")

      def shingleSet(t: String): Set[String] =
        t.split(" ").sliding(3).map(_.mkString(" ")).toSet
      val brute = (for {
        a <- docs; b <- docs if a._1 < b._1
        sa = shingleSet(a._2); sb = shingleSet(b._2)
        j = (sa & sb).size.toDouble / (sa | sb).size
        if j >= 0.7
      } yield (a._1, b._1)).toSet

      val lsh = Dedup.minhashJaccardPairs(df, "doc_id", "text",
          shingleN = 3, threshold = 0.7)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      assert(lsh == brute, s"seed $seed: lsh=$lsh brute=$brute")
    }
  }
}
