package graft

import org.apache.spark.sql.functions._
import graft.ops.EditJoin

/** [[graft.ops.EditJoin]] — exactness vs the brute-force definition. */
class EditJoinSpec extends SparkSpec {
  import spark.implicits._

  private def brute(names: Seq[(Long, String)], d: Int): Set[(Long, Long, Long)] =
    (for {
      (ia, sa) <- names; (ib, sb) <- names if ia < ib
      dist = {
        // textbook DP — the independent reference implementation
        val (m, n) = (sa.length, sb.length)
        val dp = Array.tabulate(m + 1)(i => i)
        for (j <- 1 to n) {
          var prev = dp(0); dp(0) = j
          for (i <- 1 to m) {
            val cur = dp(i)
            dp(i) = math.min(math.min(dp(i) + 1, dp(i - 1) + 1),
              prev + (if (sa(i - 1) == sb(j - 1)) 0 else 1))
            prev = cur
          }
        }
        dp(m)
      } if dist <= d
    } yield (ia, ib, dist.toLong)).toSet

  private def run(names: Seq[(Long, String)], d: Int, q: Int): Set[(Long, Long, Long)] =
    EditJoin.editJoin(names.toDF("id", "s"), "id", "s", maxDist = d, q = q)
      .as[(Long, Long, Long)].collect().toSet

  test("editJoin matches brute force incl. shorts, ties, exact dups") {
    val names: Seq[(Long, String)] = Seq(
      1L -> "kitten", 2L -> "sitten", 3L -> "sittin", 4L -> "mitten",
      5L -> "kitten",              // exact duplicate → dist 0
      6L -> "a", 7L -> "b", 8L -> "ab", 9L -> "ba",  // short-path slice
      10L -> "abcdefghij", 11L -> "abcdefghix", 12L -> "zbcdefghij",
      13L -> "", 14L -> "xy",      // empty string is a legal short
      15L -> "completely unrelated string here")
    for (d <- Seq(1, 2); q <- Seq(2, 3))
      assert(run(names, d, q) == brute(names, d), s"d=$d q=$q")
  }

  test("editJoin on fixture color names matches brute force") {
    val names = graft.ops.Tables.table(spark, sf, "part")
      .where(col("p_partkey") <= 60)
      .select(col("p_partkey"), col("p_name"))
      .as[(Long, String)].collect().toSeq
    assert(run(names, 2, 3) == brute(names, 2))
  }

  test("editJoin excludes null strings and respects maxDist 0") {
    val names = Seq((1L, "same"), (2L, "same"), (3L, null), (4L, "sam"))
      .toDF("id", "s")
    val got = EditJoin.editJoin(names, "id", "s", maxDist = 0)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 2L, 0L)))
  }
}
