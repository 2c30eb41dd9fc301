package graft.delivery

import scala.concurrent.duration._
import scala.util.Random

import org.apache.spark.sql.streaming.StreamingQuery

import graft.model.ClientConfig

/** Exponential-backoff restart supervision for streaming queries
  * (SURVEY.md §2a #17; reference BackoffSupervisor wiring at
  * Producer.scala:48-51 / ScaladslKinesisSubscriber.scala:149-158,
  * defaults 3s→30s ×0.2 jitter from reference.conf:19-25).
  *
  * Spark-first: there is no actor to supervise — the unit of restart is
  * the StreamingQuery, and state recovery is the checkpoint replay. The
  * supervisor is a plain driver-side loop.
  */
object Supervision {

  /** Run `start` and restart it with exponential backoff whenever it
    * terminates with an exception; returns after `maxRestarts` failures
    * or clean termination. Backoff resets after a stretch of stability. */
  def superviseSync(config: ClientConfig = ClientConfig(None, None, None, None),
                    maxRestarts: Int = Int.MaxValue,
                    resetAfter: FiniteDuration = 2.minutes,
                    sleeper: Long => Unit = Thread.sleep)
                   (start: () => StreamingQuery): Int = {
    val rnd = new Random(42)
    var restarts = 0
    var attempt = 0
    var continue = true
    while (continue && restarts <= maxRestarts) {
      val startedAt = System.nanoTime()
      val query = start()
      try {
        query.awaitTermination()
        continue = false // clean stop
      } catch {
        case _: Exception =>
          val ranFor = (System.nanoTime() - startedAt).nanos
          attempt = if (ranFor >= resetAfter) 0 else attempt + 1
          restarts += 1
          if (restarts <= maxRestarts) {
            sleeper(nextBackoff(config, attempt, rnd).toMillis)
          }
      }
    }
    restarts
  }

  /** min(max, min * 2^attempt) * (1 + U(0,1) * randomFactor) — the
    * reference's BackoffSupervisor formula. */
  def nextBackoff(config: ClientConfig, attempt: Int, rnd: Random): FiniteDuration = {
    val base = config.minBackoff * math.pow(2.0, math.min(attempt, 30)).toLong
    val capped = if (base > config.maxBackoff) config.maxBackoff else base
    val jitter = 1.0 + rnd.nextDouble() * config.randomFactor
    (capped * jitter).asInstanceOf[FiniteDuration]
  }
}
