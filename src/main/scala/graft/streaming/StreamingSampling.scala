package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Streaming deterministic reservoir sampling: maintain, per stratum, the
  * fixed-size sample [[graft.sample.Sampling.stratifiedTopN]] would pick
  * over everything that has EVER streamed in — the continuous-ingestion
  * form of "keep a stable n-doc eval slice per source while the corpus
  * grows".
  *
  * The reservoir is the n smallest (md5(key), key) pairs seen so far —
  * the same rank the batch operator orders by. That choice buys two
  * properties a classical random reservoir lacks:
  *
  *  - **order-independence**: the content is a pure function of the SET
  *    of keys seen, so the streamed reservoir equals the batch operator
  *    over the union after any arrival order (the convergence spec);
  *  - **replay-safety for free**: redelivered keys cannot change the
  *    content — a key still in the reservoir is recognized and skipped, a
  *    key that was evicted re-arrives with a rank the reservoir already
  *    rejected. No seen-set state is needed, so state stays n entries per
  *    stratum, NOT corpus-sized (contrast the LSH/IVF maintenance ops,
  *    which must track membership to keep counters honest).
  *
  * Emission (Update mode): the full current reservoir whenever a batch
  * changed it, stamped with a run-local version `ver` (count of
  * admissions in this run — monotone within a run, so `max(ver)` selects
  * the latest snapshot; the CONTENT at any ver is order-independent even
  * though ver itself is not).
  *
  * Scale: each micro-batch shuffles once on stratum; state is n×(32-char
  * rank + key string) per stratum.
  */
object StreamingSampling {

  case class ReservoirState(entries: Seq[(String, String)], ver: Long)
  case class ReservoirMember(stratum: String, ver: Long, rnk: Long, key: String)

  def reservoirPerStratum(stream: DataFrame, stratum: Column, key: Column,
      n: Int): Dataset[ReservoirMember] = {
    require(n > 0, s"reservoir size must be positive: $n")
    val spark = stream.sparkSession
    import spark.implicits._
    val keyed = stream
      .select(stratum.cast("string").as("stratum"),
        md5(key.cast("string")).as("rank"), key.cast("string").as("key"))
      .as[(String, String, String)]
    keyed.groupByKey(_._1)
      .flatMapGroupsWithState[ReservoirState, ReservoirMember](
        org.apache.spark.sql.streaming.OutputMode.Update(),
        GroupStateTimeout.NoTimeout) {
        case (strat, rows, state: GroupState[ReservoirState]) =>
          val prev = state.getOption.getOrElse(ReservoirState(Seq.empty, 0L))
          var entries = prev.entries.toVector
          var admitted = 0L
          // admit in (rank, key) order so intra-batch processing is
          // deterministic; the END state is order-independent regardless
          rows.map(r => (r._2, r._3)).toSeq.distinct
            .sorted.foreach { case (rank, k) =>
              val already = entries.exists(_._2 == k)
              if (!already) {
                val worst = if (entries.size < n) None else Some(entries.last)
                val ord = Ordering.Tuple2[String, String]
                if (worst.forall(w => ord.lt((rank, k), w))) {
                  entries = (entries :+ (rank -> k)).sorted.take(n)
                  admitted += 1
                }
              }
            }
          if (admitted == 0L) Iterator.empty
          else {
            val ver = prev.ver + admitted
            state.update(ReservoirState(entries, ver))
            entries.iterator.zipWithIndex.map { case ((_, k), i) =>
              ReservoirMember(strat, ver, (i + 1).toLong, k)
            }
          }
      }
  }
}
