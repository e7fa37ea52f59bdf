package graft.sim

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Streaming similarity search: maintain the exact top-k nearest
  * neighbors per query over a GROWING corpus stream (the "time series /
  * interactive top-k similarity" shape from the streaming-search
  * literature, done Spark-native):
  *
  *  - the small query set is a STATIC side of a stream-static broadcast
  *    join — each arriving corpus micro-batch is scored against all
  *    queries map-side (VecText.FloatVecDot + precomputed norms);
  *  - per-query state is a k-bounded sorted list merged per batch via
  *    mapGroupsWithState — the streaming twin of the bounded-heap
  *    TopKDesc aggregate, with the same (cos desc, neighbor_id) order;
  *  - emission is the full current top-k snapshot per updated query
  *    (Update mode), versioned by candidates-seen so consumers can pick
  *    the latest snapshot.
  *
  * At scale: state is k entries per query (tiny, bounded); each batch
  * shuffles only batch×|queries| candidate scores on query_id.
  */
object StreamingSimilarity {

  case class TopKState(entries: Seq[(Long, Double)], seen: Long)
  case class TopKSnapshot(
      query_id: Long, rnk: Long, neighbor_id: Long, cosine: Double, seen: Long)

  def topKStream(corpusStream: DataFrame, queries: DataFrame, k: Int = 5): Dataset[TopKSnapshot] = {
    val spark = corpusStream.sparkSession
    import spark.implicits._
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
      Similarity.fnorm(col("embedding")).as("q_norm"))
    val scored = corpusStream
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("c_emb"),
        Similarity.fnorm(col("embedding")).as("c_norm"))
      .join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        Similarity.cosineWithNorms(col("q_emb"), col("c_emb"),
          col("q_norm"), col("c_norm")).as("cos"))
      .as[(Long, Long, Double)]
    scored.groupByKey(_._1)
      .flatMapGroupsWithState[TopKState, TopKSnapshot](
        org.apache.spark.sql.streaming.OutputMode.Update(),
        GroupStateTimeout.NoTimeout) {
        case (query, rows, state: GroupState[TopKState]) =>
          val prev = state.getOption.getOrElse(TopKState(Seq.empty, 0L))
          var n = prev.seen
          val merged = scala.collection.mutable.ArrayBuffer(prev.entries: _*)
          rows.foreach { case (_, neighbor, cos) =>
            merged += ((neighbor, cos)); n += 1
          }
          val top = merged
            .sortBy { case (id, cos) => (-cos, id) }
            .take(k).toSeq
          state.update(TopKState(top, n))
          top.zipWithIndex.iterator.map { case ((id, cos), i) =>
            TopKSnapshot(query, (i + 1).toLong, id, cos, n)
          }
      }
  }
}
