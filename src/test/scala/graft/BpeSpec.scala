package graft

import org.apache.spark.sql.functions._

import graft.text.TextAnalysis

/** BPE merge-table trainer + encoder: hand-checkable merges, greedy
  * left-to-right merge semantics, early stop, determinism.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("merge rounds recover the hand-computed table; encode applies it; training stops when pairs run dry") {
    // distinct words: aaab (cnt 2), ab (cnt 1)
    // r1 pairs: (a,a)=4 (two sites in aaab × cnt 2), (a,b)=3 → merge aa
    // r2 pairs: (aa,a)=2, (a,b)=3 → merge ab → aaab=|aa||ab|, ab=|ab|
    // r3 pairs: (aa,ab)=2 → merge aaab
    // r4: no pairs left → early stop (3 rows from merges=4)
    val docs = Seq((1L, "aaab aaab ab")).toDF("doc_id", "text")
    val vocab = TextAnalysis.bpeVocab(docs, merges = 4)
      .orderBy("round")
      .as[(Long, String, String, String, Long)].collect().toSeq
    assert(vocab == Seq(
      (1L, "a", "a", "aa", 4L),
      (2L, "a", "b", "ab", 3L),
      (3L, "aa", "ab", "aaab", 2L)))
    val enc4 = TextAnalysis.bpeEncode(docs, merges = 4)
      .as[(Long, Long, Long)].head()
    assert(enc4 == ((1L, 3L, 3L))) // aaab→1, aaab→1, ab→1
    val enc2 = TextAnalysis.bpeEncode(docs, merges = 2)
      .as[(Long, Long, Long)].head()
    assert(enc2 == ((1L, 3L, 5L))) // |aa||ab|×2 + |ab|
  }

  test("greedy left-to-right non-overlap: a run of the merged pair folds like the canonical scan") {
    // "aaaaa" with merge (a,a): greedy → |aa||aa||a| (2 sites, not 4)
    val docs = Seq((1L, "aaaaa")).toDF("doc_id", "text")
    val enc = TextAnalysis.bpeEncode(docs, merges = 1)
      .as[(Long, Long, Long)].head()
    assert(enc == ((1L, 1L, 3L)))
  }

  test("ties break lexicographically and training is run-deterministic on the corpus") {
    val docs = Tables.documents(spark, Sf0001)
    val a = TextAnalysis.bpeVocab(docs).orderBy("round").collect().toSeq
    val b = TextAnalysis.bpeVocab(docs).orderBy("round").collect().toSeq
    assert(a == b)
    assert(a.length == 8)
    // merged symbols are the concatenation of their parts, counts are
    // positive and the encoder's budget is bounded by char count
    a.foreach { r =>
      assert(r.getString(3) == r.getString(1) + r.getString(2))
      assert(r.getLong(4) > 0L)
    }
    val enc = TextAnalysis.bpeEncode(docs)
      .join(docs.select(col("doc_id"), col("n_chars")), "doc_id")
    assert(enc.filter(col("n_pieces") > col("n_chars")).count() == 0L)
    assert(enc.filter(col("n_pieces") < col("n_tokens")).count() == 0L,
      "a token is at least one piece")
  }

  test("zero-token docs encode to (0, 0)") {
    val docs = Seq((1L, ""), (2L, "xy xy")).toDF("doc_id", "text")
    val rows = TextAnalysis.bpeEncode(docs, merges = 1)
      .orderBy("doc_id").as[(Long, Long, Long)].collect().toSeq
    assert(rows == Seq((1L, 0L, 0L), (2L, 2L, 2L)))
  }

  test("bpeEncodeWith applies a frozen merge table identically to the coupled encoder, and transfers to unseen text") {
    val train = Tables.documents(spark, Sf0001)
    val table = TextAnalysis.bpeMergesOf(TextAnalysis.bpeVocab(train))
    assert(table.length == 8)
    // frozen apply == coupled train+encode on the training corpus
    val coupled = TextAnalysis.bpeEncode(train).orderBy("doc_id").collect()
    val frozen = TextAnalysis.bpeEncodeWith(train, table)
      .orderBy("doc_id").collect()
    assert(coupled.sameElements(frozen))
    // the table transfers: encoding a DIFFERENT corpus needs no
    // retraining and still bounds pieces by chars
    val other = Seq((1L, "the cat sat on the mat"), (2L, "zzzz qqqq"))
      .toDF("doc_id", "text")
    val rows = TextAnalysis.bpeEncodeWith(other, table)
      .orderBy("doc_id").as[(Long, Long, Long)].collect().toSeq
    assert(rows.map(_._2) == Seq(6L, 2L))
    assert(rows.forall(r => r._3 >= r._2))
  }

  test("bpeEncodeRowLocal streams in append mode and matches the joined encoder exactly") {
    val train = Tables.documents(spark, Sf0001)
    val table = TextAnalysis.bpeMergesOf(TextAnalysis.bpeVocab(train))
    val joined = TextAnalysis.bpeEncodeWith(train, table)
      .orderBy("doc_id").collect()
    val rowLocal = TextAnalysis.bpeEncodeRowLocal(train, table)
      .orderBy("doc_id").collect()
    assert(joined.sameElements(rowLocal),
      "the per-token fold must equal the joined distinct-word plan")
    // degenerate edges match the joined encoder's contract
    val edges = Seq((1L, ""), (2L, "a b c a")).toDF("doc_id", "text")
    assert(TextAnalysis.bpeEncodeRowLocal(edges, Seq.empty)
      .orderBy("doc_id").as[(Long, Long, Long)].collect().toSeq
      == Seq((1L, 0L, 0L), (2L, 4L, 4L)))
    // and the same frozen table encodes INSIDE an append-mode stream
    // (no explode, no join, no per-doc groupBy, no state)
    val root = java.nio.file.Files.createTempDirectory("graft-bpe-stream")
    val landing = java.nio.file.Files.createDirectory(root.resolve("in")).toString
    train.filter(col("doc_id") % 2 === 0).write.parquet(s"$landing/w0")
    train.filter(col("doc_id") % 2 === 1).write.parquet(s"$landing/w1")
    val stream = spark.readStream.schema(train.schema)
      .option("recursiveFileLookup", "true").parquet(landing)
    val q = TextAnalysis.bpeEncodeRowLocal(stream, table)
      .writeStream.format("memory").queryName("bpe_stream")
      .outputMode("append")
      .option("checkpointLocation", root.resolve("ck").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val streamed = spark.table("bpe_stream").orderBy("doc_id").collect()
    assert(streamed.sameElements(joined),
      "streamed frozen encoding must equal the batch encoder row-for-row")
  }

  test("a pairless corpus (all single-char words) trains an empty table; encode degrades to token counts") {
    val docs = Seq((1L, "a b c a")).toDF("doc_id", "text")
    val vocab = TextAnalysis.bpeVocab(docs, merges = 4)
    assert(vocab.count() == 0L)
    val enc = TextAnalysis.bpeEncode(docs, merges = 4)
      .as[(Long, Long, Long)].head()
    assert(enc == ((1L, 4L, 4L)))
    // the frozen apply with an EMPTY table is the identity encoding
    val rows = TextAnalysis.bpeEncodeWith(docs, Seq.empty)
      .as[(Long, Long, Long)].head()
    assert(rows == ((1L, 4L, 4L)))
  }
}
