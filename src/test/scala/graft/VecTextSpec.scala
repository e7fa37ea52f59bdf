package graft

import org.apache.spark.sql.functions._

import graft.functions.VecText

/** Property-style tests (seeded deterministic sampling — scalatestplus is
  * not on the offline classpath): each custom Catalyst expression must
  * agree with the reference formulation built from Spark HOF primitives
  * or plain Scala set math (SURVEY.md §5.2.3).
  */
class VecTextSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(42)
  private def randToken(): String =
    List.fill(1 + rnd.nextInt(6))(('a' + rnd.nextInt(6)).toChar).mkString
  private def randTokens(n: Int): List[String] = List.fill(1 + rnd.nextInt(n))(randToken())

  test("WordShingles set equals HOF slice/concat formulation (100 cases)") {
    val cases = for (_ <- 1 to 100) yield (randTokens(30), 1 + rnd.nextInt(4))
    cases.groupBy(_._2).foreach { case (k, group) =>
      val df = group.map(_._1).toDF("toks")
      val both = df.select(
        VecText.word_shingles(col("toks"), k).as("fast"),
        array_distinct(
          when(size(col("toks")) >= k,
            transform(sequence(lit(0), size(col("toks")) - k),
              i => concat_ws(" ", slice(col("toks"), i + 1, lit(k)))))
            .otherwise(array(concat_ws(" ", col("toks"))))).as("slow"))
        .as[(Seq[String], Seq[String])].collect()
      both.foreach { case (fast, slow) => assert(fast.toSet == slow.toSet, s"k=$k") }
    }
  }

  test("JaccardSorted64/HashSet64 and JaccardDistinct equal plain set math (100 cases)") {
    val cases = for (_ <- 1 to 100) yield (randTokens(25).distinct, randTokens(25).distinct)
    val df = cases.toDF("a", "b")
    val got = df.select(
      VecText.jaccard_sorted64(VecText.hash_set64(col("a")), VecText.hash_set64(col("b"))),
      VecText.jaccard_distinct(col("a"), col("b")))
      .as[(Double, Double)].collect()
    cases.zip(got).foreach { case ((a, b), (viaHash, viaSets)) =>
      val (sa, sb) = (a.toSet, b.toSet)
      val expected = sa.intersect(sb).size.toDouble / sa.union(sb).size.toDouble
      assert(math.abs(viaHash - expected) < 1e-12, s"hash path: $a vs $b")
      assert(math.abs(viaSets - expected) < 1e-12, s"set path: $a vs $b")
    }
  }

  test("FloatVecDot is bit-identical to sequential double accumulation (100 cases)") {
    val cases = for (_ <- 1 to 100)
      yield (List.fill(16)(rnd.nextFloat() * 2 - 1), List.fill(16)(rnd.nextFloat() * 2 - 1))
    val got = cases.toDF("a", "b")
      .select(VecText.fvec_dot(col("a"), col("b"))).as[Double].collect()
    cases.zip(got).foreach { case ((a, b), d) =>
      val want = a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x.toDouble * y.toDouble }
      assert(d == want) // exactly equal, same accumulation order
    }
  }

  test("mulAddMod61 equals the BigInt formulation (1000 cases + edges)") {
    import graft.functions.VecTextKernels.{mulAddMod61, P}
    val cases = Seq((P - 1, P - 1, P - 1), (0L, 0L, 0L), (1L, P - 1, 0L),
      (P - 1, 1L, P - 1)) ++
      Seq.fill(1000)((math.abs(rnd.nextLong()) % P,
        math.abs(rnd.nextLong()) % P, math.abs(rnd.nextLong()) % P))
    cases.foreach { case (a, h, b) =>
      val want = ((BigInt(a) * BigInt(h) + BigInt(b)) mod BigInt(P)).toLong
      assert(mulAddMod61(a, h, b) == want, s"a=$a h=$h b=$b")
    }
  }

  test("md5Mod60 equals parsing the first 15 hex chars of the md5 digest") {
    import graft.functions.VecTextKernels.md5Mod60
    import org.apache.spark.unsafe.types.UTF8String
    val cases = Seq("", "hello world", "a b", "minhash-a-0") ++ Seq.fill(50)(randToken())
    cases.foreach { s =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val want = java.lang.Long.parseLong(hex.take(15), 16)
      assert(md5Mod60(UTF8String.fromString(s)) == want, s"input '$s'")
    }
  }

  test("MinHashSignature: equal sets -> equal signatures; disjoint sets differ") {
    val df = Seq(
      (1L, Seq("a b", "b c", "c d")),
      (2L, Seq("c d", "a b", "b c")), // same set, different order
      (3L, Seq("x y", "y z", "z w"))).toDF("id", "sh")
    val sigs = df.select(col("id"), VecText.minhash_sig(col("sh"), 64))
      .as[(Long, Seq[Long])].collect().toMap
    assert(sigs(1L) == sigs(2L))
    assert(sigs(1L) != sigs(3L))
    assert(sigs(1L).length == 64)
  }

  test("MinHash signature agreement estimates Jaccard within tolerance") {
    // A={a,b,c}, B={b,c,d} -> J = 2/4 = 0.5
    val df = Seq((Seq("a", "b", "c"), Seq("b", "c", "d"))).toDF("a", "b")
    val (sa, sb) = df.select(
      VecText.minhash_sig(col("a"), 256), VecText.minhash_sig(col("b"), 256))
      .as[(Seq[Long], Seq[Long])].head()
    val agree = sa.zip(sb).count { case (x, y) => x == y }.toDouble / 256
    assert(math.abs(agree - 0.5) < 0.15) // stderr ~0.031 at 256 perms
  }

  test("SimHash64: identical tokens -> hamming 0; similar closer than disjoint") {
    import graft.dedup.Dedup
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "the quick brown fox jumps over the lazy cat again and again"),
      (4L, "zx qv wm yk jh tf rd es bn pl ca xo")).toDF("id", "text")
    val sigs = df.select(col("id"), Dedup.simhash(col("text")))
      .as[(Long, Long)].collect().toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sigs(1L), sigs(2L)) == 0)
    assert(ham(sigs(1L), sigs(3L)) < ham(sigs(1L), sigs(4L)))
  }

  test("RhpSignature equals the HOF hyperplane formulation on real embeddings") {
    import graft.sim.Similarity
    val emb = Tables.embeddings(spark, Sf0001).limit(50)
    val both = emb.select(
      Similarity.rhpSignature(col("embedding"), 16).as("fast"),
      Similarity.rhpSignatureHof(col("embedding"), 16).as("slow"))
      .as[(Long, Long)].collect()
    assert(both.nonEmpty)
    both.foreach { case (fast, slow) => assert(fast == slow) }
  }

  test("NearestCentroid equals the window-argmax formulation on real embeddings") {
    import org.apache.spark.sql.expressions.Window
    import graft.sim.Similarity
    val emb = Tables.embeddings(spark, Sf0001).limit(200)
    val cents = Tables.embeddings(spark, Sf0001).limit(6)
      .select(col("vec_id").as("centroid_id"),
        transform(col("embedding"), x => x.cast("double")).as("centroid"))
    val w = Window.partitionBy("vec_id").orderBy(col("d").desc, col("centroid_id"))
    val expected = emb.crossJoin(broadcast(cents))
      .withColumn("d", Similarity.cosine(col("embedding"), col("centroid")))
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("vec_id"), col("centroid_id"))
      .as[(Long, Long)].collect().toMap
    val centArr = cents.agg(array_sort(
      collect_list(struct(col("centroid_id"), col("centroid")))).as("cents"))
    val got = emb.crossJoin(broadcast(centArr))
      .select(col("vec_id"),
        VecText.nearest_centroid(col("cents"), col("embedding")).as("centroid_id"))
      .as[(Long, Long)].collect().toMap
    assert(got.size == 200)
    assert(got == expected)
  }

  test("NearestCentroid ties, zero-norm centroids, and zero-norm vectors") {
    val vecs = Seq(
      (1L, Seq(1.0f, 0.0f)), // ties c10/c20 -> first (lowest id) wins
      (2L, Seq(0.0f, 0.0f)), // zero-norm vector: every cosine NULL -> lowest id
      (3L, Seq(0.1f, 0.9f))  // nearest is c40
    ).toDF("vec_id", "embedding")
    val cents = Seq(
      (10L, Seq(1.0, 0.0)),
      (20L, Seq(1.0, 0.0)), // duplicate of c10 (tie case)
      (30L, Seq(0.0, 0.0)), // zero-norm centroid: must be skipped
      (40L, Seq(0.0, 1.0))
    ).toDF("centroid_id", "centroid")
    val centArr = cents.agg(array_sort(
      collect_list(struct(col("centroid_id"), col("centroid")))).as("cents"))
    val got = vecs.crossJoin(broadcast(centArr))
      .select(col("vec_id"),
        VecText.nearest_centroid(col("cents"), col("embedding")).as("cid"))
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 10L, 2L -> 10L, 3L -> 40L))
  }

  test("termFreqs kernel equals the HOF tokenizer counts (corpus + edges)") {
    import graft.text.TextAnalysis
    val edges = Seq("", " ", "  a  b a ", "a", "join join join",
      "   leading and trailing   ").toDF("text")
    val docs = Tables.documents(spark, Sf0001).select("text").unionByName(edges)
    val terms = Seq("join", "a", "scan")
    val f = VecText.term_freqs(col("text"), array(terms.map(lit): _*))
    val mismatch = docs.select(
      f.as("k"),
      array(
        TextAnalysis.tokenCount(col("text")).cast("long") +:
          terms.map(t => size(filter(TextAnalysis.tokens(col("text")),
            x => x === lit(t))).cast("long")): _*).as("h"))
      .filter(col("k") =!= col("h")).count()
    assert(mismatch == 0)
  }

  test("retrievalScore ranks higher tf above lower at equal length; drops no-hit docs") {
    import graft.text.TextAnalysis
    val docs = Seq(
      (1L, "join join scan scan"), // tf(join)=2
      (2L, "join scan scan scan"), // tf(join)=1, tf(scan)=3
      (3L, "merge sort rows here")) // no query terms
      .toDF("doc_id", "text")
    val got = TextAnalysis.retrievalScore(docs, Seq("join"))
      .as[(Long, Double)].collect().toMap
    assert(!got.contains(3L))
    assert(got(1L) > got(2L))
  }

  test("rollingHash is order-sensitive where fingerprint is not") {
    import graft.text.TextAnalysis
    val df = Seq(("a b c", "c b a")).toDF("x", "y")
    val (rx, ry) = df.select(TextAnalysis.rollingHash(col("x")),
      TextAnalysis.rollingHash(col("y"))).as[(Long, Long)].head()
    assert(rx != ry)
    val (fx, fy) = df.select(TextAnalysis.fingerprint(lit("a  b   c")),
      TextAnalysis.fingerprint(lit("a b c"))).as[(String, String)].head()
    assert(fx == fy) // whitespace-normalized
  }
}
