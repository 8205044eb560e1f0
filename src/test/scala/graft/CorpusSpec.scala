package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Specs for the [[Corpus]] operators — edge cases the cross-engine oracle
  * corpus can't isolate: packing boundary conditions on synthetic data,
  * chunk coverage invariants, k-means convergence on separable clusters,
  * and passage-dedup reassembly.
  */
class CorpusSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Engine.session("local[4]")
  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) = {
    Engine.prepare(spark, sf)
    SparkEntry.queries(name)(spark, sf)
  }

  /** Raw entry, bypassing the SparkEntry prepare wrapper — used by tests
    * that override a table view with synthetic data (prepare would
    * re-register the real table on top of the override). */
  private def entry(name: String): (SparkSession, String) => org.apache.spark.sql.DataFrame =
    SparkEntry.allEntries.find(_.name == name).get.q

  test("chunking covers every character and respects stride/overlap") {
    val rows = run("q97_doc_chunking").collect()
    val byDoc = rows.groupBy(_.getLong(0))
    val lens = Queries.T(spark, sf, "documents")
      .filter(col("doc_id") < 60)
      .select(col("doc_id"), length(col("text")).cast("long").as("len"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byDoc.keySet == lens.keySet, "every selected doc chunks")
    byDoc.foreach { case (doc, cs) =>
      val sorted = cs.sortBy(_.getLong(1))
      // chunk indices are dense from 0; starts advance by the stride
      assert(sorted.map(_.getLong(1)).toSeq == (0L until sorted.length))
      assert(sorted.forall(r => r.getLong(2) == r.getLong(1) * 90 + 1))
      // last chunk reaches the end of the doc; all others are full-size
      val last = sorted.last
      assert(last.getLong(2) + last.getLong(3) - 1 == lens(doc),
        s"doc $doc: last chunk must end at len ${lens(doc)}")
      assert(sorted.init.forall(_.getLong(3) == 120))
      // a doc shorter than one chunk still yields exactly one chunk
      if (lens(doc) <= 120) assert(sorted.length == 1)
    }
  }

  test("greedy packing: boundary fits, overflow resets, oversized doc isolated") {
    import spark.implicits._
    // tok counts via 1-char words: doc text "a a a" = 3 tokens
    def doc(src: String, id: Long, tok: Int) =
      (id, Seq.fill(tok)("a").mkString(" "), "en", src, 1L)
    val docs = Seq(
      doc("s1", 1, 100), doc("s1", 2, 156), // exactly 256: fits pack 0
      doc("s1", 3, 1), //                      overflow by 1 → pack 1
      doc("s1", 4, 300), //                    oversized → pack 2 alone
      doc("s1", 5, 10), //                     after oversized → pack 3
      doc("s2", 6, 200), doc("s2", 7, 200) //  new source resets to pack 0, then 1
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    Engine.prepare(spark, sf)
    docs.createOrReplaceTempView("documents")
    try {
      val got = entry("q99_greedy_packing")(spark, sf)
        .collect().map(r => (r.getLong(1), r.getLong(3), r.getLong(4))).toSeq
      assert(got == Seq(
        (1L, 0L, 100L), (2L, 0L, 256L), (3L, 1L, 1L), (4L, 2L, 300L),
        (5L, 3L, 10L), (6L, 0L, 200L), (7L, 1L, 200L)))
    } finally Engine.registerTables(spark, sf) // restore real views (prepare memoizes)
  }

  test("sequence packing spans match token totals per shard") {
    val rows = run("q98_sequence_packing").collect()
    rows.groupBy(_.getString(0)).foreach { case (_, ds) =>
      val sorted = ds.sortBy(_.getLong(1))
      // offsets are the exclusive prefix sum of tok
      var expect = 0L
      sorted.foreach { r =>
        assert(r.getLong(3) == expect, s"offset of doc ${r.getLong(1)}")
        expect += r.getLong(2)
      }
      // pack spans consistent with offsets
      sorted.foreach { r =>
        assert(r.getLong(4) == r.getLong(3) / 256)
        assert(r.getLong(5) == (r.getLong(3) + r.getLong(2) - 1) / 256)
        assert(r.getLong(6) == r.getLong(5) - r.getLong(4) + 1)
      }
    }
  }

  test("k-means separates well-separated synthetic clusters") {
    import spark.implicits._
    // 3 tight blobs along distinct axes, 30 vecs each, dim 8; centers are
    // vecs 0..7 so init picks at least one seed from blob 0 and blob 1
    val vecs = (0 until 90).map { i =>
      val blob = i % 3
      val base = Array.fill(8)(0.05f * ((i * 7) % 5))
      base(blob * 2) += 10f
      (i.toLong, base.toSeq, blob)
    }.toDF("vec_id", "embedding", "label")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    Engine.prepare(spark, sf) // registers dot_product before the override
    vecs.createOrReplaceTempView("embeddings")
    try {
      val got = entry("q100_kmeans")(spark, sf)
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      // every true blob maps to a consistent set of final clusters and no
      // final cluster mixes two blobs (separation >> intra-blob spread)
      val byCluster = got.groupBy(_._2).view.mapValues(_.map(x => (x._1 % 3)).toSet)
      byCluster.foreach { case (cid, blobs) =>
        assert(blobs.size == 1, s"cluster $cid mixes blobs $blobs")
      }
      assert(got.length == 90)
    } finally Engine.registerTables(spark, sf)
  }

  test("k-means assignment is map-side: zero exchanges on the corpus side") {
    Engine.prepare(spark, sf)
    val e0 = spark.table("embeddings").selectExpr("vec_id", "embedding",
      "dot_product(embedding, embedding) AS ee").localCheckpoint()
    val c0 = spark.table("embeddings").filter(col("vec_id") < 8).selectExpr(
      "vec_id AS cid",
      "transform(embedding, v -> round(CAST(v AS DOUBLE), 6)) AS cvec")
    try {
      val plan = Corpus.kmeansAssign(e0, c0).queryExecution.executedPlan.toString
      // the ONLY shuffle is the SinglePartition collapse of the k-row
      // centroid table (the broadcast of its one-row result is free); the
      // corpus reaches its assignment as a projection — no shuffle, no
      // window, no shuffled join touches the big side
      assert(plan.linesIterator.count(l =>
        l.contains("Exchange ") && !l.contains("BroadcastExchange")) <= 1, plan)
      assert(!plan.contains("Window"), plan)
      assert(!plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("ShuffledHashJoin"), plan)
    } finally e0.unpersist(true)
  }

  test("sub-sharded greedy packing: fresh pack per sub-shard, budget respected") {
    import spark.implicits._
    val docs = Seq(
      // source s1, sub-shard size 3 → sub 0 = ids {0,1,2}, sub 1 = {3,4,5}
      ("s1", 0L, 100L), ("s1", 1L, 100L), ("s1", 2L, 100L),
      ("s1", 3L, 50L), ("s1", 4L, 100L), ("s1", 5L, 50L)
    ).toDF("source", "doc_id", "tok")
    val got = Corpus.greedyPack(spark, docs, 256L, Some(3L))
      .collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(4), r.getLong(5)))
      .sortBy(_._2)
    assert(got.toSeq == Seq(
      // sub 0: 100+100 fits pack 0; third 100 overflows → pack 1
      (0L, 0L, 0L, 100L), (0L, 1L, 0L, 200L), (0L, 2L, 1L, 100L),
      // sub 1 starts FRESH at pack 0 even though sub 0's last pack had
      // room for doc 3 — the documented boundary-spill cost of parallelism
      (1L, 3L, 0L, 50L), (1L, 4L, 0L, 150L), (1L, 5L, 0L, 200L)))
  }

  test("sub-sharded packing matches the unsalted packer per sub-shard") {
    Engine.prepare(spark, sf)
    val docs = spark.table("documents")
      .selectExpr("source", "doc_id",
        "CAST(size(split(text, ' ')) AS BIGINT) AS tok")
    val S = 50L
    val salted = Corpus.greedyPack(spark, docs, 256L, Some(S))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)) ->
        (r.getLong(4), r.getLong(5))).toMap
    // reference: the unsalted packer over docs re-keyed to (source#sub)
    // must produce the identical (pack_id, fill) per doc
    val rekeyed = docs.withColumn("source",
      concat_ws("#", col("source"), (col("doc_id") / S).cast("long")))
    val plain = Corpus.greedyPack(spark, rekeyed, 256L)
      .collect()
      .map { r =>
        val Array(src, sub) = r.getString(0).split("#")
        (src, sub.toLong, r.getLong(2)) -> (r.getLong(4), r.getLong(5))
      }.toMap
    assert(salted == plain)
    assert(salted.nonEmpty)
  }

  test("greedy packing invariants hold on pseudo-random corpora (both variants)") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val docs = (0 until 500).map { i =>
      (s"s${rnd.nextInt(5)}", i.toLong, (1 + rnd.nextInt(400)).toLong)
    }.toDF("source", "doc_id", "tok")
    val budget = 256L
    Seq(None, Some(64L)).foreach { sub =>
      val rows = Corpus.greedyPack(spark, docs, budget, sub)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5)))
      assert(rows.length == 500, s"every doc packed exactly once (sub=$sub)")
      rows.groupBy(r => (r._1, r._2)).foreach { case (shardKey, shard) =>
        val inOrder = shard.sortBy(_._3) // doc_id order within the shard
        var prevPack = -1L
        var prevFill = 0L
        inOrder.foreach { case (_, _, id, tok, pack, fill) =>
          val ctx = s"sub=$sub shard=$shardKey doc=$id"
          if (prevPack == -1L) assert(pack == 0L, s"$ctx: shard starts at pack 0")
          assert(pack == math.max(prevPack, 0L) || pack == prevPack + 1, ctx)
          if (pack == prevPack) // same pack: fill accumulates, stays in budget
            assert(fill == prevFill + tok && fill <= budget, ctx)
          else { // fresh pack: first doc alone; oversized docs sit alone over budget
            assert(fill == tok, ctx)
            assert(fill <= budget || tok > budget, ctx)
          }
          // greedy = never break a pack the doc would still fit in
          if (pack == prevPack + 1 && prevPack >= 0)
            assert(prevFill + tok > budget, s"$ctx: premature pack break")
          prevPack = pack; prevFill = fill
        }
      }
    }
  }

  test("LSH sketch bits are parameterized and bucket-bounded") {
    Engine.prepare(spark, sf)
    Seq(6, 12).foreach { bits =>
      val sk = Corpus.lshSketch(spark, bits)
        .agg(max("b1"), max("b2"), min("b1"), min("b2")).collect()(0)
      assert(sk.getLong(0) < (1L << bits) && sk.getLong(1) < (1L << bits))
      assert(sk.getLong(2) >= 0L && sk.getLong(3) >= 0L)
    }
    // more bits → strictly finer buckets on the same corpus
    val c6 = Corpus.lshSketch(spark, 6).select("b1").distinct().count()
    val c12 = Corpus.lshSketch(spark, 12).select("b1").distinct().count()
    assert(c12 >= c6)
  }

  test("k-means|| init spreads seeds across blobs where take-first-k cannot") {
    import spark.implicits._
    // 4 tight, well-separated blobs in dim 8 — but the first 8 vec_ids
    // ALL sit in blob 0, so the contract's take-first-k init starts
    // degenerate; k-means|| cost-weighted sampling must reach every blob
    val vecs = (0 until 120).map { i =>
      val blob = if (i < 8) 0 else i % 4
      val base = Array.fill(8)(0.01f * ((i * 13) % 7))
      base(blob * 2) += 20f
      (i.toLong, base.toSeq)
    }.toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    Engine.prepare(spark, sf) // registers dot_product before the override
    vecs.createOrReplaceTempView("embeddings")
    try {
      val seeds = Corpus.kmeansParallelInit(spark, spark.table("embeddings"),
        k = 4, rounds = 4, l = 8.0)
      assert(seeds.length == 4)
      // a seed's blob = the axis pair carrying its dominant mass
      val blobs = seeds.map(c => c.zipWithIndex.maxBy(_._1)._2 / 2).toSet
      assert(blobs.size == 4, s"seeds must cover all 4 blobs, got $blobs")
      // determinism: the md5 coin makes reruns bit-identical
      val again = Corpus.kmeansParallelInit(spark, spark.table("embeddings"),
        k = 4, rounds = 4, l = 8.0)
      assert(seeds.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
    } finally Engine.registerTables(spark, sf)
  }

  test("multiprobe LSH dominates single-probe: per-rank similarity never drops") {
    Engine.prepare(spark, sf)
    def byRank(name: String): Map[(Long, Long), Double] =
      SparkEntry.queries(name)(spark, sf).collect()
        .map(r => (r.getLong(0), r.getLong(3)) -> r.getDouble(2)).toMap
    val single = byRank("q102_ann_lsh")
    val multi = byRank("q105_ann_lsh_multiprobe")
    // the multiprobe probe set is a superset of the single-probe set, so
    // its candidate pool per query is a superset → the rank-i similarity
    // is monotonically ≥ the single-probe one
    single.foreach { case ((qid, rn), cos) =>
      multi.get((qid, rn)).foreach { m =>
        assert(m >= cos, s"qid=$qid rank=$rn: multiprobe $m < single $cos")
      }
    }
    assert(multi.nonEmpty && single.nonEmpty)
  }

  test("passage dedup removes only repeated passages and reassembles order") {
    import spark.implicits._
    val words16a = (1 to 16).map(i => s"w$i").mkString(" ") // shared passage
    val uniqueB = (1 to 16).map(i => s"x$i").mkString(" ")
    val uniqueC = (1 to 16).map(i => s"y$i").mkString(" ")
    val docs = Seq(
      (1L, s"$words16a $uniqueB", "en", "s1", 1L), // first occurrence kept
      (2L, s"$words16a $uniqueC", "en", "s1", 1L) //  repeat removed
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    Engine.prepare(spark, sf)
    docs.createOrReplaceTempView("documents")
    try {
      val got = entry("q101_passage_dedup")(spark, sf)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      assert(got.length == 2)
      val (d1, d2) = (got(0), got(1))
      assert(d1 == (1L, 2L, 0L, md5hex(s"$words16a $uniqueB")))
      assert(d2 == (2L, 2L, 1L, md5hex(uniqueC)), "doc 2 keeps only its unique passage")
    } finally Engine.registerTables(spark, sf)
  }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
}
