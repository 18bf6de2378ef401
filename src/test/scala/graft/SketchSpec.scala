package graft

import graft.ops.{Similarity, Sketch}
import org.apache.spark.sql.functions._

/** Sketch tier: Count-Min / HyperLogLog properties, and the SemDeDup
  * drop rule against an independent driver-side recomputation.
  */
class SketchSpec extends GraftSpec {

  val dir = "/root/testdata/sf0.001"
  def docs = Tables.t(spark, dir, "documents")
  def emb = Tables.t(spark, dir, "embeddings")
  def toks = docs.select(explode(split(lower(col("text")), " ")).as("token"))

  test("count-min: estimates are one-sided (est >= exact, every token)") {
    for (md5Mode <- Seq(false, true)) {
      val cm = Sketch.countMin(toks, "token", useMd5 = md5Mode)
      val exact = toks.groupBy("token").agg(count(lit(1)).as("exact"))
      val bad = Sketch.cmsEstimate(cm, exact.select("token"), "token")
        .join(exact, "token")
        .where(col("est") < col("exact"))
      assert(bad.count() == 0, s"CMS must never underestimate (md5=$md5Mode)")
    }
  }

  test("count-min: sketch mass per row equals the item count") {
    val n = toks.count()
    val rows = Sketch.countMin(toks, "token", depth = 4).sketch
      .groupBy("row").agg(sum("cnt").as("mass")).collect()
    assert(rows.length == 4)
    rows.foreach(r => assert(r.getLong(1) == n))
  }

  test("hll: estimate within 3 standard errors on 5000 distinct items") {
    import spark.implicits._
    val items = spark.range(5000).select(
      concat(lit("item_"), col("id")).as("token"))
    val est = Sketch.hllEstimate(Sketch.hllRegisters(items, "token"))
    // m=256 -> se ~ 6.5%; 3*se ~ 20%
    assert(math.abs(est - 5000) / 5000.0 < 0.20, s"estimate $est")
    // estimator m must agree with the register build (p=8 ⇒ m=256):
    // a smaller m sees out-of-range register ids and fails loud
    intercept[IllegalArgumentException] {
      Sketch.hllEstimate(Sketch.hllRegisters(items, "token"), m = 64)
    }
  }

  test("hll: merge of shard sketches == sketch of the union") {
    val a = spark.range(0, 3000).select(
      concat(lit("x"), col("id")).as("token"))
    val b = spark.range(2000, 6000).select(
      concat(lit("x"), col("id")).as("token"))
    val merged = Sketch.hllMerge(
      Sketch.hllRegisters(a, "token"), Sketch.hllRegisters(b, "token"))
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    val whole = Sketch.hllRegisters(a.union(b), "token")
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    assert(merged == whole)
  }

  test("hll: streaming registers across two microbatches == batch sketch") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val items = (0 until 2000).map(i => s"s$i")
    val stream = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[String]
    val sq = Sketch.hllRegisters(stream.toDF().toDF("token"), "token")
      .writeStream.format("memory").queryName("sketch_spec_hll")
      .outputMode("complete").start()
    stream.addData(items.take(1000)); sq.processAllAvailable()
    stream.addData(items.drop(1000)); sq.processAllAvailable()
    sq.stop()
    val streamed = spark.table("sketch_spec_hll")
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    val batch = Sketch.hllRegisters(items.toDF("token"), "token")
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    assert(streamed == batch)
  }

  test("cms estimate plan broadcasts the sketch side") {
    val cm = Sketch.countMin(toks, "token")
    val p = Sketch.cmsEstimate(cm, toks.limit(10), "token")
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast in:\n$p")
  }

  test("hll: md5 and xxh64 modes both estimate within tolerance") {
    val items = spark.range(5000).select(
      concat(lit("m_"), col("id")).as("token"))
    for (md5Mode <- Seq(false, true)) {
      val est = Sketch.hllEstimate(
        Sketch.hllRegisters(items, "token", useMd5 = md5Mode))
      assert(math.abs(est - 5000) / 5000.0 < 0.20,
        s"estimate $est (md5=$md5Mode)")
    }
  }

  test("semdedup matches a driver-side recomputation of the drop rule") {
    val vecs = emb.orderBy("vec_id").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    val centroids = vecs.take(16).map(_._2).toSeq
    val tau = 0.50

    def dot(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < math.min(a.length, b.length)) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    }
    def cell(v: Array[Float]): Int =
      centroids.zipWithIndex.map { case (c, i) =>
        (c.foldLeft(0.0)((s, x) => s + x.toDouble * x.toDouble) - 2.0 * dot(v, c), i)
      }.min._2
    val assigned = vecs.map { case (id, v) => (id, v, cell(v)) }
    val expectedDropped = (for {
      (ib, vb, cb) <- assigned
      if assigned.exists { case (ia, va, ca) =>
        ca == cb && ia < ib &&
          dot(va, vb) / (math.sqrt(dot(va, va)) * math.sqrt(dot(vb, vb))) >= tau
      }
    } yield ib).toSet

    val df = Similarity.semDeDup(emb, centroids, tau)
    val res = df.collect()
    assert(res.length == vecs.length, "one row per input vector")
    val gotDropped = res.filter(!_.getBoolean(2)).map(_.getLong(0)).toSet
    assert(gotDropped == expectedDropped)
    val cellOf = assigned.map { case (id, _, c) => id -> c }.toMap
    res.foreach(r => assert(cellOf(r.getLong(0)) == r.getInt(1)))
    df.unpersist()
  }

  test("bigram surprisal: hand-computed fixture, all-integer") {
    import spark.implicits._
    val docs = Seq((1L, "x y z"), (2L, "x y y"), (3L, "solo"))
      .toDF("doc_id", "text")
    // c2: (x,y)=2,(y,z)=1,(y,y)=1; c1: x=2,y=2; flog2 diffs:
    // d1 = (1-1)+(1-0) = 1 over 2 bigrams; d2 = (1-1)+(1-0) = 1; d3 = 0
    val r = graft.ops.Text.bigramSurprisal(docs, "doc_id", "text")
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2))).toMap
    assert(r == Map(1L -> (2L, 1L), 2L -> (2L, 1L), 3L -> (0L, 0L)))
  }

  test("bigram surprisal: non-negative, n_bigrams = max(tokens-1, 0)") {
    val r = graft.ops.Text.bigramSurprisal(docs, "doc_id", "text")
    assert(r.where(col("surprisal") < 0).count() == 0)
    val nb = docs.select(col("doc_id"),
        greatest(size(split(lower(col("text")), " ")) - 1, lit(0))
          .cast("long").as("expect"))
      .join(r, "doc_id").where(col("n_bigrams") =!= col("expect"))
    assert(nb.count() == 0)
  }

  test("pq codes match a driver-side recomputation; one narrow pass") {
    val vecs = emb.orderBy("vec_id").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    val centroids = vecs.take(16).map(_._2).toSeq
    def code(v: Array[Float], s: Int): Int =
      centroids.zipWithIndex.map { case (c, j) =>
        val cs = c.slice(s * 8, (s + 1) * 8)
        val c2 = cs.foldLeft(0.0)((a, x) => a + x.toDouble * x.toDouble)
        var d = 0.0; var i = 0
        while (i < 8) { d += v(s * 8 + i).toDouble * cs(i).toDouble; i += 1 }
        (c2 - 2.0 * d, j)
      }.min._2
    val expected = (for ((id, v) <- vecs; s <- 0 until 8)
      yield (id, s, code(v, s))).toSet
    val df = Similarity.pqCodes(emb, centroids)
    val got = df.collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    assert(got == expected)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"pq encode must be narrow:\n$p")
  }

  test("pq ADC search matches a driver-side recomputation") {
    val vecs = emb.orderBy("vec_id").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    val centroids = vecs.take(16).map(_._2).toSeq
    def subDist(v: Array[Float], c: Array[Float], s: Int): Double = {
      val cs = c.slice(s * 8, (s + 1) * 8)
      val c2 = cs.foldLeft(0.0)((a, x) => a + x.toDouble * x.toDouble)
      var d = 0.0; var i = 0
      while (i < 8) { d += v(s * 8 + i).toDouble * cs(i).toDouble; i += 1 }
      c2 - 2.0 * d
    }
    def code(v: Array[Float], s: Int): Int =
      centroids.zipWithIndex.map { case (c, j) => (subDist(v, c, s), j) }.min._2
    val queries = vecs.filter(_._1 < 10)
    val expected = (for ((qid, qv) <- queries) yield {
      val scored = vecs.filter(_._1 != qid).map { case (nid, nv) =>
        val score = (0 until 8).map(s =>
          math.floor(subDist(qv, centroids(code(nv, s)), s) * (1L << 20)).toLong).sum
        (score, nid)
      }.sorted.take(5)
      scored.zipWithIndex.map { case ((_, nid), i) => (qid, nid, i + 1) }
    }).flatten.toSet
    val got = graft.ops.Similarity.pqSearchTopK(
      graft.ops.Similarity.pqCodes(emb, centroids), centroids,
      emb.where(col("vec_id") < 10), 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == expected)
  }

  test("ivf-pq search matches a driver-side recomputation") {
    val vecs = emb.orderBy("vec_id").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    val cents = vecs.take(16).map(_._2).toSeq
    def d2(v: Array[Float], c: Array[Float], off: Int, n: Int): Double = {
      val cs = c.slice(off, off + n)
      val c2 = cs.foldLeft(0.0)((a, x) => a + x.toDouble * x.toDouble)
      var d = 0.0; var i = 0
      while (i < n) { d += v(off + i).toDouble * cs(i).toDouble; i += 1 }
      c2 - 2.0 * d
    }
    def coarseCell(v: Array[Float]): Int =
      cents.zipWithIndex.map { case (c, j) => (d2(v, c, 0, 64), j) }.min._2
    def code(v: Array[Float], s: Int): Int =
      cents.zipWithIndex.map { case (c, j) => (d2(v, c, s * 8, 8), j) }.min._2
    val cellOf = vecs.map { case (id, v) => id -> coarseCell(v) }.toMap
    val expected = (for ((qid, qv) <- vecs.filter(_._1 < 10)) yield {
      val probed = cents.zipWithIndex
        .map { case (c, j) => (d2(qv, c, 0, 64), j) }.sorted.take(4)
        .map(_._2).toSet
      val scored = vecs
        .filter { case (nid, _) => nid != qid && probed(cellOf(nid)) }
        .map { case (nid, nv) =>
          val score = (0 until 8).map(s =>
            math.floor(d2(qv, cents(code(nv, s)), s * 8, 8) * (1L << 20)).toLong).sum
          (score, nid)
        }.sorted.take(5)
      scored.zipWithIndex.map { case ((_, nid), i) => (qid, nid, i + 1) }
    }).flatten.toSet
    val got = Similarity.ivfPqSearchTopK(
      Similarity.ivfPqIndex(emb, cents, cents), cents, cents,
      emb.where(col("vec_id") < 10), 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == expected)
  }

  test("triangle counts: K4 plus a pendant edge, hand-computed") {
    import spark.implicits._
    // K4 on 1..4 (4 triangles, each corner in 3) + pendant edge (4,5)
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L)).toDF("ia", "ib")
    val r = graft.ops.Components.triangleCounts(edges, "ia", "ib")
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    // non-canonical input — duplicates, reversed pairs, a self-loop —
    // must yield the same counts (canonicalized inside the op)
    val messy = Seq((2L, 1L), (1L, 2L), (1L, 3L), (4L, 1L), (2L, 3L),
      (3L, 2L), (2L, 4L), (3L, 4L), (5L, 4L), (3L, 3L)).toDF("ia", "ib")
    val rm = graft.ops.Components.triangleCounts(messy, "ia", "ib")
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(rm == r)
  }

  test("hard negatives: never the anchor's label, ranked by cosine") {
    val rows = emb.collect().map(r =>
      (r.getLong(0), r.getSeq[Float](1).toArray, r.getInt(2)))
    val labelOf = rows.map(r => r._1 -> r._3).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      def dot(x: Array[Float], y: Array[Float]) = {
        var s = 0.0; var i = 0
        while (i < x.length) { s += x(i).toDouble * y(i).toDouble; i += 1 }
        s
      }
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    }
    val got = graft.ops.Similarity.hardNegatives(
      emb, emb.where(col("vec_id") < 5), 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(got.nonEmpty)
    got.foreach { case (qid, nid, _) =>
      assert(labelOf(qid) != labelOf(nid), "negative shares anchor label")
    }
    val expected = (for ((qid, qv, ql) <- rows.filter(_._1 < 5)) yield {
      rows.filter(r => r._1 != qid && r._3 != ql)
        .map(r => (-cos(qv, r._2), r._1)).sorted.take(3)
        .zipWithIndex.map { case ((_, nid), i) => (qid, nid, i + 1) }
    }).flatten.toSet
    assert(got.toSet == expected)
  }

  test("ivf-pq index save/load: indexed search ≡ in-memory search") {
    val cents = emb.where(col("vec_id") < 16).orderBy("vec_id")
      .collect().map(_.getSeq[Float](1).toArray).toSeq
    val queries = emb.where(col("vec_id") < 5)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val direct = canon(Similarity.ivfPqSearchTopK(
      Similarity.ivfPqIndex(emb, cents, cents), cents, cents, queries, 3))
    val tmp = java.nio.file.Files.createTempDirectory("graft_ivfpq_spec").toString
    Similarity.ivfPqSaveIndex(emb, cents, cents, tmp)
    val (codes, coarse, pq) = Similarity.ivfPqLoadIndex(spark, tmp)
    assert(coarse.map(_.toSeq) == cents.map(_.toSeq) &&
      pq.map(_.toSeq) == cents.map(_.toSeq), "codebooks round-trip exactly")
    assert(canon(Similarity.ivfPqSearchTopK(codes, coarse, pq, queries, 3))
      == direct)
  }

  test("pq tier stays inside whole-stage codegen — no silent 64KB fallback") {
    // with fallback disabled, a generated-code compile failure THROWS
    // instead of quietly interpreting the stage. The pre-round-5 column
    // forests (8×16 inlined slice+dot structs) failed here: janino
    // "Code grows beyond 64 KB" on every PQ-tier query.
    val cents = emb.where(col("vec_id") < 16).orderBy("vec_id")
      .collect().map(_.getSeq[Float](1).toArray).toSeq
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val r = Similarity.ivfPqSearchTopK(
        Similarity.ivfPqIndex(emb, cents, cents), cents, cents,
        emb.where(col("vec_id") < 3), 2).collect()
      assert(r.nonEmpty)
      assert(Similarity.pqSearchTopK(Similarity.pqCodes(emb, cents), cents,
        emb.where(col("vec_id") < 3), 2).collect().nonEmpty)
    } finally spark.conf.set("spark.sql.codegen.fallback", "true")
  }

  test("ivf-pq append: search(saved ∪ appended batch) ≡ full rebuild") {
    val cents = emb.where(col("vec_id") < 16).orderBy("vec_id")
      .collect().map(_.getSeq[Float](1).toArray).toSeq
    val queries = emb.where(col("vec_id") < 5)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val rebuilt = canon(Similarity.ivfPqSearchTopK(
      Similarity.ivfPqIndex(emb, cents, cents), cents, cents, queries, 3))
    val tmp = java.nio.file.Files.createTempDirectory("graft_ivfpq_app").toString
    Similarity.ivfPqSaveIndex(emb.where(col("vec_id") >= 40), cents, cents, tmp)
    Similarity.ivfPqAppendIndex(emb.where(col("vec_id") < 40), tmp)
    val (codes, coarse, pq) = Similarity.ivfPqLoadIndex(spark, tmp)
    assert(canon(Similarity.ivfPqSearchTopK(codes, coarse, pq, queries, 3))
      == rebuilt, "append with saved codebooks must be bit-equal to rebuild")
    // appended rows really land inside the partitioned layout (file
    // adds, not a rewrite): every cell dir present, codes row count =
    // 8 subspaces × corpus size
    assert(codes.count() == 8L * emb.count())
  }

  test("ivf-pq refine: a planted near-tie ADC cannot order is fixed by " +
    "the exact re-rank (≡ brute force)") {
    import spark.implicits._
    val vecs = emb.orderBy("vec_id").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    val cents = vecs.take(16).map(_._2).toSeq
    def dotd(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    }
    def cosd(a: Array[Float], b: Array[Float]): Double =
      dotd(a, b) / (math.sqrt(dotd(a, a)) * math.sqrt(dotd(b, b)))
    // plant two vectors ε away from vec 0's vector along ±u — close
    // enough that every sub-quantizer gives all three IDENTICAL codes
    // (ε² vs the O(1) inter-centroid spacing), so ADC sees a 3-way
    // tie it can only break by id, while the true cosine order is
    // vec0 (the query itself), then +εu, then −εu
    val base = vecs(0)._2
    val u0 = vecs(1)._2
    val u = if (dotd(base, u0) < 0) u0.map(x => -x) else u0
    val eps = 1e-3f
    val vA = base.zip(u).map { case (b, x) => b - eps * x } // id 9001
    val vB = base.zip(u).map { case (b, x) => b + eps * x } // id 9002
    assert(cosd(base, vB) > cosd(base, vA),
      "plant must make 9002 strictly closer than 9001")
    val planted = Seq((9001L, vA.toSeq, 0), (9002L, vB.toSeq, 0))
      .toDF("vec_id", "embedding", "label")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val corpus = emb.unionByName(planted)
    val queries = Seq((9000L, base.toSeq, 0))
      .toDF("vec_id", "embedding", "label")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    // the plants really are code-identical — ADC cannot tell them apart
    val pc = Similarity.pqCodes(planted, cents).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(pc.filter(_._1 == 9001L).map(c => (c._2, c._3)).toSet ==
           pc.filter(_._1 == 9002L).map(c => (c._2, c._3)).toSet)
    val cells = Similarity.ivfPqIndex(corpus, cents, cents)
    val unrefined = Similarity.ivfPqSearchTopK(cells, cents, cents,
        queries, 3).orderBy("rank").collect().map(_.getLong(1)).toList
    assert(unrefined == List(0L, 9001L, 9002L),
      s"ADC tie → id order (the wrong order for this plant): $unrefined")
    val refined = Similarity.ivfPqSearchTopKRefined(cells, cents, cents,
        queries, raw = corpus, k = 3, rerank = 10)
      .orderBy("rank").collect().map(_.getLong(1)).toList
    assert(refined == List(0L, 9002L, 9001L),
      s"exact re-rank must restore the true cosine order: $refined")
    val brute = Similarity.bruteKnn(corpus, queries, 3)
      .orderBy("rank").collect().map(_.getLong(1)).toList
    assert(refined == brute, "refined ≡ brute force on the near-tie")
  }

  test("ivf-pq refine sidecar: indexed refined search ≡ in-memory, raw " +
    "scan partition-pruned to probed cells, delete + compact respected") {
    import spark.implicits._
    val cents = emb.where(col("vec_id") < 16).orderBy("vec_id")
      .collect().map(_.getSeq[Float](1).toArray).toSeq
    val queries = emb.where(col("vec_id") < 5)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val tmp = java.nio.file.Files.createTempDirectory("graft_ivfpq_raw").toString
    // build via save + append so the raw sidecar exercises both paths
    Similarity.ivfPqSaveIndex(emb.where(col("vec_id") >= 40), cents, cents,
      tmp, keepRaw = true)
    Similarity.ivfPqAppendIndex(emb.where(col("vec_id") < 40), tmp)
    assert(spark.read.parquet(s"$tmp/raw").count() == emb.count(),
      "append must extend the raw sidecar too")
    val inMem = canon(Similarity.ivfPqSearchTopKRefined(
      Similarity.ivfPqIndex(emb, cents, cents), cents, cents, queries,
      raw = emb, k = 3, rerank = 10))
    val indexed = Similarity.ivfPqSearchTopKRefinedIndexed(
      spark, tmp, queries, 3, rerank = 10)
    val indexedRows = canon(indexed)
    assert(indexedRows == inMem, "durable refined ≡ in-memory refined")
    // the raw-vector side reads ONLY the probed cells' partitions
    val plan = indexed.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [cell"),
      s"raw scan must be partition-pruned to the probed cells:\n$plan")
    // GDPR: a deleted vector vanishes from refined results...
    val victim = indexedRows.find(_._3 == 1).get._2
    Similarity.ivfPqDeleteIndex(Seq(victim).toDF("vec_id"), tmp)
    val afterDel = canon(Similarity.ivfPqSearchTopKRefinedIndexed(
      spark, tmp, queries, 3, rerank = 10))
    assert(!afterDel.exists(_._2 == victim),
      "tombstoned vector must not surface from the refine step")
    // ...and compaction physically drops it from the raw sidecar
    Similarity.ivfPqCompactIndex(spark, tmp)
    assert(spark.read.parquet(s"$tmp/raw")
      .where(col("vec_id") === victim).count() == 0,
      "compaction must rewrite the raw sidecar as well as the codes")
    assert(canon(Similarity.ivfPqSearchTopKRefinedIndexed(
      spark, tmp, queries, 3, rerank = 10)) == afterDel)
  }

  test("rendezvous sharding: removing a shard moves only its own ids") {
    val with8 = graft.ops.Sample.rendezvousShard(docs, "doc_id", 8)
      .select(col("doc_id"), col("shard"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val with7 = graft.ops.Sample.rendezvousShard(docs, "doc_id", 7)
      .select(col("doc_id"), col("shard"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(with8.values.toSet.size > 1, "ids spread across shards")
    val moved = with8.keySet.filter(id => with8(id) != with7(id))
    val onRemoved = with8.keySet.filter(id => with8(id) == 7)
    assert(moved == onRemoved,
      "exactly the removed shard's ids reassign — everyone else's argmax is untouched")
    // no shuffle: the argmax is a pure projection
    val p = graft.ops.Sample.rendezvousShard(docs, "doc_id", 8)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"HRW must be narrow:\n$p")
    // never silently overwrite an existing column; custom names work
    val pre = graft.ops.Sample.rendezvousShard(docs, "doc_id", 8)
    intercept[IllegalArgumentException] {
      graft.ops.Sample.rendezvousShard(pre, "doc_id", 4)
    }
    val renamed = graft.ops.Sample.rendezvousShard(pre, "doc_id", 8, "shard2")
    assert(renamed.select(col("shard")).except(
      renamed.select(col("shard2"))).isEmpty,
      "same id + same shard count ⇒ same assignment under any column name")
  }

  test("semdedup pairwise join shuffles on cell — never a cross product") {
    val centroids = emb.where(col("vec_id") < 16).orderBy("vec_id")
      .collect().map(_.getSeq[Float](1).toArray).toSeq
    val df = Similarity.semDeDup(emb, centroids, 0.50)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"within-cell join must be an equi-join on cell:\n$p")
    df.unpersist()
  }

  test("hdr sketch: bucket rule on hand-computed values, zero bucket, " +
    "negative fails loud") {
    import spark.implicits._
    // k=16: v=1 → e=0,sub=0 → 0; v=2 → e=1,p=2,sub=0 → 16;
    // v=3 → e=1,sub=((3-2)*16)/2=8 → 24; v=100 → e=6,p=64,
    // sub=((100-64)*16)/64=9 → 105; v=0 → -1
    val got = Seq(1L, 2L, 3L, 100L, 0L).toDF("v")
      .select(Sketch.hdrBucket("v").as("b"))
      .collect().map(_.getLong(0)).toList
    assert(got == List(0L, 16L, 24L, 105L, -1L))
    // lower bounds invert: lb(105) = 64 + (9*64)/16 = 100 (exact here)
    val lbs = Seq(0L, 16L, 24L, 105L, -1L).toDF("bucket")
      .select(Sketch.hdrBucketLow("bucket").as("lb"))
      .collect().map(_.getLong(0)).toList
    assert(lbs == List(1L, 2L, 3L, 100L, 0L))
    intercept[Exception] {
      Seq(-1L).toDF("v").select(Sketch.hdrBucket("v")).collect()
    }
  }

  test("hdr sketch: merge of shard sketches ≡ sketch of the union") {
    val d = docs.select(graft.ops.Text.tokenCount(col("text")).as("v"))
    val a = d.where(col("v") % 2 === 0)
    val b = d.where(col("v") % 2 =!= 0)
    val merged = Sketch.hdrMerge(
        Sketch.hdrSketch(a, "v"), Sketch.hdrSketch(b, "v"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val whole = Sketch.hdrSketch(d, "v")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(merged == whole && whole.nonEmpty)
  }

  test("hdr sketch: quantile estimates within the 1/k relative-error " +
    "bound of the exact quantiles") {
    val d = docs.select(graft.ops.Text.tokenCount(col("text")).as("v"))
    val n = d.count()
    val exactVals = d.orderBy("v").collect().map(_.getLong(0))
    val qs = Seq("p50" -> 0.5, "p90" -> 0.9, "p99" -> 0.99)
    val est = Sketch.hdrQuantiles(Sketch.hdrSketch(d, "v"), qs)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((name, q) <- qs) {
      val exact = exactVals((math.ceil(q * n) - 1).toInt.max(0))
      val lb = est(name)
      assert(lb <= exact && exact <= lb + lb / 16 + 1,
        s"$name: est $lb vs exact $exact outside 1/k bound")
    }
  }
}
