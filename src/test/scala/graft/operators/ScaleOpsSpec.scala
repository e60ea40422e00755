package graft.operators

import graft.SparkSpec
import graft.engine.KeyedTable
import org.apache.spark.sql.functions._

class ScaleOpsSpec extends SparkSpec {

  test("saltedAggregate equals plain groupBy aggregate") {
    val s = spark
    import s.implicits._
    // 90% of rows share one hot key
    val df = ((1 to 900).map(_ => ("hot", 1.0)) ++ (1 to 100).map(i => (s"k${i % 7}", 2.0)))
      .toDF("k", "v")
    val plain = df.groupBy("k").agg(count(lit(1)).as("n"),
        sum($"v".cast("decimal(18,2)")).cast("double").as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val salted = SkewOps.saltedAggregate(df, Seq("k"), 8,
        partial = Seq(count(lit(1)).as("n"), sum($"v".cast("decimal(18,2)")).as("s")),
        fin = Seq(sum($"n").as("n"), sum($"s").cast("double").as("s")))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(salted == plain)
  }

  test("saltedJoin equals plain inner join") {
    val s = spark
    import s.implicits._
    val left = ((1 to 500).map(_ => ("hot", "L")) ++ Seq(("a", "L"), ("b", "L"))).toDF("k", "lv")
    val right = Seq(("hot", 1), ("a", 2), ("z", 3)).toDF("k", "rv")
    val plain = left.join(right, Seq("k")).groupBy("k").count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val salted = SkewOps.saltedJoin(left, right, "k", 8).groupBy("k").count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(salted == plain)
    assert(salted.contains(("hot", 500L)))
  }

  test("ivfTopK: high recall on clustered data, bounded candidates") {
    val s = spark
    import s.implicits._
    def vec(cluster: Int, i: Int): Seq[Float] =
      (0 until 16).map { d =>
        math.sin(cluster * 17.0 + d).toFloat * 2f + (((i * 31 + d * 7) % 13) - 6) * 0.01f
      }
    val rows = for (c <- 0 until 4; i <- 0 until 12) yield (c * 12L + i, vec(c, i))
    val emb = rows.toDF("vec_id", "embedding")
    val queries = emb.filter(col("vec_id") % 12 === 0)
    val exact = Similarity.cosineTopK(emb, queries, "vec_id", "embedding", k = 3)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val ivf = Similarity.ivfTopK(emb, queries, "vec_id", "embedding",
        k = 3, nlist = 4, nprobe = 2, iters = 3)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val recall = (exact & ivf).size.toDouble / exact.size
    assert(recall >= 0.9, s"IVF recall $recall: exact=$exact ivf=$ivf")

    // build-once / search-many: a reused index answers repeated query
    // batches identically to the one-shot path, without retraining
    val idx = Similarity.ivfBuild(emb, "vec_id", "embedding", nlist = 4, iters = 3)
    idx.assigned.persist()
    val viaIndex = Similarity.ivfSearch(idx, queries, "vec_id", "embedding", k = 3, nprobe = 2)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    assert(viaIndex == ivf)
    val otherQueries = emb.filter(col("vec_id") % 12 === 1)
    val second = Similarity.ivfSearch(idx, otherQueries, "vec_id", "embedding", k = 2, nprobe = 2)
    assert(second.count() == otherQueries.count() * 2)
    idx.assigned.unpersist()
  }

  test("IVF index round-trips through storage with cell-partitioned layout") {
    val s = spark
    import s.implicits._
    def vec(cluster: Int, i: Int): Seq[Float] =
      (0 until 16).map { d =>
        math.sin(cluster * 17.0 + d).toFloat * 2f + (((i * 31 + d * 7) % 13) - 6) * 0.01f
      }
    val rows = for (c <- 0 until 4; i <- 0 until 12) yield (c * 12L + i, vec(c, i))
    val emb = rows.toDF("vec_id", "embedding")
    val queries = emb.filter(col("vec_id") % 12 === 0)
    val idx = Similarity.ivfBuild(emb, "vec_id", "embedding", nlist = 4, iters = 3)
    val root = tmpDir("graft-ivfrt")
    Similarity.ivfWrite(idx, root)
    // the persisted layout is one directory per cell — the unit dynamic
    // partition pruning skips at probe time
    val cellDirs = new java.io.File(s"$root/assigned").listFiles()
      .filter(_.getName.startsWith("cell=")).map(_.getName).sorted
    assert(cellDirs.nonEmpty && cellDirs.forall(_.matches("cell=\\d+")))
    // searches against the reopened index are identical to the in-memory one
    val live = Similarity.ivfSearch(idx, queries, "vec_id", "embedding", k = 3, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val stored = Similarity.ivfSearch(Similarity.ivfRead(spark, root), queries,
        "vec_id", "embedding", k = 3, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(stored == live)
  }

  test("IVF/IVF+PQ stored-index append: grown index searchable, growth tracked") {
    val s = spark
    import s.implicits._
    def vec(cluster: Int, i: Int): Seq[Float] =
      (0 until 16).map { d =>
        math.sin(cluster * 17.0 + d).toFloat * 2f + (((i * 31 + d * 7) % 13) - 6) * 0.01f
      }
    val baseRows = for (c <- 0 until 4; i <- 0 until 10) yield (c * 100L + i, vec(c, i))
    val base = baseRows.toDF("vec_id", "embedding")
    // the appended batch plants an EXACT clone of each query vector under a
    // new id: it must land in the query's own nearest cell (same assignment
    // rule) and come back at rank 1 (cosine 1) from the GROWN index
    val queries = base.filter(col("vec_id") % 100 === 0)
    // i stops at 13: vec(c, ·)'s noise term is periodic in i with period 13,
    // so i = 13 would be a SECOND exact clone of vec(c, 0) and win the
    // rank-1 tie on lower id
    val batchRows = (for (c <- 0 until 4) yield (c * 100L + 50, vec(c, 0))) ++
      (for (c <- 0 until 4; i <- 10 until 13) yield (c * 100L + i, vec(c, i)))
    val batch = batchRows.toDF("vec_id", "embedding")

    val root = tmpDir("graft-ivfapp")
    Similarity.ivfWrite(Similarity.ivfBuild(base, "vec_id", "embedding",
      nlist = 4, iters = 3), root)
    Similarity.ivfAppendWrite(spark, root, batch, "vec_id", "embedding")
    val grown = Similarity.ivfRead(spark, root)
    assert(grown.assigned.count() == baseRows.size + batchRows.size)
    val growth = Similarity.indexGrowth(spark, root, "assigned")
    assert(growth == Similarity.IndexGrowth(baseRows.size, batchRows.size))
    assert(growth.shouldRetrain(0.3) && !growth.shouldRetrain(1.0))
    val top1 = Similarity.ivfSearch(grown, queries, "vec_id", "embedding",
        k = 1, nprobe = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (c <- 0 until 4)
      assert(top1(c * 100L) == c * 100L + 50, s"clone not found for cluster $c: $top1")
    // second append accumulates in the same log
    Similarity.ivfAppendWrite(spark, root,
      Seq((999L, vec(0, 3))).toDF("vec_id", "embedding"), "vec_id", "embedding")
    assert(Similarity.indexGrowth(spark, root, "assigned").appendedRows ==
      batchRows.size + 1)

    val pqRoot = tmpDir("graft-ivfpqapp")
    Similarity.ivfPqWrite(Similarity.ivfPqBuild(base, "vec_id", "embedding",
      dim = 16, nlist = 4, m = 4, k = 8, iters = 2), pqRoot)
    Similarity.ivfPqAppendWrite(spark, pqRoot, batch, "vec_id", "embedding", dim = 16)
    val pqGrown = Similarity.ivfPqRead(spark, pqRoot, dim = 16)
    assert(pqGrown.codes.count() == baseRows.size + batchRows.size)
    assert(Similarity.indexGrowth(spark, pqRoot, "codes") ==
      Similarity.IndexGrowth(baseRows.size, batchRows.size))
    val corpus = base.unionByName(batch)
    val pqTop1 = Similarity.ivfPqSearch(pqGrown, corpus, queries, "vec_id", "embedding",
        topK = 1, nprobe = 1, rerank = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (c <- 0 until 4)
      assert(pqTop1(c * 100L) == c * 100L + 50, s"PQ clone not found for cluster $c: $pqTop1")
  }

  test("IVF tolerates a zero-norm (degenerate) centroid consistently") {
    val s = spark
    import s.implicits._
    // vec_id 0 is the zero vector and seeds centroid 0 (init = first nlist
    // rows by id): training must not NaN-diverge from index assignment, and
    // the dead centroid must capture NO rows (score -Inf in both paths,
    // where 0/0 NaN previously ranked LARGEST under greatest()).
    val rows = (0L, Seq.fill(8)(0f)) +:
      (1 to 20).map(i => (i.toLong, (0 until 8).map(d => (1 + ((i + d) % 5)).toFloat)))
    val emb = rows.toDF("vec_id", "embedding")
    val idx = Similarity.ivfBuild(emb, "vec_id", "embedding", nlist = 2, iters = 2)
    val cells = idx.assigned.select("cell").distinct().collect().map(_.getInt(0)).toSet
    assert(cells == Set(1), s"expected every row in the live cell, got $cells")
    val res = Similarity.ivfSearch(idx, emb.filter($"vec_id" === 1), "vec_id", "embedding",
      k = 3, nprobe = 2)
    assert(res.count() == 3)
  }

  test("PQ index round-trips through storage (books + codes)") {
    val s = spark
    import s.implicits._
    def vec(cluster: Int, i: Int): Seq[Float] =
      (0 until 16).map { d =>
        math.sin(cluster * 17.0 + d).toFloat * 2f + (((i * 31 + d * 7) % 13) - 6) * 0.01f
      }
    val rows = for (c <- 0 until 4; i <- 0 until 12) yield (c * 12L + i, vec(c, i))
    val emb = rows.toDF("vec_id", "embedding")
    val queries = emb.filter(col("vec_id") % 12 === 0)
    val idx = Similarity.pqBuild(emb, "vec_id", "embedding", dim = 16, m = 4, k = 8, iters = 2)
    val root = tmpDir("graft-pqrt")
    Similarity.pqWrite(idx, root)
    val live = Similarity.pqSearch(idx, emb, queries, "vec_id", "embedding",
        topK = 3, rerank = 12)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val stored = Similarity.pqSearch(Similarity.pqRead(spark, root, dim = 16),
        emb, queries, "vec_id", "embedding", topK = 3, rerank = 12)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(stored == live)
  }

  test("pqTopK: recall with exact re-rank; codes bounded by m and k") {
    val s = spark
    import s.implicits._
    def vec(cluster: Int, i: Int): Seq[Float] =
      (0 until 16).map { d =>
        math.sin(cluster * 17.0 + d).toFloat * 2f + (((i * 31 + d * 7) % 13) - 6) * 0.01f
      }
    val rows = for (c <- 0 until 4; i <- 0 until 12) yield (c * 12L + i, vec(c, i))
    val emb = rows.toDF("vec_id", "embedding")
    val queries = emb.filter(col("vec_id") % 12 === 0)
    val exact = Similarity.cosineTopK(emb, queries, "vec_id", "embedding", k = 3)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val pq = Similarity.pqTopK(emb, queries, "vec_id", "embedding",
        dim = 16, topK = 3, m = 4, k = 8, iters = 2, rerank = 12)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val recall = (exact & pq).size.toDouble / exact.size
    assert(recall >= 0.75, s"PQ recall $recall: exact=$exact pq=$pq")
    // codes stay within [0, k)
    val books = Similarity.pqTrain(emb, "vec_id", "embedding", dim = 16, m = 4, k = 8, iters = 2)
    val codes = Similarity.pqEncode(emb, "vec_id", "embedding", books, dim = 16)
      .select(explode(col("codes")).as("c")).as[Int].collect()
    assert(codes.forall(c => c >= 0 && c < 8))
    assert(books.size == 4 && books.forall(_.size == 8) && books.forall(_.forall(_.length == 4)))
    // norm-invariance: a 10×-scaled duplicate of vec 1 must surface in the
    // shortlist (ADC runs over unit vectors) and re-rank with the SAME
    // cosine as its unscaled twin — an L2-shortlist over raw vectors would
    // push the large-norm copy out of reach of the exact re-rank
    val scaled = emb.union(Seq((999L, vec(0, 1).map(_ * 10f))).toDF("vec_id", "embedding"))
    val sims = Similarity.pqTopK(scaled, emb.filter(col("vec_id") === 0), "vec_id", "embedding",
        dim = 16, topK = 13, m = 4, k = 8, iters = 2, rerank = 20)
      .collect().map(r => r.getAs[Long]("neighbor_id") -> r.getAs[Double]("sim")).toMap
    assert(sims.contains(999L) && sims.contains(1L))
    assert(math.abs(sims(999L) - sims(1L)) < 1e-5)
    // tiny corpus (< k rows) trains without crashing
    val tiny = rows.take(5).toDF("vec_id", "embedding")
    val tinyBooks = Similarity.pqTrain(tiny, "vec_id", "embedding", dim = 16, m = 4, k = 8, iters = 2)
    assert(tinyBooks.forall(_.size == 5))
  }

  test("KeyedTable.vacuum drops superseded versions, keeps live buckets") {
    val s = spark
    import s.implicits._
    val root = tmpDir("vac")
    val t = KeyedTable(spark, root, Seq("id"), Some("ver"), numBuckets = 4)
    t.merge((1 to 50).map(i => (s"k$i", 1, i)).toDF("id", "ver", "v"))   // v1 all buckets
    t.merge(Seq(("k1", 2, -1)).toDF("id", "ver", "v"))                    // v2 one bucket
    t.merge(Seq(("k2", 3, -2)).toDF("id", "ver", "v"))                    // v3 one bucket
    val deleted = t.vacuum(keepVersions = 1)
    // v1 buckets are still referenced by the current manifest → v1 survives
    assert(!deleted.contains(1L))
    assert(t.current.count() == 50)
    assert(t.current.filter("id = 'k1'").collect()(0).getInt(2) == -1)

    // unbucketed: older snapshots are never referenced → dropped
    val u = KeyedTable(spark, tmpDir("vac_u"), Seq("id"), Some("ver"))
    u.merge(Seq(("a", 1, 1)).toDF("id", "ver", "v"))
    u.merge(Seq(("a", 2, 2)).toDF("id", "ver", "v"))
    u.merge(Seq(("a", 3, 3)).toDF("id", "ver", "v"))
    val del2 = u.vacuum(keepVersions = 1)
    assert(del2 == Seq(1L, 2L))
    assert(u.current.collect()(0).getInt(2) == 3)
  }

  test("jlProject: deterministic signs, basis vectors project to ±1/√k exactly") {
    val s = spark
    import s.implicits._
    // seeded sign rows are stable across calls (plan literals must agree
    // with any re-generated oracle)
    assert(Similarity.jlSigns(3, 64).toSeq == Similarity.jlSigns(3, 64).toSeq)
    // basis vector e_i projects to s_j(i)/√k exactly — signed-sum arithmetic
    val dim = 16
    val basis = (0 until dim).map { i =>
      (i.toLong, Array.tabulate(dim)(x => if (x == i) 1.0f else 0.0f).toSeq)
    }.toDF("vec_id", "embedding")
    val out = Similarity.jlProject(basis, "vec_id", "embedding", k = 4, dim = dim)
      .orderBy("vec_id").collect()
    val scale = math.sqrt(4.0)
    for (i <- 0 until dim; j <- 0 until 4) {
      val expected = Similarity.jlSigns(j, dim)(i) / scale
      assert(out(i).getDouble(1 + j) == expected, s"vec $i dim $j")
    }
  }
}
