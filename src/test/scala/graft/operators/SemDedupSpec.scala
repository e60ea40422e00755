package graft.operators

import graft.SparkSpec

/** Pins the SemDeDup semantics the structural driver gate cannot
  * distinguish: the keep-rule selects the LOWEST-centroid-similarity member
  * of a duplicate group (not the min id), non-duplicates and zero-norm
  * vectors survive as singletons, and pair mining stays within cells.
  */
class SemDedupSpec extends SparkSpec {
  import spark.implicits._

  // Geometry: ids 1..2 seed k-means (init = first nlist by id).
  //   id1 c  = 55° in the x-y plane — same cell as the near-dup pair, NOT a
  //            duplicate of it (cos 40° = 0.77 to a2, cos 55° = 0.57 to a1)
  //   id2 b  = z-axis — its own cell
  //   id3 a2 = 15°, id4 a1 = 0° — the duplicate pair (cos 15° = 0.966 ≥ 0.9)
  //   id5    = zero vector
  // Cell-1 centroid converges toward the mean direction (~23°), so a1 (0°)
  // has LOWER centroid similarity than a2 (15°) — the survivor must be id4,
  // where a min-id rule would keep id3.
  private def deg(d: Double) = math.toRadians(d)
  private def v(angleDeg: Double): Seq[Float] =
    Seq(math.cos(deg(angleDeg)).toFloat, math.sin(deg(angleDeg)).toFloat, 0f, 0f)

  private lazy val corpus = Seq(
    (1L, v(55)),
    (2L, Seq(0f, 0f, 1f, 0f)),
    (3L, v(15)),
    (4L, v(0)),
    (5L, Seq(0f, 0f, 0f, 0f)),
  ).toDF("vec_id", "embedding")

  test("semDedup keeps the lowest-centroid-similarity member of a dup group") {
    val out = Similarity.semDedup(corpus, "vec_id", "embedding", nlist = 2, tau = 0.9)
      .orderBy("id")
      .collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[Long]("cluster_id"), r.getAs[Long]("n_members")))
    assert(out.toSeq == Seq(
      (1L, 1L, 1L), // same cell as the pair, below tau → singleton
      (2L, 2L, 1L),
      (4L, 3L, 2L), // survivor of {3,4}: a1 is farther from the centroid
      (5L, 5L, 1L), // zero-norm: excluded from pairing, survives
    ))
  }

  test("semDedup with tau above every similarity keeps everything") {
    val out = Similarity.semDedup(corpus, "vec_id", "embedding", nlist = 2, tau = 0.999)
    assert(out.select("id").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 2L, 3L, 4L, 5L))
  }
}
