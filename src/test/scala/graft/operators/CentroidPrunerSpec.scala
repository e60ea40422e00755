package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Pins CentroidPruner.assign ≡ the brute-force ascending `>=` scan it
  * replaces (r12 verdict Next #2) — bit-identical cell assignment is the
  * contract that lets the pruned path ship without stored-index format
  * bumps or oracle drift. Sweeps seeded random geometries (clustered and
  * uniform), plus the degenerate shapes the scan has defined semantics for:
  * zero vectors, zero-norm centroids, duplicate (tied) centroids, and the
  * all-degenerate centroid set.
  */
class CentroidPrunerSpec extends AnyFunSuite {

  private def randVec(rng: scala.util.Random, dim: Int): Array[Float] =
    Array.fill(dim)((rng.nextDouble() * 2 - 1).toFloat)

  test("pruned assignment is bit-identical to the brute-force scan (uniform + clustered sweeps)") {
    val rng = new scala.util.Random(20260815L)
    for (trial <- 0 until 6) {
      val dim = Seq(4, 16, 64)(trial % 3)
      val m = Seq(7, 64, 300)(trial % 3)
      // clustered centroids on even trials (tight pruning bounds), uniform
      // on odd (loose bounds — pruning must stay conservative)
      val centroids: Seq[Array[Float]] =
        if (trial % 2 == 0) {
          val hubs = Seq.fill(math.max(2, m / 20))(randVec(rng, dim))
          Seq.fill(m) {
            val h = hubs(rng.nextInt(hubs.length))
            h.map(x => x + (rng.nextDouble() * 0.1 - 0.05).toFloat)
          }
        } else Seq.fill(m)(randVec(rng, dim))
      val p = Similarity.CentroidPruner(centroids)
      for (_ <- 0 until 400) {
        val v = randVec(rng, dim).toSeq
        assert(p.assign(v) == p.assignBrute(v))
      }
    }
  }

  test("tied (duplicate) centroids break toward the higher index, like the >= scan") {
    val c = Array(1f, 0f, 0f, 0f)
    // indices 1 and 3 are identical — the scan's >= keeps the LAST winner
    val p = Similarity.CentroidPruner(Seq(Array(0f, 1f, 0f, 0f), c, Array(0f, 0f, 1f, 0f), c))
    val v = Seq(0.9f, 0.1f, 0f, 0f)
    assert(p.assignBrute(v) == 3)
    assert(p.assign(v) == 3)
    // scaled twin (same direction, different norm) ties on cosine too
    val p2 = Similarity.CentroidPruner(Seq(c, c.map(_ * 2f), Array(0f, 1f, 0f, 0f)))
    assert(p2.assign(v) == p2.assignBrute(v))
  }

  test("degenerate shapes replicate the scan: zero vector, zero-norm centroids, all-degenerate") {
    val z = Array(0f, 0f, 0f, 0f)
    val a = Array(1f, 0f, 0f, 0f)
    val b = Array(0f, 1f, 0f, 0f)
    // zero VECTOR: every finite score ties at 0 → highest nonzero-norm index
    val p = Similarity.CentroidPruner(Seq(a, z, b, z))
    assert(p.assignBrute(Seq(0f, 0f, 0f, 0f)) == 2)
    assert(p.assign(Seq(0f, 0f, 0f, 0f)) == 2)
    // zero-norm CENTROID never wins over a finite score
    assert(p.assign(Seq(0f, 1f, 0f, 0f)) == 2)
    assert(p.assign(Seq(1f, 0f, 0f, 0f)) == p.assignBrute(Seq(1f, 0f, 0f, 0f)))
    // ALL centroids degenerate: the scan's >= over -Inf ends at the last index
    val pz = Similarity.CentroidPruner(Seq(z, z, z))
    assert(pz.assignBrute(Seq(1f, 0f, 0f, 0f)) == 2)
    assert(pz.assign(Seq(1f, 0f, 0f, 0f)) == 2)
  }

  test("nlist=1 and nlist=2 (the spec-fixture shapes) assign like the scan") {
    val rng = new scala.util.Random(7L)
    for (m <- Seq(1, 2, 3)) {
      val cs = Seq.fill(m)(randVec(rng, 4))
      val p = Similarity.CentroidPruner(cs)
      for (_ <- 0 until 100) {
        val v = randVec(rng, 4).toSeq
        assert(p.assign(v) == p.assignBrute(v))
      }
    }
  }
}
