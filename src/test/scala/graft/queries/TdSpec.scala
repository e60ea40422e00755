package graft.queries

import graft.SparkSpec

class TdSpec extends SparkSpec {

  test("docShingles: two live sessions keep their cached plans (no thrash)") {
    val d = "/root/testdata/sf0.001"
    val s1 = spark.newSession()
    val s2 = spark.newSession()
    val p1 = Td.docShingles(s1, d, 3)
    val p2 = Td.docShingles(s2, d, 3)
    // the old scheme evicted every OTHER session's entries inside the cache
    // thunk, so s2's first call dropped s1's plan and this re-lookup would
    // rebuild a fresh (non-eq) DataFrame; live sessions must coexist
    assert(Td.docShingles(s1, d, 3) eq p1)
    assert(Td.docShingles(s2, d, 3) eq p2)
    // and the cached plans belong to their own sessions
    assert(p1.sparkSession eq s1)
    assert(p2.sparkSession eq s2)
  }
}
