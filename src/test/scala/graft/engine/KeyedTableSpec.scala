package graft.engine

import graft.SparkSpec

class KeyedTableSpec extends SparkSpec {

  test("merge inserts new keys, updates existing, never deletes; idempotent") {
    val s = spark
    import s.implicits._
    val root = tmpDir("kt")
    val t = KeyedTable(spark, root, Seq("id"), orderCol = Some("ver"))

    t.merge(Seq(("a", 1, "A1"), ("b", 1, "B1")).toDF("id", "ver", "payload"))
    assert(t.currentVersion == 1)
    assert(t.current.count() == 2)

    // batch with one update (newer), one insert, and two versions of one key
    val batch = Seq(("b", 2, "B2"), ("c", 1, "C1"), ("c", 2, "C2")).toDF("id", "ver", "payload")
    t.merge(batch)
    val m = t.current.collect().map(r => r.getString(0) -> (r.getInt(1), r.getString(2))).toMap
    assert(m == Map("a" -> (1, "A1"), "b" -> (2, "B2"), "c" -> (2, "C2")))

    // idempotence: re-applying the same batch changes nothing but the version
    t.merge(batch)
    val m2 = t.current.collect().map(r => r.getString(0) -> (r.getInt(1), r.getString(2))).toMap
    assert(m2 == m)
    assert(t.currentVersion == 3)
  }

  test("last-arriving version wins even if older (faithful T3 semantics, SURVEY §7.5)") {
    val s = spark
    import s.implicits._
    val t = KeyedTable(spark, tmpDir("kt2"), Seq("id"), orderCol = Some("ver"))
    t.merge(Seq(("a", 5, "newest")).toDF("id", "ver", "payload"))
    t.merge(Seq(("a", 3, "older-but-later")).toDF("id", "ver", "payload"))
    val r = t.current.collect()(0)
    assert(r.getString(2) == "older-but-later") // no updated_at freshness gate
  }

  test("bucketed table: merge rewrites only touched buckets, reads via manifest") {
    val s = spark
    import s.implicits._
    val root = tmpDir("kt3")
    val t = KeyedTable(spark, root, Seq("id"), orderCol = Some("ver"), numBuckets = 8)
    t.merge((1 to 100).map(i => (s"k$i", 1, i)).toDF("id", "ver", "v"))
    assert(t.current.count() == 100)
    assert(t.current.columns.toSeq == Seq("id", "ver", "v")) // bucket col hidden
    val m1 = t.manifest
    assert(m1.values.forall(_ == 1))

    // single-key update → exactly one bucket rewritten at v2
    t.merge(Seq(("k7", 2, 700)).toDF("id", "ver", "v"))
    val m2 = t.manifest
    assert(m2.values.count(_ == 2L) == 1, s"expected 1 touched bucket, got $m2")
    assert(m2.values.count(_ == 1L) == m1.size - 1) // everything else untouched
    val v2Buckets = new java.io.File(s"$root/v=2").listFiles().count(_.getName.startsWith("__bucket="))
    assert(v2Buckets == 1) // only the touched bucket dir exists in v=2
    assert(t.current.count() == 100)
    assert(t.current.filter("id = 'k7'").collect()(0).getInt(2) == 700)

    // equivalence with an unbucketed table over the same operations
    val u = KeyedTable(spark, tmpDir("kt3u"), Seq("id"), orderCol = Some("ver"))
    u.merge((1 to 100).map(i => (s"k$i", 1, i)).toDF("id", "ver", "v"))
    u.merge(Seq(("k7", 2, 700)).toDF("id", "ver", "v"))
    val a = t.current.collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2))).toSet
    val b = u.current.collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2))).toSet
    assert(a == b)

    t.overwrite(Seq(("x", 1, 0)).toDF("id", "ver", "v"))
    assert(t.current.count() == 1)
  }

  test("property: random batches — bucketed == unbucketed, idempotent, no deletes") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(42)
    val tb = KeyedTable(spark, tmpDir("ktp_b"), Seq("id"), Some("ver"), numBuckets = 4)
    val tu = KeyedTable(spark, tmpDir("ktp_u"), Seq("id"), Some("ver"))
    var keysSeen = Set.empty[String]
    for (round <- 1 to 5) {
      val batch = (1 to 30).map { i => // ver unique within batch → deterministic latest pick
        val k = s"k${rnd.nextInt(40)}"
        (k, round * 100 + i, rnd.nextInt(1000))
      }.toDF("id", "ver", "v")
      tb.merge(batch)
      tu.merge(batch)
      keysSeen ++= batch.select("id").collect().map(_.getString(0))
      val cb = tb.current.collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2))).toSet
      val cu = tu.current.collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2))).toSet
      assert(cb == cu, s"bucketed != unbucketed at round $round")
      assert(cb.map(_._1) == keysSeen) // one row per key ever seen, none deleted
      // idempotence: re-applying the same batch changes nothing
      tb.merge(batch)
      val cb2 = tb.current.collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2))).toSet
      assert(cb2 == cb)
    }
  }

  test("compact: manifest spread resets to 1, data unchanged, vacuum reclaims") {
    val s = spark
    import s.implicits._
    val root = tmpDir("ktc")
    val t = KeyedTable(spark, root, Seq("id"), orderCol = Some("ver"), numBuckets = 8)
    t.merge((1 to 100).map(i => (s"k$i", 1, i)).toDF("id", "ver", "v"))
    t.merge(Seq(("k7", 2, 700), ("k9", 2, 900)).toDF("id", "ver", "v"))
    t.merge(Seq(("k13", 3, 1300)).toDF("id", "ver", "v"))
    assert(t.manifestSpread > 1) // merges fragmented the manifest
    val before = t.current.collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2))).toSet
    val v = t.compact()
    assert(t.currentVersion == v)
    assert(t.manifestSpread == 1)
    val after = t.current.collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2))).toSet
    assert(after == before)
    val removed = t.vacuum()
    assert(removed.nonEmpty) // pre-compaction versions reclaimed
    assert(t.current.collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2))).toSet == before)
    // merges keep working post-compaction
    t.merge(Seq(("k7", 9, 7000)).toDF("id", "ver", "v"))
    assert(t.current.filter("id = 'k7'").collect()(0).getInt(2) == 7000)
  }

  test("mergeEvolving: additive drift round-trips; type conflicts rejected") {
    val s = spark
    import s.implicits._
    val t = KeyedTable(spark, tmpDir("ktev"), Seq("id"), orderCol = Some("ver"), numBuckets = 4)
    t.merge(Seq(("a", 1, "A1"), ("b", 1, "B1")).toDF("id", "ver", "payload"))

    // batch carries a NEW column `region`: existing rows null-fill, schema grows
    t.mergeEvolving(Seq(("b", 2, "B2", "eu"), ("c", 1, "C1", "us"))
      .toDF("id", "ver", "payload", "region"))
    val m = t.current.collect()
      .map(r => r.getString(0) -> (r.getString(2), Option(r.getString(3)))).toMap
    assert(m == Map("a" -> ("A1", None), "b" -> ("B2", Some("eu")), "c" -> ("C1", Some("us"))))
    assert(t.storedSchema.get.fieldNames.toSeq == Seq("id", "ver", "payload", "region"))

    // batch OMITS `payload`: batch rows null-fill it, schema unchanged,
    // and the incremental (touched-buckets) path still applies
    t.mergeEvolving(Seq(("d", 1, "ap")).toDF("id", "ver", "region"))
    val d = t.current.filter("id = 'd'").collect()(0)
    assert(d.isNullAt(d.fieldIndex("payload")) && d.getString(d.fieldIndex("region")) == "ap")
    assert(t.current.filter("id = 'a'").collect()(0).getString(2) == "A1")

    // the batch may omit even the orderCol itself: null-filled before the
    // per-key collapse, so the contract holds for every non-key column
    t.mergeEvolving(Seq(("e", "E1", "sa")).toDF("id", "payload", "region"))
    val e = t.current.filter("id = 'e'").collect()(0)
    assert(e.isNullAt(e.fieldIndex("ver")) && e.getString(e.fieldIndex("payload")) == "E1")

    // same name, different type → loud rejection, nothing committed
    val before = t.currentVersion
    intercept[IllegalArgumentException] {
      t.mergeEvolving(Seq(("e", 1, 42L)).toDF("id", "ver", "payload"))
    }
    assert(t.currentVersion == before)

    // a drifted batch must still carry the key
    intercept[IllegalArgumentException] {
      t.mergeEvolving(Seq((9, "x")).toDF("ver", "payload"))
    }
  }

  test("commit protocol rejects a lost-update double commit (both protocols)") {
    val s = spark
    import s.implicits._
    for ((proto, name) <- Seq(
        (KeyedTable.RenameCommit, "rename"),
        (KeyedTable.ConditionalPutCommit, "condput"))) {
      val root = tmpDir(s"ktcommit-$name")
      val t = new KeyedTable(spark, root, Seq("id"), commitProtocol = proto)
      t.overwrite(Seq(("a", 1)).toDF("id", "v"))
      t.merge(Seq(("b", 2)).toDF("id", "v")) // current is now v2
      // a committer that staged its work against v1 (crash-window survivor
      // or concurrent writer) must NOT publish v2 over the winner
      val fs = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val marker = new org.apache.hadoop.fs.Path(root, KeyedTable.CurrentMarker)
      intercept[java.util.ConcurrentModificationException] {
        proto.publish(fs, marker, expectedCurrent = 1, next = 2)
      }
      // the table still reads at the winner's version
      assert(t.currentVersion == 2 && t.current.count() == 2, name)
    }
  }

  test("conditional-put commit closes the check-then-swap window rename leaves open") {
    val s = spark
    import s.implicits._
    val root = tmpDir("ktcondput-window")
    val t = new KeyedTable(spark, root, Seq("id"),
      commitProtocol = KeyedTable.ConditionalPutCommit)
    t.overwrite(Seq(("a", 1)).toDF("id", "v")) // v1, claim _COMMIT_v1 exists
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val marker = new org.apache.hadoop.fs.Path(root, KeyedTable.CurrentMarker)
    // Simulate a committer that WON the conditional put for v2 and crashed
    // before the pointer write: claim present, pointer still at v1. A
    // second committer staged at v1 passes the pointer read-check — the
    // exact window where RenameCommit would double-publish — but must lose
    // the claim create and leave the pointer untouched.
    fs.create(KeyedTable.ConditionalPutCommit.claimPath(marker, 2), false).close()
    intercept[java.util.ConcurrentModificationException] {
      KeyedTable.ConditionalPutCommit.publish(fs, marker, expectedCurrent = 1, next = 2)
    }
    assert(t.currentVersion == 1 && t.current.count() == 1)
    // same staged state through RenameCommit: the window is open and the
    // publish lands — the behavioral difference the protocols encode
    KeyedTable.RenameCommit.publish(fs, marker, expectedCurrent = 1, next = 2)
    assert(t.currentVersion == 2)
  }

  test("conditional-put table sustains a normal merge lifecycle with claim ledger") {
    val s = spark
    import s.implicits._
    val root = tmpDir("ktcondput-life")
    val t = new KeyedTable(spark, root, Seq("id"),
      commitProtocol = KeyedTable.ConditionalPutCommit)
    t.overwrite(Seq(("a", 1), ("b", 2)).toDF("id", "v"))
    t.merge(Seq(("b", 20), ("c", 3)).toDF("id", "v"))
    t.merge(Seq(("d", 4)).toDF("id", "v"))
    assert(t.currentVersion == 3)
    assert(t.current.orderBy("id").collect().map(r => (r.getString(0), r.getInt(1))).toSeq ==
      Seq(("a", 1), ("b", 20), ("c", 3), ("d", 4)))
    // one claim per published transition — the commit log
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val marker = new org.apache.hadoop.fs.Path(root, KeyedTable.CurrentMarker)
    for (v <- 1L to 3L)
      assert(fs.exists(KeyedTable.ConditionalPutCommit.claimPath(marker, v)), s"claim v$v")
    // vacuum reclaims claims alongside their version dirs, keeps the rest —
    // and NEVER touches an in-flight transition above the pointer (the
    // crash-recovery marker + its half-written data dir must survive)
    fs.create(KeyedTable.ConditionalPutCommit.claimPath(marker, 4), false).close()
    fs.mkdirs(new org.apache.hadoop.fs.Path(root, "v=4"))
    t.vacuum(keepVersions = 1)
    assert(!fs.exists(KeyedTable.ConditionalPutCommit.claimPath(marker, 1)))
    assert(!fs.exists(KeyedTable.ConditionalPutCommit.claimPath(marker, 2)))
    assert(fs.exists(KeyedTable.ConditionalPutCommit.claimPath(marker, 3)))
    assert(fs.exists(KeyedTable.ConditionalPutCommit.claimPath(marker, 4)))
    assert(fs.exists(new org.apache.hadoop.fs.Path(root, "v=4")))
    assert(t.currentVersion == 3 && t.current.count() == 4)
  }

  test("reserve claims the transition BEFORE data writes; loser aborts pre-clobber") {
    val s = spark
    import s.implicits._
    val root = tmpDir("ktreserve")
    val t = new KeyedTable(spark, root, Seq("id"),
      commitProtocol = KeyedTable.ConditionalPutCommit)
    t.overwrite(Seq(("a", 1)).toDF("id", "v")) // v1
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val marker = new org.apache.hadoop.fs.Path(root, KeyedTable.CurrentMarker)
    // Another committer (different process — its claim, not ours) has
    // reserved v2 and is mid-write: OUR reserve must throw, i.e. the table
    // flow aborts BEFORE its mode("overwrite") write could clobber v=2.
    fs.create(KeyedTable.ConditionalPutCommit.claimPath(marker, 2), false).close()
    intercept[java.util.ConcurrentModificationException] {
      t.merge(Seq(("b", 2)).toDF("id", "v"))
    }
    // nothing was published and no v=2 data dir was created by the loser
    assert(t.currentVersion == 1)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(root, "v=2")))
    // same-process retry semantics: reserve is idempotent for its holder
    fs.delete(KeyedTable.ConditionalPutCommit.claimPath(marker, 2), false)
    KeyedTable.ConditionalPutCommit.reserve(fs, marker, 1, 2)
    KeyedTable.ConditionalPutCommit.reserve(fs, marker, 1, 2) // held → no-op
    KeyedTable.ConditionalPutCommit.publish(fs, marker, 1, 2)
    assert(t.currentVersion == 2)
  }

  test("same-JVM writers with distinct owner tokens cannot share a claim") {
    val s = spark
    import s.implicits._
    // protocol-level: bare marker dir, no table data involved
    val proot = new org.apache.hadoop.fs.Path(tmpDir("ktownerp"))
    val fs = proot.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(proot)
    val marker = new org.apache.hadoop.fs.Path(proot, KeyedTable.CurrentMarker)
    // Writer A claims v0→v1 and is "mid-write". Writer B — SAME JVM, its
    // own token — races the same transition: it must lose at reserve time
    // (pre-r7 a bare held set treated B as A's retry and let both write).
    KeyedTable.ConditionalPutCommit.reserve(fs, marker, 0, 1, owner = "writer-A")
    intercept[java.util.ConcurrentModificationException] {
      KeyedTable.ConditionalPutCommit.reserve(fs, marker, 0, 1, owner = "writer-B")
    }
    // A's retry stays idempotent, and A alone publishes.
    KeyedTable.ConditionalPutCommit.reserve(fs, marker, 0, 1, owner = "writer-A")
    KeyedTable.ConditionalPutCommit.publish(fs, marker, 0, 1, owner = "writer-A")
    // B may now claim the NEXT transition (fresh, unclaimed)
    KeyedTable.ConditionalPutCommit.reserve(fs, marker, 1, 2, owner = "writer-B")
    KeyedTable.ConditionalPutCommit.publish(fs, marker, 1, 2, owner = "writer-B")
    // table-level: two INSTANCES get distinct per-instance tokens
    val root = tmpDir("ktowner")
    val t = new KeyedTable(spark, root, Seq("id"),
      commitProtocol = KeyedTable.ConditionalPutCommit)
    t.overwrite(Seq(("a", 1)).toDF("id", "v")) // v1
    val t2 = new KeyedTable(spark, root, Seq("id"),
      commitProtocol = KeyedTable.ConditionalPutCommit)
    t2.merge(Seq(("b", 2)).toDF("id", "v")) // fresh transition — proceeds
    assert(t2.currentVersion == 2 && t2.current.count() == 2)
    // ...but a transition claimed by someone else makes the instance lose
    val tmarker = new org.apache.hadoop.fs.Path(root, KeyedTable.CurrentMarker)
    fs.create(KeyedTable.ConditionalPutCommit.claimPath(tmarker, 3), false).close()
    intercept[java.util.ConcurrentModificationException] {
      t2.merge(Seq(("c", 3)).toDF("id", "v"))
    }
    assert(t2.currentVersion == 2)
  }
}
