package graft.examples
import graft.operators._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object PerfProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val docs = spark.read.parquet(s"$d/documents.parquet")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"PROBE $name%-28s rows=$n%9d  ${(System.nanoTime()-t0)/1e9}%8.2f s")
    }
    time("explodedShingles")(Dedup.explodedShingles(docs, "doc_id", "text", 3).count())
    time("jaccardPairs")(Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.5).count())
    // prefix-filtered AllPairs — the third exact-pair mitigation next to
    // the df cap and minhash banding; its slope on a df-scaled corpus is
    // the number SCALING.md's mitigation table cites
    time("jaccardPairsPrefix")(Dedup.jaccardPairsPrefix(docs, "doc_id", "text", 3, 0.5).count())
    time("minhashPairs")(Dedup.minhashPairs(docs, "doc_id", "text", 3, 0.5).count())
    // banding recall vs exact, with the missed pairs' similarity range —
    // misses should hug tau (the 8×4 S-curve's soft edge), never sit high
    locally {
      val ex = Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.5)
      val mh = Dedup.minhashPairs(docs, "doc_id", "text", 3, 0.5)
      val missed = ex.join(mh.select("id_a", "id_b"), Seq("id_a", "id_b"), "left_anti")
        .agg(count(lit(1)), min("jaccard"), max("jaccard")).head()
      println(s"PROBE banding-missed n=${missed.getLong(0)} " +
        s"simRange=[${missed.get(1)}, ${missed.get(2)}]")
      // forensics: do the missed pairs share a band (candidate-stage bug)
      // or genuinely collide in no band (S-curve miss)?
      val missedPairs = ex.join(mh.select("id_a", "id_b"), Seq("id_a", "id_b"), "left_anti")
        .select("id_a", "id_b", "jaccard").limit(5).collect()
      val bands = Dedup.bandIndex(docs, "doc_id", "text", 3)
      missedPairs.foreach { r =>
        val (a, b) = (r.getLong(0), r.getLong(1))
        val shared = bands.as("x").join(bands.as("y"),
          col("x.band_idx") === col("y.band_idx") &&
            col("x.band_val") === col("y.band_val") &&
            col("x.id") === a && col("y.id") === b).count()
        println(s"PROBE missed pair ($a,$b) J=${r.getDouble(2)} sharedBands=$shared")
      }
      // the recall knob, measured: 16×2 banding's collision probability at
      // the missed pairs' J range is ~1 — recall should close to 100%
      time("minhashPairs 16x2")(Dedup.minhashPairs(docs, "doc_id", "text", 3, 0.5,
        bands = 16, rowsPerBand = 2).count())
    }
    // SemDeDup cell-count knob: in-cell pair mass ∝ Σ C(cell,2), so holding
    // nlist fixed while the corpus grows 10× grows in-cell pairs ~100×/cell
    // count. "Raise nlist with the corpus" is the documented advice — these
    // two lines make it a measured number at whatever scale `args(0)` is.
    locally {
      val emb = spark.read.parquet(s"$d/embeddings.parquet")
      time("semDedup nlist=16")(
        Similarity.semDedup(emb, "vec_id", "embedding", nlist = 16, tau = 0.9).count())
      time("semDedup nlist=64")(
        Similarity.semDedup(emb, "vec_id", "embedding", nlist = 64, tau = 0.9).count())
    }
    time("minhash bands")(Dedup.withBands(Dedup.withMinHashes(
      docs.select("doc_id","text"), "doc_id", "text", 3, 32), 8, 4).count())
    time("lshCandidates")(Dedup.lshCandidates(docs, "doc_id", "text").count())
    time("minhashDedup")(Dedup.minhashDedup(docs, "doc_id", "text", tau = 0.5).count())
    // Unicode-workload split (r10→r11): the ASCII-era normalizer mapped
    // every non-ASCII doc to "" (zero shingles — absent from the whole
    // minhash pipeline); the Unicode tokenizer makes them real
    // participants. These counts separate "the kernel got slower" from
    // "the corpus got bigger" for q_minhash_dedup's 0.9→1.5 s move.
    val ascii = docs.filter(!col("text").rlike("[^\\x00-\\x7F]"))
    time("docs ascii-only")(ascii.count())
    time("docs total")(docs.count())
    time("shingles ascii-only")(Dedup.explodedShingles(ascii, "doc_id", "text", 3).count())
    time("minhashDedup ascii-only")(Dedup.minhashDedup(ascii, "doc_id", "text", tau = 0.5).count())
    time("minhashDedup full (again)")(Dedup.minhashDedup(docs, "doc_id", "text", tau = 0.5).count())
    // Kernel A/B, in-JVM (no Spark): the r9 ASCII-era fold vs the r10
    // codepoint fold over the real shingle strings — isolates "the kernel
    // got slower" from every plan/infra effect.
    locally {
      val sh = Dedup.explodedShingles(docs, "doc_id", "text", 3)
        .select("s").collect().map(_.getString(0))
      def utf16Fold(s: String): Long = { // r9 kernel, verbatim semantics
        var h = 0L; var i = 0
        while (i < s.length) { h = (h * 31 + s.charAt(i)) % 1000000007L; i += 1 }
        h
      }
      def cpFold(s: String): Long = { // r10 kernel (codepoint)
        var h = 0L; var i = 0
        while (i < s.length) {
          val cp = s.codePointAt(i); h = (h * 31 + cp) % 1000000007L
          i += Character.charCount(cp)
        }
        h
      }
      def bench(name: String)(f: String => Long): Unit = {
        var sink = 0L
        val t0 = System.nanoTime()
        var r = 0
        while (r < 10) { var i = 0; while (i < sh.length) { sink += f(sh(i)); i += 1 }; r += 1 }
        println(f"PROBE kern $name%-22s 10x${sh.length} strs ${(System.nanoTime()-t0)/1e9}%8.3f s (sink=$sink)")
      }
      bench("warmup-cp")(cpFold); bench("warmup-16")(utf16Fold)
      bench("polyHash utf16 (r9)")(utf16Fold)
      bench("polyHash codepoint (r10)")(cpFold)
    }
    spark.stop()
  }
}
