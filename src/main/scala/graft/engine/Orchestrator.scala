package graft.engine

import org.apache.hadoop.fs.{FileSystem, FileUtil, Path}
import org.apache.spark.sql.SparkSession

/** O1–O5 — the control plane (SURVEY §2.5), deliberately thin: ordered Scala
  * steps with failure short-circuit, a retry policy knob, and the file
  * lifecycle used by the customer-dim load. No Spark involvement beyond the
  * Hadoop FS API — orchestration must not serialize into tasks.
  */
object Orchestrator {

  /** Uniform activity policy in the reference: `timeout: "0.12:00:00",
    * retry: 0, retryIntervalInSeconds: 30` (`pipeline/New_LoadCustomerDim
    * .json:9-15`). retries=0 ⇒ single attempt, matching the reference.
    */
  final case class RetryPolicy(retries: Int = 0, intervalMs: Long = 30000L)

  final case class Step(name: String, policy: RetryPolicy = RetryPolicy())(val run: () => Unit)

  final case class StepResult(name: String, succeeded: Boolean, attempts: Int,
                              error: Option[Throwable])

  /** O1/O2 — run steps sequentially, each gated on the predecessor's
    * `Succeeded` (the reference's `dependsOn` edges,
    * `pipeline/New_FinalAirBnBPipeline.json:23-31`). Returns per-step results;
    * stops at the first failure.
    */
  def runPipeline(name: String, steps: Seq[Step]): Seq[StepResult] = {
    val out = Seq.newBuilder[StepResult]
    var failed = false
    steps.foreach { s =>
      if (!failed) {
        var attempt = 0
        var err: Option[Throwable] = None
        var ok = false
        while (!ok && attempt <= s.policy.retries) {
          attempt += 1
          try { s.run(); ok = true; err = None }
          catch {
            case t: Throwable =>
              err = Some(t)
              if (attempt <= s.policy.retries) Thread.sleep(s.policy.intervalMs)
          }
        }
        if (!ok) failed = true
        out += StepResult(s.name, ok, attempt, err)
      }
    }
    out.result()
  }

  /** S4 — GetMetadata childItems: enumerate files in a landing folder
    * (reference `pipeline/New_LoadCustomerDim.json:5-33`). Driver-side by
    * design — it feeds orchestration, not a DataFrame.
    */
  def listFiles(spark: SparkSession, dir: String, suffix: String = ""): Seq[String] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq.filter(_.isFile).map(_.getPath.toString)
      .filter(_.endsWith(suffix)).sorted
  }

  /** K3 — archive copy: the reference copies the processed file unchanged to
    * the archive folder (`pipeline/New_LoadCustomerDim.json:152-171`), so this
    * is a byte-level FS copy, not a re-serialization.
    */
  def archiveFile(spark: SparkSession, file: String, archiveDir: String): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val src = new Path(file)
    val fs = src.getFileSystem(conf)
    val dstDir = new Path(archiveDir)
    if (!fs.exists(dstDir)) fs.mkdirs(dstDir)
    val dst = new Path(dstDir, src.getName)
    FileUtil.copy(fs, src, fs, dst, false, true, conf)
  }

  /** K4 — delete the source file after a successful archive
    * (`pipeline/New_LoadCustomerDim.json:186-221`).
    */
  def deleteFile(spark: SparkSession, file: String): Boolean = {
    val p = new Path(file)
    val fs: FileSystem = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(p, false)
  }
}
