package graft.streaming

/** Epoch-tag construction shared by the maintained-state flows (AggFlow,
  * Scd2Flow, JoinFlow, TopKFlow).
  *
  * Epoch ids restart at 0 whenever a checkpoint directory is recreated. A
  * bare `epoch-N` tag therefore has a trap: reset the checkpoint but keep
  * the state tables, and the NEW stream's first batch — different data —
  * arrives as epoch 0, matches the stale `epoch-0` tag a previous instance
  * left on the table, and is silently dropped (for the non-idempotent
  * flows, permanent loss). Prefixing the tag with a stable hash of the
  * checkpoint path scopes it to one stream instance: a new checkpoint can
  * never collide with tags the old one committed. `processBatch` callers
  * doing batch-mode replays keep the empty prefix — their epoch ids are
  * caller-controlled.
  */
private[streaming] object FlowTags {
  /** SHA-256 truncated to 64 bits, not String.hashCode: two distinct
    * checkpoint paths colliding in 32 bits (1 in 2^32 — reachable across a
    * fleet of streams) plus a matching epoch id would false-match `lastTag`
    * and silently drop a batch, the exact lost-update this prefix exists to
    * prevent. 64 bits of a cryptographic digest puts collision odds past
    * birthday range for any realistic stream count.
    */
  def prefix(checkpoint: String): String = {
    val d = java.security.MessageDigest.getInstance("SHA-256")
      .digest(checkpoint.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    "ck" + d.take(8).map(b => f"$b%02x").mkString + "-"
  }
  def tag(prefix: String, epochId: Long): String = s"${prefix}epoch-$epochId"
}
