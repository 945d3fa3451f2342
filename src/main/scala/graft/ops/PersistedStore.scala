package graft.ops

/** Shared commit protocol for the engine's persisted derived stores —
  * the near-dup candidate edge list (TextSim.ensureEdgeStore), the
  * snapshot dedup index (TextSim.ensureSnapshotStore) and the CDC
  * changelog (Relational.ensureChangelogStore). Each is a
  * derive-once / read-many parquet directory under java.io.tmpdir that
  * stands in for the production metadata location next to the corpus
  * (the testdata dir is read-only in this sandbox).
  *
  * Two contracts, both previously hand-rolled per store (r13) and since
  * the r13 review required to be cross-process safe:
  *
  * 1. VERSIONED KEY — [[dir]] hashes the dataset path TOGETHER WITH
  *    every contract constant the build depends on (banding constants,
  *    snapshot boundary, changelog derivation rules) plus an explicit
  *    version token. A semantics change therefore lands in a FRESH
  *    directory instead of silently reading a stale store from a
  *    previous build out of the persistent tmpdir.
  *
  * 2. ATOMIC PUBLISH — [[ensure]] builds into a unique sibling temp
  *    directory (same parent, so same filesystem), stamps the `_DONE`
  *    marker INSIDE it, and then atomically `rename`s it into place:
  *    the store directory and its marker appear together or not at all.
  *    A crash mid-build leaves only an unpublished `*.build.*` temp dir
  *    that no reader ever resolves; concurrent JVMs (the workflow runs
  *    sbt test, Verify and Bench processes against the same tmpdir) race
  *    the rename, the loser discards its build and waits for the
  *    winner's marker. This closes the r13 gap where two processes could
  *    both pass `!done.exists()` and the second's torn overwrite could
  *    coexist with the first's `_DONE`.
  *
  * In production the same protocol is the object-store variant: write
  * under a staging prefix, commit by publishing a manifest/marker last —
  * what table formats (Delta `_delta_log`, Iceberg metadata pointer)
  * do per commit.
  */
private[graft] object PersistedStore {

  /** Store directory under tmpdir: `graft_<name>_store_<key>`, where the
    * key is SHA-256 over every element of `contract` (dataset path,
    * constants, version token). Callers fold in ALL constants their
    * build reads — PersistedStoreSpec pins that a contract change moves
    * the directory. */
  def dir(name: String, contract: Seq[Any]): String = {
    val key = java.security.MessageDigest.getInstance("SHA-256")
      .digest(contract.mkString(":").getBytes("UTF-8"))
      .take(8).map("%02x".format(_)).mkString
    s"${System.getProperty("java.io.tmpdir")}/graft_${name}_store_$key"
  }

  /** Idempotently materialize `storeDir`: if its `_DONE` marker exists
    * the store is complete and nothing runs; otherwise `build` writes
    * into a fresh temp directory which is atomically renamed into place
    * (marker already inside). Returns `storeDir`. The JVM-local lock
    * only prevents duplicate builds between threads of one process; the
    * rename is what makes concurrent PROCESSES safe. */
  def ensure(storeDir: String)(build: String => Unit): String =
    synchronized {
      val dirF = new java.io.File(storeDir)
      val done = new java.io.File(dirF, "_DONE")
      if (!done.exists()) {
        val tmp = new java.io.File(dirF.getParentFile,
          s"${dirF.getName}.build.${java.util.UUID.randomUUID()}")
        try build(tmp.getAbsolutePath)
        catch { case t: Throwable => deleteRecursively(tmp); throw t }
        new java.io.File(tmp, "_DONE").createNewFile()
        if (!tmp.renameTo(dirF)) {
          // another process published first: discard our build, then
          // wait for its marker (it renamed before we did, so the
          // marker is either visible already or about to be — the
          // timeout guards against a foreign non-store directory
          // squatting on the path, which is a config error, not a race)
          deleteRecursively(tmp)
          val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
          while (!done.exists()) {
            if (System.nanoTime() > deadline)
              throw new IllegalStateException(
                s"persisted store $storeDir: lost the publish race but " +
                  "no _DONE marker ever appeared")
            Thread.sleep(200)
          }
        }
      }
      storeDir
    }

  private def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRecursively)
    f.delete(): Unit
  }
}
