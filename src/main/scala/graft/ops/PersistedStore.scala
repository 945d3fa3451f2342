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
    * the directory.
    *
    * The digest is INJECTIVE over the element sequence: each element is
    * fed as `<type-tag>` + length-prefixed `<byte-len>:<bytes>`, so two
    * distinct contracts can never collide into one key by an element
    * that itself contains the would-be separator (r14 review:
    * `Seq("a:b")` vs `Seq("a","b")` under a plain mkString(":") shared
    * a directory — i.e. a stale store silently crossing semantics) NOR
    * by differently-typed elements with the same rendering (r15 review:
    * `Seq(1)` vs `Seq("1")`, `Seq(null)` vs `Seq("null")` — a build
    * whose semantics hang on an element's TYPE, e.g. an Int threshold
    * becoming a Double, must land in a fresh directory too). */
  def dir(name: String, contract: Seq[Any]): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    contract.foreach { e =>
      val tag = (if (e == null) "null" else e.getClass.getName)
        .getBytes("UTF-8")
      md.update(s"${tag.length}:".getBytes("UTF-8"))
      md.update(tag)
      val b = String.valueOf(e).getBytes("UTF-8")
      md.update(s"${b.length}:".getBytes("UTF-8"))
      md.update(b)
    }
    val key = md.digest().take(8).map("%02x".format(_)).mkString
    s"${System.getProperty("java.io.tmpdir")}/graft_${name}_store_$key"
  }

  /** Per-storeDir lock objects: unrelated stores (edge, snapshot,
    * changelog) must not serialize behind each other's Spark builds —
    * an object-wide lock here would also let one store's lose-race wait
    * (up to 120s) stall every other store's first access (r14 review).
    * The map only ever holds one tiny Object per distinct store path
    * the process touches — bounded by the store × scale-dir product. */
  private val locks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** Idempotently materialize `storeDir`: if its `_DONE` marker exists
    * the store is complete and nothing runs; otherwise `build` writes
    * into a fresh temp directory which is atomically renamed into place
    * (marker already inside). Returns `storeDir`. The JVM-local lock is
    * STRIPED PER STORE PATH and only prevents duplicate builds of the
    * same store between threads of one process; the rename is what makes
    * concurrent PROCESSES safe. The lose-race marker-wait runs OUTSIDE
    * the lock, so a stalled foreign publisher never blocks other threads
    * — at worst a same-store thread entering during the wait runs one
    * redundant build and discards it on its own failed rename. */
  def ensure(storeDir: String)(build: String => Unit): String = {
    val dirF = new java.io.File(storeDir)
    val done = new java.io.File(dirF, "_DONE")
    if (done.exists()) return storeDir
    val lock = locks.computeIfAbsent(storeDir, _ => new Object)
    val published = lock.synchronized {
      if (done.exists()) true // built by another thread while we queued
      else {
        val tmp = new java.io.File(dirF.getParentFile,
          s"${dirF.getName}.build.${java.util.UUID.randomUUID()}")
        try build(tmp.getAbsolutePath)
        catch { case t: Throwable => deleteRecursively(tmp); throw t }
        new java.io.File(tmp, "_DONE").createNewFile()
        if (tmp.renameTo(dirF)) true
        else { deleteRecursively(tmp); false }
      }
    }
    if (!published) {
      // another PROCESS published first: our build is discarded; wait
      // for the winner's marker lock-free (it renamed before we did, so
      // the marker is either visible already or about to be — the
      // timeout guards against a foreign non-store directory squatting
      // on the path, which is a config error, not a race)
      val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
      while (!done.exists()) {
        if (System.nanoTime() > deadline)
          throw new IllegalStateException(
            s"persisted store $storeDir: lost the publish race but " +
              "no _DONE marker ever appeared")
        Thread.sleep(200)
      }
    }
    storeDir
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRecursively)
    f.delete(): Unit
  }
}
