package graft

import org.apache.spark.sql.SparkSession

/** Dev-side store-build probe (not part of the driver contract, not CI):
  * measures the ONE-TIME derivation cost of the three persisted derived
  * stores — the near-dup candidate edge list (TextSim.ensureEdgeStore),
  * the snapshot dedup index (TextSim.ensureSnapshotStore) and the CDC
  * changelog (Relational.ensureChangelogStore) — for a dataset dir.
  *
  * The bench legitimately reads these stores WARM (production indexes a
  * corpus once at curation time and every consumer reads the index), so
  * the build wall-clock appears in no per-query bench number; this main
  * is where the amortization claim gets its figure (results → SCALE.md).
  * Any pre-existing store is wiped first so the probe always measures a
  * cold build.
  *
  * Run: `sbt "runMain graft.StoreBuild [sfDir]"` or the compiled classes
  * directly (scripts/bench.sh's JVM flags). Prints one JSON line:
  * `{"metric":"store_build","sf_dir":...,"edge":s,"snapshot":s,
  * "changelog":s,"unit":"sec"}`.
  */
object StoreBuild {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def wipe(dir: String): Unit = {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
        f.delete(): Unit
      }
      rm(new java.io.File(dir))
    }
    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }

    wipe(ops.TextSim.edgeStoreDir(d))
    wipe(ops.TextSim.snapshotStoreDir(d))
    wipe(ops.Relational.changelogStoreDir(d))
    val edge = time(ops.TextSim.ensureEdgeStore(spark, d))
    val snap = time(ops.TextSim.ensureSnapshotStore(spark, d))
    val cl = time(ops.Relational.ensureChangelogStore(spark, d))
    println(f"""{"metric":"store_build","sf_dir":"$d","edge":$edge%.2f,""" +
      f""""snapshot":$snap%.2f,"changelog":$cl%.2f,"unit":"sec"}""")
    spark.stop()
  }
}
