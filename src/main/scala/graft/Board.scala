package graft

/** Prints the declared query board (SparkEntry.queries keys), one per
  * line — the source of truth for coverage-aware evidence gates:
  * scripts/bench_gate.sh and scripts/decade_check.sh compare an
  * artifact's query set against this list, so a bench or decade sweep of
  * a stale (smaller) board can no longer pass silently (the r11 gap:
  * BENCH_r11_full.json covered 256 of the 285 declared queries and the
  * gate still said "pass"). Needs no SparkSession — building the queries
  * map only constructs lambdas.
  *
  * The list is framed by BOARD_BEGIN/BOARD_END sentinel lines: raw JVM
  * stdout can carry log4j/JDK warnings, and a whitespace-split of the
  * whole stream would turn any such token into a phantom "declared
  * query", flipping the coverage gates to spurious partial/fail. Parsers
  * must read only the lines between the sentinels.
  */
object Board {
  def main(args: Array[String]): Unit = {
    println("BOARD_BEGIN")
    SparkEntry.queries.keys.toSeq.sorted.foreach(println)
    println("BOARD_END")
  }
}
