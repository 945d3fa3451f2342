package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins scripts/bench_gate.sh's classification rule on synthetic
  * fixtures — the machine half of BASELINE.md's mover protocol (r15).
  * The rule: a query qualifies for a list only when its absolute delta
  * exceeds max(observed spreads, 0.3s floor); above that, ratio >2x is
  * a `suspect` (flips the verdict), ratio >1.3x a `mover` (the
  * round-open adjudication queue). A sub-floor wobble — any ratio —
  * lands in neither. Without this spec a refactor of the gate script
  * could silently drop the floor and the protocol's written rule and
  * its machine check would diverge.
  */
class BenchGateSpec extends AnyFunSuite {

  test("bench_gate classifies suspect / mover / below-floor by the " +
      "documented ratio+delta rule") {
    val dir = java.nio.file.Files.createTempDirectory("graft_gate_")
    def write(name: String, body: String): String = {
      val p = dir.resolve(name)
      java.nio.file.Files.writeString(p, body)
      p.toString
    }
    // prev medians: a=1.0 b=0.1 c=1.0 d=0.5 e=2.0 (+spread map empty →
    // the 0.3s FLOOR governs every band)
    val prev = write("prev.json",
      """{"queries":{"a":1.0,"b":0.1,"c":1.0,"d":0.5,"e":2.0},
        |"spread":{}}""".stripMargin)
    // cur: a 2.5x & +1.5s  -> suspect
    //      b 2.5x & +0.15s -> below floor, NEITHER (the r14 debt class)
    //      c 1.5x & +0.5s  -> mover
    //      d 1.24x & +0.12s-> under both ratios, neither
    //      e 1.5x & +1.0s but spread 1.2 -> delta under its own spread,
    //        neither (spread-aware band, not just the floor)
    val cur = write("cur.json",
      """{"queries":{"a":2.5,"b":0.25,"c":1.5,"d":0.62,"e":3.0},
        |"spread":{"e":1.2}}""".stripMargin)
    val out = new StringBuilder
    val pb = new ProcessBuilder("bash", "scripts/bench_gate.sh", cur, prev)
      .redirectErrorStream(true)
    // hermetic: skip the gate's JVM coverage probe (it spawns a second
    // java process against compiled classes with a 120s timeout — up to
    // ~2min of latency in a unit test of the classification rule, and
    // the probe's result is never asserted here)
    pb.environment().put("GATE_NO_COVERAGE", "1")
    val proc = pb.start()
    scala.io.Source.fromInputStream(proc.getInputStream)
      .getLines().foreach(l => out.append(l).append('\n'))
    assert(proc.waitFor() === 0)
    val json = out.toString.linesIterator
      .find(_.trim.startsWith("{")).getOrElse(fail(s"no JSON in: $out"))
    def names(field: String): Seq[String] =
      s""""$field":\\[(.*?)\\]""".r.findFirstMatchIn(json)
        .map(_.group(1)).toSeq
        .flatMap(""""q":"([a-z]+)"""".r.findAllMatchIn(_).map(_.group(1)))
    assert(names("suspects") === Seq("a"),
      s"suspects misclassified in: $json")
    assert(names("movers") === Seq("c"),
      s"movers misclassified in: $json")
  }
}
