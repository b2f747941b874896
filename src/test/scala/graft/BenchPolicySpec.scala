package graft

import org.scalatest.funsuite.AnyFunSuite

/** The rolling-baseline merge policy (r14 verdict #1) — pure-function
  * coverage for every branch: the floor may only drop, except a REPRODUCED
  * slowdown (two agreeing same-session runs, both >1.3× the floor — the
  * lowest ratio any rerun trigger fires at, so a structural GC-heavy
  * regression between 1.3× and 2× stays adoptable — neither suspect), and
  * new sections enter only from non-suspect readings. */
class BenchPolicySpec extends AnyFunSuite {

  private val clean: String => Boolean = _ => false

  test("a contended run can never raise an existing floor") {
    // the r14 driver shape: dedup_cluster_10x measured 49.12 s (rerun
    // 63.16 s — disagreeing, so NOT a reproduced regression) against a
    // 9.97 s clean floor
    val out = Bench.mergeBaseline(
      prior = Map("dedup_cluster_10x" -> 9.97),
      measured = Map("dedup_cluster_10x" -> 49.12),
      runs = Map("dedup_cluster_10x" -> Seq(49.12, 63.16)),
      suspect = clean)
    assert(out == Map("dedup_cluster_10x" -> 9.97))
  }

  test("a faster clean run lowers the floor") {
    val out = Bench.mergeBaseline(
      Map("a" -> 5.0), Map("a" -> 3.2), Map.empty, clean)
    assert(out == Map("a" -> 3.2))
  }

  test("a reproduced regression adopts the new value (no perpetual rerun)") {
    // both runs >2× the floor and within 25% of each other: a plan change
    val out = Bench.mergeBaseline(
      Map("a" -> 2.0), Map("a" -> 5.0),
      Map("a" -> Seq(5.2, 5.0)), clean)
    assert(out == Map("a" -> 5.0))
  }

  test("a reproduced GC-heavy regression between 1.3x and 2x also adopts") {
    // the gc-relative trigger reruns from 1.3x; a structural regression
    // in that band must re-baseline too or it reruns every run forever
    val out = Bench.mergeBaseline(
      Map("a" -> 10.0), Map("a" -> 14.0),
      Map("a" -> Seq(15.0, 14.0)), clean)
    assert(out == Map("a" -> 14.0))
  }

  test("a disagreeing rerun pair keeps the floor even when both are slow") {
    val out = Bench.mergeBaseline(
      Map("a" -> 2.0), Map("a" -> 5.0),
      Map("a" -> Seq(8.0, 5.0)), clean) // 8.0 > 1.25 * 5.0
    assert(out == Map("a" -> 2.0))
  }

  test("a suspect section cannot ratify a reproduced regression") {
    val out = Bench.mergeBaseline(
      Map("a" -> 2.0), Map("a" -> 5.0),
      Map("a" -> Seq(5.2, 5.0)), suspect = _ == "a")
    assert(out == Map("a" -> 2.0))
  }

  test("a new section enters the floor only from a non-suspect reading") {
    val out = Bench.mergeBaseline(
      Map.empty, Map("fresh" -> 4.0, "stormy" -> 9.0),
      Map.empty, suspect = _ == "stormy")
    assert(out == Map("fresh" -> 4.0))
  }

  test("sections absent from this run drop out of the floor") {
    val out = Bench.mergeBaseline(
      Map("renamed_away" -> 1.0, "kept" -> 2.0),
      Map("kept" -> 2.5), Map.empty, clean)
    assert(out == Map("kept" -> 2.0))
  }

  test("shouldRerun: wall-relative trigger (>2x floor and >1s over)") {
    assert(Bench.shouldRerun(5.0, Some(2.0), gcMs = 0))
    assert(!Bench.shouldRerun(3.9, Some(2.0), gcMs = 0)) // under 2x
    assert(!Bench.shouldRerun(1.9, Some(0.9), gcMs = 0)) // 2.1x but 1.0s over
    assert(!Bench.shouldRerun(5.0, None, gcMs = 0)) // no floor: nothing to compare
  }

  test("shouldRerun: gc-relative trigger fires below the 2x wall threshold") {
    // 1.5x the floor — wall-relative alone would NOT fire — but 40% of the
    // section's wall was GC: the r14 driver's memory-pressure shape
    assert(Bench.shouldRerun(15.0, Some(10.0), gcMs = 6000))
    // same wall inflation with negligible gc: no storm, no trigger
    assert(!Bench.shouldRerun(15.0, Some(10.0), gcMs = 100))
    // gc share high but absolute gc tiny (sub-second section noise)
    assert(!Bench.shouldRerun(0.5, Some(0.3), gcMs = 180))
    // gc storm but the section is AT its floor: nothing to re-measure
    assert(!Bench.shouldRerun(10.2, Some(10.0), gcMs = 6000))
  }

  test("a single slow run >2x prior without a rerun entry keeps the floor") {
    // rerunSafe=false sections have no rerun pair; their one contended
    // reading must not move the floor either
    val out = Bench.mergeBaseline(
      Map("store_build" -> 10.0), Map("store_build" -> 30.0),
      Map.empty, clean)
    assert(out == Map("store_build" -> 10.0))
  }

  test("suspectSection: CPU leg unchanged — spin >2x the run median") {
    assert(Bench.suspectSection(cpu = 150, cpuMedian = 70,
      io = 10, ioMedian = 10, ioFloor = Some(8.0)))
    assert(!Bench.suspectSection(cpu = 120, cpuMedian = 70,
      io = 10, ioMedian = 10, ioFloor = Some(8.0)))
  }

  test("suspectSection: io leg, non-uniform disk contention (>3x run median)") {
    assert(Bench.suspectSection(cpu = 70, cpuMedian = 70,
      io = 130, ioMedian = 40, ioFloor = None))
    // under the 20 ms absolute guard: a fast write can't be contention
    // that moves a multi-second section, however skewed the ratio
    assert(!Bench.suspectSection(cpu = 70, cpuMedian = 70,
      io = 15, ioMedian = 4, ioFloor = Some(3.0)))
  }

  test("suspectSection: io leg, UNIFORM disk contention (>4x rolling io floor) — the r16 blind spot") {
    // every section's io canary inflated ~equally: the median-relative
    // test sees nothing (io == ioMedian), the floor leg fires (planted
    // uniform contention measured 8-56x, BASELINE §r17)
    assert(Bench.suspectSection(cpu = 70, cpuMedian = 70,
      io = 240, ioMedian = 240, ioFloor = Some(28.0)))
    // no recorded floor (pre-r17 artifact): the leg disables, uniform
    // contention stays undetectable by io — documented residual
    assert(!Bench.suspectSection(cpu = 70, cpuMedian = 70,
      io = 240, ioMedian = 240, ioFloor = None))
    // quiet window: the r17 close run's worst observed wobble (79.4 ms
    // against a 28.3 ms median/floor — fsync variance at rest, third-
    // pass review) must NOT be suspect, or a section born under it
    // would be refused a floor forever
    assert(!Bench.suspectSection(cpu = 70, cpuMedian = 70,
      io = 79.4, ioMedian = 28.3, ioFloor = Some(28.3)))
  }

  test("suspectLegs names exactly the legs that fired (r18 verdict #2)") {
    // cpu only
    assert(Bench.suspectLegs(cpu = 150, cpuMedian = 70,
      io = 10, ioMedian = 10, ioFloor = Some(8.0)) == Seq("cpu"))
    // io median only (no floor recorded)
    assert(Bench.suspectLegs(cpu = 70, cpuMedian = 70,
      io = 130, ioMedian = 40, ioFloor = None) == Seq("io_median"))
    // io floor only (uniform contention: io == median)
    assert(Bench.suspectLegs(cpu = 70, cpuMedian = 70,
      io = 240, ioMedian = 240, ioFloor = Some(28.0)) == Seq("io_floor"))
    // both io legs + cpu — the r17 planted-contention shape
    assert(Bench.suspectLegs(cpu = 200, cpuMedian = 70,
      io = 400, ioMedian = 50, ioFloor = Some(28.0)) ==
      Seq("cpu", "io_median", "io_floor"))
    // clean
    assert(Bench.suspectLegs(cpu = 70, cpuMedian = 70,
      io = 30, ioMedian = 28, ioFloor = Some(28.0)).isEmpty)
    // the 20 ms guard gates BOTH io legs
    assert(Bench.suspectLegs(cpu = 70, cpuMedian = 70,
      io = 19, ioMedian = 4, ioFloor = Some(3.0)).isEmpty)
    // suspectSection is exactly legs.nonEmpty — the two cannot drift
    for (io <- Seq(10.0, 130.0, 240.0); cpu <- Seq(70.0, 150.0))
      assert(Bench.suspectSection(cpu, 70, io, 40, Some(28.0)) ==
        Bench.suspectLegs(cpu, 70, io, 40, Some(28.0)).nonEmpty)
  }

  test("copyDirForced + deleteDirRec round-trip a nested store dir (r18 verdict #1)") {
    import java.nio.file.{Files, Paths}
    val src = Files.createTempDirectory("graft-cp-src")
    Files.createDirectories(src.resolve("gen0/part"))
    Files.write(src.resolve("gen0/part/a.bin"), Array.fill[Byte](4096)(7))
    Files.write(src.resolve("manifest.json"), "m1".getBytes("UTF-8"))
    val dst = Files.createTempDirectory("graft-cp-dst").resolve("copy")
    Bench.copyDirForced(src, dst)
    assert(Files.readAllBytes(dst.resolve("gen0/part/a.bin")).toSeq ==
      Array.fill[Byte](4096)(7).toSeq)
    assert(new String(Files.readAllBytes(dst.resolve("manifest.json")),
      "UTF-8") == "m1")
    // mutating the copy leaves the source untouched (the rerun arena)
    Files.write(dst.resolve("manifest.json"), "m2".getBytes("UTF-8"))
    assert(new String(Files.readAllBytes(src.resolve("manifest.json")),
      "UTF-8") == "m1")
    Bench.deleteDirRec(dst)
    assert(!Files.exists(dst) && Files.exists(src.resolve("gen0/part/a.bin")))
    Bench.deleteDirRec(src)
    Bench.deleteDirRec(Paths.get(dst.getParent.toString))
  }

  test("shouldRerunAgain: bounded extra reruns under sustained contention (r19 verdict #2)") {
    // kept reading suspect AND >2x floor -> another attempt
    assert(Bench.shouldRerunAgain(kept = 26.7, floor = Some(8.08),
      keptSuspect = true, extrasSoFar = 0))
    assert(Bench.shouldRerunAgain(kept = 26.7, floor = Some(8.08),
      keptSuspect = true, extrasSoFar = 1))
    // hard bound: never more than 2 extras
    assert(!Bench.shouldRerunAgain(kept = 26.7, floor = Some(8.08),
      keptSuspect = true, extrasSoFar = 2))
    // a non-suspect kept reading is a reproduced honest regression — stays
    assert(!Bench.shouldRerunAgain(kept = 26.7, floor = Some(8.08),
      keptSuspect = false, extrasSoFar = 0))
    // within 2x floor: mild wobble never burns extra rerun time
    assert(!Bench.shouldRerunAgain(kept = 12.0, floor = Some(8.08),
      keptSuspect = true, extrasSoFar = 0))
    // sub-second absolute delta guard (same as shouldRerun)
    assert(!Bench.shouldRerunAgain(kept = 0.9, floor = Some(0.3),
      keptSuspect = true, extrasSoFar = 0))
    // no floor -> no trigger
    assert(!Bench.shouldRerunAgain(kept = 26.7, floor = None,
      keptSuspect = true, extrasSoFar = 0))
  }

  test("pickStdout: first candidate under the cap; last as final resort (r19 verdict #1)") {
    val a = "x" * 2500; val b = "y" * 2000; val c = "z" * 1800
    val d = "w" * 1500
    assert(Bench.pickStdout(Seq(a, b, c, d)) == c)
    assert(Bench.pickStdout(Seq(d, c)) == d)
    // nothing fits -> the last (most degraded) candidate ships anyway
    assert(Bench.pickStdout(Seq(a, b)) == b)
    assert(Bench.pickStdout(Seq(a, b, c, d), cap = 100) == d)
  }
}
