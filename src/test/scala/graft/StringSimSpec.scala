package graft

import org.apache.spark.sql.functions._
import graft.ext.EntityResolution

class StringSimSpec extends SparkSpec {
  import spark.implicits._

  // golden values probed from DuckDB jaro_winkler_similarity /
  // jaro_similarity (the oracle engine) — semantic pinning, not just
  // self-consistency
  private val golden = Seq(
    ("MARTHA", "MARHTA", 0.9611111111111111),
    ("DIXON", "DICKSONX", 0.8133333333333332),   // jaro 0.7667, prefix 2
    ("DWAYNE", "DUANE", 0.8400000000000001),
    ("abc", "abc", 1.0),
    ("abc", "", 0.0),
    ("", "", 0.0),                                // both empty -> 0, not 1
    ("ab", "ba", 0.0),                            // window 0, no matches
    ("CRATE", "TRACE", 0.7333333333333334),       // boost-eligible, prefix 0
    ("aaa", "aab", 0.8222222222222222),           // boost over 0.7
    ("abcdefgh", "abcdxxxx", 0.6666666666666666), // jaro <= 0.7: NO boost
    ("abcd", "abdc", 0.9333333333333333),         // one transposition
    ("abcxxx", "bcaxxx", 0.9444444444444445),     // odd mismatches: t = 3/2 -> 1
    ("Customer#000000001", "Customer#000000010", 0.9888888888888889))

  test("jaro-winkler: matches DuckDB golden values exactly") {
    val got = golden.map { case (a, b, _) => (a, b) }.toDF("a", "b")
      .select(EntityResolution.jaroWinkler(col("a"), col("b")))
      .collect().map(_.getDouble(0))
    golden.zip(got).foreach { case ((a, b, want), g) =>
      assert(math.abs(g - want) < 1e-12, s"jw($a, $b): got $g want $want")
    }
    // symmetric
    val rev = golden.map { case (a, b, _) => (b, a) }.toDF("a", "b")
      .select(EntityResolution.jaroWinkler(col("a"), col("b")))
      .collect().map(_.getDouble(0))
    golden.zip(rev).foreach { case ((a, b, want), g) =>
      assert(math.abs(g - want) < 1e-12, s"jw($b, $a) not symmetric")
    }
  }

  test("jaro-winkler: null propagation, codegen, SQL registration") {
    val d = Seq((Some("x"), None: Option[String])).toDF("a", "b")
    assert(d.select(EntityResolution.jaroWinkler(col("a"), col("b")))
      .head().isNullAt(0))
    val plan = spark.range(4)
      .select(EntityResolution.jaroWinkler(
        col("id").cast("string"), concat(col("id").cast("string"), lit("x"))))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan) // whole-stage codegen marker
    graft.functions.GraftFunctions.registerAll(spark)
    val viaSql = spark.sql(
      "SELECT graft_jaro_winkler('MARTHA', 'MARHTA')").head().getDouble(0)
    assert(math.abs(viaSql - 0.9611111111111111) < 1e-12)
  }

  test("fuzzy join: blocked candidates only, threshold filter, block-pair guard") {
    val left = Seq((1L, "jonathan smith", "s"), (2L, "maria garcia", "g"),
      (3L, "zed", "z")).toDF("id", "name", "blk")
    val right = Seq((10L, "jonathon smith", "s"), (11L, "mario garcia", "g"),
      (12L, "completely different", "s"), (13L, "zed", "x")).toDF("id", "name", "blk")
    val got = EntityResolution.fuzzyJoin(left, "id", "name", right, "id", "name",
        col("blk"), col("blk"), threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // 3/13 "zed" pair blocked apart despite identical names; 1/12 same
    // block but below threshold
    assert(got == Set((1L, 10L), (2L, 11L)))
    // guard: a block whose cross product exceeds maxBlockPairs drops whole
    val wide = (1L to 10L).map(i => (i, s"name$i", "hot")).toDF("id", "name", "blk")
    val guarded = EntityResolution.fuzzyJoin(wide, "id", "name", wide, "id", "name",
      col("blk"), col("blk"), threshold = 0.0, maxBlockPairs = 99L)
    assert(guarded.count() == 0L)
    val kept = EntityResolution.fuzzyJoin(wide, "id", "name", wide, "id", "name",
      col("blk"), col("blk"), threshold = 0.0, maxBlockPairs = 100L)
    assert(kept.count() == 100L)
  }

  test("fuzzy dedup: equals brute-force within-block pairs") {
    val names = Seq((1L, "anna meyer"), (2L, "anna mayer"), (3L, "anna meier"),
      (4L, "bob stone"), (5L, "bob stein"), (6L, "rob stone")).toDF("id", "name")
    val blk = EntityResolution.prefixBlock(col("name"), 1)
    val got = EntityResolution.fuzzyDedup(names, "id", "name", blk, 0.85)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted
    val rows = names.collect().map(r => (r.getLong(0), r.getString(1)))
    val want = (for {
      (ia, na) <- rows; (ib, nb) <- rows
      if ia < ib && na.charAt(0) == nb.charAt(0)
      s = math.floor(graft.functions.JaroWinkler.sim(
        org.apache.spark.unsafe.types.UTF8String.fromString(na),
        org.apache.spark.unsafe.types.UTF8String.fromString(nb)) * 1e6 + 0.5) / 1e6
      if s >= 0.85
    } yield (ia, ib, s)).sorted
    assert(got.toSeq == want.toSeq)
  }

  test("fuzzy dedup: id predicate precedes the similarity in the join " +
      "condition (r19 optimization)") {
    // the cheap id_a < id_b test must sit BEFORE the Jaro-Winkler call in
    // the join condition, so half the pair space never evaluates the
    // expensive similarity; the plan's condition string is the evidence
    val names = Seq((1L, "anna meyer"), (2L, "anna mayer"),
      (4L, "bob stone"), (5L, "bob stein")).toDF("id", "name")
    val blk = EntityResolution.prefixBlock(col("name"), 1)
    val plan = EntityResolution.fuzzyDedup(names, "id", "name", blk, 0.85)
      .queryExecution.executedPlan.toString
    // the join-condition line is the one holding BOTH the id comparison
    // and the similarity call (the Project above it has no " < ")
    val cond = plan.linesIterator
      .find(l => l.contains("graft_jaro_winkler") && l.contains(" < "))
      .getOrElse(fail(s"no combined join condition in plan:\n$plan"))
    // anchor the match to the id columns (r19 ADVICE: a bare " < " can
    // hit an unrelated token in the condition line)
    val idCmp = """left_id#\S+ < right_id#\S+""".r
    val m = idCmp.findFirstMatchIn(cond)
      .getOrElse(fail(s"no left_id < right_id comparison in: $cond"))
    assert(m.start < cond.indexOf("graft_jaro_winkler"),
      s"id comparison must precede jaro_winkler in: $cond")
  }
}
