package graft

import org.apache.spark.sql.functions._
import graft.ext.AsOfJoin

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  // left: (key, ts, label) / right: (key, ts, value)
  private val left = Seq(
    ("a", 10L, "l1"), ("a", 20L, "l2"), ("a", 5L, "l3"),
    ("b", 10L, "l4"), ("c", 10L, "l5")).toDF("k", "ts", "label")
  private val right = Seq(
    ("a", 8L, 1.0), ("a", 10L, 2.0), ("a", 15L, 3.0),
    ("b", 30L, 4.0)).toDF("k", "ts", "v")

  private def run(direction: String, tol: Option[Long] = None) =
    AsOfJoin.asOfJoin(left, right, Seq("k"), "ts", "ts", Seq("v"),
        direction = direction, tolerance = tol)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2),
        Option(r.get(3)).map(_.asInstanceOf[Long]),
        Option(r.get(4)).map(_.asInstanceOf[Double]))).sortBy(x => (x._1, x._2))

  test("backward: greatest right ts <= left ts, inclusive; unmatched -> nulls") {
    assert(run("backward").toSeq == Seq(
      ("a", 5L, "l3", None, None),              // nothing at or before 5
      ("a", 10L, "l1", Some(10L), Some(2.0)),   // inclusive: 10 beats 8
      ("a", 20L, "l2", Some(15L), Some(3.0)),
      ("b", 10L, "l4", None, None),             // right exists only later
      ("c", 10L, "l5", None, None)))            // key absent on the right
  }

  test("forward: least right ts >= left ts, inclusive") {
    assert(run("forward").toSeq == Seq(
      ("a", 5L, "l3", Some(8L), Some(1.0)),
      ("a", 10L, "l1", Some(10L), Some(2.0)),
      ("a", 20L, "l2", None, None),
      ("b", 10L, "l4", Some(30L), Some(4.0)),
      ("c", 10L, "l5", None, None)))
  }

  test("tolerance: matches farther than the bound resolve to null") {
    assert(run("backward", tol = Some(3L)).toSeq == Seq(
      ("a", 5L, "l3", None, None),
      ("a", 10L, "l1", Some(10L), Some(2.0)),
      ("a", 20L, "l2", None, None),             // gap 5 > 3
      ("b", 10L, "l4", None, None),
      ("c", 10L, "l5", None, None)))
    assert(run("forward", tol = Some(3L)).toSeq == Seq(
      ("a", 5L, "l3", Some(8L), Some(1.0)),
      ("a", 10L, "l1", Some(10L), Some(2.0)),
      ("a", 20L, "l2", None, None),
      ("b", 10L, "l4", None, None),             // gap 20 > 3
      ("c", 10L, "l5", None, None)))
  }

  test("null timestamps: right nulls excluded, left nulls never match in either direction") {
    val l = Seq(("a", Some(10L)), ("a", None)).toDF("k", "ts")
    val r = Seq(("a", Some(5L), 1.0), ("a", None, 9.0)).toDF("k", "ts", "v")
    for (dir <- Seq("backward", "forward")) {
      val got = AsOfJoin.asOfJoin(l, r, Seq("k"), "ts", "ts", Seq("v"),
          direction = dir)
        .collect().map(x => (Option(x.getAs[Any]("ts")),
          Option(x.getAs[Any]("asof_ts")))).toSet
      val expected = dir match {
        case "backward" => Set((Some(10L), Some(5L)), (None, None))
        case _          => Set((Some(10L), None), (None, None))
      }
      assert(got.map { case (a, b) =>
        (a.map(_.asInstanceOf[Long]), b.map(_.asInstanceOf[Long])) } == expected, dir)
    }
  }

  test("matches a brute-force reference on random data") {
    val rnd = new scala.util.Random(7)
    val lRows = (1 to 300).map(i =>
      (s"k${rnd.nextInt(5)}", rnd.nextInt(1000).toLong, s"l$i"))
    val rRows = (1 to 200).map(i =>
      (s"k${rnd.nextInt(6)}", rnd.nextInt(1000).toLong, i.toDouble))
    // de-dup right (key, ts) — ties there are documented as undefined
    val rDistinct = rRows.groupBy(r => (r._1, r._2)).map(_._2.head).toSeq
    val got = AsOfJoin.asOfJoin(lRows.toDF("k", "ts", "label"),
        rDistinct.toDF("k", "ts", "v"), Seq("k"), "ts", "ts", Seq("v"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2),
        Option(r.get(4)).map(_.asInstanceOf[Double])))
      .sortBy(x => (x._1, x._2, x._3))
    val want = lRows.map { case (k, ts, lab) =>
      val cands = rDistinct.filter(r => r._1 == k && r._2 <= ts)
      (k, ts, lab, cands.sortBy(_._2).lastOption.map(_._3))
    }.sortBy(x => (x._1, x._2, x._3))
    assert(got.toSeq == want)
  }

  test("null join keys never match (equi-join semantics), either side") {
    val l = Seq((Some("a"), 10L, "l1"), (None: Option[String], 10L, "l2"))
      .toDF("k", "ts", "label")
    val r = Seq((Some("a"), 5L, 1.0), (None: Option[String], 5L, 9.0))
      .toDF("k", "ts", "v")
    val got = AsOfJoin.asOfJoin(l, r, Seq("k"), "ts", "ts", Seq("v"))
      .collect().map(x => (Option(x.getAs[String]("k")),
        Option(x.getAs[Any]("asof_v")))).toSet
    // the null-key left row gets NO match even though a null-key right
    // row exists at an earlier ts
    assert(got == Set((Some("a"), Some(1.0)), (None, None)))
  }

  test("tolerance on timestamp columns compares in epoch MICROS, not seconds") {
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(plusMicros: Long) = new java.sql.Timestamp(base.getTime + plusMicros / 1000)
    val l = Seq(("a", ts(900000L), "l1")).toDF("k", "ts", "label") // +900ms
    val r = Seq(("a", ts(0L), 1.0)).toDF("k", "ts", "v")
    def run(tol: Long) = AsOfJoin.asOfJoin(l, r, Seq("k"), "ts", "ts",
        Seq("v"), tolerance = Some(tol))
      .head().getAs[Any]("asof_v")
    assert(run(1000000L) == 1.0)        // 1s tolerance: 900ms gap passes
    assert(run(500000L) == null)        // 0.5s tolerance: 900ms gap fails
    // a bare seconds cast would have made the gap 0 and passed both
  }

  test("funnel: ordered completion, out-of-order steps do not count, ties count via >=") {
    // u1 completes all three; u2 viewed BEFORE signup (view must not
    // count, so no purchase either); u3 signup+view only; u4 ties:
    // signup and view at the same ts -> view counts (inclusive)
    val ev = Seq(
      ("u1", "signup", 10L), ("u1", "view", 20L), ("u1", "purchase", 30L),
      ("u2", "view", 5L), ("u2", "signup", 10L), ("u2", "purchase", 20L),
      ("u3", "signup", 1L), ("u3", "view", 2L),
      ("u4", "signup", 7L), ("u4", "view", 7L)
    ).toDF("user_id", "event_type", "ts")
    val got = graft.ext.Funnel.funnel(ev, "user_id", "event_type", "ts",
        Seq("signup", "view", "purchase"))
      .orderBy("step").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq == Seq((1, "signup", 4L), (2, "view", 3L),
      (3, "purchase", 1L)))
  }

  test("plan shape: one shuffle on the keys, no join node") {
    val plan = AsOfJoin.asOfJoin(left, right, Seq("k"), "ts", "ts", Seq("v"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan)
    assert(plan.split("Exchange hashpartitioning").length == 2, plan) // exactly one
  }

  test("tieBreak pins duplicate right timestamps to the max-by winner, deterministically") {
    val l = Seq(("a", 15L, "l1"), ("a", 10L, "l2")).toDF("k", "ts", "label")
    // two right rows at EXACTLY ts=10 for key a — undefined without
    // tieBreak; with tieBreak=seq the larger seq must win every time
    val r = Seq(("a", 10L, 1.0, 1L), ("a", 10L, 2.0, 2L), ("a", 5L, 9.0, 3L))
      .toDF("k", "ts", "v", "seq")
    def run() = AsOfJoin.asOfJoin(l, r.repartition(7), Seq("k"), "ts", "ts",
        Seq("v"), tieBreak = Seq("seq"))
      .select("label", "asof_ts", "asof_v").collect()
      .map(x => (x.getString(0), x.getLong(1), x.getDouble(2))).sorted.toSeq
    val first = run()
    assert(first == Seq(("l1", 10L, 2.0), ("l2", 10L, 2.0)), first.toString)
    (1 to 3).foreach(_ => assert(run() == first)) // stable across replans
    // default (no tieBreak) still answers with SOME row at ts=10
    val legacy = AsOfJoin.asOfJoin(l, r, Seq("k"), "ts", "ts", Seq("v"))
      .select("asof_ts").collect().map(_.getLong(0)).toSeq
    assert(legacy.forall(_ == 10L))
    // ALL-NULL tieBreak values in a duplicate group (backfilled source
    // without sequence numbers) must still attach a real row, not null —
    // struct ordering ranks null fields lowest but the struct itself is
    // non-null, so max_by keeps the group
    val ln = Seq(("b", 20L, "x1")).toDF("k", "ts", "label")
    val rn = Seq(("b", 20L, 7.0, None: Option[Long]),
      ("b", 20L, 8.0, None: Option[Long])).toDF("k", "ts", "v", "seq")
    val gotN = AsOfJoin.asOfJoin(ln, rn, Seq("k"), "ts", "ts", Seq("v"),
        tieBreak = Seq("seq"))
      .select("asof_v").collect()
    assert(gotN.length == 1 && !gotN.head.isNullAt(0),
      s"all-null tieBreak group lost its values: ${gotN.mkString}")
  }
}
