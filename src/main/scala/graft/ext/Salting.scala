package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, MapType, StructType}

/** Two-stage salted aggregation — the standard defense when a groupBy key
  * is so skewed that one reducer owns the hot key's entire mass (AQE's
  * skew handling splits skewed JOIN partitions, but a skewed AGGREGATION
  * key still funnels every pre-aggregated partial for that key to one
  * task). Stage 1 groups by (key, salt) — the hot key's rows spread over
  * `saltBuckets` reducers; stage 2 re-aggregates the bucket partials by
  * key alone, shuffling only #keys·saltBuckets tiny rows.
  *
  * Restricted to ALGEBRAIC aggregates (partials merge exactly):
  * sum/count/min/max arrive decomposed; avg = salted sum / salted count,
  * assembled in stage 2. Results are exactly the plain groupBy's up to
  * float addition order (integer/decimal sums are bit-identical; the gate
  * rounds the double column like every other sum oracle).
  *
  * Note Spark's hash aggregation already does map-side partial combine,
  * which absorbs MOST skew; the salt matters when the number of DISTINCT
  * hot-key partials still overwhelms one reducer — i.e. very many map
  * tasks, or high-cardinality secondary grouping. The ScaleProbe's
  * `salted` leg measures both stages. */
object Salting {

  private def q(n: String): Column = col("`" + n.replace("`", "``") + "`")

  /** Spark's hash expressions reject MapType anywhere in the input (maps
    * have no canonical element order), so the deterministic row hashes
    * below must skip columns carrying one (r17 review: hashing EVERY
    * column made both salted APIs fail analysis on any table with an
    * irrelevant map column). Rows that tie because they differ only in
    * skipped columns are OUTPUT-interchangeable here: equal hashable
    * columns mean equal aggregate contributions, and in the join the
    * salt only routes — every salt value meets the full replicated right
    * side — so a retry-order swap among such ties cannot change the
    * result multiset. */
  private def containsMap(dt: DataType): Boolean = dt match {
    case _: MapType => true
    case ArrayType(et, _) => containsMap(et)
    case st: StructType => st.fields.exists(f => containsMap(f.dataType))
    case _ => false
  }

  private def hashableCols(df: DataFrame): Seq[Column] = {
    val hs = df.schema.fields.filterNot(f => containsMap(f.dataType))
      .map(f => q(f.name)).toSeq
    require(hs.nonEmpty,
      "salted ops need at least one non-map column to hash for the " +
        "deterministic per-row salt")
    hs
  }

  /** Supported aggregate spec: output column name → ("sum"|"count"|"min"|
    * "max"|"avg", input column; count ignores it / lit(1)). */
  def saltedAggregate(df: DataFrame, keys: Seq[String],
      aggs: Seq[(String, (String, String))],
      saltBuckets: Int = 32): DataFrame = {
    require(keys.nonEmpty, "saltedAggregate: at least one key")
    require(aggs.nonEmpty, "saltedAggregate: at least one aggregate")
    require(saltBuckets >= 1, "saltBuckets >= 1")
    val ops = Set("sum", "count", "min", "max", "avg")
    aggs.foreach { case (out, (op, _)) =>
      require(ops.contains(op), s"saltedAggregate: unsupported op '$op' for '$out'")
      require(!out.startsWith("__"), "output names may not start with __")
    }
    require(!df.columns.contains("__rh") && !df.columns.contains("__rh2") &&
      !df.columns.contains("__salt"),
      "saltedAggregate: __rh/__rh2/__salt are reserved column names")
    // Deterministic ordinal salt (r9): rows first sort WITHIN partitions
    // by a content hash, then take a partition-local ordinal. A plain
    // monotonically_increasing_id over post-shuffle input is a retry
    // hazard — shuffle-read arrival order is nondeterministic, so a map
    // task recomputed after a fetch failure could assign DIFFERENT salts
    // to the same rows while other reducers already consumed the first
    // attempt's buckets (the SPARK-23207 class of bug; Spark's own
    // round-robin repartition fix is this same sort). After the sort the
    // ordinal is a pure function of partition CONTENT, so any retry
    // salts identically. Ties break on a SECOND independent hash (r17
    // review: "ties are identical-content rows" is false under single-
    // hash collision, and at ~1e11 rows the birthday bound makes one
    // same-partition collision plausible — a tie of two DIFFERENT rows
    // could swap salts across a retry; requiring both 64-bit hashes to
    // collide makes that astronomically unlikely, and hashable-column
    // ties are output-interchangeable, see [[containsMap]]). No rand(),
    // no extra shuffle — one in-partition sort on two 8-byte keys.
    val hashCols = hashableCols(df)
    val rowHash = xxhash64(hashCols :+ lit(0x5a17): _*)
    val rowHash2 = xxhash64(hashCols :+ lit(0x17a5): _*)
    val salt = pmod(xxhash64(col("__rh"), monotonically_increasing_id()),
      lit(saltBuckets.toLong))
    // stage 1: decomposed partials per (keys, salt)
    val partials = aggs.flatMap { case (out, (op, in)) =>
      op match {
        case "sum"   => Seq(sum(q(in)).as(s"__s_$out"))
        case "count" => Seq(count(lit(1)).as(s"__c_$out"))
        case "min"   => Seq(min(q(in)).as(s"__m_$out"))
        case "max"   => Seq(max(q(in)).as(s"__x_$out"))
        case "avg"   => Seq(sum(q(in)).as(s"__s_$out"),
          count(q(in)).as(s"__c_$out"))
      }
    }
    val stage1 = df.withColumn("__rh", rowHash).withColumn("__rh2", rowHash2)
      .sortWithinPartitions("__rh", "__rh2")
      .withColumn("__salt", salt)
      .groupBy((keys.map(q) :+ col("__salt")): _*)
      .agg(partials.head, partials.tail: _*)
    // stage 2: merge bucket partials per key
    val finals = aggs.map { case (out, (op, _)) =>
      op match {
        case "sum"   => sum(col(s"__s_$out")).as(out)
        case "count" => sum(col(s"__c_$out")).as(out)
        case "min"   => min(col(s"__m_$out")).as(out)
        case "max"   => max(col(s"__x_$out")).as(out)
        case "avg"   => (sum(col(s"__s_$out")) / sum(col(s"__c_$out"))).as(out)
      }
    }
    stage1.groupBy(keys.map(q): _*).agg(finals.head, finals.tail: _*)
  }

  /** Salted (hot-key-replicated) equi-join — the skew defense for a join
    * whose RIGHT side is too big to broadcast and whose LEFT key
    * distribution has hot keys that would pin whole partitions on single
    * reducers. The classic recipe:
    *
    *   1. ONE count aggregation over the left keys finds keys with more
    *      than `hotKeyThreshold` rows — O(#hot keys) reaches the driver
    *      (guarded by `maxHotKeys`; millions of hot keys means the
    *      threshold is mis-set, not that the driver should eat them);
    *   2. hot left rows get a deterministic salt in [0, saltFactor) — the
    *      hot key's mass spreads over saltFactor reducers;
    *   3. right rows for hot keys REPLICATE saltFactor times (one per
    *      salt), everything else carries salt 0 and replicates once —
    *      replication cost is #hot-right-rows x saltFactor, paid exactly
    *      where it buys reducer parallelism;
    *   4. ordinary equi-join on (keys, salt).
    *
    * Hot-key tagging rides a broadcast join against a LOCAL relation of
    * the collected hot keys — never an isin literal list (which would
    * inline up to maxHotKeys literals into the plan).
    *
    * Join types. inner/left are direct: each left row owns exactly ONE
    * salt, so it matches exactly the right rows the plain join would
    * give it and no output dedup is needed. right/full (r12, verdict #7)
    * CANNOT run the salted join with that join type directly — a
    * replicated right row sits in every salt bucket, and each replica
    * that finds no left partner in ITS bucket would emit a null-extended
    * output (up to saltFactor spurious rows per unmatched right key).
    * Instead they are built by composition, still with zero output dedup:
    *
    *   right outer = salted INNER  ∪  (unmatched right rows, left-null-extended)
    *   full  outer = salted LEFT   ∪  (unmatched right rows, left-null-extended)
    *
    * where "unmatched right" is `right LEFT ANTI JOIN distinct(left
    * keys)`. The distinct collapses any hot left key to a single row
    * before the anti probe, so the anti leg cannot re-import the skew the
    * salt just defused (a hot key is ONE row in the build side; AQE's
    * skew-split can still divide an overweight stream-side partition).
    * Each unmatched right row survives the anti exactly once → exactly
    * one null-extended output row, which is the plain right/full join's
    * contract. Null right keys never equi-match, so they flow through the
    * anti leg and surface null-extended, matching plain-join semantics.
    * Complements AQE's skew-split, which rebalances partition SIZES after
    * the fact but cannot spread one gigantic key's matches across
    * reducers when the right side must co-locate. Row-identical to the
    * plain join for all four types (property-tested under 90% skew).
    *
    * Determinism caveat (right/full only): the anti leg re-evaluates
    * `left` for its key set — a SECOND scan in a separate job from the
    * core join. The key set is unbounded, so the collect-once trick the
    * hot-key probe uses is not available; if `left` is nondeterministic
    * (an `asNondeterministic` UDF, a limit-without-order, or a table
    * mutating between jobs) the two evaluations can disagree and a right
    * row may emit both matched and null-extended, or neither. Same class
    * of contract as Spark's own self-join over a nondeterministic child:
    * inputs must be re-evaluation-stable. inner/left scan `left` once
    * past the hot-key probe and carry no such caveat (a drifting hot-key
    * SET only shifts which keys get salted, never the output rows).
    *
    * `stabilizeLeft` (r13, verdict #7; lifecycle reworked r14) opts
    * right/full out of the caveat: `left` is eagerly
    * `localCheckpoint()`ed — one materializing job up front (the hot-key
    * probe then reads the checkpointed blocks, so the total number of
    * left scans is unchanged) — and the core join and the anti leg read
    * that ONE snapshot instead of re-evaluating. The blocks need no
    * caller-side unpersist: the ContextCleaner releases them when the
    * returned frame becomes unreachable, so a call site that never read
    * this doc cannot leak cache for the SparkContext lifetime (the r13
    * persist-based form could). Checkpointing also fails LOUDLY on
    * executor loss instead of silently recomputing a different
    * nondeterministic snapshot — for a knob whose whole point is
    * snapshot stability, failing beats quietly resampling. Skipped when
    * the caller already persisted `left` (their cache is the snapshot);
    * no-op for inner/left, which have no second evaluation to stabilize. */
  def saltedJoin(left: DataFrame, right: DataFrame,
      leftKeys: Seq[String], rightKeys: Seq[String],
      saltFactor: Int = 16, hotKeyThreshold: Long = 1000000L,
      maxHotKeys: Int = 100000,
      joinType: String = "inner",
      stabilizeLeft: Boolean = false): DataFrame = {
    require(leftKeys.nonEmpty && leftKeys.size == rightKeys.size,
      "saltedJoin: leftKeys/rightKeys must pair up")
    require(saltFactor >= 1, "saltFactor >= 1")
    val jt = joinType match {
      case "inner"                      => "inner"
      case "left" | "left_outer"        => "left"
      case "right" | "right_outer"      => "right"
      case "full" | "full_outer" | "outer" => "full"
      case other => throw new IllegalArgumentException(
        s"saltedJoin: unsupported joinType '$other' — inner/left/right/" +
          "full only (semi/anti/cross have no salted form here)")
    }
    val reserved = Seq("__salt", "__hot", "__rh", "__rh2")
    require(!(left.columns ++ right.columns).exists(reserved.contains),
      "saltedJoin: __salt/__hot/__rh/__rh2 are reserved column names")
    val spark = left.sparkSession
    // stabilize: eager localCheckpoint BEFORE the hot-key probe — the
    // probe, the core join and the right/full anti leg below all read the
    // checkpointed snapshot instead of re-evaluating a possibly-
    // nondeterministic left. No caller-managed lifetime: the blocks are
    // released by the ContextCleaner when the result frame is GC'd (a
    // failed call leaks nothing past GC either). Skipped when the caller
    // ALREADY persisted left — their cache stabilizes the snapshot by
    // itself and its lifetime stays theirs.
    val doStabilize = stabilizeLeft && (jt == "right" || jt == "full") &&
      left.storageLevel == org.apache.spark.storage.StorageLevel.NONE
    val l = if (doStabilize) left.localCheckpoint() else left
    // step 1: hot LEFT keys in one aggregation, bounded collect (null
    // keys never equi-join, so they are excluded from hotness outright)
    val notNullL = leftKeys.map(q(_).isNotNull).reduce(_ && _)
    val hotRows = l.filter(notNullL)
      .groupBy(leftKeys.map(q): _*).agg(count(lit(1)).as("__n"))
      .filter(col("__n") > hotKeyThreshold)
      .select(leftKeys.map(q): _*)
      .limit(maxHotKeys + 1)
      .collect()
    require(hotRows.length <= maxHotKeys,
      s"saltedJoin: more than $maxHotKeys hot keys at threshold " +
        s"$hotKeyThreshold - raise the threshold")
    val keySchema = org.apache.spark.sql.types.StructType(
      leftKeys.map(k => l.schema(k)).toArray)
    val hotL = spark.createDataFrame(
        java.util.Arrays.asList(hotRows: _*), keySchema)
      .withColumn("__hot", lit(true))
    // select-with-alias, not sequential renames (r17 review: with
    // crosswise key overlap — leftKeys=Seq("a","b"), rightKeys=
    // Seq("b","a") — intermediate renames collide and a later rename
    // hits both columns, corrupting the broadcast frame)
    val hotR = hotL.select(leftKeys.zip(rightKeys)
      .map { case (lk, rk) => q(lk).as(rk) } :+ col("__hot"): _*)
    // step 2: deterministic per-row salt for hot left rows — a
    // partition-local ordinal taken AFTER an in-partition sort on the
    // row-content hash. The ordinal is what spreads a hot key whose rows
    // are byte-identical (exactly the crawl-dedup-shaped skew this
    // targets): content alone would land every duplicate in ONE salt
    // bucket and the spread would silently vanish. The sort is what makes
    // the ordinal RETRY-DETERMINISTIC: post-shuffle arrival order is not
    // stable across task re-execution, so an unsorted ordinal could
    // re-salt rows a reducer already consumed from the first attempt
    // (SPARK-23207 class — duplicated/lost rows on fetch-failure
    // recovery); after the sort the assignment is a pure function of
    // partition content. Ties break on a second independent hash, and
    // residual double-hash ties are output-interchangeable for the join
    // (the salt only routes; every salt meets the full replicated right
    // side) — see [[containsMap]] and the saltedAggregate note.
    val lHashCols = hashableCols(l)
    val lSalt = when(coalesce(col("__hot"), lit(false)),
      pmod(xxhash64(col("__rh"), monotonically_increasing_id(), lit(0x5a17e)),
        lit(saltFactor.toLong))).otherwise(lit(0L))
    val lSalted = l.join(broadcast(hotL), leftKeys.toSeq, "left")
      .withColumn("__rh", xxhash64(lHashCols: _*))
      .withColumn("__rh2", xxhash64(lHashCols :+ lit(0x17a5): _*))
      .sortWithinPartitions("__rh", "__rh2")
      .withColumn("__salt", lSalt).drop("__hot", "__rh", "__rh2")
    // step 3: right rows replicate saltFactor ways for hot keys only
    val rSalts = when(coalesce(col("__hot"), lit(false)),
      sequence(lit(0L), lit((saltFactor - 1).toLong)))
      .otherwise(array(lit(0L)))
    val rSalted = right.join(broadcast(hotR), rightKeys.toSeq, "left")
      .withColumn("__salt", explode(rSalts)).drop("__hot")
    // step 4: plain equi-join on (keys, salt). right/full run their
    // left-preserving core (inner / left) — the right-preserving rows are
    // the composition's anti leg below, never a right-outer over
    // replicated rows.
    val coreType = jt match {
      case "right" => "inner"
      case "full"  => "left"
      case other   => other
    }
    val cond = leftKeys.zip(rightKeys)
      .map { case (lk, rk) => lSalted(lk) === rSalted(rk) }
      .reduce(_ && _) && lSalted("__salt") === rSalted("__salt")
    val core = lSalted.join(rSalted, cond, coreType)
      .drop("__salt")
    if (jt == "inner" || jt == "left") core
    else {
      // step 5 (right/full): unmatched right rows, exactly once each.
      // distinct() collapses every left key — hot or not — to one build
      // row, so this anti join cannot reintroduce the defused skew.
      val keySet = l.filter(notNullL)
        .select(leftKeys.zip(rightKeys)
          .map { case (lk, rk) => q(lk).as(rk) }: _*)
        .distinct()
      val unmatchedR = right.join(keySet, rightKeys.toSeq, "left_anti")
      // positional union — core's order is KEYS-FIRST on both sides
      // (the using-columns hot-tag joins in steps 2/3 move the key
      // columns to the front), NOT the inputs' original order. The anti
      // leg must mirror that or real right values land in the wrong
      // columns whenever a key isn't its table's first column.
      val leftOrdered = leftKeys ++ l.columns.filterNot(leftKeys.contains)
      val rightOrdered = rightKeys ++ right.columns.filterNot(rightKeys.contains)
      val nullLeft = leftOrdered
        .map(n => lit(null).cast(l.schema(n).dataType).as(n))
      core.union(unmatchedR.select(nullLeft ++ rightOrdered.map(q): _*))
    }
  }
}
