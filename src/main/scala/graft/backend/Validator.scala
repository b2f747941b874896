package graft.backend

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.checks._
import graft.errors._
import graft.errors.SchemaErrorReason._
import graft.errors.ErrorCategory.{SCHEMA, DATA}
import graft.schema._

/** The validation engine.
  *
  * The reference's pyspark backend runs ONE Spark action per data check
  * (`filter(~cond).limit(1).count()`, pandera/backends/pyspark/
  * builtin_checks.py:48-49) — O(#checks) jobs, its documented perf weakness
  * (docs/source/pyspark_sql.md:226-233). This engine instead compiles every
  * row-level check of every column into ONE fused aggregate:
  *
  *   df.agg(sum(when(fail_1,1)), sum(when(fail_2,1)), ..., count(*))
  *
  * — a single whole-stage-codegen'd pass over the data, independent of the
  * number of checks. Additional jobs are incurred only for:
  *   - uniqueness (needs a shuffle: groupBy keys),
  *   - aggregate-class checks (set equality, groupby, hypothesis tests),
  *   - failure-case sampling, and only for checks that actually failed.
  *
  * At 100 TB this means validation cost ≈ one scan + K small shuffles,
  * versus the reference's (#checks × scan).
  *
  * Lifecycle order mirrors backends/pyspark/container.py:39-151:
  * metadata checks → strict/filter → add-missing/defaults/parsers →
  * coercion → subsample → data checks → error report.
  */
object Validator {

  private val OrigPrefix = "__graft_orig__"

  private def q(n: String): Column = col("`" + n.replace("`", "``") + "`")

  /** A pending row-level failure to count in the fused pass. */
  private final case class Pending(
      id: String,
      failCond: Column,
      sampleExpr: Column, // value to show in failure cases
      mkError: (Long, Seq[String]) => SchemaError,
      nFailureCases: Int,
      passCond: Column) // for drop_invalid_rows

  /** Output of the parse/transform stage: the transformed frame plus the
    * bookkeeping the check stage needs. */
  private final case class Staged(
      work: DataFrame,
      present: Seq[(String, (String, ColumnSchema))],
      coerced: Seq[(String, org.apache.spark.sql.types.DataType)],
      incompatible: Set[(Int, Int)])

  /** Stage 2 of the lifecycle (strict-filter → add-missing → parsers →
    * coercion → defaults → check-input-dtype restrictions). Pure plan
    * construction — zero Spark actions. */
  private def transformStage(
      schema: DataFrameSchema,
      df: DataFrame,
      resolved: Seq[(String, (String, ColumnSchema))],
      errs: scala.collection.mutable.ArrayBuffer[SchemaError],
      doSchema: Boolean): Staged = {
    val dfCols = df.columns.toSeq
    val resolvedNames = resolved.map(_._1)
    var work: DataFrame = df

    // strict="filter": drop extra columns (pyspark container.py:329)
    if (schema.strict == Strict.Filter)
      // distinct: an explicit declaration overlapping a regex declaration
      // resolves the same dataframe column twice, and a duplicate select
      // would poison every later reference with AMBIGUOUS_REFERENCE (r18
      // review)
      work = work.select(resolvedNames.filter(dfCols.contains).distinct.map(q): _*)

    // add_missing_columns (pandas container.py:418)
    if (schema.addMissingColumns) {
      resolved.filterNot { case (dn, _) => dfCols.contains(dn) }.foreach {
        case (dn, (_, cs)) =>
          val dt = cs.dtype.getOrElse(org.apache.spark.sql.types.StringType)
          cs.default match {
            case Some(d) => work = work.withColumn(dn, lit(d).cast(dt))
            case None if cs.nullable =>
              work = work.withColumn(dn, lit(null).cast(dt))
            case None =>
              // SCHEMA-category, so it honors the validation-depth knob
              // like its INVALID_CHECK_INPUT_TYPE sibling (r18 review)
              if (doSchema)
                errs += SchemaError("DataFrameSchema", Some(dn), "add_missing_columns",
                  ADD_MISSING_COLUMN_NO_DEFAULT, SCHEMA, 1L, Seq(dn),
                  s"column '$dn' is missing, non-nullable and has no default")
          }
      }
    }

    // df-level parsers run BEFORE the presence snapshot (r18 review: a
    // DataFrameParser that creates a declared column used to leave every
    // check on it silently skipped, and one that dropped a column crashed
    // later — parser output IS the frame the rest of the stage sees)
    schema.parsers.foreach(p => work = p.transform(work))
    val workCols = work.columns.toSeq
    val present = resolved.filter { case (dn, _) => workCols.contains(dn) }
    present.foreach { case (dn, (_, cs)) =>
      cs.parsers.foreach(p => work = work.withColumn(dn, p.transform(q(dn))))
    }

    // set_defaults BEFORE coercion (container.py:86-90 runs
    // add_missing_columns → strict_filter → set_defaults → coerce_dtype;
    // r18 review: the former coerce-then-default order let an
    // un-coercible value fall through to the default SILENTLY — the
    // coercion-failure condition tests the post-default column, which a
    // default makes never-null). The default casts to the column's
    // CURRENT dtype; a later coercion then casts it with everything else
    // (an un-coercible default is counted as a coercion failure — loud).
    present.foreach { case (dn, (_, cs)) =>
      cs.default.foreach { d =>
        work = work.withColumn(dn,
          coalesce(q(dn), lit(d).cast(work.schema(dn).dataType)))
      }
    }

    // coercion via try_cast semantics (SURVEY §7 hard part (a): the
    // reference disables ANSI; we use try_cast so un-coercible values
    // become null and are COUNTED in the same fused pass).
    val coerced = present.collect {
      case (dn, (_, cs)) if (cs.coerce || schema.coerce) && cs.dtype.isDefined &&
        work.schema(dn).dataType != cs.dtype.get => (dn, cs.dtype.get)
    }
    // one transform per resolved column (r18 review: overlapping
    // declarations listed a column twice and the second pass overwrote
    // the __graft_orig__ snapshot with the already-coerced value, zeroing
    // the failure count; when two declarations request different target
    // dtypes the FIRST wins)
    coerced.distinctBy(_._1).foreach { case (dn, dt) =>
      work = work
        .withColumn(OrigPrefix + dn, q(dn))
        .withColumn(dn, expr(s"try_cast(`${dn.replace("`", "``")}` AS ${dt.sql})"))
    }

    // check/dtype input restrictions (reference:
    // @register_input_datatypes, backends/pyspark/decorators.py:42-105):
    // a str_* check on an int column is a SCHEMA error here, and the check
    // is excluded from the fused pass — never a silent implicit cast or a
    // runtime analysis exception. Keyed by (declaration idx, check idx).
    val incompatible: Set[(Int, Int)] = present.zipWithIndex.flatMap {
      case ((dn, (_, cs)), di) =>
        val eff = work.schema(dn).dataType // post-coercion dtype
        cs.checks.zipWithIndex.collect {
          case (c, i) if !Check.acceptsInputDtype(c.name, eff) =>
            if (doSchema)
              errs += SchemaError("Column", Some(dn), c.described,
                INVALID_CHECK_INPUT_TYPE, SCHEMA, 1L, Seq(eff.sql),
                s"check '${c.name}' cannot apply to column '$dn' of type " +
                  s"${eff.sql} (invalid input datatype)")
            (di, i)
        }
    }.toSet

    Staged(work, present, coerced, incompatible)
  }

  /** Compile every row-level check into a Pending (fused-aggregate slot +
    * pass-predicate) and collect the aggregate-class checks. Pure plan
    * construction — zero Spark actions.
    *
    * Pending ids carry the declaration index `di` so they stay globally
    * unique when a regex column overlaps an explicit declaration (or a
    * duplicate column name appears): two declarations over one resolved
    * column must count into two separate aggregate slots, not collide in
    * Row.getAs. */
  private def buildPendings(
      schema: DataFrameSchema,
      present: Seq[(String, (String, ColumnSchema))],
      coerced: Seq[(String, org.apache.spark.sql.types.DataType)],
      incompatible: Set[(Int, Int)],
      checkDf: DataFrame): (Seq[Pending], Seq[(Option[String], AggregateCheck)]) = {
    val pendings = scala.collection.mutable.ArrayBuffer.empty[Pending]
    val aggChecks = scala.collection.mutable.ArrayBuffer.empty[(Option[String], AggregateCheck)]
    present.zipWithIndex.foreach { case ((dn, (_, cs)), di) =>
      val c = q(dn)
      if (!cs.nullable)
        pendings += Pending(s"nn${di}__$dn", c.isNull, c.cast("string"),
          (n, cases) => SchemaError("Column", Some(dn), "not_nullable",
            SERIES_CONTAINS_NULLS, DATA, n, cases,
            s"non-nullable column '$dn' contains $n null(s)"),
          Check.DefaultNFailureCases, c.isNotNull)
      if (cs.dtype.isDefined && coerced.exists(_._1 == dn)) {
        // the dtype guard keeps a dtype-less declaration overlapping a
        // coerced column (regex + explicit) from crashing on .get (r18
        // review); the declaration that REQUESTED the coercion carries
        // the pending
        val orig = q(OrigPrefix + dn)
        val dt = cs.dtype.get
        pendings += Pending(s"co${di}__$dn", orig.isNotNull && c.isNull,
          orig.cast("string"),
          (n, cases) => SchemaError("Column", Some(dn), s"coerce_dtype('${dt.sql}')",
            DATATYPE_COERCION, DATA, n, cases,
            s"column '$dn': $n value(s) could not be coerced to ${dt.sql}"),
          Check.DefaultNFailureCases, !(orig.isNotNull && c.isNull))
      }
      cs.checks.zipWithIndex.filterNot(ci => incompatible((di, ci._2))).foreach {
        case (cc: ColumnCheck, i) =>
          // warning checks report but never fail a row: excluded from the
          // pass-predicate (r18 review: drop_invalid_rows and the
          // streaming quarantine silently removed rows that only failed
          // an advisory check, contradicting ValidationResult.passed /
          // CheckSlot.isWarning semantics)
          pendings += Pending(s"ck${di}_${i}__$dn", cc.failCond(c), c.cast("string"),
            (n, cases) => SchemaError("Column", Some(dn), cc.described,
              DATAFRAME_CHECK, DATA, n, cases,
              s"column '$dn' failed check ${cc.described}: $n failure(s)",
              isWarning = cc.raiseWarning),
            cc.nFailureCases,
            if (cc.raiseWarning) lit(true) else !cc.failCond(c))
        case (wc: WideCheck, i) =>
          pendings += Pending(s"wk${di}_${i}__$dn", wc.failCond(checkDf),
            c.cast("string"),
            (n, cases) => SchemaError("Column", Some(dn), wc.described,
              DATAFRAME_CHECK, DATA, n, cases,
              s"column '$dn' failed check ${wc.described}: $n failure(s)",
              isWarning = wc.raiseWarning),
            wc.nFailureCases,
            if (wc.raiseWarning) lit(true) else !wc.failCond(checkDf))
        case (ac: AggregateCheck, _) => aggChecks += (Some(dn) -> ac)
      }
    }
    schema.checks.zipWithIndex.foreach {
      case (wc: WideCheck, i) =>
        val sampleCols = checkDf.columns.take(4).map(q(_).cast("string"))
        pendings += Pending(s"dfk$i", wc.failCond(checkDf),
          concat_ws("|", sampleCols.toIndexedSeq: _*),
          (n, cases) => SchemaError("DataFrameSchema", None, wc.described,
            DATAFRAME_CHECK, DATA, n, cases,
            s"dataframe failed check ${wc.described}: $n failure(s)",
            isWarning = wc.raiseWarning),
          wc.nFailureCases,
          if (wc.raiseWarning) lit(true) else !wc.failCond(checkDf))
      case (ac: AggregateCheck, _) => aggChecks += (None -> ac)
      case (cc: ColumnCheck, _) =>
        sys.error(s"table-level checks must be WideCheck/AggregateCheck, got column check '${cc.name}'")
    }
    (pendings.toSeq, aggChecks.toSeq)
  }

  /** Plan-only split of `df` into (valid, invalid) halves by the conjoined
    * row-level pass predicate — the same predicate drop_invalid_rows
    * filters on. ZERO Spark actions and zero shuffles are added: each half
    * is a single codegen'd filter over `df`, which is what a streaming
    * quarantine sink needs per micro-batch (the previous exceptAll
    * formulation shuffled the whole batch twice; round-3 verdict wrong #1).
    * Rows whose predicate evaluates null (three-valued logic on a
    * WideCheck) land on the invalid side, matching drop_invalid_rows.
    * Aggregate-class checks and uniqueness are not row-attributable and are
    * not part of the predicate — run `validate` for the full report. */
  def splitByRowChecks(schema: DataFrameSchema, df: DataFrame): (DataFrame, DataFrame) = {
    val discard = scala.collection.mutable.ArrayBuffer.empty[SchemaError]
    val resolved = schema.resolveColumns(df.columns.toSeq)
    val staged = transformStage(schema, df, resolved, discard, doSchema = false)
    val (pendings, _) = buildPendings(schema, staged.present, staged.coerced,
      staged.incompatible, staged.work)
    val pass = pendings.map(_.passCond).reduceOption(_ && _).getOrElse(lit(true))
    val dropCols = staged.coerced.map(c => OrigPrefix + c._1)
    (staged.work.filter(pass).drop(dropCols: _*),
      staged.work.filter(!coalesce(pass, lit(false))).drop(dropCols: _*))
  }

  /** One row-level check slot for grouped/per-partition failure counting
    * (the ValidationLedger's fused GROUP BY pass): a stable human-readable
    * label, the fail condition over [[rowCheckSlots]]'s returned frame,
    * and whether the check is warning-only (ledger counts it but does not
    * fail the partition on it — mirroring ValidationResult.passed). */
  private[graft] final case class CheckSlot(
      label: String, failCond: Column, isWarning: Boolean)

  /** Package-internal hook behind the ValidationLedger: the same staging
    * as validate()'s stages 2+4 (strict-filter, add-missing, parsers,
    * coercion via try_cast, defaults, input-dtype exclusion, then one
    * Pending per row-level check), but exposed as raw (frame, slots,
    * aggregate-check labels) so the caller can count failures GROUPED —
    * `work.groupBy(part).agg(sum(when(slot.failCond,1)) ...)` — instead
    * of corpus-wide. Aggregate-class checks are returned by label only:
    * they are not row-decomposable and the caller decides whether to
    * refuse or to run validate() separately. Pure plan construction —
    * zero Spark actions; schema-level (metadata) errors are NOT surfaced
    * here (run validate(depth = SchemaOnly) for those). */
  private[graft] def rowCheckSlots(schema: DataFrameSchema, df: DataFrame)
      : (DataFrame, Seq[CheckSlot], Seq[String]) = {
    val discard = scala.collection.mutable.ArrayBuffer.empty[SchemaError]
    val resolved = schema.resolveColumns(df.columns.toSeq)
    val staged = transformStage(schema, df, resolved, discard, doSchema = false)
    val (pendings, aggChecks) = buildPendings(schema, staged.present,
      staged.coerced, staged.incompatible, staged.work)
    val seen = scala.collection.mutable.Map.empty[String, Int]
    val slots = pendings.map { p =>
      val e = p.mkError(0L, Nil) // label + warning flag live on the error
      val base = e.column.fold(e.check)(c => s"$c:${e.check}")
      val n = seen.getOrElse(base, 0); seen(base) = n + 1
      CheckSlot(if (n == 0) base else s"$base#$n", p.failCond, e.isWarning)
    }
    val aggLabels = aggChecks.map { case (c, ac) =>
      c.fold(ac.described)(cn => s"$cn:${ac.described}") }
    (staged.work, slots, aggLabels)
  }

  def validate(
      schema: DataFrameSchema,
      df: DataFrame,
      sample: Option[(Double, Long)] = None,
      head: Option[Int] = None,
      depth: GraftConfig.Depth = GraftConfig.validationDepth): ValidationResult = {

    if (!GraftConfig.validationEnabled) return ValidationResult(df, Nil)

    val errs = scala.collection.mutable.ArrayBuffer.empty[SchemaError]
    val doSchema = depth != GraftConfig.DataOnly
    val doData = depth != GraftConfig.SchemaOnly

    // ---- 1. metadata (SCHEMA-category) checks: zero data jobs ----------
    val dfCols = df.columns.toSeq

    if (doSchema && schema.uniqueColumnNames) {
      val dups = dfCols.groupBy(identity).collect { case (n, g) if g.size > 1 => n }
      if (dups.nonEmpty)
        errs += SchemaError("DataFrameSchema", None, "column_names_are_unique",
          DUPLICATE_COLUMN_LABELS, SCHEMA, dups.size.toLong, dups.toSeq,
          s"duplicate column labels: ${dups.mkString(", ")}")
    }

    val resolved = schema.resolveColumns(dfCols) // (dfName, (declName, cs))
    val resolvedNames = resolved.map(_._1)

    if (doSchema) {
      // column presence (backends/pyspark/container.py:607)
      schema.columns.foreach { case (n, cs) =>
        val found = if (cs.regex) resolved.exists(_._2._1 == n) else dfCols.contains(n)
        if (!found && cs.required && !(schema.addMissingColumns && (cs.default.isDefined || cs.nullable)))
          errs += SchemaError("DataFrameSchema", Some(n), "column_in_dataframe",
            COLUMN_NOT_IN_DATAFRAME, SCHEMA, 1L, Seq(n),
            s"column '$n' not in dataframe")
      }
      // ordered (errors.py:145 COLUMN_NOT_ORDERED)
      if (schema.ordered) {
        // distinct: a regex declaration overlapping an explicit one lists
        // the column twice and misaligns the zip (r18 review)
        val expected = resolvedNames.filter(dfCols.contains).distinct
        val actual = dfCols.filter(expected.contains)
        expected.zip(actual).collect { case (e, a) if e != a => e }.foreach { c =>
          errs += SchemaError("DataFrameSchema", Some(c), "column_ordered",
            COLUMN_NOT_ORDERED, SCHEMA, 1L, Seq(c), s"column '$c' out of order")
        }
      }
      // strict (container.py:549 / pyspark :329)
      if (schema.strict == Strict.Error) {
        dfCols.filterNot(resolvedNames.contains).foreach { c =>
          errs += SchemaError("DataFrameSchema", Some(c), "column_in_schema",
            COLUMN_NOT_IN_SCHEMA, SCHEMA, 1L, Seq(c),
            s"column '$c' not in schema (strict)")
        }
      }
      // dtype (WRONG_DATATYPE; coerced columns are cast instead)
      resolved.foreach { case (dn, (decl, cs)) =>
        if (dfCols.contains(dn)) cs.dtype.foreach { dt =>
          val actual = df.schema(dn).dataType
          if (actual != dt && !(cs.coerce || schema.coerce))
            errs += SchemaError("Column", Some(dn), s"dtype('${dt.sql}')",
              WRONG_DATATYPE, SCHEMA, 1L, Seq(actual.sql),
              s"column '$dn' has type ${actual.sql}, expected ${dt.sql} " +
                s"(declared as '$decl')")
        }
      }
    }

    // ---- 2. parse/transform stage (mutates data; lazily planned) -------
    val Staged(work, present, coerced, incompatible) =
      transformStage(schema, df, resolved, errs, doSchema)

    // ---- 3. subsample for data checks (backends/pyspark/base.py:55-69) --
    var checkDf = sample.fold(work) { case (f, seed) => work.sample(false, f, seed) }
    checkDf = head.fold(checkDf)(n => checkDf.limit(n))

    // ---- 4. data checks: the fused aggregate ---------------------------
    val pendings = scala.collection.mutable.ArrayBuffer.empty[Pending]
    val aggChecks = scala.collection.mutable.ArrayBuffer.empty[(Option[String], AggregateCheck)]

    if (doData) {
      val (p, a) = buildPendings(schema, present, coerced, incompatible, checkDf)
      pendings ++= p
      aggChecks ++= a
    }

    val uniqueCols = present.collect { case (dn, (_, cs)) if cs.unique => dn }
    val multiJob = uniqueCols.nonEmpty || schema.unique.nonEmpty ||
      aggChecks.nonEmpty || pendings.nonEmpty
    val cached = GraftConfig.cacheDataFrame && doData && multiJob
    if (cached) checkDf.persist(StorageLevel.MEMORY_AND_DISK)

    try {
      if (doData && schema.dropInvalidRows) {
        // drop_invalid_rows (SURVEY §2.B): Spark has no row index, so we
        // conjoin all row-level pass-conditions and filter — one job, no
        // error bookkeeping for dropped rows (they are handled, not raised).
        val pass = pendings.map(_.passCond)
          .reduceOption(_ && _).getOrElse(lit(true))
        runAggChecks(checkDf, aggChecks.toSeq, errs)
        uniquenessErrors(checkDf, uniqueCols, schema, errs)
        val kept = work.filter(pass).drop(coerced.map(c => OrigPrefix + c._1): _*)
        return ValidationResult(kept, errs.toSeq)
      }

      if (doData && pendings.nonEmpty) {
        val aggExprs = pendings.map(p =>
          coalesce(sum(when(p.failCond, 1L)), lit(0L)).as(p.id)) :+
          count(lit(1)).as("__graft_total")
        val row = checkDf.agg(aggExprs.head, aggExprs.tail.toIndexedSeq: _*).head()
        val failed = pendings.filter(p => row.getAs[Long](p.id) > 0L)
        // failure-case sampling (n_failure_cases semantics,
        // backends/pandas/checks.py:203-236): ONE job for ALL failed checks
        // — filter to rows failing anything, then a hard-capped
        // BoundedCollect per failed check. Memory is O(n_failure_cases) per
        // check regardless of how many rows failed; clean data never pays
        // this job at all.
        val sampled = failed.filter(_.nFailureCases > 0)
        val cases: Map[String, Seq[String]] =
          if (sampled.isEmpty) Map.empty
          else {
            val anyFail = sampled.map(_.failCond).reduce(_ || _)
            // coalesce to the literal "null": a failing row whose sample
            // VALUE is null (e.g. the not_nullable check) must still be
            // collected (BoundedCollect skips null inputs by design)
            val caseExprs = sampled.map(p =>
              graft.functions.BoundedCollect.of(
                when(p.failCond, coalesce(p.sampleExpr, lit("null"))),
                p.nFailureCases).as(p.id))
            val caseRow = checkDf.filter(anyFail)
              .agg(caseExprs.head, caseExprs.tail.toIndexedSeq: _*).head()
            sampled.map(p =>
              p.id -> caseRow.getSeq[String](caseRow.fieldIndex(p.id)).toSeq).toMap
          }
        failed.foreach { p =>
          errs += p.mkError(row.getAs[Long](p.id), cases.getOrElse(p.id, Nil))
        }
      }

      if (doData) {
        runAggChecks(checkDf, aggChecks.toSeq, errs)
        uniquenessErrors(checkDf, uniqueCols, schema, errs)
      }

      val out = work.drop(coerced.map(c => OrigPrefix + c._1): _*)
      ValidationResult(out, errs.toSeq)
    } finally {
      if (cached && !GraftConfig.keepCachedDataFrame) checkDf.unpersist()
    }
  }

  private def runAggChecks(
      df: DataFrame,
      aggChecks: Seq[(Option[String], AggregateCheck)],
      errs: scala.collection.mutable.ArrayBuffer[SchemaError]): Unit =
    aggChecks.foreach { case (colOpt, ac) =>
      val outcomeOpt =
        try Some(ac.eval(df, colOpt))
        catch {
          case e: Exception =>
            errs += SchemaError("Check", colOpt, ac.described, CHECK_ERROR, DATA,
              1L, Seq(String.valueOf(e.getMessage)),
              s"check ${ac.described} raised: ${e.getMessage}")
            None
        }
      outcomeOpt.filterNot(_.passed).foreach { outcome =>
        errs += SchemaError(if (colOpt.isDefined) "Column" else "DataFrameSchema",
          colOpt, ac.described, DATAFRAME_CHECK, DATA, 1L,
          outcome.failureCases :+ outcome.observed,
          s"${colOpt.fold("dataframe")(c => s"column '$c'")} failed " +
            s"aggregate check ${ac.described}: ${outcome.observed}",
          isWarning = ac.raiseWarning)
      }
    }

  /** Uniqueness checks — the only row-level checks that genuinely need a
    * shuffle. One groupBy job per key-set computes BOTH the duplicate-row
    * count and a bounded sample of duplicated keys via a single
    * aggregate-then-filter plan; report_duplicates ∈ {all, exclude_first,
    * exclude_last} maps to n vs n-1 per duplicated key
    * (backends/pyspark/container.py:532-540).
    */
  private def uniquenessErrors(
      df: DataFrame,
      uniqueCols: Seq[String],
      schema: DataFrameSchema,
      errs: scala.collection.mutable.ArrayBuffer[SchemaError]): Unit = {

    def dupCount(cnt: Column): Column = schema.reportDuplicates match {
      case ReportDuplicates.All => cnt
      case _                    => cnt - 1L // order-insensitive n-1
    }

    // one action per key-set: duplicate-row count, duplicated-key count AND
    // a hard-capped key sample come out of a single aggregate-then-aggregate
    // plan (BoundedCollect keeps the sample O(n_failure_cases) in memory).
    def dupStats(grouped: DataFrame, keyStr: Column): (Long, Long, Seq[String]) = {
      val agg = grouped.agg(
        coalesce(sum(dupCount(col("count"))), lit(0L)).as("dups"),
        count(lit(1)).as("keys"),
        graft.functions.BoundedCollect.of(keyStr, Check.DefaultNFailureCases)
          .as("cases")).head()
      (agg.getAs[Long]("dups"), agg.getAs[Long]("keys"),
        agg.getSeq[String](agg.fieldIndex("cases")).toSeq)
    }

    // Null semantics are deliberately asymmetric and oracle-pinned:
    // per-COLUMN uniqueness exempts nulls (a nullable unique id column
    // tolerates many unfilled rows — the not_nullable check owns that
    // complaint), while TABLE-level keys below count null-containing
    // tuples as ordinary values (a composite business key with a null
    // part is still one key; pandas' duplicated() treats NaN==NaN the
    // same way).
    uniqueCols.foreach { c =>
      val grouped = df.filter(q(c).isNotNull).groupBy(q(c)).count()
        .filter(col("count") > 1L)
      val (dups, keys, cases) = dupStats(grouped, q(c).cast("string"))
      if (dups > 0L) {
        errs += SchemaError("Column", Some(c), "field_uniqueness",
          SERIES_CONTAINS_DUPLICATES, DATA, dups, cases,
          s"column '$c' contains $keys duplicated value(s) " +
            s"($dups duplicate row(s))")
      }
    }

    if (schema.unique.nonEmpty) {
      // missing key columns refuse as an accumulated error, not a mid-
      // validate AnalysisException that loses the whole report (r18
      // review; schema.unique may name columns the schema never declared)
      val missing = schema.unique.filterNot(df.columns.contains)
      if (missing.nonEmpty) {
        errs += SchemaError("DataFrameSchema", None,
          s"multiple_fields_uniqueness(${schema.unique.mkString(",")})",
          COLUMN_NOT_IN_DATAFRAME, SCHEMA, 1L, missing,
          s"table-level unique columns missing from dataframe: " +
            missing.mkString(", "))
        return
      }
      val cols = schema.unique.map(q)
      val grouped = df.groupBy(cols: _*).count().filter(col("count") > 1L)
      val (dups, keys, cases) = dupStats(grouped,
        concat_ws("|", schema.unique.map(c => q(c).cast("string")): _*))
      if (dups > 0L) {
        errs += SchemaError("DataFrameSchema", None,
          s"multiple_fields_uniqueness(${schema.unique.mkString(",")})",
          DUPLICATES, DATA, dups, cases,
          s"columns (${schema.unique.mkString(", ")}) contain " +
            s"$keys duplicated key(s) ($dups duplicate row(s))")
      }
    }
  }
}
