package graft.io

import scala.jdk.CollectionConverters._
import org.apache.spark.sql.types._
import graft.checks._
import graft.schema._

/** Schema document serialization — YAML and JSON.
  *
  * Keeps the reference's schema-document shape (version header, per-column
  * dtype/nullable/checks-with-statistics, table options; see
  * pandera/io/pyspark_sql_io.py:106-343) so documents are recognizably
  * cross-compatible. Dtypes serialize to pandera-style names (int64,
  * float32, str, datetime64[ns], ...) with Spark DDL as fallback; both
  * spellings parse. Only checks with serializable statistics round-trip
  * (builtin + registry-reconstructible) — custom lambda checks are listed
  * in `unserializable` and skipped, mirroring the reference's behavior for
  * unregistered custom checks.
  */
object SchemaIO {

  val Version = "graft-0.1"

  // ---- dtype ⇄ string (pandera spellings from engines/pyspark_engine.py) --
  private val dtypeNames: Seq[(DataType, String)] = Seq(
    BooleanType -> "bool", StringType -> "str", LongType -> "int64",
    IntegerType -> "int32", ShortType -> "int16", ByteType -> "int8",
    DoubleType -> "float64", FloatType -> "float32", DateType -> "date",
    TimestampType -> "datetime64[ns]", BinaryType -> "binary")

  def dtypeToName(dt: DataType): String =
    dtypeNames.collectFirst { case (d, n) if d == dt => n }
      .getOrElse(dt.sql.toLowerCase)

  def nameToDtype(s: String): DataType = {
    val alias = Map("string" -> StringType, "int" -> LongType,
      "float" -> FloatType, "double" -> DoubleType, "timestamp" -> TimestampType,
      "datetime" -> TimestampType, "bigint" -> LongType)
    dtypeNames.collectFirst { case (d, n) if n == s => d }
      .orElse(alias.get(s.toLowerCase))
      .getOrElse(DataType.fromDDL(s))
  }

  // ---- check ⇄ (name, statistics) ---------------------------------------
  /** Rebuild a builtin check from its serialized statistics (the inverse of
    * each factory in graft.checks.Check; registry names dispatch through
    * Check.registry). */
  def checkFromStats(name: String, stats: Map[String, Any]): Check = {
    def v(k: String): Any = stats(k)
    def opt(k: String): Option[Any] = stats.get(k).filter(_ != null)
    name match {
      case "equal_to"     => Check.equalTo(v("value"))
      case "not_equal_to" => Check.notEqualTo(v("value"))
      case "greater_than" => Check.greaterThan(v("min_value"))
      case "greater_than_or_equal_to" => Check.ge(v("min_value"))
      case "less_than"    => Check.lessThan(v("max_value"))
      case "less_than_or_equal_to" => Check.le(v("max_value"))
      case "in_range" => Check.inRange(v("min_value"), v("max_value"),
        opt("include_min").forall(_ == true), opt("include_max").forall(_ == true))
      case "isin"  => Check.isin(v("allowed_values").asInstanceOf[Seq[Any]])
      case "notin" => Check.notin(v("forbidden_values").asInstanceOf[Seq[Any]])
      case "str_matches"    => Check.strMatches(v("pattern").toString)
      case "str_contains"   => Check.strContains(v("pattern").toString)
      case "str_startswith" => Check.strStartswith(v("string").toString)
      case "str_endswith"   => Check.strEndswith(v("string").toString)
      case "str_length" => Check.strLength(
        opt("min_value").map(x => x.toString.toDouble.toInt),
        opt("max_value").map(x => x.toString.toDouble.toInt))
      case "unique_values_eq" =>
        Check.uniqueValuesEq(v("values").asInstanceOf[Seq[Any]])
      case other if Check.registry.contains(other) =>
        Check.registry(other, stats.toSeq.sortBy(_._1).map(_._2): _*)
      case other =>
        throw new IllegalArgumentException(s"cannot deserialize check '$other'")
    }
  }

  private def serializableCheck(c: Check): Boolean = c match {
    case cc: ColumnCheck =>
      try { checkFromStats(cc.name, cc.statistics); true }
      catch { case _: Exception => false }
    case _ => false
  }

  /** Checks that will NOT survive serialization: custom lambda checks, plus
    * same-name siblings beyond the first on one column (the document format
    * keys checks by name per column — reference format — so a second
    * `str_contains` on the same column cannot round-trip; it is reported
    * here instead of silently dropped). */
  def unserializable(schema: DataFrameSchema): Seq[String] = {
    def dropped(cs: Seq[Check]): Seq[String] = {
      val ser = cs.filter(serializableCheck)
      val custom = cs.filterNot(serializableCheck).map(_.name)
      val dups = ser.groupBy(_.name).values.flatMap(_.drop(1))
        .map(c => s"${c.name} (duplicate name, dropped by document format)")
      custom ++ dups
    }
    schema.columns.flatMap(c => dropped(c._2.checks)) ++ dropped(schema.checks)
  }

  // ---- to/from nested maps ----------------------------------------------
  def toMap(schema: DataFrameSchema): Map[String, Any] = {
    // ListMaps keep a deterministic dump order (columns in declaration
    // order, checks alphabetical) so toYaml is a stable fixpoint.
    def checksMap(cs: Seq[Check]): Map[String, Any] =
      scala.collection.immutable.ListMap(
        cs.filter(serializableCheck).map(c => c.name -> (c.statistics: Any))
          .sortBy(_._1): _*)
    scala.collection.immutable.ListMap[String, Any](
      "schema_type" -> "dataframe",
      "version" -> Version,
      "name" -> schema.name.orNull,
      "title" -> schema.title.orNull,
      "description" -> schema.description.orNull,
      "columns" -> scala.collection.immutable.ListMap(schema.columns.map { case (n, c) =>
        n -> (scala.collection.immutable.ListMap[String, Any](
          "dtype" -> c.dtype.map(dtypeToName).orNull,
          "nullable" -> c.nullable,
          "unique" -> c.unique,
          "coerce" -> c.coerce,
          "required" -> c.required,
          "regex" -> c.regex,
          "default" -> c.default.orNull,
          "title" -> c.title.orNull,
          "description" -> c.description.orNull,
          "checks" -> checksMap(c.checks)): Any)
      }: _*),
      "column_order" -> schema.columnNames,
      "checks" -> checksMap(schema.checks),
      "unique" -> schema.unique,
      "coerce" -> schema.coerce,
      "strict" -> (schema.strict match {
        case Strict.NotStrict => false
        case Strict.Error     => true
        case Strict.Filter    => "filter"
      }),
      "ordered" -> schema.ordered,
      "unique_column_names" -> schema.uniqueColumnNames,
      "add_missing_columns" -> schema.addMissingColumns,
      "drop_invalid_rows" -> schema.dropInvalidRows,
      "report_duplicates" -> (schema.reportDuplicates match {
        case ReportDuplicates.All          => "all"
        case ReportDuplicates.ExcludeFirst => "exclude_first"
        case ReportDuplicates.ExcludeLast  => "exclude_last"
      }))
  }

  def fromMap(m: Map[String, Any]): DataFrameSchema = {
    def str(a: Any): String = String.valueOf(a)
    def boolOf(a: Any): Boolean = a match {
      case b: Boolean => b; case s: String => s.toBoolean; case _ => false
    }
    val colsRaw = m.getOrElse("columns", Map.empty).asInstanceOf[Map[String, Any]]
    val order = m.get("column_order").map(_.asInstanceOf[Seq[Any]].map(str))
      .getOrElse(colsRaw.keys.toSeq.sorted)
    val columns = order.filter(colsRaw.contains).map { n =>
      val cm = colsRaw(n).asInstanceOf[Map[String, Any]]
      val checks = cm.getOrElse("checks", Map.empty).asInstanceOf[Map[String, Any]]
        .toSeq.sortBy(_._1)
        .map { case (cn, st) => checkFromStats(cn, st.asInstanceOf[Map[String, Any]]) }
      n -> ColumnSchema(
        dtype = Option(cm.getOrElse("dtype", null)).map(d => nameToDtype(str(d))),
        checks = checks,
        nullable = cm.get("nullable").forall(boolOf),
        unique = cm.get("unique").exists(boolOf),
        coerce = cm.get("coerce").exists(boolOf),
        required = cm.get("required").forall(boolOf),
        regex = cm.get("regex").exists(boolOf),
        default = Option(cm.getOrElse("default", null)),
        title = Option(cm.getOrElse("title", null)).map(str),
        description = Option(cm.getOrElse("description", null)).map(str))
    }
    val tableChecks = m.getOrElse("checks", Map.empty).asInstanceOf[Map[String, Any]]
      .toSeq.sortBy(_._1)
      .map { case (cn, st) => checkFromStats(cn, st.asInstanceOf[Map[String, Any]]) }
    DataFrameSchema(
      columns = columns,
      checks = tableChecks,
      unique = m.get("unique").map(_.asInstanceOf[Seq[Any]].map(str)).getOrElse(Nil),
      coerce = m.get("coerce").exists(boolOf),
      strict = m.getOrElse("strict", false) match {
        case "filter" => Strict.Filter
        case b if boolOf(b) => Strict.Error
        case _ => Strict.NotStrict
      },
      ordered = m.get("ordered").exists(boolOf),
      uniqueColumnNames = m.get("unique_column_names").exists(boolOf),
      addMissingColumns = m.get("add_missing_columns").exists(boolOf),
      dropInvalidRows = m.get("drop_invalid_rows").exists(boolOf),
      reportDuplicates = m.getOrElse("report_duplicates", "all") match {
        case "exclude_first" => ReportDuplicates.ExcludeFirst
        case "exclude_last"  => ReportDuplicates.ExcludeLast
        case _               => ReportDuplicates.All
      },
      name = Option(m.getOrElse("name", null)).map(str),
      title = Option(m.getOrElse("title", null)).map(str),
      description = Option(m.getOrElse("description", null)).map(str))
  }

  // ---- scala ⇄ java for snakeyaml/jackson --------------------------------
  private def toJava(a: Any): Any = a match {
    case m: Map[_, _] => m.map { case (k, v) => String.valueOf(k) -> toJava(v) }.asJava
    case s: Seq[_]    => s.map(toJava).asJava
    // temporal statistics (e.g. inferred min/max) → ISO strings; Spark
    // compares string literals against timestamp/date columns natively.
    case t: java.time.LocalDateTime => t.toString
    case t: java.time.Instant       => t.toString
    case t: java.time.LocalDate     => t.toString
    case t: java.sql.Timestamp      => t.toLocalDateTime.toString
    case t: java.sql.Date           => t.toLocalDate.toString
    case o => o
  }
  private def toScala(a: Any): Any = a match {
    case m: java.util.Map[_, _] =>
      m.asScala.map { case (k, v) => String.valueOf(k) -> toScala(v) }.toMap
    case l: java.util.List[_] => l.asScala.map(toScala).toSeq
    case o => o
  }

  // ---- YAML ---------------------------------------------------------------
  def toYaml(schema: DataFrameSchema): String = {
    val opts = new org.yaml.snakeyaml.DumperOptions
    opts.setDefaultFlowStyle(org.yaml.snakeyaml.DumperOptions.FlowStyle.BLOCK)
    new org.yaml.snakeyaml.Yaml(opts).dump(toJava(toMap(schema)))
  }
  def fromYaml(s: String): DataFrameSchema = {
    val loaded = new org.yaml.snakeyaml.Yaml().load[Any](s)
    fromMap(toScala(loaded).asInstanceOf[Map[String, Any]])
  }

  // ---- JSON ---------------------------------------------------------------
  private lazy val jackson = new com.fasterxml.jackson.databind.ObjectMapper()
  def toJson(schema: DataFrameSchema): String =
    jackson.writerWithDefaultPrettyPrinter().writeValueAsString(toJava(toMap(schema)))
  def fromJson(s: String): DataFrameSchema = {
    val loaded = jackson.readValue(s, classOf[java.util.Map[String, Any]])
    fromMap(toScala(loaded).asInstanceOf[Map[String, Any]])
  }

  // ---- schema-as-code (reference: to_script, io/pandas_io.py:738) ---------
  def toScript(schema: DataFrameSchema): String = {
    def lit(a: Any): String = a match {
      case s: String => "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
      case l: Long   => l + "L"
      case o         => String.valueOf(o)
    }
    def checkCode(c: Check): Option[String] = c match {
      case cc: ColumnCheck if serializableCheck(cc) =>
        val st = cc.statistics
        Some(cc.name match {
          case "equal_to" => s"Check.equalTo(${lit(st("value"))})"
          case "not_equal_to" => s"Check.notEqualTo(${lit(st("value"))})"
          case "greater_than" => s"Check.greaterThan(${lit(st("min_value"))})"
          case "greater_than_or_equal_to" => s"Check.ge(${lit(st("min_value"))})"
          case "less_than" => s"Check.lessThan(${lit(st("max_value"))})"
          case "less_than_or_equal_to" => s"Check.le(${lit(st("max_value"))})"
          case "in_range" => s"Check.inRange(${lit(st("min_value"))}, ${lit(st("max_value"))})"
          case "isin" => s"Check.isin(Seq(${st("allowed_values").asInstanceOf[Seq[Any]].map(lit).mkString(", ")}))"
          case "notin" => s"Check.notin(Seq(${st("forbidden_values").asInstanceOf[Seq[Any]].map(lit).mkString(", ")}))"
          case "str_matches" => s"Check.strMatches(${lit(st("pattern"))})"
          case "str_contains" => s"Check.strContains(${lit(st("pattern"))})"
          case "str_startswith" => s"Check.strStartswith(${lit(st("string"))})"
          case "str_endswith" => s"Check.strEndswith(${lit(st("string"))})"
          case _ => s"SchemaIO.checkFromStats(${lit(cc.name)}, Map())"
        })
      case _ => None
    }
    val cols = schema.columns.map { case (n, c) =>
      val checks = c.checks.flatMap(checkCode).mkString(", ")
      val dt = c.dtype.map(d => s"Some(org.apache.spark.sql.types.DataType.fromDDL(${lit(d.sql)}))").getOrElse("None")
      s"""    ${lit(n)} -> ColumnSchema($dt, Seq($checks), nullable = ${c.nullable}, unique = ${c.unique}, coerce = ${c.coerce})"""
    }.mkString(",\n")
    s"""import graft.checks.Check
       |import graft.schema._
       |import graft.io.SchemaIO
       |
       |val schema = DataFrameSchema(
       |$cols)
       |""".stripMargin
  }
}
