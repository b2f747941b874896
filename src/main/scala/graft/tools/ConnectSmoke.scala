package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Spark Connect compatibility smoke (r19 verdict #5).
  *
  * Runs a representative slice of each operator-family mechanism against a
  * live Spark Connect server and prints one `CONNECT_SMOKE <leg> OK|FAIL`
  * line per leg — the measured evidence behind README's "Deployment note:
  * Spark Connect" matrix. Launch:
  *
  *   sbt package
  *   /opt/spark/sbin/start-connect-server.sh \
  *     --jars target/scala-2.13/<graft>.jar \
  *     --conf spark.sql.extensions=graft.functions.GraftSparkExtensions \
  *     --conf spark.sql.legacy.parquet.nanosAsLong=true
  *   # client classpath = graft jar + spark-connect-client-jvm + the
  *   # static NON-ENGINE classic jars graft's type references pull in
  *   # (scala-library/reflect, spark-common-utils{,-java}, spark-sql-api,
  *   # spark-unsafe + icu4j [StringType -> CollationFactory], spark-core
  *   # [SparkConf], json4s, antlr4-runtime, jackson, kryo+minlog+
  *   # objenesis+reflectasm, log4j+slf4j) and the Arrow module opens:
  *   java --add-opens=java.base/java.nio=ALL-UNNAMED \
  *        --add-opens=java.base/sun.nio.ch=ALL-UNNAMED \
  *     -cp <graft>.jar:connect-repl/spark-connect-client-jvm_*.jar:<above> \
  *     graft.tools.ConnectSmoke sc://localhost:15002 /root/testdata/sf0.001
  *
  * Measured r19 (this sandbox, Spark 4.1.2): 13/13 compatible legs OK —
  * incl. all three server-registered `graft_*` SQL-native legs — and
  * exactly the two expected-fail legs fail with NoClassDefFoundError on
  * `catalyst.expressions.Expression`, confirming the classic-only
  * boundary is the Column⇄Expression bridge and nothing else.
  *
  * The client JVM classpath deliberately has NO classic Spark jars: the
  * unified `org.apache.spark.sql.SparkSession` companion then resolves the
  * Connect implementation, and every leg exercises the exact code path a
  * Connect-only deployment would run. Legs that construct native Catalyst
  * expressions client-side are EXPECTED to fail (the Column⇄Expression
  * bridge is classic-only); their Connect route is the server-registered
  * SQL surface (`graft_*` functions via GraftSparkExtensions), which the
  * `sql_native_*` legs prove.
  */
object ConnectSmoke {
  private var failures = 0

  private def leg(name: String)(body: => Long): Unit =
    try println(s"CONNECT_SMOKE $name OK rows=$body")
    catch {
      case e: Throwable =>
        failures += 1
        val msg = String.valueOf(
          Option(e.getMessage).getOrElse(e.toString)).replace('\n', ' ')
        println(s"CONNECT_SMOKE $name FAIL ${e.getClass.getSimpleName}: ${msg.take(160)}")
    }

  /** Build a Connect session by reflecting DIRECTLY on the connect
    * companion. The unified `SparkSession.builder()` resolves its
    * implementation via a scala-reflect runtime-mirror companion lookup
    * that throws "Cannot find a SparkSession implementation" on this
    * distribution's client-only classpath even though the connect
    * companion itself loads fine (verified: `Class.forName(
    * "org.apache.spark.sql.connect.SparkSession$").getField("MODULE$")`
    * succeeds on the same classpath). Classic-compiled code cannot name
    * `connect.SparkSession` at compile time, so the three calls go
    * through java.lang.reflect; everything after this returns to the
    * unified compile-time API. */
  private def connectSession(url: String): SparkSession = {
    val cls = Class.forName("org.apache.spark.sql.connect.SparkSession$")
    val companion = cls.getField("MODULE$").get(null)
    val b = companion.getClass.getMethod("builder").invoke(companion)
    b.getClass.getMethod("remote", classOf[String]).invoke(b, url)
    b.getClass.getMethod("getOrCreate").invoke(b)
      .asInstanceOf[SparkSession]
  }

  def main(args: Array[String]): Unit = {
    val url = args.headOption.getOrElse("sc://localhost:15002")
    val sf = args.drop(1).headOption.getOrElse("/root/testdata/sf0.001")
    val spark = connectSession(url)
    println(s"CONNECT_SMOKE session ${spark.getClass.getName} version ${spark.version}")

    def docs: DataFrame = spark.read.parquet(s"$sf/documents.parquet")
    def li: DataFrame = spark.read.parquet(s"$sf/lineitem.parquet")
    def orders: DataFrame = spark.read.parquet(s"$sf/orders.parquet")

    // ---- pure-DataFrame families (expected OK, no server jar needed) ----
    leg("read_filter_agg") {
      li.filter(col("l_quantity") > 25)
        .groupBy("l_returnflag").agg(sum("l_extendedprice")).count()
    }
    leg("dedup_exact") {
      graft.ext.Dedup.dropExact(docs, Seq("text")).count() +
        graft.ext.Dedup.exactStats(docs, Seq("text")).count()
    }
    leg("text_quality") {
      docs.select(graft.ext.TextAnalysis.qualityScore(col("text"))).count()
    }
    leg("text_langid") {
      docs.select(graft.ext.TextAnalysis.languageId(col("text"))).count()
    }
    leg("text_gopher") {
      docs.select(graft.ext.TextAnalysis.gopherKeep(col("text"))).count()
    }
    leg("join_asof") {
      val l = orders.select(col("o_custkey").as("k"),
        col("o_orderdate").cast("timestamp").as("ts"), col("o_totalprice"))
      graft.ext.AsOfJoin.asOfJoin(l.limit(2000), l.limit(2000), Seq("k"),
        "ts", "ts", Seq("o_totalprice")).count()
    }
    leg("drift_psi") {
      graft.ext.Drift.psi(li.limit(20000), li.limit(10000),
        "l_extendedprice").count()
    }
    leg("sample_stratified") {
      graft.ext.Sampling.stratifiedSampleByKey(
        orders, "o_orderkey", "o_orderstatus",
        Map("O" -> 0.1, "F" -> 0.2), 0.05, 42L).count()
    }
    leg("events_sessionize") {
      val ev = orders.limit(5000).select(col("o_custkey").as("user_id"),
        col("o_orderdate").cast("timestamp").as("ts"))
      graft.ext.Sessions.sessionize(ev.withColumn("v", lit(1L)),
        "user_id", "ts", "v", "30 minutes").count()
    }
    leg("validate_schema_only") {
      import graft.schema._
      import graft.errors.GraftConfig
      val schema = DataFrameSchema(
        "o_orderkey" -> ColumnSchema(Some(org.apache.spark.sql.types.LongType), Nil, nullable = false))
      val r = graft.backend.Validator.validate(schema, orders,
        depth = GraftConfig.SchemaOnly)
      r.errors.size.toLong
    }

    // ---- server-registered SQL natives (OK iff the graft jar + extensions
    //      are on the SERVER; plan built purely from SQL text) ----
    leg("sql_native_minhash") {
      spark.sql("SELECT graft_minhash_sig(graft_word_shingles(array('a','b','c','d'), 2), 16) AS sig").count()
    }
    leg("sql_native_simhash_cosine") {
      spark.sql("SELECT graft_simhash64(array('x','y')) AS h, graft_cosine_sim(array(1.0,0.0), array(1.0,0.0)) AS c").count()
    }
    leg("sql_native_over_table") {
      docs.limit(100).createOrReplaceTempView("cs_docs")
      spark.sql("SELECT graft_simhash64(split(text, ' ')) AS h FROM cs_docs").count()
    }

    // ---- classic-only mechanisms (expected FAIL under Connect: the
    //      Column⇄Expression bridge / classic session internals) ----
    leg("native_column_api_expected_fail") {
      docs.select(graft.ext.Dedup.simhash64(col("text"))).count()
    }
    leg("validate_data_expected_fail") {
      // full data validation samples failure cases via the BoundedCollect
      // native aggregate — classic-only client-side
      import graft.schema._
      val schema = DataFrameSchema(
        "o_orderkey" -> ColumnSchema(Some(org.apache.spark.sql.types.LongType),
          Seq(graft.checks.Check.ge(1L)), nullable = false))
      graft.backend.Validator.validate(schema, orders).errors.size.toLong
    }

    println(s"CONNECT_SMOKE done failures=$failures")
    spark.close()
  }
}
