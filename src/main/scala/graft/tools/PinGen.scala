package graft.tools

import org.apache.spark.sql.SparkSession

/** Maintenance utility: print a SparkEntry query's result as a DuckDB
  * `(VALUES ...)` list for authoring golden pins (the oracle form used for
  * the seeded-but-not-SQL-expressible operators: LSH/IVF top-k, SimHash).
  * Usage: runMain graft.tools.PinGen <queryName> <sfDir> */
object PinGen {
  def main(args: Array[String]): Unit = {
    val Array(name, sfDir) = args
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    val rows = df.collect().map { r =>
      (0 until r.length).map { i =>
        r.get(i) match {
          case null      => "NULL"
          case s: String => "'" + s.replace("'", "''") + "'"
          case v         => v.toString
        }
      }.mkString("(", ", ", ")")
    }
    println(s"-- $name @ $sfDir: ${rows.length} rows, cols ${df.columns.mkString(",")}")
    println(rows.mkString(", "))
    spark.stop()
  }
}
