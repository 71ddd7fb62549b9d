package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev scratchpad: evaluate one-off SQL against an in-memory session to
  * probe Spark↔DuckDB function parity. Not part of the driver contract.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { sql =>
      println(s"SQL> $sql")
      try spark.sql(sql).show(20, truncate = false)
      catch { case e: Throwable =>
        println(s"ERR: ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}") }
    }
    spark.stop()
  }
}

/** Same, but one SQL statement per line of the file given as args(0)
  * (shell quoting mangles inline SQL literals).
  */
object ProbeFile {
  def main(args: Array[String]): Unit = {
    val sqls = scala.io.Source.fromFile(args(0)).getLines().filter(_.trim.nonEmpty).toList
    Probe.main(sqls.toArray)
  }
}
