package graft
import org.apache.spark.sql.SparkSession
object ExplainCellMath {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries("cell_math_int_suite")(s, "/root/testdata/sf0.001")
    println(df.queryExecution.executedPlan.toString.linesIterator
      .map(_.take(100)).take(40).mkString("\n"))
  }
}
