package graft.tools
import org.apache.spark.sql.SparkSession
object ExtProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.sql("SELECT cosine_sim(array(CAST(1.0 AS DOUBLE), CAST(2.0 AS DOUBLE)), array(CAST(2.0 AS DOUBLE), CAST(4.0 AS DOUBLE))) AS c, simhash64(array(7L, 7L)) AS s").show()
    spark.stop()
  }
}
