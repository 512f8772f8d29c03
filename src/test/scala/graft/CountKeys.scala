package graft
object CountKeys {
  def main(args: Array[String]): Unit = {
    val qs = SparkEntry.queries.keySet
    val os = SparkEntry.oracleSql.keySet
    println(s"queries=${qs.size} oracle=${os.size} oracleOnlyDiff=${(os -- qs).toSeq.sorted}")
    println(s"prop-only=${(qs -- os).toSeq.sorted.mkString(",")}")
  }
}
