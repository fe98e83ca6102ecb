package graft.tools
object ListQueries {
  def main(args: Array[String]): Unit = {
    graft.SparkEntry.queries.keys.toSeq.sorted.foreach(println)
    System.err.println("oracles: " + graft.SparkEntry.oracleSql.size)
  }
}
