package graft.tools
object CountGates {
  def main(args: Array[String]): Unit = {
    println(s"GATES=${graft.SparkEntry.queries.size} ORACLES=${graft.SparkEntry.oracleSql.size}")
  }
}
