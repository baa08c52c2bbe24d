package graft.tools

/** Budget-discipline helper: prints the declared query inventory, the
  * worst-case bench line length (the number BenchLineSpec pins under
  * 1,850), and the keys/oracle drift check — without starting Spark.
  * Run: `sbt "runMain graft.tools.Inventory"`.
  */
object Inventory {
  def main(args: Array[String]): Unit = {
    val qk = graft.SparkEntry.queries.keys.toSeq.sorted
    val ok = graft.SparkEntry.oracleSql.keys.toSet
    val line = graft.Bench.buildLine(qk.map(_ -> 9.9), Seq.empty, "sf0.1")
    println(s"queries=${qk.size} oracles=${ok.size} worstLine=${line.length}/1850")
    val drift = (qk.filterNot(ok) , ok.toSeq.filterNot(qk.toSet))
    if (drift._1.nonEmpty) println(s"queries-without-oracle=${drift._1.mkString(",")}")
    if (drift._2.nonEmpty) println(s"oracles-without-query=${drift._2.mkString(",")}")
    println(qk.mkString(","))
  }
}
