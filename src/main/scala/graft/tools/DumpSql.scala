package graft.tools
object DumpSql {
  def main(a: Array[String]): Unit = {
    val m = graft.SparkEntry.oracleSql
    a.foreach { n =>
      val f = new java.io.PrintWriter(s"/tmp/r8b_out/${n}.sql")
      f.print(m(n)); f.close()
    }
  }
}
