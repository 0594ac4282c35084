package graft.tools

import java.nio.file.{Files, Paths}

/** Dump SparkEntry.oracleSql as JSON (same escaping as Verify) without
  * running the queries — feeds `scripts/duck_bench.py` for the bench
  * anchor protocol when no fresh verify_out exists.
  * `sbt "runMain graft.tools.DumpOracles /tmp/oracle_sql.json"` */
object DumpOracles {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/tmp/oracle_sql.json")
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = graft.SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(out), json)
    println(s"wrote ${graft.SparkEntry.oracleSql.size} oracle SQLs to $out")
  }
}
