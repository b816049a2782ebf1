package graft.tools

import java.nio.file.{Files, Paths}

/** Dev tool: write SparkEntry.oracleSql as oracle_sql.json (the Verify
  * format) WITHOUT dumping any query results — lets check_oracle.py run
  * against a DumpProbe subset. `sbt "runMain graft.tools.OracleSqlDump
  * /tmp/out"`. */
object OracleSqlDump {
  def main(args: Array[String]): Unit = {
    val Array(outDir) = args
    new java.io.File(outDir).mkdirs()
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
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
  }
}
