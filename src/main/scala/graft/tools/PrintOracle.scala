package graft.tools
object PrintOracle {
  def main(args: Array[String]): Unit = {
    val keys = args.toSeq
    val m = graft.SparkEntry.oracleSql
    keys.foreach { k =>
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"/tmp/oracle_$k.sql"),
        m(k).getBytes("UTF-8"))
    }
    println("written: " + keys.mkString(", "))
  }
}
