package graft

import java.sql.DriverManager
import graft.SparkSpec

/** End-to-end JDBC: start the Thrift server on the shared session,
  * connect with the bundled hive-jdbc driver, run the flagship
  * aggregation over the wire, compare to the DataFrame result. */
class JdbcServerSpec extends SparkSpec {

  test("hive-jdbc client queries registered tables over the wire") {
    // keep derby/metastore scratch out of the repo tree
    System.setProperty("derby.system.home",
      java.nio.file.Files.createTempDirectory("graft_derby").toString)
    val port = {
      val s = new java.net.ServerSocket(0)
      try s.getLocalPort.toString finally s.close()
    }
    val server = JdbcServer.start(spark, "/root/testdata/sf0.001", port)
    try {
      Class.forName("org.apache.hive.jdbc.HiveDriver")
      // the server accepts connections slightly after start: retry briefly
      val conn = {
        var c: java.sql.Connection = null
        var attempts = 0
        while (c == null && attempts < 30) {
          try c = DriverManager.getConnection(
            s"jdbc:hive2://localhost:$port/default", "", "")
          catch { case _: Exception => attempts += 1; Thread.sleep(1000) }
        }
        assert(c != null, "could not connect to thrift server")
        c
      }
      try {
        val rs = conn.createStatement().executeQuery(
          """SELECT l_returnflag, COUNT(*) AS n
            |FROM global_temp.lineitem
            |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
        val viaJdbc = Iterator.continually(rs)
          .takeWhile(_.next()).map(r => (r.getString(1), r.getLong(2))).toSeq
        val viaDf = Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
          .groupBy("l_returnflag").count()
          .orderBy("l_returnflag")
          .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
        assert(viaJdbc == viaDf && viaJdbc.nonEmpty)
      } finally conn.close()

      // native-function parity: a FRESH connection gets its own derived
      // session — the registered graft functions must be visible there,
      // not only on the hosting session
      val conn2 = DriverManager.getConnection(
        s"jdbc:hive2://localhost:$port/default", "", "")
      try {
        val rs = conn2.createStatement().executeQuery(
          "SELECT cosine_sim(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c, " +
            "portable_simhash(array('x','y')) AS h, " +
            "normalize_spaces(lower('A,,B')) AS n")
        assert(rs.next())
        assert(math.abs(rs.getDouble(1) - 1.0) < 1e-12)
        assert(rs.getLong(2) != 0L)
        assert(rs.getString(3) == "a b")
      } finally conn2.close()
    } finally JdbcServer.stop(server)
  }
}
