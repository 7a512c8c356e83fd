package graft.streaming

import graft.SparkSpec
import graft.fpl.{Fixture, Ingest}

/** S1: the reference's actual source — a TCP line socket
  * (`socketTextStream("localhost", 6100)`, reference master.py:330) —
  * exercised against a real localhost server feeding the replay
  * fixture through the full ingest path. */
class SocketSourceSpec extends SparkSpec {

  test("socket text source streams the fixture through ingest (S1)") {
    val server = new java.net.ServerSocket(0)
    val port = server.getLocalPort
    val writer = new Thread(() => {
      val sock = server.accept()
      val out = new java.io.PrintWriter(sock.getOutputStream, true)
      Fixture.allLines.foreach(out.println)
      out.flush()
      // keep the connection open so the source doesn't restart
      Thread.sleep(30000)
      sock.close()
    })
    writer.setDaemon(true)
    writer.start()

    val lines = spark.readStream
      .format("socket")
      .option("host", "localhost").option("port", port)
      .load()
    val q = Ingest.parse(lines)
      .writeStream.format("memory").queryName("socket_parsed")
      .outputMode("append").start()
    try {
      val deadline = System.currentTimeMillis() + 30000
      var n = 0L
      while (n < Fixture.allLines.size && System.currentTimeMillis() < deadline) {
        q.processAllAvailable()
        n = spark.table("socket_parsed").count()
        if (n < Fixture.allLines.size) Thread.sleep(200)
      }
      assert(n == Fixture.allLines.size,
        s"expected ${Fixture.allLines.size} parsed rows, got $n")
      // record-type split works on socket-fed rows too
      val parsed = spark.table("socket_parsed")
      assert(parsed.filter("wyId IS NOT NULL").count() == 1)
      assert(parsed.filter("eventId IS NOT NULL AND wyId IS NULL").count()
        == Fixture.eventJsons.size)
    } finally {
      q.stop()
      server.close()
    }
  }
}
