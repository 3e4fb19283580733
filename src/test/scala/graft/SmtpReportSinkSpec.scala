package graft

import java.io.{BufferedReader, BufferedWriter, InputStreamReader, OutputStreamWriter}
import java.net.ServerSocket
import java.nio.charset.StandardCharsets.US_ASCII

import scala.collection.mutable.ArrayBuffer

import org.scalatest.funsuite.AnyFunSuite

import graft.sinks.SmtpReportSink

/** K6: the SMTP report transport speaks enough RFC 5321 to deliver
  * the describe() report — verified against an in-process stub server
  * (the reference's real counterpart is smtplib + a live relay,
  * my_data_pipeline.py:178-197; the wire protocol is the testable
  * part). */
class SmtpReportSinkSpec extends AnyFunSuite {

  test("delivers subject and body over the SMTP exchange") {
    val stub = new SmtpStub
    try {
      val sink = new SmtpReportSink("127.0.0.1", stub.server.getLocalPort,
        "graft@example.com", Seq("ops@example.com", "data@example.com"))
      sink.send("daily air quality", "count  mean\n3      41.5")
      assert(stub.commands.exists(_.startsWith("HELO")))
      assert(stub.commands.contains("MAIL FROM:<graft@example.com>"))
      assert(stub.commands.contains("RCPT TO:<ops@example.com>"))
      assert(stub.commands.contains("RCPT TO:<data@example.com>"))
      assert(stub.data.contains("Subject: daily air quality"))
      assert(stub.data.contains("count  mean"))
      assert(stub.data.contains("3      41.5"))
    } finally stub.server.close()
  }

  test("dot-stuffs body lines starting with a period (RFC 5321 4.5.2)") {
    val stub = new SmtpStub
    try {
      val sink = new SmtpReportSink("127.0.0.1", stub.server.getLocalPort,
        "a@b.c", Seq("d@e.f"))
      sink.send("s", ".25   0.5\nplain")
      // the lone-dot terminator must NOT have been swallowed by the
      // body line; the stuffed line arrives with the extra dot intact
      assert(stub.data.contains("..25   0.5"))
      assert(stub.data.contains("plain"))
    } finally stub.server.close()
  }

  test("end-to-end: the air-quality app emails every pollutant report") {
    val stub = new SmtpStub
    try {
      val sink = new SmtpReportSink("127.0.0.1", stub.server.getLocalPort,
        "graft@example.com", Seq("ops@example.com"))
      val r = graft.app.AirQualityApp.run(SharedSession.spark,
        outDir = None, reporter0 = Some(sink))
      assert(r.nErrors >= 0)
      // Result.reports is captured by the recording wrapper even when
      // the transport is SMTP, not just for the console sink
      assert(r.reports.size == 4)
      assert(r.reports.map(_._1).forall(_.startsWith("Air quality summary")))
      val subjects = stub.synchronized {
        stub.data.filter(_.startsWith("Subject: ")).toList
      }
      // one emailed describe() report per pollutant, like the
      // reference's enviar_email loop
      assert(subjects.size == 4, subjects)
      assert(subjects.forall(_.startsWith("Subject: Air quality summary:")),
        subjects)
      assert(stub.synchronized(stub.data.exists(_.contains("mean"))))
    } finally stub.server.close()
  }

  test("rejects CR/LF in subject and addresses (header injection)") {
    intercept[IllegalArgumentException] {
      new SmtpReportSink("h", 25, "a@b.c\r\nRCPT TO:<evil@x>", Seq("d@e.f"))
    }
    intercept[IllegalArgumentException] {
      new SmtpReportSink("h", 25, "a@b.c", Seq("d@e.f\nX-Inject: 1"))
    }
    val stub = new SmtpStub
    try {
      val sink = new SmtpReportSink("127.0.0.1", stub.server.getLocalPort,
        "a@b.c", Seq("d@e.f"))
      intercept[IllegalArgumentException] {
        sink.send("subj\r\nBcc: hidden@x", "body")
      }
    } finally stub.server.close()
  }

  test("fails fast on a rejecting server") {
    val server = new ServerSocket(0)
    val t = new Thread(() => {
      val sock = server.accept()
      val out = new BufferedWriter(
        new OutputStreamWriter(sock.getOutputStream, US_ASCII))
      out.write("554 no service\r\n"); out.flush()
      sock.close()
    })
    t.setDaemon(true); t.start()
    try {
      val sink = new SmtpReportSink("127.0.0.1", server.getLocalPort,
        "a@b.c", Seq("d@e.f"))
      val e = intercept[IllegalArgumentException](sink.send("s", "b"))
      assert(e.getMessage.contains("554"))
    } finally server.close()
  }
}
