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

  /** One-connection stub SMTP server: greets, 250s commands, 354s
    * DATA, records the message body until the lone-dot terminator. */
  private class StubServer {
    val server = new ServerSocket(0)
    val commands = ArrayBuffer.empty[String]
    val data = ArrayBuffer.empty[String]
    val thread = new Thread(() => {
      val sock = server.accept()
      val in = new BufferedReader(
        new InputStreamReader(sock.getInputStream, US_ASCII))
      val out = new BufferedWriter(
        new OutputStreamWriter(sock.getOutputStream, US_ASCII))
      def reply(s: String): Unit = { out.write(s); out.write("\r\n"); out.flush() }
      reply("220 stub ESMTP")
      var inData = false
      var done = false
      var line = in.readLine()
      while (line != null && !done) {
        if (inData) {
          if (line == ".") { inData = false; reply("250 OK queued") }
          else data += line
        } else {
          commands += line
          line.takeWhile(_ != ' ').toUpperCase match {
            case "DATA" => inData = true; reply("354 go ahead")
            case "QUIT" => reply("221 bye"); sock.close(); done = true
            case "EHLO" => reply("250-stub"); reply("250 OK")
            case _ => reply("250 OK")
          }
        }
        if (!done) line = in.readLine()
      }
    })
    thread.setDaemon(true)
    thread.start()
  }

  test("delivers subject and body over the SMTP exchange") {
    val stub = new StubServer
    try {
      val sink = new SmtpReportSink("127.0.0.1", stub.server.getLocalPort,
        "graft@example.com", Seq("ops@example.com", "data@example.com"))
      sink.send("daily air quality", "count  mean\n3      41.5")
      stub.thread.join(5000)
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
    val stub = new StubServer
    try {
      val sink = new SmtpReportSink("127.0.0.1", stub.server.getLocalPort,
        "a@b.c", Seq("d@e.f"))
      sink.send("s", ".25   0.5\nplain")
      stub.thread.join(5000)
      // the lone-dot terminator must NOT have been swallowed by the
      // body line; the stuffed line arrives with the extra dot intact
      assert(stub.data.contains("..25   0.5"))
      assert(stub.data.contains("plain"))
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
