package graft

import java.io.{BufferedReader, BufferedWriter, InputStreamReader, OutputStreamWriter}
import java.net.ServerSocket
import java.nio.charset.StandardCharsets.US_ASCII

import scala.collection.mutable.ArrayBuffer

/** Stub SMTP server for sink tests: greets, 250s commands, 354s DATA,
  * records message bodies until the lone-dot terminator. Accepts
  * connections in a loop (one per `send`) until the server socket is
  * closed; `commands`/`data` accumulate across connections
  * (synchronized — the accept thread writes, the test thread reads
  * after `join`/close). */
final class SmtpStub {
  val server = new ServerSocket(0)
  val commands = ArrayBuffer.empty[String]
  val data = ArrayBuffer.empty[String]
  val thread = new Thread(() => {
    try while (!server.isClosed) {
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
          else synchronized { data += line }
        } else {
          synchronized { commands += line }
          line.takeWhile(_ != ' ').toUpperCase match {
            case "DATA" => inData = true; reply("354 go ahead")
            case "QUIT" => reply("221 bye"); sock.close(); done = true
            case "EHLO" => reply("250-stub"); reply("250 OK")
            case _ => reply("250 OK")
          }
        }
        if (!done) line = in.readLine()
      }
    } catch { case _: java.net.SocketException => () } // server closed
  })
  thread.setDaemon(true)
  thread.start()
}
