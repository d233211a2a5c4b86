package graft.sources

import java.io.{BufferedReader, BufferedWriter, InputStreamReader, OutputStreamWriter}
import java.net.{InetSocketAddress, Socket}
import java.nio.charset.StandardCharsets

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ArrayNode
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Driver-side client for the remote EVAL protocol — Kerf IPC's
  * "send a program, get a value" (reference: the REPLICATED_SOCKET_THINGS
  * + MESSAGE presented types, /root/reference/enums.h:264,278; the
  * folio-of-sockets remote execution surface presented.h:427–430). The
  * dialect's `rexec 'host:port' 'program'` verb lands here.
  *
  * This is the QUESTION-to-the-data direction: the program evaluates on
  * the site's Spark session (its own cluster, its own tables) and only
  * the result VALUE crosses the wire — REPL-sized by the server's
  * maxEvalRows contract. The returned frame is a LOCAL dataset on the
  * caller (the rows already crossed the wire; there is nothing left to
  * push down), so compose rexec results with local tables via ordinary
  * joins — Spark will broadcast the small side.
  */
object RemoteEval {
  private val connectTimeoutMs = 5000
  private val readTimeoutMs = 600000 // programs run real queries remotely

  /** `site` accepts `host:port:token` (what [[RemoteTableServer
    * .evalHandle]] prints — the kdb `host:port:user:pass` handle shape;
    * eval sites authenticate, so this is the normal form), plus
    * token-less `host:port` / `remote://host:port[/table]` forms for
    * sites that would refuse anyway (the not-enabled error path). The
    * table suffix is irrelevant to eval and is dropped, not parsed
    * into the port; tokens never parse as ports (they carry a letter),
    * so the two handle shapes stay unambiguous. */
  def call(spark: SparkSession, site: String, program: String): DataFrame = {
    val hp = site.stripPrefix("remote://").takeWhile(_ != '/')
    val segs = hp.split(':')
    val (host, portStr, token) =
      if (segs.length >= 3 && segs.last.toIntOption.isEmpty &&
          segs(segs.length - 2).toIntOption.isDefined)
        (segs.dropRight(2).mkString(":"), segs(segs.length - 2), segs.last)
      else hp.lastIndexOf(':') match {
        case -1 => throw new IllegalArgumentException(
          s"rexec: site must be host:port[:token] or remote://host:port[/table], got '$site'")
        case i => (hp.substring(0, i), hp.substring(i + 1), "")
      }
    val port = portStr.toIntOption.getOrElse(throw new IllegalArgumentException(
      s"rexec: malformed port '$portStr' in site '$site'"))
    val sock = new Socket()
    try {
      sock.connect(new InetSocketAddress(host, port), connectTimeoutMs)
      sock.setSoTimeout(readTimeoutMs)
      val out = new BufferedWriter(
        new OutputStreamWriter(sock.getOutputStream, StandardCharsets.UTF_8))
      val in = new BufferedReader(
        new InputStreamReader(sock.getInputStream, StandardCharsets.UTF_8))
      val m = new ObjectMapper()
      val req = m.createObjectNode()
      req.put("op", "eval")
      req.put("program", program)
      if (token.nonEmpty) req.put("token", token)
      out.write(req.toString); out.newLine(); out.flush()

      val first = in.readLine()
      require(first != null, s"rexec: $host:$port closed the connection")
      val hdr = m.readTree(first)
      if (hdr.has("error"))
        throw new RuntimeException(s"rexec failed at $host:$port: " +
          hdr.path("error").asText())
      val schema = StructType.fromDDL(hdr.path("schema").asText())
      val fields = schema.fields
      // one decoder for BOTH protocol halves: values decode through
      // RemoteCodec.fromJson (the scan wire's decoder — quoted-NaN
      // handling and all), then convert Catalyst-internal -> external
      // for Row. A duplicated switch here once let a codec fix land on
      // only one side.
      val toExternal = fields.map(f =>
        org.apache.spark.sql.catalyst.CatalystTypeConverters
          .createToScalaConverter(f.dataType))
      val rows = scala.collection.mutable.ArrayBuffer[Row]()
      var done = false
      while (!done) {
        val line = in.readLine()
        require(line != null, s"rexec: $host:$port closed mid-result")
        val node = m.readTree(line)
        if (node.isObject) {
          if (node.has("error"))
            throw new RuntimeException(s"rexec failed at $host:$port: " +
              node.path("error").asText())
          done = true // {"done":n}
        } else {
          val arr = node.asInstanceOf[ArrayNode]
          val vals = new Array[Any](fields.length)
          var i = 0
          while (i < fields.length) {
            vals(i) = toExternal(i)(
              RemoteCodec.fromJson(arr.get(i), fields(i).dataType))
            i += 1
          }
          rows += Row.fromSeq(vals.toIndexedSeq)
        }
      }
      spark.createDataFrame(
        new java.util.ArrayList[Row](scala.jdk.CollectionConverters
          .SeqHasAsJava(rows.toSeq).asJava), schema)
    } finally {
      try sock.close() catch { case _: Throwable => () }
    }
  }

}
