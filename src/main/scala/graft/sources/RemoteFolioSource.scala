package graft.sources

import java.io.{BufferedReader, BufferedWriter, InputStreamReader, OutputStreamWriter}
import java.net.Socket
import java.nio.charset.StandardCharsets
import java.util

import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DSv2 client for [[RemoteTableServer]] — the folio-of-remote-tables
  * member (/root/reference/presented.h:427–430) as a first-class Spark
  * table:
  *
  *   spark.read.format("graft.sources.RemoteFolioSource")
  *     .option("endpoint", "127.0.0.1:9099").option("table", "trades")
  *     .load()
  *
  * (or via [[graft.io.Folio.federatedRead]] with a `remote://host:port/
  * table` location, mixing remote sites into a local folio).
  *
  * Scale shape: `plan` returns the site's fragment list and the scan
  * plans ONE InputPartition per fragment — reader parallelism equals
  * remote file parallelism, each executor task holding one socket. The
  * scan pushes the required column set (remote parquet projection) and
  * every serializable filter over the wire; pushed filters are ALSO kept
  * as Spark-side residuals, so the remote evaluation only ever REDUCES
  * wire bytes — three-valued-logic corner cases (nulls, type edges)
  * cannot change results. `.explain` shows both prunings the usual way
  * (ReadSchema / PushedFilters).
  */
class RemoteFolioSource extends TableProvider with DataSourceRegister {
  import RemoteFolioSource._

  override def shortName(): String = "remotetable"
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val (host, port, table) = endpointOf(options)
    StructType.fromDDL(plan(host, port, table).schemaDdl)
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    val (host, port, table) = endpointOf(opts)
    val codec = Option(opts.get("wirecodec")).getOrElse("gzip")
    require(codec == "gzip" || codec == "none",
      s"remotetable option 'wireCodec' must be 'gzip' or 'none', got '$codec'")
    val format = Option(opts.get("wireformat")).getOrElse("bin")
    require(format == "bin" || format == "json",
      s"remotetable option 'wireFormat' must be 'bin' or 'json', got '$format'")
    new RemoteFolioTable(host, port, table, schema, codec, format)
  }
}

object RemoteFolioSource {
  final case class PlanInfo(schemaDdl: String, fragments: Seq[String],
                            bytes: Long)

  private[sources] def endpointOf(options: CaseInsensitiveStringMap): (String, Int, String) = {
    val ep = options.get("endpoint")
    val table = options.get("table")
    require(ep != null && ep.contains(":"),
      "remotetable requires option 'endpoint' as host:port")
    require(table != null && table.nonEmpty, "remotetable requires option 'table'")
    val Array(host, port) = ep.split(":", 2)
    (host, port.toInt, table)
  }

  /** Connect with bounded patience — a dead site must fail the task
    * loudly, never park it forever. Scan readers get a longer read
    * timeout than plan round-trips: an aggregated scan legitimately
    * computes a whole fragment before its first byte. */
  private[sources] def connect(host: String, port: Int,
                               readTimeoutMs: Int = 120000): Socket = {
    val sock = new Socket()
    sock.connect(new java.net.InetSocketAddress(host, port), 10000)
    sock.setSoTimeout(readTimeoutMs)
    sock
  }

  /** One plan round-trip: schema DDL + live fragment list. */
  def plan(host: String, port: Int, table: String): PlanInfo = {
    val sock = connect(host, port)
    try {
      val out = new BufferedWriter(
        new OutputStreamWriter(sock.getOutputStream, StandardCharsets.UTF_8))
      val in = new BufferedReader(
        new InputStreamReader(sock.getInputStream, StandardCharsets.UTF_8))
      val m = new ObjectMapper()
      val req = m.createObjectNode()
      req.put("op", "plan"); req.put("table", table)
      out.write(req.toString); out.newLine(); out.flush()
      val line = in.readLine() // null = closed without a byte; readTree
      if (line == null)        // would throw IAE, masking the IO failure
        throw new java.io.IOException("remote plan failed: connection closed")
      val resp = m.readTree(line)
      if (resp.has("error"))
        throw new java.io.IOException(
          s"remote plan failed: ${resp.path("error").asText()}")
      val frags = {
        val it = resp.path("fragments").elements()
        val b = Seq.newBuilder[String]
        while (it.hasNext) b += it.next().asText()
        b.result()
      }
      PlanInfo(resp.path("schema").asText(), frags,
        resp.path("bytes").asLong(Long.MaxValue))
    } finally sock.close()
  }
}

final class RemoteFolioTable(host: String, port: Int, tableName: String,
                             tableSchema: StructType,
                             wireCodec: String = "gzip",
                             wireFormat: String = "bin") extends Table with SupportsRead {
  override def name(): String = s"remote://$host:$port/$tableName"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new RemoteScanBuilder(host, port, tableName, tableSchema, wireCodec, wireFormat)
}

final class RemoteScanBuilder(host: String, port: Int, table: String,
                              full: StructType, wireCodec: String = "gzip",
                              wireFormat: String = "bin")
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters
    with org.apache.spark.sql.connector.read.SupportsPushDownAggregates {
  private var required: StructType = full
  private var pushed: Array[Filter] = Array.empty
  // the wire forms computed ONCE at push time — build() reuses them, so
  // the pushability decision and the shipped JSON can never drift (the
  // duplicated-switch hazard RemoteEval warns about on the decode side)
  private var pushedJson: Array[String] = Array.empty
  private var aggJson: Option[String] = None
  private var aggSchema: Option[StructType] = None

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** Keep EVERYTHING as residual: the remote evaluation is conservative
    * (drops only definitely-false rows), Spark re-verifies the rest. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val translated = filters.flatMap(f =>
      RemoteFilters.toJson(f).map(j => f -> j.toString))
    pushed = translated.map(_._1)
    pushedJson = translated.map(_._2)
    filters
  }
  override def pushedFilters(): Array[Filter] = pushed

  /** PARTIAL aggregate pushdown — the federation scale move: a pushed
    * group-by ships one partial row per (fragment × group) instead of
    * the fragment's rows; Spark's final aggregate merges the partials
    * like its own map-side output. Never complete pushdown (partials
    * from many fragments still need the merge), and never when filters
    * exist: our filter pushdown is conservative-3VL with Spark-side
    * residual re-evaluation, which cannot run on pre-aggregated rows —
    * Spark's own pushdown rule already refuses that shape (a Filter node
    * sits between Aggregate and relation), this guard keeps the
    * invariant local too. */
  override def supportCompletePushDown(agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean = false
  override def pushAggregation(agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean =
    if (pushed.nonEmpty) false
    else RemoteAggPush.translate(agg, full) match {
      case Some((json, schema)) =>
        aggJson = Some(json); aggSchema = Some(schema); true
      case None => false
    }

  override def build(): Scan =
    new RemoteScan(host, port, table, aggSchema.getOrElse(required),
      pushedJson, aggJson, wireCodec, wireFormat)
}

final class RemoteScan(host: String, port: Int, table: String,
                       required: StructType, filterJson: Array[String],
                       aggJson: Option[String] = None,
                       wireCodec: String = "gzip",
                       wireFormat: String = "bin")
    extends Scan with Batch
    with org.apache.spark.sql.connector.read.SupportsRuntimeFiltering
    with org.apache.spark.sql.connector.read.SupportsReportStatistics {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"RemoteScan remote://$host:$port/$table cols=[${required.fieldNames.mkString(",")}]" +
      aggJson.map(j => s" pushedAggregate=$j").getOrElse("")

  // ---- runtime (DPP-style) filtering: a broadcast join against a
  // filtered dim hands this scan the dim-side key set at RUN time;
  // shipping it to the site turns a full fact scan into a semi-join
  // scan. Same conservative contract as static filters: the join above
  // re-verifies every row, so the remote evaluation only sheds wire
  // bytes. Never offered on an aggregated scan — its output rows are
  // partials, not fact rows.
  private var runtimeFilterJson: Array[String] = Array.empty
  override def filterAttributes(): Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    if (aggJson.isDefined) Array.empty
    else required.fieldNames.map(org.apache.spark.sql.connector.expressions.Expressions.column)
  override def filter(filters: Array[Filter]): Unit =
    runtimeFilterJson = filters.flatMap(f => RemoteFilters.toJson(f)).map(_.toString)

  // one plan round-trip per scan, shared by partition planning and the
  // statistics report
  private lazy val planInfo = RemoteFolioSource.plan(host, port, table)

  override def planInputPartitions(): Array[InputPartition] =
    planInfo.fragments.map(f => RemoteFragment(f): InputPartition).toArray

  /** Site size for the optimizer (SupportsReportStatistics): without it
    * a DSv2 relation defaults to "huge" and a 100 KB remote dim would
    * SHUFFLE the fact side of every join instead of broadcasting —
    * at federation scale the single worst plan choice. On-disk parquet
    * bytes, the same basis FileScan uses. */
  override def estimateStatistics(): org.apache.spark.sql.connector.read.Statistics =
    new org.apache.spark.sql.connector.read.Statistics {
      override def sizeInBytes(): java.util.OptionalLong =
        java.util.OptionalLong.of(planInfo.bytes)
      override def numRows(): java.util.OptionalLong = java.util.OptionalLong.empty()
    }

  override def createReaderFactory(): PartitionReaderFactory =
    new RemoteReaderFactory(host, port, table, required,
      filterJson ++ runtimeFilterJson, aggJson, wireCodec, wireFormat)
}

final case class RemoteFragment(fragment: String) extends InputPartition

final class RemoteReaderFactory(host: String, port: Int, table: String,
                                schema: StructType, filterJson: Array[String],
                                aggJson: Option[String] = None,
                                wireCodec: String = "gzip",
                                wireFormat: String = "bin")
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new RemoteRowReader(host, port, table,
      p.asInstanceOf[RemoteFragment].fragment, schema, filterJson, aggJson,
      wireCodec, wireFormat)
}

/** One socket per fragment; rows stream as JSON lines and convert
  * straight to InternalRow (no Row intermediary). */
final class RemoteRowReader(host: String, port: Int, table: String,
                            fragment: String, schema: StructType,
                            filterJson: Array[String],
                            aggJson: Option[String] = None,
                            wireCodec: String = "gzip",
                            wireFormat: String = "bin")
    extends PartitionReader[InternalRow] {
  private val mapper = new ObjectMapper()
  private val socket = RemoteFolioSource.connect(host, port, readTimeoutMs = 600000)
  // request goes first (plain JSON); the response STREAM is then framed
  // per the requested codec (gzip, bus.h:110) and format (json|bin,
  // bus.h:106), so the reader wraps the input only after the request is
  // on the wire
  locally {
    val out = new BufferedWriter(
      new OutputStreamWriter(socket.getOutputStream, StandardCharsets.UTF_8))
    val req = mapper.createObjectNode()
    req.put("op", "scan"); req.put("table", table); req.put("fragment", fragment)
    req.put("codec", wireCodec); req.put("format", wireFormat)
    val cols = req.putArray("columns")
    // aggregated scan: the server derives its input columns from the
    // aggregate spec; `schema` here is the partial-OUTPUT schema (for
    // parsing), its synthetic names mean nothing remotely
    if (aggJson.isEmpty) schema.fieldNames.foreach(cols.add)
    val fs = req.putArray("filters")
    filterJson.foreach(j => fs.add(mapper.readTree(j)))
    aggJson.foreach(j => req.set[ObjectNode]("aggregate", mapper.readTree(j)))
    out.write(req.toString); out.newLine(); out.flush()
  }
  private val bodyStream: java.io.InputStream =
    if (wireCodec == "gzip") new java.util.zip.GZIPInputStream(socket.getInputStream, 8192)
    else socket.getInputStream
  private val jsonIn: BufferedReader =
    if (wireFormat == "json")
      new BufferedReader(new InputStreamReader(bodyStream, StandardCharsets.UTF_8))
    else null
  private val binIn: java.io.DataInputStream =
    if (wireFormat == "bin")
      new java.io.DataInputStream(new java.io.BufferedInputStream(bodyStream, 1 << 16))
    else null

  private val types: Array[DataType] = schema.fields.map(_.dataType)
  private var current: InternalRow = _

  private def nextJson(): Boolean = {
    val line = jsonIn.readLine()
    if (line == null)
      throw new java.io.IOException(
        s"remote server closed the stream mid-scan ($table/$fragment)")
    val node = mapper.readTree(line)
    if (node.isObject) {
      if (node.has("error"))
        throw new java.io.IOException(
          s"remote scan failed: ${node.path("error").asText()}")
      false // {"done":n}
    } else {
      val arr = node.asInstanceOf[ArrayNode]
      val vals = new Array[Any](types.length)
      var i = 0
      while (i < types.length) {
        vals(i) = RemoteCodec.fromJson(arr.get(i), types(i))
        i += 1
      }
      current = new GenericInternalRow(vals)
      true
    }
  }

  private def nextBin(): Boolean = {
    val tag =
      try binIn.readByte()
      catch {
        case _: java.io.EOFException =>
          throw new java.io.IOException(
            s"remote server closed the stream mid-scan ($table/$fragment)")
      }
    tag match {
      case 0 =>
        val vals = new Array[Any](types.length)
        var i = 0
        while (i < types.length) {
          vals(i) = RemoteCodec.readBin(binIn, types(i))
          i += 1
        }
        current = new GenericInternalRow(vals)
        true
      case 1 => binIn.readLong(); false // done + row count
      case 2 =>
        val b = new Array[Byte](binIn.readInt()); binIn.readFully(b)
        throw new java.io.IOException(
          s"remote scan failed: ${new String(b, StandardCharsets.UTF_8)}")
      case other =>
        throw new java.io.IOException(s"corrupt bin frame: unknown tag $other")
    }
  }

  override def next(): Boolean =
    if (binIn != null) nextBin() else nextJson()

  override def get(): InternalRow = current
  override def close(): Unit = socket.close()
}

/** Symmetric JSON value codec — the server serializes with [[addJson]],
  * the reader parses with [[fromJson]]; keeping both halves in one object
  * keeps the wire format honest. Numeric JSON round-trips exactly:
  * Jackson writes shortest-round-trip decimal forms for double/float and
  * full precision for longs. */
object RemoteCodec {
  def addJson(arr: ArrayNode, v: Any, dt: DataType): Unit =
    if (v == null) { arr.addNull(); () }
    else dt match {
      case LongType                         => arr.add(v.asInstanceOf[Long]); ()
      case IntegerType | DateType           => arr.add(v.asInstanceOf[Int]); ()
      case DoubleType                       => arr.add(v.asInstanceOf[Double]); ()
      case FloatType                        => arr.add(v.asInstanceOf[Float]); ()
      case BooleanType                      => arr.add(v.asInstanceOf[Boolean]); ()
      case StringType                       => arr.add(v.asInstanceOf[String]); ()
      case TimestampType | TimestampNTZType => arr.add(v.asInstanceOf[Long]); ()
      case ArrayType(et, _) =>
        val sub = arr.addArray()
        v.asInstanceOf[Seq[Any]].foreach(e => addJson(sub, e, et))
      case other => throw new UnsupportedOperationException(s"codec: $other")
    }

  /** Binary field form (the `bin` wire format): 1-byte null flag, then
    * the value big-endian (DataOutput IS network byte order — the bus's
    * byte-order flag, bus.h:106). Strings/arrays are i32-length-prefixed;
    * string payloads are raw UTF-8, so the reader materializes
    * UTF8String.fromBytes with no text round-trip. */
  def writeBin(o: java.io.DataOutputStream, v: Any, dt: DataType): Unit =
    if (v == null) o.writeByte(0)
    else {
      o.writeByte(1)
      dt match {
        case LongType | TimestampType | TimestampNTZType =>
          o.writeLong(v.asInstanceOf[Long])
        case IntegerType | DateType => o.writeInt(v.asInstanceOf[Int])
        case DoubleType             => o.writeDouble(v.asInstanceOf[Double])
        case FloatType              => o.writeFloat(v.asInstanceOf[Float])
        case BooleanType            => o.writeBoolean(v.asInstanceOf[Boolean])
        case StringType =>
          val b = v.asInstanceOf[String].getBytes(java.nio.charset.StandardCharsets.UTF_8)
          o.writeInt(b.length); o.write(b)
        case ArrayType(et, _) =>
          val s = v.asInstanceOf[Seq[Any]]
          o.writeInt(s.length)
          s.foreach(e => writeBin(o, e, et))
        case other => throw new UnsupportedOperationException(s"codec: $other")
      }
    }

  /** Binary → the Catalyst-internal value (mirror of [[writeBin]]). */
  def readBin(in: java.io.DataInputStream, dt: DataType): Any =
    if (in.readByte() == 0) null
    else dt match {
      case LongType | TimestampType | TimestampNTZType => in.readLong()
      case IntegerType | DateType => in.readInt()
      case DoubleType             => in.readDouble()
      case FloatType              => in.readFloat()
      case BooleanType            => in.readBoolean()
      case StringType =>
        val b = new Array[Byte](in.readInt()); in.readFully(b)
        UTF8String.fromBytes(b)
      case ArrayType(et, _) =>
        val n = in.readInt()
        val out = new Array[Any](n)
        var i = 0
        while (i < n) { out(i) = readBin(in, et); i += 1 }
        new GenericArrayData(out)
      case other => throw new UnsupportedOperationException(s"codec: $other")
    }

  /** JSON → the Catalyst-internal value for `dt` (UTF8String for strings,
    * micros Long for timestamps, days Int for dates, GenericArrayData for
    * arrays). */
  def fromJson(n: JsonNode, dt: DataType): Any =
    if (n == null || n.isNull) null
    else dt match {
      case LongType                         => n.asLong()
      case IntegerType | DateType           => n.asInt()
      // Jackson writes non-finite floats as QUOTED tokens ("NaN",
      // "Infinity") — a bare .asDouble() on a TextNode silently returns
      // 0.0, corrupting every non-finite value; parse text explicitly
      case DoubleType =>
        if (n.isTextual) java.lang.Double.parseDouble(n.asText()) else n.asDouble()
      case FloatType =>
        if (n.isTextual) java.lang.Float.parseFloat(n.asText()) else n.floatValue()
      case BooleanType                      => n.asBoolean()
      case StringType                       => UTF8String.fromString(n.asText())
      case TimestampType | TimestampNTZType => n.asLong()
      case ArrayType(et, _) =>
        val a = n.asInstanceOf[ArrayNode]
        val out = new Array[Any](a.size())
        var i = 0
        while (i < a.size()) { out(i) = fromJson(a.get(i), et); i += 1 }
        new GenericArrayData(out)
      case other => throw new UnsupportedOperationException(s"codec: $other")
    }
}

/** Translates a connector [[Aggregation]] into the wire form +
  * partial-output schema, or None when anything in it can't run
  * remotely (distinct flags, non-column arguments, unsupported types —
  * the scan then falls back to row shipping and Spark aggregates as
  * usual). Output types mirror Spark's own partial-aggregate buffers so
  * the rewritten final aggregate consumes them cast-free: count→long,
  * sum(integral)→long, sum(fractional)→double, min/max→input type. */
object RemoteAggPush {
  import org.apache.spark.sql.connector.expressions.{Expression => VExpr, NamedReference}
  import org.apache.spark.sql.connector.expressions.aggregate._

  private def columnOf(e: VExpr): Option[String] = e match {
    case nr: NamedReference if nr.fieldNames.length == 1 => Some(nr.fieldNames()(0))
    case _ => None
  }

  private val groupable: Set[DataType] = Set(
    LongType, IntegerType, DoubleType, FloatType, BooleanType, StringType,
    DateType, TimestampType, TimestampNTZType)

  def translate(agg: Aggregation, schema: StructType): Option[(String, StructType)] = {
    val m = new ObjectMapper()
    val root = m.createObjectNode()
    val gbNode = root.putArray("groupBy")
    val aggNode = root.putArray("aggs")
    val fields = Seq.newBuilder[StructField]

    val groupCols = agg.groupByExpressions().map(columnOf)
    if (groupCols.exists(_.isEmpty)) return None
    for (c <- groupCols.flatten) {
      val f = schema.find(_.name == c).getOrElse(return None)
      if (!groupable(f.dataType)) return None
      gbNode.add(c)
      fields += StructField(c, f.dataType, f.nullable)
    }

    def colType(c: String): Option[DataType] =
      schema.find(_.name == c).map(_.dataType)

    agg.aggregateExpressions().zipWithIndex.foreach { case (fn, i) =>
      def put(fname: String, col: String, outType: DataType): Unit = {
        val o = aggNode.addObject()
        o.put("fn", fname); if (col.nonEmpty) o.put("col", col)
        fields += StructField(s"agg_$i", outType, nullable = true)
      }
      fn match {
        case _: CountStar => put("count_star", "", LongType)
        case c: Count if !c.isDistinct =>
          val col = columnOf(c.column).getOrElse(return None)
          put("count", col, LongType)
        case s: Sum if !s.isDistinct =>
          val col = columnOf(s.column).getOrElse(return None)
          colType(col) match {
            case Some(LongType | IntegerType)  => put("sum", col, LongType)
            case Some(DoubleType | FloatType)  => put("sum", col, DoubleType)
            case _ => return None
          }
        case mn: Min =>
          val col = columnOf(mn.column).getOrElse(return None)
          colType(col).filter(groupable) match {
            case Some(dt) => put("min", col, dt)
            case None     => return None
          }
        case mx: Max =>
          val col = columnOf(mx.column).getOrElse(return None)
          colType(col).filter(groupable) match {
            case Some(dt) => put("max", col, dt)
            case None     => return None
          }
        case _ => return None
      }
    }
    Some((root.toString, StructType(fields.result())))
  }
}

/** Wire form + conservative remote evaluation of Spark source filters.
  *
  * Only filters whose value is a plain Number/String/Boolean serialize
  * (dates, timestamps, decimals, nested attributes stay client-side).
  * Server evaluation follows three-valued logic with UNKNOWN → keep:
  * a row is dropped only when the predicate is definitely false, which
  * makes remote filtering a pure optimization under the
  * keep-all-residuals client. */
object RemoteFilters {

  private def litJson(m: ObjectMapper, v: Any): Option[JsonNode] = v match {
    case n: java.lang.Long    => Some(m.getNodeFactory.numberNode(n.longValue()))
    case n: java.lang.Integer => Some(m.getNodeFactory.numberNode(n.intValue()))
    case n: java.lang.Short   => Some(m.getNodeFactory.numberNode(n.intValue()))
    case n: java.lang.Double  => Some(m.getNodeFactory.numberNode(n.doubleValue()))
    case n: java.lang.Float   => Some(m.getNodeFactory.numberNode(n.doubleValue()))
    case n: java.math.BigDecimal => Some(m.getNodeFactory.numberNode(n))
    case s: String            => Some(m.getNodeFactory.textNode(s))
    case s: UTF8String        => Some(m.getNodeFactory.textNode(s.toString))
    case b: java.lang.Boolean => Some(m.getNodeFactory.booleanNode(b.booleanValue()))
    case _                    => None
  }

  private def simpleCol(name: String): Boolean = !name.contains(".")

  // shared: ObjectMapper is heavyweight and thread-safe for node
  // creation; toJson runs once per filter per scan build
  private val sharedMapper = new ObjectMapper()

  def toJson(f: Filter): Option[ObjectNode] = {
    val m = sharedMapper
    def leaf(op: String, col: String, v: Any): Option[ObjectNode] =
      if (!simpleCol(col)) None
      else litJson(m, v).map { jn =>
        val o = m.createObjectNode()
        o.put("op", op); o.put("col", col); o.set[ObjectNode]("val", jn); o
      }
    f match {
      case EqualTo(c, v)            => leaf("eq", c, v)
      case GreaterThan(c, v)        => leaf("gt", c, v)
      case GreaterThanOrEqual(c, v) => leaf("ge", c, v)
      case LessThan(c, v)           => leaf("lt", c, v)
      case LessThanOrEqual(c, v)    => leaf("le", c, v)
      case IsNull(c) if simpleCol(c) =>
        val o = m.createObjectNode(); o.put("op", "isnull"); o.put("col", c); Some(o)
      case IsNotNull(c) if simpleCol(c) =>
        val o = m.createObjectNode(); o.put("op", "isnotnull"); o.put("col", c); Some(o)
      case In(c, vs) if simpleCol(c) && vs.nonEmpty =>
        val lits = vs.map(litJson(m, _))
        if (lits.exists(_.isEmpty)) None
        else {
          val o = m.createObjectNode()
          o.put("op", "in"); o.put("col", c)
          val a = o.putArray("vals"); lits.flatten.foreach(a.add)
          Some(o)
        }
      case _ => None
    }
  }

  /** Server-side predicate. `keeps(v)` answers "may this row satisfy the
    * filter?" — false only on DEFINITE failure. */
  sealed trait Pred { def col: String; def keeps(v: Any): Boolean }

  /** None = incomparable/unknown.
    *
    * Floating rows compare in DOUBLE semantics (`Double.compare` against
    * the literal re-parsed as a double): Catalyst pushed the comparison
    * on a double column, so double semantics are THE semantics — and a
    * decimal-exact compare would be subtly wrong the other way: the
    * binary expansion of a double (`new BigDecimal(0.1d)` = 0.1000…0555…)
    * is a DIFFERENT decimal than its shortest wire form ("0.1"), so a
    * row exactly equal to the literal would compare as ">", and `<=`
    * would definitely-drop the boundary row the client wanted
    * (under-shipping = wrong results; over-shipping is just bytes).
    * NaN rows are incomparable → ship, client decides. Integral rows
    * compare via BigDecimal — exact for any numeric literal. */
  private def cmp(row: Any, lit: JsonNode): Option[Int] = row match {
    case null => None
    case n: java.lang.Long if lit.isNumber =>
      Some(java.math.BigDecimal.valueOf(n.longValue()).compareTo(lit.decimalValue()))
    case n: java.lang.Integer if lit.isNumber =>
      Some(java.math.BigDecimal.valueOf(n.longValue()).compareTo(lit.decimalValue()))
    case n: java.lang.Double if lit.isNumber && !n.isNaN =>
      Some(java.lang.Double.compare(n.doubleValue(), lit.asDouble()))
    case n: java.lang.Float if lit.isNumber && !n.isNaN =>
      Some(java.lang.Double.compare(n.doubleValue(), lit.asDouble()))
    case s: String if lit.isTextual =>
      // UTF8String (byte/code-point) order, NOT Java's UTF-16 code-unit
      // order: Spark compares UTF8String, and the two disagree whenever
      // a supplementary-plane character (U+10000 and up, a surrogate
      // pair in UTF-16) meets a high BMP one (U+E000..U+FFFF) - a Java
      // compare could definitely-drop rows Spark would keep
      // (under-shipping = wrong results; ExtremeAcc already does this)
      Some(org.apache.spark.unsafe.types.UTF8String.fromString(s)
        .compareTo(org.apache.spark.unsafe.types.UTF8String.fromString(lit.asText())))
    case b: java.lang.Boolean if lit.isBoolean =>
      Some(java.lang.Boolean.compare(b.booleanValue(), lit.asBoolean()))
    case _ => None
  }

  private final case class CmpPred(op: String, col: String, lit: JsonNode) extends Pred {
    def keeps(v: Any): Boolean = cmp(v, lit) match {
      case None    => true
      case Some(c) => op match {
        case "eq" => c == 0
        case "gt" => c > 0
        case "ge" => c >= 0
        case "lt" => c < 0
        case "le" => c <= 0
      }
    }
  }
  private final case class NullPred(col: String, wantNull: Boolean) extends Pred {
    def keeps(v: Any): Boolean = (v == null) == wantNull
  }
  private final case class InPred(col: String, lits: Seq[JsonNode]) extends Pred {
    def keeps(v: Any): Boolean =
      lits.exists(l => cmp(v, l) match { case None => true; case Some(c) => c == 0 })
  }

  def fromJson(n: JsonNode): Pred = {
    val col = n.path("col").asText()
    n.path("op").asText() match {
      case op @ ("eq" | "gt" | "ge" | "lt" | "le") => CmpPred(op, col, n.path("val"))
      case "isnull"    => NullPred(col, wantNull = true)
      case "isnotnull" => NullPred(col, wantNull = false)
      case "in" =>
        val it = n.path("vals").elements()
        val b = Seq.newBuilder[JsonNode]
        while (it.hasNext) b += it.next()
        InPred(col, b.result())
      case other => throw new IllegalArgumentException(s"unknown filter op '$other'")
    }
  }
}
