package graft.sql

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Temporal

/** Textual front-end for the SQL dialect the reference's parser defines
  * but never evaluates: `select/update/insert/upsert/delete` heads with
  * `from/where/group/order/limit/values/set` middles
  * (/root/reference/lexer.h:103–104, clause scooping parser.h:541–567,
  * interpreter stub interpreter.h:8–23). Kerf-flavored details kept:
  *
  *  - clause keywords without `by` (`group a`, `order -a`);
  *  - Kerf temporal literals in expressions (`2024.01.05`,
  *    `2024.01.05T12:00:00`, lexer.h:247–311);
  *  - bare verb expressions with `+ - * / %` and comparison ops;
  *  - `order -col` for descending (q-style).
  *
  * Lowering is to the DataFrame API — Catalyst does the optimizing; this
  * class is ~pure syntax. Aggregates: sum/avg/min/max/count(*).
  *
  * Mutations (`update … set … where`, `delete from … where`,
  * `insert into … values`, `upsert …`) lower to [[graft.ops.TableOps]]
  * and return the rewritten DataFrame (caller persists via Folio).
  */
object KerfSql {

  // ---------------------------------------------------------------- lexer
  private val tokenRe =
    ("""\s*(""" +
     """\d{4}\.\d{2}\.\d{2}T\d{2}:\d{2}:\d{2}(?:\.\d+)?|""" + // datetime lit
     """\d{4}\.\d{2}\.\d{2}|""" +                             // date lit
     """\d+\.\d+|\.\d+|\d+|""" +                              // numbers
     """'[^']*'|""" +                                         // string lit
     """<=|>=|!=|<>|==|[(),*+\-/%<>=]|""" +                   // operators
     """[A-Za-z_][A-Za-z0-9_.]*""" +                          // idents
     """)""").r

  private def lex(s: String): List[String] =
    tokenRe.findAllMatchIn(s).map(_.group(1)).toList

  // ---------------------------------------------------------------- parser
  private class P(var toks: List[String]) {
    def peek: Option[String] = toks.headOption
    def peekIs(s: String): Boolean = peek.exists(_.equalsIgnoreCase(s))
    def pop(): String = { val h = toks.head; toks = toks.tail; h }
    def expect(s: String): Unit = {
      val t = pop()
      require(t.equalsIgnoreCase(s), s"expected '$s', got '$t'")
    }
    def done: Boolean = toks.isEmpty
  }

  private val clauseWords = Set("from", "where", "group", "order", "limit",
    "select", "set", "values", "into")
  private val aggFns = Set("sum", "avg", "min", "max", "count")

  /** expression := term ((+|-) term)* ; term := factor ((*|/|%) factor)* ;
    * factor := primary comparison?  — comparisons bind loosest. */
  private def parseExpr(p: P): Column = {
    var left = parseAdd(p)
    while (p.peek.exists(t => Set("<", ">", "<=", ">=", "=", "==", "!=", "<>").contains(t))) {
      val op = p.pop()
      val right = parseAdd(p)
      left = op match {
        case "<" => left < right;  case ">" => left > right
        case "<=" => left <= right; case ">=" => left >= right
        case "=" | "==" => left === right
        case "!=" | "<>" => left =!= right
      }
    }
    // and/or chains
    while (p.peekIs("and") || p.peekIs("or")) {
      val op = p.pop().toLowerCase
      val right = parseExpr(p)
      left = if (op == "and") left && right else left || right
    }
    left
  }

  private def parseAdd(p: P): Column = {
    var left = parseMul(p)
    while (p.peek.exists(t => t == "+" || t == "-")) {
      val op = p.pop(); val right = parseMul(p)
      left = if (op == "+") left + right else left - right
    }
    left
  }

  private def parseMul(p: P): Column = {
    var left = parsePrimary(p)
    while (p.peek.exists(t => t == "*" || t == "/" || t == "%")) {
      val op = p.pop(); val right = parsePrimary(p)
      left = op match {
        case "*" => left * right; case "/" => left / right; case "%" => left % right
      }
    }
    left
  }

  private def parsePrimary(p: P): Column = {
    val t = p.pop()
    t match {
      case "(" => val e = parseExpr(p); p.expect(")"); e
      case "-" => -parsePrimary(p)
      case v if v.matches("""\d{4}\.\d{2}\.\d{2}(T.*)?""") => Temporal.stampLit(v)
      case v if v.matches("""\d+\.\d+|\.\d+""") => lit(v.toDouble)
      case v if v.matches("""\d+""") => lit(v.toLong)
      case v if v.startsWith("'") => lit(v.substring(1, v.length - 1))
      case fn if aggFns.contains(fn.toLowerCase) && p.peekIs("(") =>
        p.expect("(")
        val inner = if (p.peekIs("*")) { p.pop(); lit(1) } else parseExpr(p)
        p.expect(")")
        fn.toLowerCase match {
          case "sum" => sum(inner); case "avg" => avg(inner)
          case "min" => min(inner); case "max" => max(inner)
          case "count" => count(inner)
        }
      case ident => col(ident)
    }
  }

  /** A select-list entry: the Column, its auto/explicit alias, and its
    * source tokens (used to drop bare group columns from the agg list —
    * groupBy().agg() auto-includes the keys). */
  private case class Item(col: Column, srcToks: List[String])

  private def parseSelectItem(p: P): Item = {
    val start = p.toks
    val e = parseExpr(p)
    val src = start.take(start.length - p.toks.length)
    val alias =
      if (p.peekIs("as")) { p.pop(); p.pop() }
      else src.mkString("_").replaceAll("[^A-Za-z0-9_]", "_")
    Item(e.as(alias), src)
  }

  private def parseExprList(p: P)(stop: => Boolean): Seq[Item] = {
    val items = scala.collection.mutable.ArrayBuffer[Item]()
    var more = true
    while (more && !p.done && !stop) {
      items += parseSelectItem(p)
      if (p.peekIs(",")) p.pop() else more = false
    }
    items.toSeq
  }

  // ---------------------------------------------------------------- driver

  /** Evaluate one Kerf-SQL statement against the session catalog (tables
    * must be registered as temp views, e.g. via Folio.workspaceLoad). */
  def run(spark: SparkSession, statement: String): DataFrame = {
    val p = new P(lex(statement))
    val head = p.pop().toLowerCase
    head match {
      case "select" => runSelect(spark, p)
      case "update" => runUpdate(spark, p)
      case "delete" => runDelete(spark, p)
      case "insert" | "upsert" => runMerge(spark, p, head == "upsert")
      case other => throw new IllegalArgumentException(s"unknown statement head '$other'")
    }
  }

  private def stopAtClause(p: P): Boolean =
    p.peek.exists(t => clauseWords.contains(t.toLowerCase))

  private def runSelect(spark: SparkSession, p: P): DataFrame = {
    val star = p.peekIs("*")
    val items = if (star) { p.pop(); Nil } else parseExprList(p)(stopAtClause(p))
    p.expect("from")
    var df = spark.table(p.pop())
    if (p.peekIs("where")) { p.pop(); df = df.filter(parseExpr(p)) }
    val groupNames =
      if (p.peekIs("group")) { p.pop(); parseGroupNames(p) } else Nil
    df =
      if (groupNames.nonEmpty) {
        // bare group-column items are auto-included by groupBy().agg()
        val aggs = items.filterNot(i =>
          i.srcToks.lengthCompare(1) == 0 && groupNames.contains(i.srcToks.head))
        require(aggs.nonEmpty, "grouped select needs at least one aggregate")
        df.groupBy(groupNames.map(col): _*).agg(aggs.head.col, aggs.tail.map(_.col): _*)
      }
      else if (items.nonEmpty) df.select(items.map(_.col): _*)
      else df
    if (p.peekIs("order")) {
      p.pop()
      df = df.orderBy(parseOrderCols(p): _*)
    }
    if (p.peekIs("limit")) { p.pop(); df = df.limit(p.pop().toInt) }
    df
  }

  private def parseGroupNames(p: P): Seq[String] = {
    val names = scala.collection.mutable.ArrayBuffer[String]()
    var more = true
    while (more) {
      names += p.pop()
      if (p.peekIs(",")) p.pop() else more = false
    }
    names.toSeq
  }

  /** `order a, -b` — q-style leading minus for descending. */
  private def parseOrderCols(p: P): Seq[Column] = {
    val cols = scala.collection.mutable.ArrayBuffer[Column]()
    var more = true
    while (more) {
      if (p.peekIs("-")) { p.pop(); cols += col(p.pop()).desc }
      else cols += col(p.pop()).asc
      if (p.peekIs(",")) p.pop() else more = false
    }
    cols.toSeq
  }

  private def runUpdate(spark: SparkSession, p: P): DataFrame = {
    val df = spark.table(p.pop())
    p.expect("set")
    val sets = scala.collection.mutable.ArrayBuffer[(String, Column)]()
    var more = true
    while (more) {
      val name = p.pop(); p.expect("="); sets += name -> parseExpr(p)
      if (p.peekIs(",")) p.pop() else more = false
    }
    val pred = if (p.peekIs("where")) { p.pop(); parseExpr(p) } else lit(true)
    graft.ops.TableOps.update(df, pred, sets.toSeq: _*)
  }

  private def runDelete(spark: SparkSession, p: P): DataFrame = {
    p.expect("from")
    val df = spark.table(p.pop())
    val pred = if (p.peekIs("where")) { p.pop(); parseExpr(p) } else lit(true)
    graft.ops.TableOps.delete(df, pred)
  }

  /** `insert into t values (…), (…)` / `upsert into t key k values …` —
    * values rows positional against the table schema. */
  private def runMerge(spark: SparkSession, p: P, isUpsert: Boolean): DataFrame = {
    p.expect("into")
    val name = p.pop()
    val df = spark.table(name)
    val keys = if (isUpsert && p.peekIs("key")) {
      p.pop(); val k = scala.collection.mutable.ArrayBuffer[String]()
      var more = true
      while (more) { k += p.pop(); if (p.peekIs(",")) p.pop() else more = false }
      k.toSeq
    } else Seq(df.columns.head)
    p.expect("values")
    val rows = scala.collection.mutable.ArrayBuffer[Seq[Any]]()
    while (!p.done && p.peekIs("(")) {
      p.expect("(")
      val vals = scala.collection.mutable.ArrayBuffer[Any]()
      var more = true
      while (more) {
        val t = p.pop()
        vals += (t match {
          case v if v.matches("""\d+\.\d+""") => v.toDouble
          case v if v.matches("""\d+""") => v.toLong
          case v if v.startsWith("'") => v.substring(1, v.length - 1)
          case v => v
        })
        if (p.peekIs(",")) p.pop() else more = false
      }
      p.expect(")")
      rows += vals.toSeq
      if (p.peekIs(",")) p.pop()
    }
    // values arrive untyped: build a string frame, cast per target schema
    import org.apache.spark.sql.types.{StringType, StructField, StructType}
    val strSchema = StructType(df.schema.map(f => StructField(f.name, StringType)))
    val rdd = spark.sparkContext.parallelize(rows.toSeq.map(r =>
      org.apache.spark.sql.Row.fromSeq(r.map(v => if (v == null) null else v.toString))))
    val incoming = spark.createDataFrame(rdd, strSchema)
      .select(df.schema.map(f => col(f.name).cast(f.dataType).as(f.name)): _*)
    if (isUpsert) graft.ops.TableOps.upsert(df, incoming, keys)
    else graft.ops.TableOps.insert(df, incoming)
  }
}
