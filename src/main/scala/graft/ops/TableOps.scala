package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The SQL-mutation surface Kerf's parser reserves — `select insert
  * update upsert delete` with `from/where/group/order/limit/values/set`
  * (/root/reference/lexer.h:103–104, parser.h:541–567) — re-expressed
  * immutably: every mutation is a transformation producing a new
  * DataFrame; persistence is a versioned folio rewrite (SURVEY §7.5.4),
  * which also subsumes the reference's FILE_REGISTRY locking
  * (/root/reference/file.h:39–310) via immutable files.
  */
object TableOps {

  /** UPDATE t SET col = expr WHERE pred. The predicate and EVERY set
    * expression evaluate against the PRE-update row (standard SQL UPDATE
    * semantics) — one select, never a chain of withColumns, which would
    * feed already-updated columns into later SETs and the re-checked
    * predicate (`set a = 0, b = 1 where a > 5` must update b). Set names
    * not in the schema append as new columns (null where pred is false). */
  def update(df: DataFrame, pred: Column, sets: (String, Column)*): DataFrame = {
    val updated = df.columns.map { c =>
      sets.find(_._1.equalsIgnoreCase(c)) match {
        case Some((_, v)) => when(pred, v).otherwise(col(c)).as(c)
        case None => col(c)
      }
    }
    val added = sets.filterNot(s => df.columns.exists(_.equalsIgnoreCase(s._1)))
      .map { case (n, v) => when(pred, v).as(n) }
    df.select(updated ++ added: _*)
  }

  /** DELETE FROM t WHERE pred. */
  def delete(df: DataFrame, pred: Column): DataFrame = df.filter(!pred)

  /** INSERT INTO t VALUES ... (columns aligned by name). */
  def insert(df: DataFrame, rows: DataFrame): DataFrame =
    df.unionByName(rows)

  /** UPSERT (merge) by key: incoming rows replace same-key rows, others
    * insert. One shuffle of each side on the key (anti-join + union) —
    * at scale this is the read-modify-write of just the touched
    * partitions, Kerf's COW amend writ large (presented.cc:534–563). */
  def upsert(df: DataFrame, incoming: DataFrame, keys: Seq[String]): DataFrame =
    df.join(incoming.select(keys.map(col): _*), keys, "left_anti")
      .unionByName(incoming)

  /** SELECT ... FROM ... WHERE ... GROUP ... ORDER ... LIMIT — the full
    * clause chain as one combinator (parser.h:541–567's clause split). */
  def select(df: DataFrame,
             where: Option[Column] = None,
             group: Seq[Column] = Nil,
             aggs: Seq[Column] = Nil,
             order: Seq[Column] = Nil,
             limit: Option[Int] = None,
             projection: Seq[Column] = Nil): DataFrame = {
    var d = df
    where.foreach(p => d = d.filter(p))
    if (group.nonEmpty) d = d.groupBy(group: _*).agg(aggs.head, aggs.tail: _*)
    else if (projection.nonEmpty) d = d.select(projection: _*)
    if (order.nonEmpty) d = d.orderBy(order: _*)
    limit.foreach(n => d = d.limit(n))
    d
  }
}
