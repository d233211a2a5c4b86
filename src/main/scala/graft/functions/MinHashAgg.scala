package graft.functions

import org.apache.spark.sql.{Column, GraftColumnGlue}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, XXH64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mergeable MinHash-signature AGGREGATE — the sketch-style
  * `TypedImperativeAggregate` SURVEY §7.4 calls for: aggregates a group's
  * string items into a k-slot minhash signature, so group-level set
  * similarity (source↔source, day↔day) is one partial-merged aggregation
  * pass instead of a collect + pairwise pass. The buffer is k longs; the
  * merge is elementwise min — associative/commutative, so map-side
  * partial aggregation applies (this is what makes it 100 TB-viable:
  * signatures combine, raw item sets never travel).
  *
  * Hash family is IDENTICAL to the column-algebra minhash
  * ([[graft.llm.Dedup.minhashSignature]]): itemHash = xxhash64(item)
  * (seed 42, Spark's default), slot i folds xxhash64(i, itemHash) — the
  * equality is spec-pinned, so sketches built here interoperate with the
  * LSH banding pipeline.
  *
  * Reference: Kerf's hashed-set dedup machinery
  * (/root/reference/hash.cc:1–145) — re-expressed as a distributed,
  * mergeable summary instead of a shared-memory set.
  */
case class MinHashAgg(
    child: Expression,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(numHashes > 0, "numHashes must be positive")

  // analysis-time type check (the sibling-expression convention): a
  // non-string child would otherwise pass analysis and die per-task
  // with a ClassCastException deep inside update()
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"minhash_agg expects a string item column, got ${child.dataType.simpleString}")

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_agg"

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(numHashes)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String]
      val itemHash =
        XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
      var i = 0
      while (i < numHashes) {
        val h = XXH64.hashLong(itemHash, XXH64.hashInt(i, 42L))
        if (h < buf(i)) buf(i) = h
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numHashes) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * numHashes)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(numHashes)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(n: Int): MinHashAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): MinHashAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): MinHashAgg =
    copy(child = c.head)
}

object MinHashAgg {
  /** `minhash(stringCol, k)` as a Column aggregate. */
  def minhash(c: Column, numHashes: Int = 32): Column =
    GraftColumnGlue.toColumn(
      MinHashAgg(GraftColumnGlue.toExpr(c), numHashes).toAggregateExpression())

  /** Estimated Jaccard between two equal-length signatures: fraction of
    * agreeing slots. */
  def estJaccard(a: Column, b: Column, numHashes: Int): Column = {
    import org.apache.spark.sql.functions._
    aggregate(zip_with(a, b, (x, y) => when(x === y, 1).otherwise(0)),
      lit(0), (acc, v) => acc + v).cast("double") / numHashes
  }

  /** Register as SQL aggregate `minhash_agg(item, k)` for the session
    * (k must be a literal int). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash_agg",
      exprs => {
        require(exprs.length == 2, "minhash_agg(item, k) takes 2 args")
        val k = exprs(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"minhash_agg: k must be a literal int, got $other")
        }
        MinHashAgg(exprs.head, k).toAggregateExpression()
      },
      "built-in")
}
