package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's storage model re-expressed on partitioned Parquet.
  *
  * Kerf writes objects as singlefile / directory-expanded / multifile
  * trees and mmaps them back lazily (/root/reference/file.cc:385–990);
  * a FOLIO is its partitioned list-of-lists — "a local folio of tables
  * is a striped/parted table" (/root/reference/presented.h:409–430).
  * Here: a folio IS a partition-dirs Parquet dataset; the sorted-write
  * convention materializes Kerf's maintained sorted-asc attribute
  * (/root/reference/slab.h:234–235, slop.cc:851–871) as Parquet row-group
  * min/max stats that Catalyst prunes on; mmap laziness is
  * `spark.read.parquet` laziness.
  */
object Folio {

  /** Directory-expanded write: one subdir per partition key value
    * (file.cc:433–544's one-dir-per-node, relationally); rows sorted
    * within partitions so every file carries tight min/max stats. */
  def write(df: DataFrame, path: String, partitionCols: Seq[String],
            sortCols: Seq[String], mode: SaveMode = SaveMode.Overwrite): Unit =
    df.repartition(partitionCols.map(col): _*)
      .sortWithinPartitions((partitionCols ++ sortCols).map(col): _*)
      .write.mode(mode)
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** Lazy read-back — the mmap moment (file.cc:935–990): nothing is
    * touched until an action; partition pruning replaces Kerf's
    * parted-date binary search (presented.h:432). */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Append one new partition-worth of rows (the realtime→historical
    * promotion a tick DB does at day roll: new date dir slots into the
    * folio without touching existing ones). */
  def appendPartition(df: DataFrame, path: String, partitionCols: Seq[String],
                      sortCols: Seq[String]): Unit =
    write(df, path, partitionCols, sortCols, SaveMode.Append)

  /** Kerf's transparent type promotion at the table boundary
    * (/root/reference/layout.cc:726–836: vectors promote on append;
    * SURVEY §7.5.5): appending a batch whose column widths exceed the
    * stored schema widens BOTH to the least upper type and rewrites the
    * folio schema forward. Parquet can't merge int32/int64 schemas, so
    * promotion is explicit: numeric lattice byte<short<int<long<float<
    * double; anything else must match exactly. */
  private val widthRank: Map[org.apache.spark.sql.types.DataType, Int] = {
    import org.apache.spark.sql.types._
    Map(ByteType -> 0, ShortType -> 1, IntegerType -> 2, LongType -> 3,
        FloatType -> 4, DoubleType -> 5)
  }

  def widen(a: org.apache.spark.sql.types.DataType,
            b: org.apache.spark.sql.types.DataType): org.apache.spark.sql.types.DataType =
    if (a == b) a
    else (widthRank.get(a), widthRank.get(b)) match {
      case (Some(ra), Some(rb)) => if (ra >= rb) a else b
      case _ => throw new IllegalArgumentException(s"cannot promote $a vs $b")
    }

  /** Append with promote-on-append semantics: widens the on-disk data
    * when the incoming batch needs it (one rewrite — the table-level
    * analog of the reference's promote_or_expand_via_widths). */
  def appendWithPromotion(df: DataFrame, path: String): Unit = {
    val spark = df.sparkSession
    val existing = try Some(spark.read.parquet(path)) catch { case _: Exception => None }
    existing match {
      case None => df.write.mode(SaveMode.Overwrite).parquet(path)
      case Some(old) =>
        val target = org.apache.spark.sql.types.StructType(old.schema.map { f =>
          val incoming = df.schema(f.name)
          f.copy(dataType = widen(f.dataType, incoming.dataType))
        })
        def castTo(d: DataFrame) =
          d.select(target.map(f => col(f.name).cast(f.dataType).as(f.name)): _*)
        val widened = castTo(old).unionByName(castTo(df))
        // rewrite through a temp dir: can't overwrite a path being read
        val tmp = path + "__promote_tmp"
        widened.write.mode(SaveMode.Overwrite).parquet(tmp)
        val fs = new java.io.File(path)
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
        }
        rm(fs)
        new java.io.File(tmp).renameTo(fs)
    }
  }

  // ----- workspace (file.cc:994–1023 workspace_save/load) -----

  /** Persist a set of named tables — the Kerf Tree snapshot
    * (/root/reference/cores.h:72) as a directory of Parquet datasets. */
  def workspaceSave(tables: Map[String, DataFrame], path: String): Unit =
    tables.foreach { case (name, df) =>
      df.write.mode(SaveMode.Overwrite).parquet(s"$path/$name")
    }

  /** Restore: every table back, registered as temp views (the catalog
    * replaces Kerf's global tree). */
  def workspaceLoad(spark: SparkSession, path: String): Map[String, DataFrame] = {
    val fs = new java.io.File(path).listFiles()
    if (fs == null) Map.empty
    else fs.filter(_.isDirectory).map { d =>
      val df = spark.read.parquet(d.getAbsolutePath)
      df.createOrReplaceTempView(d.getName)
      d.getName -> df
    }.toMap
  }
}
