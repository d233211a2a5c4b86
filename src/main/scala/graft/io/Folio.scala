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
