package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (BASELINE north-star): media travel as
  * opaque `binary` columns + typed metadata struct; decode/feature-extract
  * runs per-partition so one task holds one batch of blobs at a time —
  * the shape that scales to 100 TB of images (partition size bounds
  * executor memory; no blob ever visits the driver).
  *
  * The actual codec is STUBBED (this container ships no image/audio libs):
  * `fakeFeatures` derives a deterministic pseudo-embedding from the bytes
  * via xxhash64 — the Spark-side schema, partitioning and batch shape are
  * real and tested; swap `fakeFeatures` for a real decoder expression (or
  * a mapPartitions over a JNI codec) in production.
  */
object Multimodal {

  /** Wrap raw bytes with typed metadata — the "multimodal column". */
  def asMedia(bytes: Column, mime: String): Column =
    struct(bytes.as("data"), lit(mime).as("mime"),
           length(bytes).as("n_bytes"), xxhash64(bytes).as("content_hash"))

  /** STUB decode: deterministic D-dim pseudo-feature vector from the blob
    * bytes (stand-in for decode→resize→embed). Map-only, codegen'd. */
  def fakeFeatures(media: Column, dims: Int = 8): Column =
    transform(sequence(lit(0), lit(dims - 1)),
      i => (xxhash64(i, media.getField("content_hash")).cast("double") /
            lit(Long.MaxValue.toDouble)))

  /** Frame-sample stand-in: pick every `stride`-th byte window as a
    * "frame" hash — exercises the ragged array<struct> result shape that a
    * video frame-sampler produces. */
  def fakeFrameSample(media: Column, stride: Int = 1024): Column =
    transform(
      sequence(lit(0), greatest((media.getField("n_bytes") / stride).cast("int") - 1, lit(0))),
      f => struct(f.as("frame_no"),
                  xxhash64(f, media.getField("content_hash")).as("frame_hash")))

  /** THE CODEC SEAM: a real decoder (JNI image/audio library, ONNX
    * embedder, …) implements this one method and drops in — the
    * Spark-side schema, partitioning, and iterator batching in
    * [[decodePartitioned]] are codec-agnostic and stay as-is.
    * Implementations must be Serializable (shipped to executors) and
    * should hold native handles lazily/@transient (one init per task,
    * not per row). */
  trait MediaCodec extends Serializable {
    def dims: Int
    /** One blob → one feature vector. Called inside an iterator-to-
      * iterator mapPartitions: never assume the whole partition fits. */
    def decode(bytes: Array[Byte]): Array[Double]
  }

  /** Deterministic stand-in codec — this container ships no media libs
    * (acknowledged limitation). Same decode contract as production. */
  final case class StubCodec(dims: Int = 8) extends MediaCodec {
    def decode(bytes: Array[Byte]): Array[Double] = {
      // stand-in for decode→resize→embed: deterministic bytes→features
      val h0 = scala.util.hashing.MurmurHash3.bytesHash(bytes, 42)
      Array.tabulate(dims)(i =>
        scala.util.hashing.MurmurHash3.productHash((h0, i)).toDouble / Int.MaxValue)
    }
  }

  /** Per-partition decode path — the shape a REAL codec plugs into
    * ((d)-tier mapPartitions, used deliberately: a JNI/image library call
    * is genuine per-partition imperative logic). Iterator-to-iterator:
    * one blob in flight per task at a time, so executor memory is bounded
    * by (batch row size × open iterators), never by partition size —
    * the property that matters when blobs are MBs and partitions are GBs. */
  case class MediaRow(doc_id: Long, data: Array[Byte])
  case class DecodedRow(doc_id: Long, n_bytes: Int, features: Array[Double])

  def decodePartitioned(docs: DataFrame, idCol: String, textCol: String,
                        codec: MediaCodec = StubCodec()): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long"), to_binary(col(textCol), lit("utf-8")))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          DecodedRow(id, bytes.length, codec.decode(bytes))
        }
      }
      .toDF()
  }

  /** End-to-end demo pipeline over the documents fixture: text bytes as
    * the stand-in blob → media struct → features + frame samples. */
  def pipeline(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val media = asMedia(to_binary(col(textCol), lit("utf-8")), "application/octet-stream")
    docs.select(col(idCol), media.as("media"))
      .select(col(idCol),
        col("media").getField("mime").as("mime"),
        col("media").getField("n_bytes").as("n_bytes"),
        fakeFeatures(col("media")).as("features"),
        size(fakeFrameSample(col("media"), 64)).as("n_frames"))
  }
}
