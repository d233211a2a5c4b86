package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (BASELINE north-star): media travel as
  * opaque `binary` columns + typed metadata struct; decode/feature-extract
  * runs per-partition so one task holds one batch of blobs at a time —
  * the shape that scales to 100 TB of images (partition size bounds
  * executor memory; no blob ever visits the driver).
  *
  * The codec seam has REAL implementations on the pure-JDK decoders —
  * [[Multimodal.ImageIoCodec]] (PNG/JPEG/BMP/GIF via `javax.imageio`) and
  * [[Multimodal.WavCodec]] (PCM WAV via `javax.sound.sampled`) — plus the
  * deterministic [[Multimodal.StubCodec]] used over the text-only driver
  * fixtures (which carry no media blobs); a JNI/ONNX embedder implements
  * the same one-method trait.
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

  /** Deterministic stand-in codec (kept for the text-fixture pipeline —
    * the driver fixtures carry no media blobs). Same decode contract as
    * the real codecs below. */
  final case class StubCodec(dims: Int = 8) extends MediaCodec {
    def decode(bytes: Array[Byte]): Array[Double] = {
      // stand-in for decode→resize→embed: deterministic bytes→features
      val h0 = scala.util.hashing.MurmurHash3.bytesHash(bytes, 42)
      Array.tabulate(dims)(i =>
        scala.util.hashing.MurmurHash3.productHash((h0, i)).toDouble / Int.MaxValue)
    }
  }

  /** REAL image codec on the pure-JDK decoder (`javax.imageio` —
    * PNG/JPEG/BMP/GIF ship with every JVM, zero external deps): decode →
    * average-pool to a `grid`×`grid` mosaic → emit
    * `[width, height, cell RGB means…]`. The decode→resize→featurize
    * shape of a production embedder, with the JDK as the backend; the
    * iterator batching in [[decodePartitioned]] is unchanged. Stateless →
    * trivially Serializable. */
  final case class ImageIoCodec(grid: Int = 2) extends MediaCodec {
    val dims: Int = 2 + grid * grid * 3
    def decode(bytes: Array[Byte]): Array[Double] = {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      require(img != null, "undecodable image blob")
      val w = img.getWidth; val h = img.getHeight
      val out = Array.ofDim[Double](dims)
      out(0) = w.toDouble; out(1) = h.toDouble
      var gy = 0
      while (gy < grid) {
        var gx = 0
        while (gx < grid) {
          val x0 = gx * w / grid; val x1 = math.max((gx + 1) * w / grid, x0 + 1)
          val y0 = gy * h / grid; val y1 = math.max((gy + 1) * h / grid, y0 + 1)
          var r = 0L; var g = 0L; var b = 0L; var n = 0L
          var y = y0
          while (y < math.min(y1, h)) {
            var x = x0
            while (x < math.min(x1, w)) {
              val px = img.getRGB(x, y)
              r += (px >> 16) & 0xFF; g += (px >> 8) & 0xFF; b += px & 0xFF
              n += 1; x += 1
            }
            y += 1
          }
          val base = 2 + (gy * grid + gx) * 3
          if (n > 0) {
            out(base) = r.toDouble / n
            out(base + 1) = g.toDouble / n
            out(base + 2) = b.toDouble / n
          }
          gx += 1
        }
        gy += 1
      }
      out
    }
  }

  /** REAL audio codec on the pure-JDK WAV parser (`javax.sound.sampled`):
    * `[sampleRate, channels, nFrames, durationSec, rms]` for PCM WAV
    * blobs — header parse + one streaming pass for RMS (16-bit LE). */
  /** Both audio decode seams hardcode a 2-bytes-per-sample LE loop; any
    * other WAV encoding (8-bit, big-endian, u-law) would decode WITHOUT
    * error into garbage samples — wrong RMS, wrong envelope hashes, and
    * two gain-variants of one clip silently stop colliding in the dedup
    * index. Loud beats wrong (the indexProbe feature-check posture). */
  private def requirePcm16le(fmt: javax.sound.sampled.AudioFormat): Unit = {
    require(fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
            fmt.getSampleSizeInBits == 16 && !fmt.isBigEndian,
      s"audio decode supports 16-bit little-endian signed PCM only, got " +
      s"${fmt.getEncoding}/${fmt.getSampleSizeInBits}-bit" +
      s"${if (fmt.isBigEndian) "/big-endian" else ""} — transcode first")
  }

  final case class WavCodec() extends MediaCodec {
    val dims: Int = 5
    def decode(bytes: Array[Byte]): Array[Double] = {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val fmt = in.getFormat
        requirePcm16le(fmt)
        val nFrames = in.getFrameLength
        val data = in.readAllBytes()
        var sum = 0.0; var n = 0L; var i = 0
        while (i + 1 < data.length) {
          val s = (((data(i + 1) & 0xFF) << 8) | (data(i) & 0xFF)).toShort.toDouble / 32768.0
          sum += s * s; n += 1; i += 2
        }
        Array(fmt.getSampleRate.toDouble, fmt.getChannels.toDouble, nFrames.toDouble,
          nFrames / fmt.getFrameRate.toDouble,
          if (n == 0) 0.0 else math.sqrt(sum / n))
      } finally in.close()
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
                        codec: MediaCodec = StubCodec()): DataFrame =
    decodeBinaryPartitioned(
      docs.withColumn("__blob", to_binary(col(textCol), lit("utf-8"))),
      idCol, "__blob", codec)

  /** Same iterator-batched decode over a true BINARY column (the real
    * media path — [[decodePartitioned]] is its text-fixture adapter). */
  def decodeBinaryPartitioned(docs: DataFrame, idCol: String, binCol: String,
                              codec: MediaCodec): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          DecodedRow(id, bytes.length, codec.decode(bytes))
        }
      }
      .toDF()
  }

  /** One SAMPLED frame of a multi-frame container. */
  case class FrameRow(doc_id: Long, frame_no: Int, width: Int, height: Int,
                      mean_luma: Double)

  /** REAL frame sampler on the pure-JDK GIF reader: animated GIF is the
    * multi-frame container every JVM demuxes without native deps, so the
    * video frame-sampling shape — open container → decode every
    * `stride`-th frame → per-frame features — runs with a real backend
    * (a JNI ffmpeg demuxer implements the same iterator seam). Same
    * iterator-batched mapPartitions tier as [[decodeBinaryPartitioned]]:
    * one blob in flight per task, rows out per SAMPLED frame, so
    * executor memory is bounded by (frames of one blob), never by
    * partition size. Emits (id, frame_no, width, height, mean_luma)
    * with mean_luma = RGB-mean averaged over the frame's pixels. */
  def sampleFramesPartitioned(docs: DataFrame, idCol: String, binCol: String,
                              stride: Int = 1): DataFrame = {
    require(stride >= 1, s"stride must be >= 1, got $stride")
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          val reader = javax.imageio.ImageIO
            .getImageReadersByFormatName("gif").next()
          val iis = javax.imageio.ImageIO.createImageInputStream(
            new java.io.ByteArrayInputStream(bytes))
          try {
            reader.setInput(iis, false)
            val n = reader.getNumImages(true)
            (0 until n by stride).map { k =>
              val img = reader.read(k)
              val w = img.getWidth; val h = img.getHeight
              var sum = 0.0
              var y = 0
              while (y < h) {
                var x = 0
                while (x < w) {
                  val px = img.getRGB(x, y)
                  sum += (((px >> 16) & 0xFF) + ((px >> 8) & 0xFF) + (px & 0xFF)) / 3.0
                  x += 1
                }
                y += 1
              }
              FrameRow(id, k, w, h, sum / (w.toLong * h))
            }
          } finally { reader.dispose(); iis.close() }
        }
      }
      .toDF()
  }

  /** Deterministic multi-frame GIF synthesizer for fixtures/benches: one
    * 8×8 two-tone frame per pattern value (first `bright` cells white) —
    * the q149 family. One implementation shared by the query fixture,
    * the scaling bench, and the specs. */
  /** Deterministic SOLID-COLOR PNG (the image sibling of synthGif/
    * synthWav): w×h, every pixel `rgb`. PNG encoding is deterministic,
    * so equal inputs yield byte-identical blobs — the exact-dedup
    * fixtures stand on that. One builder, so the four image queries'
    * closed-form oracles agree with ONE construction, not four copies. */
  def synthPng(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  def synthGif(patterns: Seq[Int]): Array[Byte] = {
    val baos = new java.io.ByteArrayOutputStream()
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val ios = javax.imageio.ImageIO.createImageOutputStream(baos)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      patterns.foreach { bright =>
        val img = new java.awt.image.BufferedImage(8, 8,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        var c = 0
        while (c < 64) {
          img.setRGB(c % 8, c / 8, if (c < bright) 0xFFFFFF else 0x000000)
          c += 1
        }
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
      }
      writer.endWriteSequence()
    } finally { ios.close(); writer.dispose() }
    baos.toByteArray
  }

  case class FrameHashRow(doc_id: Long, frame_no: Int, fhash: Long)

  /** Per-frame PERCEPTUAL HASH sampler — the video-dedup feature pass:
    * same container seam as [[sampleFramesPartitioned]] (open → decode
    * every `stride`-th frame), but each frame emits its 64-bit aHash
    * (grid×grid cell lumas, cell brighter than the frame mean ⇒ bit
    * set, MSB-first — the [[aHashSignatures]] convention computed at
    * the decode site, where the pixels already are: no second decode
    * pass, no pixel column ever shuffles). One blob in flight per task;
    * output is one 20-byte row (id, frame_no, hash) per sampled frame
    * regardless of resolution. */
  def sampleFrameHashesPartitioned(docs: DataFrame, idCol: String, binCol: String,
                                   stride: Int = 1, grid: Int = 8): DataFrame = {
    require(stride >= 1, s"stride must be >= 1, got $stride")
    require(grid >= 1 && grid * grid <= 64, s"aHash64 holds at most 64 cells, grid=$grid")
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          val reader = javax.imageio.ImageIO
            .getImageReadersByFormatName("gif").next()
          val iis = javax.imageio.ImageIO.createImageInputStream(
            new java.io.ByteArrayInputStream(bytes))
          try {
            reader.setInput(iis, false)
            val n = reader.getNumImages(true)
            (0 until n by stride).map { k =>
              val img = reader.read(k)
              val w = img.getWidth; val h = img.getHeight
              val cells = grid * grid
              val lumas = new Array[Double](cells)
              val counts = new Array[Long](cells)
              var y = 0
              while (y < h) {
                var x = 0
                while (x < w) {
                  val px = img.getRGB(x, y)
                  val c = math.min(grid - 1, y * grid / h) * grid +
                          math.min(grid - 1, x * grid / w)
                  lumas(c) += (((px >> 16) & 0xFF) + ((px >> 8) & 0xFF) + (px & 0xFF)) / 3.0
                  counts(c) += 1
                  x += 1
                }
                y += 1
              }
              var mean = 0.0
              var c = 0
              while (c < cells) {
                if (counts(c) > 0) lumas(c) /= counts(c)
                mean += lumas(c); c += 1
              }
              mean /= cells
              var hash = 0L
              c = 0
              while (c < cells) {
                hash = (hash << 1) | (if (lumas(c) > mean) 1L else 0L)
                c += 1
              }
              FrameHashRow(id, k, hash)
            }
          } finally { reader.dispose(); iis.close() }
        }
      }
      .toDF()
  }

  /** VIDEO perceptual near-dup pairs — multi-frame containers whose
    * sampled-frame hash SETS overlap at Jaccard ≥ τ (re-encoded,
    * re-muxed, or padded copies collapse; byte-identity is
    * [[graft.llm.Dedup.exactBinary]]'s job). Composition of the
    * existing tiers, Spark-first: frame aHashes from the decode seam
    * (map-only, ~20 bytes/frame), per-video hash SET via one partial-agg
    * groupBy, then the SAME MinHash→band→bucket→verify engine as text
    * near-dup ([[graft.llm.Dedup.pairsFromHashSets]]) — at 100 TB the
    * banding cost model carries over unchanged because the engine is
    * literally shared. Returns (id_a, id_b, jaccard). */
  def videoPerceptualPairs(videos: DataFrame, idCol: String, binCol: String,
                           stride: Int = 1, numHashes: Int = 32, bands: Int = 8,
                           jaccardThreshold: Double = 0.9,
                           maxBucket: Int = 64): DataFrame = {
    // validate BEFORE the persist below (the Dedup.minhashPairsPlan
    // invariant): a throw after registering the cache would leak a
    // pinned CacheManager entry for the session
    require(numHashes % bands == 0, "bands must divide numHashes")
    val hashed = sampleFrameHashesPartitioned(videos, idCol, binCol, stride)
      .groupBy(col("doc_id"))
      .agg(collect_set(col("fhash")).as("shh"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // the engine returns (hashed, banded) as its cache list — the input
    // set frame is released with the rest after the seal
    val (result, caches) = graft.llm.Dedup.pairsFromHashSets(
      hashed, numHashes, bands, jaccardThreshold, maxBucket)
    graft.ops.Caches.seal(result, caches: _*)
  }

  case class AudioHashRow(doc_id: Long, window_no: Int, ahash: Long)

  /** Per-window PERCEPTUAL HASH sampler for audio — the audio analog of
    * [[sampleFrameHashesPartitioned]]: decode 16-bit LE PCM at the codec
    * seam (the [[WavCodec]] parse), split the sample stream into fixed
    * `windowSamples` windows, and hash each window's ENVELOPE: 64 equal
    * cells, bit = cell mean |amplitude| > window mean |amplitude|,
    * MSB-first (the aHash convention on the waveform instead of the
    * raster). The comparison is against the window's OWN mean, so the
    * hash is VOLUME-INVARIANT — a gain-rescaled copy emits identical
    * window hashes, which is the perceptual property that makes it a
    * dedup feature rather than a checksum. One blob in flight per task;
    * ~20 bytes out per window regardless of sample rate. */
  def sampleAudioHashesPartitioned(docs: DataFrame, idCol: String, binCol: String,
                                   windowSamples: Int = 1024): DataFrame = {
    val cells = 64
    require(windowSamples >= cells && windowSamples % cells == 0,
      s"windowSamples must be a positive multiple of $cells, got $windowSamples")
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(bytes))
          val data = try { requirePcm16le(in.getFormat); in.readAllBytes() }
                     finally in.close()
          val nSamples = data.length / 2
          val nWindows = nSamples / windowSamples
          val per = windowSamples / cells
          (0 until nWindows).map { w =>
            val base = w * windowSamples
            val cellMeans = new Array[Double](cells)
            var c = 0
            var total = 0.0
            while (c < cells) {
              var s = 0.0
              var k = 0
              while (k < per) {
                val i = (base + c * per + k) * 2
                s += math.abs((((data(i + 1) & 0xFF) << 8) | (data(i) & 0xFF)).toShort.toDouble)
                k += 1
              }
              cellMeans(c) = s / per
              total += cellMeans(c)
              c += 1
            }
            val mean = total / cells
            var hash = 0L
            c = 0
            while (c < cells) {
              hash = (hash << 1) | (if (cellMeans(c) > mean) 1L else 0L)
              c += 1
            }
            AudioHashRow(id, w, hash)
          }
        }
      }
      .toDF()
  }

  /** AUDIO perceptual near-dup pairs — clips whose window-envelope hash
    * SETS overlap at Jaccard ≥ τ: gain-rescaled, re-muxed, or padded
    * copies collapse (byte-identity is [[graft.llm.Dedup.exactBinary]]'s
    * job). Same composition as [[videoPerceptualPairs]], and literally
    * the same engine: envelope hashes from the decode seam (map-only,
    * ~20 bytes/window), per-clip hash SET via one partial-agg groupBy,
    * then the shared MinHash→band→bucket→verify path
    * ([[graft.llm.Dedup.pairsFromHashSets]]) — the 100 TB banding cost
    * model carries over unchanged. Returns (id_a, id_b, jaccard). */
  def audioPerceptualPairs(audios: DataFrame, idCol: String, binCol: String,
                           windowSamples: Int = 1024, numHashes: Int = 32,
                           bands: Int = 8, jaccardThreshold: Double = 0.9,
                           maxBucket: Int = 64): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val hashed = sampleAudioHashesPartitioned(audios, idCol, binCol, windowSamples)
      .groupBy(col("doc_id"))
      .agg(collect_set(col("ahash")).as("shh"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val (result, caches) = graft.llm.Dedup.pairsFromHashSets(
      hashed, numHashes, bands, jaccardThreshold, maxBucket)
    graft.ops.Caches.seal(result, caches: _*)
  }

  // ----- persisted media LSH indexes (the incremental-dedup store,
  // [[graft.llm.Dedup.indexAppendSets]], with media feature tags) -----

  /** Per-video frame-hash SET `(doc_id, shh)` — the index-ready form. */
  private def videoSets(videos: DataFrame, idCol: String, binCol: String,
                        stride: Int): DataFrame =
    sampleFrameHashesPartitioned(videos, idCol, binCol, stride)
      .groupBy(col("doc_id"))
      .agg(collect_set(col("fhash")).as("shh"))

  private def audioSets(audios: DataFrame, idCol: String, binCol: String,
                        windowSamples: Int): DataFrame =
    sampleAudioHashesPartitioned(audios, idCol, binCol, windowSamples)
      .groupBy(col("doc_id"))
      .agg(collect_set(col("ahash")).as("shh"))

  /** Append videos' frame-hash sets to a persisted LSH index — the
    * incremental face of [[videoPerceptualPairs]]: a re-encoded copy
    * arriving TOMORROW probes today's stored bands without re-decoding
    * the corpus. The feature tag pins the stride, so a probe sampled
    * differently is a loud error. */
  def videoIndexAppend(videos: DataFrame, idCol: String, binCol: String,
                       path: String, stride: Int = 1, numHashes: Int = 32,
                       bands: Int = 8,
                       commitTag: Option[String] = None): Unit =
    graft.llm.Dedup.indexAppendSets(videoSets(videos, idCol, binCol, stride),
      path, numHashes, bands, s"video:$stride", commitTag)

  /** Probe the video index: (id_a indexed, id_b new, jaccard ≥ τ). */
  def videoIndexProbe(videos: DataFrame, idCol: String, binCol: String,
                      path: String, stride: Int = 1,
                      jaccardThreshold: Double = 0.9,
                      maxBucket: Int = 64): DataFrame =
    graft.llm.Dedup.indexProbeSets(videoSets(videos, idCol, binCol, stride),
      path, s"video:$stride", jaccardThreshold, maxBucket)

  /** Audio siblings — window-envelope hash sets on the shared store. */
  def audioIndexAppend(audios: DataFrame, idCol: String, binCol: String,
                       path: String, windowSamples: Int = 1024,
                       numHashes: Int = 32, bands: Int = 8,
                       commitTag: Option[String] = None): Unit =
    graft.llm.Dedup.indexAppendSets(
      audioSets(audios, idCol, binCol, windowSamples),
      path, numHashes, bands, s"audio:$windowSamples", commitTag)

  def audioIndexProbe(audios: DataFrame, idCol: String, binCol: String,
                      path: String, windowSamples: Int = 1024,
                      jaccardThreshold: Double = 0.9,
                      maxBucket: Int = 64): DataFrame =
    graft.llm.Dedup.indexProbeSets(
      audioSets(audios, idCol, binCol, windowSamples),
      path, s"audio:$windowSamples", jaccardThreshold, maxBucket)

  /** Deterministic block-pattern PCM WAV (16-bit LE mono, 8 kHz) for
    * the audio-dedup fixtures: window w's 64 cells take high/low
    * amplitude from a splitmix64 bit pattern of (`patternSeed`, w);
    * `scale` rescales the volume WITHOUT touching the pattern, so the
    * rescaled clip is the canonical perceptual near-dup (identical
    * envelope hashes) while clips with different seeds share no window
    * hash. Margins are 10×, so integer quantization of the scale can
    * never flip a cell-vs-mean comparison. */
  def synthWav(patternSeed: Long, scale: Double, windows: Int = 6,
               windowSamples: Int = 1024): Array[Byte] = {
    require(scale > 0.0 && scale <= 1.0, s"scale must be in (0,1], got $scale")
    val cells = 64
    val per = windowSamples / cells
    val n = windows * windowSamples
    val data = new Array[Byte](n * 2)
    def mix(a: Long, b: Long): Long = {
      var z = a ^ (b * 0x9E3779B97F4A7C15L)
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    var idx = 0
    var w = 0
    while (w < windows) {
      val pattern = mix(patternSeed, w.toLong + 1L)
      var c = 0
      while (c < cells) {
        val high = ((pattern >>> c) & 1L) == 1L
        val amp = ((if (high) 24000.0 else 2400.0) * scale).toInt
        var k = 0
        while (k < per) {
          data(2 * idx) = (amp & 0xFF).toByte
          data(2 * idx + 1) = ((amp >> 8) & 0xFF).toByte
          idx += 1
          k += 1
        }
        c += 1
      }
      w += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, n.toLong)
    val baos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
    baos.toByteArray
  }

  /** One resized image: re-encoded blob + its new dims. */
  case class ResizedRow(doc_id: Long, png: Array[Byte], width: Int, height: Int)

  /** Binary→binary image RESIZE on the JDK raster pipeline — the
    * transform tier of the multimodal seam (decode → scale → re-encode),
    * as distinct from the feature tier: the output is ANOTHER opaque
    * binary column, so resized corpora flow through the same folio/
    * dedup/feature plumbing as originals. Bilinear scaling via
    * Graphics2D; PNG out (lossless, pure-JDK). Iterator-batched like
    * the codecs: one blob in flight per task. */
  def resizePartitioned(docs: DataFrame, idCol: String, binCol: String,
                        w: Int, h: Int): DataFrame = {
    require(w >= 1 && h >= 1, s"target dims must be positive, got ${w}x$h")
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val src = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(bytes))
          require(src != null, "undecodable image blob")
          val dst = new java.awt.image.BufferedImage(w, h,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g2 = dst.createGraphics()
          try {
            g2.setRenderingHint(
              java.awt.RenderingHints.KEY_INTERPOLATION,
              java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
            g2.drawImage(src, 0, 0, w, h, null)
          } finally g2.dispose()
          val baos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(dst, "png", baos)
          ResizedRow(id, baos.toByteArray, w, h)
        }
      }
      .toDF()
  }

  /** PERCEPTUAL 64-bit image signature (average hash — the classic
    * aHash: cell brighter than the image mean ⇒ bit set, MSB-first in
    * cell order) from an [[ImageIoCodec]] feature row at `grid`=8.
    * Returns `(doc_id, simhash)` — the same shape the text SimHash
    * machinery blocks on, so media near-dup reuses the chunk-blocked
    * hamming engine unchanged. The per-cell luma array is STAGED as a
    * real column before the folds (HOF lambdas re-evaluate referenced
    * trees per element — the [[graft.llm.Dedup.tokens]] discipline). */
  def aHashSignatures(decoded: DataFrame, idCol: String = "doc_id",
                      featuresCol: String = "features", grid: Int = 8): DataFrame = {
    require(grid * grid <= 64, s"aHash64 holds at most 64 cells, grid=$grid")
    val cells = grid * grid
    // the features column must carry the ImageIoCodec(grid) layout this
    // indexes into — a frame decoded with a different codec/grid would
    // either die mid-stage on ANSI array bounds or (ANSI off) null every
    // luma, hash every image to 0, and flood perceptualPairs with false
    // dup pairs. One row decides: the layout is uniform per decode pass.
    // batch frames only: a streaming frame cannot run the eager sample
    // (and its layout was produced by the same per-batch codec anyway —
    // the ANSI array-bounds error still catches a mismatch at runtime)
    if (!decoded.isStreaming) {
      val want = 2 + 3 * cells
      decoded.select(size(col(featuresCol)).as("n")).limit(1).collect()
        .headOption.foreach(r => require(r.getInt(0) == want,
          s"aHashSignatures(grid=$grid) expects the ImageIoCodec(grid=$grid) " +
          s"feature layout of $want elements, got ${r.getInt(0)} — decode " +
          s"with ImageIoCodec($grid)"))
    }
    // ImageIoCodec layout: [w, h, (r,g,b) × cells], element_at is 1-based
    val lumas = transform(sequence(lit(0), lit(cells - 1)), i =>
      (element_at(col(featuresCol), i * 3 + 3) +
       element_at(col(featuresCol), i * 3 + 4) +
       element_at(col(featuresCol), i * 3 + 5)) / 3.0)
    decoded.select(col(idCol).as("doc_id"), lumas.as("__lumas"))
      .withColumn("__mean",
        aggregate(col("__lumas"), lit(0.0), (a, x) => a + x) / cells)
      .select(col("doc_id"),
        // shiftleft, not *2: ANSI mode would flag the sign-bit carry of
        // a full 64-bit signature as overflow; the shift is the intent
        aggregate(col("__lumas"), lit(0L),
          (acc, l) => shiftleft(acc, 1)
            .bitwiseOR(when(l > col("__mean"), 1L).otherwise(0L)))
          .as("simhash"))
  }

  /** Perceptual NEAR-DUP pairs over an image blob column: decode →
    * aHash → chunk-blocked hamming verify (the [[graft.llm.Dedup
    * .simhashPairs]] engine on media signatures). The dedup story a
    * multimodal corpus needs beyond byte-identity ([[graft.llm.Dedup
    * .exactBinary]]): re-encoded/slightly-edited images collapse here. */
  def perceptualPairs(blobs: DataFrame, idCol: String, binCol: String,
                      maxHamming: Int = 3, maxBucket: Int = 256): DataFrame = {
    val sigs = aHashSignatures(
      decodeBinaryPartitioned(blobs, idCol, binCol, ImageIoCodec(grid = 8)))
    val (result, caches) =
      graft.llm.Dedup.hammingPairsFromSigsPlan(sigs, maxHamming, maxBucket)
    graft.ops.Caches.seal(result, caches: _*)
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
