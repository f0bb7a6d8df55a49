package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata.
  *
  * The Spark-side machinery (schema, batching, partition-parallel decode)
  * is real; the actual codec calls are STUBBED with deterministic fakes —
  * the image/audio libraries are not in this container. Swap
  * [[decodeImageStub]] / [[extractFeaturesStub]] for real codec calls
  * (JNI or `mapPartitions` over a native decoder) without touching any
  * plan shape.
  */
object Multimodal {

  /** Wrap a text column as a fake media blob (UTF-8 bytes). Stands in for
    * reading real image/audio bytes from parquet/object storage.
    */
  def asBlob(c: Column): Column = encode(c, "UTF-8")

  /** ASCII code of the hex char at 1-based position `i` (mod 32) of an
    * md5-hex digest — the unit of every deterministic fake below.
    * ascii+substr+md5 exist in every SQL engine, which is what makes the
    * stub outputs cross-checkable against an external oracle.
    */
  private def hexCode(digest: Column, i: Int): Column =
    ascii(substring(digest, (i - 1) % 32 + 1, 1))

  /** Typed metadata extracted per blob — all built-in binary functions,
    * fully codegen'd: byte length, content digest, and fake
    * width/height/channels derived deterministically from the digest
    * (stands in for an image-header parse).
    */
  def blobMetadata(blob: Column): Column = {
    val d = md5(blob)
    struct(
      octet_length(blob).cast("long").as("n_bytes"),
      d.as("digest"),
      (pmod(hexCode(d, 1) * 131 + hexCode(d, 2), lit(1920)) + 1)
        .cast("long").as("width"),
      (pmod(hexCode(d, 3) * 131 + hexCode(d, 4), lit(1080)) + 1)
        .cast("long").as("height"),
      (pmod(hexCode(d, 5), lit(3)) + 1).cast("long").as("channels"))
  }

  /** STUB decode: a real implementation calls the codec here (per
    * partition, batched). The fake emits a deterministic `dims`-dim
    * pixel vector from the blob's md5 digest so downstream plumbing
    * (schema, joins, similarity) is exercised end-to-end. Must stay in
    * lockstep with [[StubModel.infer]] (spec-pinned).
    */
  def decodeImageStub(blob: Column, dims: Int = 8): Column = {
    val d = md5(blob)
    array((0 until dims).map { i =>
      (pmod(hexCode(d, 4 * i + 1) * 131 + hexCode(d, 4 * i + 2) * 17 +
        hexCode(d, 4 * i + 3), lit(2000)).cast("double") - 1000.0) / 1000.0
    }: _*)
  }

  /** STUB feature extraction over a decoded "image": mean/min/max of the
    * fake pixels. Real impl: model inference via mapPartitions (batch the
    * rows, call the runtime once per batch — never per row).
    */
  def extractFeaturesStub(decoded: Column): Column = struct(
    // +1e-9: the mean is K/8000 for integer K, which can land exactly on
    // a 4-dp half-boundary where engines round in different directions
    round(aggregate(decoded, lit(0.0), (a, x) => a + x) / size(decoded)
      + lit(1e-9), 4).as("mean"),
    round(array_min(decoded), 4).as("p_min"),
    round(array_max(decoded), 4).as("p_max"))

  /** Frame sampling for video-ish blobs: every `stride`-th byte window.
    * Demonstrates the slice-without-decode pattern (cheap row splitter —
    * the heavy decode runs only on sampled frames).
    */
  def sampleFrames(blob: Column, frameBytes: Int, stride: Int): Column = {
    // integer frame count: Column./ is floating division, which sequence()
    // rejects — floor+cast keeps the index arithmetic integral
    val nFrames = floor(octet_length(blob) / lit(frameBytes * stride)).cast("long")
    transform(
      sequence(lit(0L), greatest(nFrames - 1L, lit(0L))),
      i => blob.substr((i * frameBytes * stride + 1).cast("int"), lit(frameBytes)))
  }

  /** The pluggable decode/inference contract [[batchedFeatures]] runs:
    * one call per BATCH of blobs, `dims` floats out per blob. Implemented
    * by the deterministic [[StubModel]] (the oracle-checkable fake) and
    * the real [[PgmModel]] codec — swapping one for the other changes no
    * plan shape, schema, or batching behavior, which is the point of
    * keeping the interface this narrow.
    */
  trait BatchModel extends Serializable {
    def infer(batch: Seq[Array[Byte]], dims: Int): Seq[Array[Float]]
  }

  /** One decoded 8-bit PGM (P5) image. */
  case class PgmImage(width: Int, height: Int, maxVal: Int,
                      pixels: Array[Int])

  /** Pure-JVM decoder for the binary PGM (P5) format — an actual image
    * codec, not a fake: `P5`, whitespace/#-comment-separated width,
    * height, maxVal (≤ 255, the 8-bit variant), one whitespace byte,
    * then width×height raw gray bytes. Small by design: the container
    * has no imaging libraries, and PGM is the standard minimal
    * interchange format real pipelines use for exactly that situation.
    */
  object Pgm {
    def decode(bytes: Array[Byte]): PgmImage = {
      var i = 0
      def fail(msg: String) = throw new IllegalArgumentException(
        s"not an 8-bit P5 PGM: $msg (offset $i)")
      def isWs(b: Byte) = b == ' ' || b == '\t' || b == '\n' || b == '\r'
      // whitespace and '#'-to-end-of-line comments separate header tokens
      def skipWs(): Unit = {
        var go = true
        while (go && i < bytes.length) {
          if (isWs(bytes(i))) i += 1
          else if (bytes(i) == '#') { while (i < bytes.length && bytes(i) != '\n') i += 1 }
          else go = false
        }
      }
      def int(): Int = {
        skipWs()
        val start = i
        while (i < bytes.length && bytes(i) >= '0' && bytes(i) <= '9') i += 1
        if (i == start) fail("expected integer")
        new String(bytes, start, i - start, "US-ASCII").toInt
      }
      if (bytes.length < 2 || bytes(0) != 'P' || bytes(1) != '5') fail("bad magic")
      i = 2
      val (w, h, maxVal) = (int(), int(), int())
      if (w <= 0 || h <= 0) fail(s"bad dims ${w}x$h")
      // untrusted-corpus guard: w*h must be checked in LONG, or a crafted
      // header (e.g. 46341x46341) overflows Int, sneaks past the
      // truncation check, and dies later with NegativeArraySizeException
      if (w.toLong * h > Int.MaxValue) fail(s"dims ${w}x$h overflow pixel count")
      if (maxVal <= 0 || maxVal > 255) fail(s"maxVal $maxVal out of 8-bit range")
      i += 1 // exactly ONE whitespace byte separates header from raster
      if (bytes.length - i < w * h) fail(s"raster truncated: ${bytes.length - i} < ${w * h}")
      val px = new Array[Int](w * h)
      var j = 0
      while (j < w * h) { px(j) = bytes(i + j) & 0xff; j += 1 }
      PgmImage(w, h, maxVal, px)
    }
  }

  /** Nearest-neighbor resize of a decoded image — the standard
    * pre-inference normalization step (every vision model wants a fixed
    * input size). Pure integer arithmetic (source index =
    * floor(target·src/dst) per axis), so the result is deterministic
    * and spec-checkable byte-for-byte; swap in a bilinear kernel behind
    * the same signature if quality matters more than exactness.
    */
  def resize(img: PgmImage, newW: Int, newH: Int): PgmImage = {
    require(newW > 0 && newH > 0, s"bad target ${newW}x$newH")
    require(newW.toLong * newH <= Int.MaxValue,
      s"target ${newW}x$newH overflows pixel count")
    val px = new Array[Int](newW * newH)
    var y = 0
    while (y < newH) {
      // per-axis index math in LONG: x*img.width (resp. y*img.height)
      // overflows Int for sources/targets near the pixel-count bound,
      // silently mis-indexing before any bound check can catch it
      val sy = (y.toLong * img.height / newH).toInt
      val rowBase = sy.toLong * img.width
      var x = 0
      while (x < newW) {
        px(y * newW + x) =
          img.pixels((rowBase + x.toLong * img.width / newW).toInt)
        x += 1
      }
      y += 1
    }
    PgmImage(newW, newH, img.maxVal, px)
  }

  /** Real codec path behind the [[BatchModel]] interface: decode each
    * blob as a P5 PGM and emit `dims` features — feature d is the mean
    * of pixels at indices ≡ d (mod dims), normalized by maxVal. A
    * uniform strided pooling: deterministic, covers every pixel, and
    * exercises the same batched mapPartitions plumbing as the stub.
    * Compose with [[resize]] upstream when a fixed input raster is
    * required.
    */
  object PgmModel extends BatchModel {
    def infer(batch: Seq[Array[Byte]], dims: Int): Seq[Array[Float]] =
      batch.map { bytes =>
        val img = Pgm.decode(bytes)
        val sums = new Array[Double](dims)
        val counts = new Array[Int](dims)
        var j = 0
        while (j < img.pixels.length) {
          sums(j % dims) += img.pixels(j); counts(j % dims) += 1; j += 1
        }
        Array.tabulate(dims) { d =>
          if (counts(d) == 0) 0f
          else (sums(d) / counts(d) / img.maxVal).toFloat
        }
      }
  }

  /** One decoded PCM16 WAV clip (interleaved samples). */
  case class WavAudio(sampleRate: Int, channels: Int,
                      samples: Array[Short]) {
    def durationSec: Double =
      if (sampleRate == 0 || channels == 0) 0.0
      else samples.length.toDouble / channels / sampleRate
  }

  /** Pure-JVM decoder for canonical PCM16 WAV (RIFF/WAVE, fmt
    * audioFormat=1, 16-bit) — the second REAL codec behind the
    * multimodal surface (images: [[Pgm]]). Walks the chunk list (word-
    * aligned, unknown chunks skipped — real WAVs carry LIST/INFO
    * chunks), validates every size against the buffer before reading
    * (untrusted-corpus rule: corrupt headers must fail cleanly, same
    * contract as the PGM long-math guards).
    */
  object Wav {
    private def u16(b: Array[Byte], i: Int): Int =
      (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
    private def u32(b: Array[Byte], i: Int): Long =
      (u16(b, i).toLong | (u16(b, i + 2).toLong << 16)) & 0xffffffffL

    def decode(bytes: Array[Byte]): WavAudio = {
      def fail(msg: String) =
        throw new IllegalArgumentException(s"not a PCM16 WAV: $msg")
      if (bytes.length < 12 ||
        new String(bytes, 0, 4, "US-ASCII") != "RIFF" ||
        new String(bytes, 8, 4, "US-ASCII") != "WAVE") fail("bad magic")
      var i = 12
      var rate = 0; var channels = 0; var haveFmt = false
      var dataOff = -1; var dataLen = 0
      while (i + 8 <= bytes.length && (!haveFmt || dataOff < 0)) {
        val id = new String(bytes, i, 4, "US-ASCII")
        val sz = u32(bytes, i + 4)
        if (sz > bytes.length - i - 8) fail(s"chunk $id overruns buffer")
        id match {
          case "fmt " =>
            if (sz < 16) fail("fmt chunk too short")
            val fmtCode = u16(bytes, i + 8)
            channels = u16(bytes, i + 10)
            val r = u32(bytes, i + 12)
            val bits = u16(bytes, i + 22)
            if (fmtCode != 1) fail(s"audioFormat $fmtCode (want PCM=1)")
            if (bits != 16) fail(s"$bits bits (want 16)")
            if (channels < 1 || channels > 8) fail(s"$channels channels")
            if (r <= 0 || r > Int.MaxValue) fail(s"sample rate $r")
            rate = r.toInt; haveFmt = true
          case "data" =>
            dataOff = i + 8; dataLen = sz.toInt
          case _ => // LIST/INFO/fact/...: skip
        }
        i += 8 + sz.toInt + (sz.toInt & 1) // chunks are word-aligned
      }
      if (!haveFmt) fail("no fmt chunk")
      if (dataOff < 0) fail("no data chunk")
      val n = dataLen / 2
      val samples = new Array[Short](n)
      var j = 0
      while (j < n) {
        samples(j) = u16(bytes, dataOff + 2 * j).toShort
        j += 1
      }
      WavAudio(rate, channels, samples)
    }
  }

  /** Minimal mono PCM16 WAV writer — the encode half of [[Wav]]: a
    * canonical 44-byte RIFF/WAVE/fmt/data layout [[Wav.decode]] reads
    * back exactly. Used to synthesize deterministic clips (specs, the
    * q279 audio path) so the container ROUND-TRIP is what the engine
    * exercises while the oracle recomputes features from the source
    * samples directly.
    */
  def wavEncode(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")); bb.putInt(36 + dataLen)
    bb.put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")); bb.putInt(16)
    bb.putShort(1); bb.putShort(1) // PCM, mono
    bb.putInt(sampleRate); bb.putInt(sampleRate * 2) // byte rate
    bb.putShort(2); bb.putShort(16) // block align, bits
    bb.put("data".getBytes("US-ASCII")); bb.putInt(dataLen)
    samples.foreach(bb.putShort)
    bb.array()
  }

  /** The standard cheap audio features — duration, RMS energy (full-
    * scale-normalized), zero-crossing rate — computed in one pass over
    * the decoded samples. Deterministic, so spec-checkable exactly.
    */
  def wavFeatures(a: WavAudio): (Double, Double, Double) = {
    val n = a.samples.length
    if (n == 0) return (0.0, 0.0, 0.0)
    var sumSq = 0.0
    var crossings = 0
    var j = 0
    while (j < n) {
      val s = a.samples(j).toDouble
      sumSq += s * s
      if (j > 0 && ((a.samples(j - 1) < 0) != (a.samples(j) < 0)))
        crossings += 1
      j += 1
    }
    (a.durationSec, math.sqrt(sumSq / n) / 32768.0,
      if (n > 1) crossings.toDouble / (n - 1) else 0.0)
  }

  /** Real audio path behind [[BatchModel]]: decode PCM16 WAV, emit
    * `dims` features by strided mean |amplitude| (full-scale
    * normalized) — the audio twin of [[PgmModel]], same batched
    * mapPartitions plumbing.
    */
  object WavModel extends BatchModel {
    def infer(batch: Seq[Array[Byte]], dims: Int): Seq[Array[Float]] =
      batch.map { bytes =>
        val a = Wav.decode(bytes)
        val sums = new Array[Double](dims)
        val counts = new Array[Int](dims)
        var j = 0
        while (j < a.samples.length) {
          sums(j % dims) += math.abs(a.samples(j).toDouble)
          counts(j % dims) += 1
          j += 1
        }
        Array.tabulate(dims) { d =>
          if (counts(d) == 0) 0f
          else (sums(d) / counts(d) / 32768.0).toFloat
        }
      }
  }

  /** Deterministic stand-in for a batched model/codec runtime. A real
    * implementation holds the expensive handle (ONNX session, decoder
    * context) per partition and is invoked once per BATCH — that
    * amortization is what [[batchedFeatures]] exercises.
    */
  object StubModel extends BatchModel {
    private def md5Hex(bytes: Array[Byte]): String =
      java.security.MessageDigest.getInstance("MD5").digest(bytes)
        .map(b => f"${b & 0xff}%02x").mkString

    /** Bit-for-bit the same fake as [[decodeImageStub]] (spec-pinned):
      * pixel d mixes three hex chars of the md5 digest. Keeping the
      * batched path and the column path in lockstep means either can
      * verify the other.
      */
    def infer(batch: Seq[Array[Byte]], dims: Int): Seq[Array[Float]] =
      batch.map { bytes =>
        val hex = md5Hex(bytes)
        Array.tabulate(dims) { d =>
          val c1 = hex.charAt((4 * d) % 32).toInt
          val c2 = hex.charAt((4 * d + 1) % 32).toInt
          val c3 = hex.charAt((4 * d + 2) % 32).toInt
          (Math.floorMod(c1 * 131 + c2 * 17 + c3, 2000) - 1000).toFloat / 1000f
        }
      }
  }

  /** Partition-parallel batched feature extraction — the Scala analogue
    * of a Pandas-UDF `mapInPandas` decode stage: each partition's rows
    * are grouped into `batchSize`-row batches and the (stubbed) model is
    * called once per batch, never per row. The optional accumulator
    * counts model invocations so tests (and ops dashboards) can verify
    * the batching actually amortizes.
    *
    * mapPartitions is the right tool here and only here: the work is
    * imperative (external runtime call), per-partition, and
    * schema-stable; everything before and after stays declarative.
    */
  def batchedFeatures(df: DataFrame, idCol: String, blobCol: String,
                      batchSize: Int = 64, dims: Int = 8,
                      batchCounter: Option[org.apache.spark.util.LongAccumulator] = None,
                      model: BatchModel = StubModel)
  : DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // fanOutForMapWork (r17, guide §2.5): the batched decode/inference
    // below is the operator's whole cost and runs in the scan stage —
    // single-task on a one-row-group input
    graft.sources.Tables.fanOutForMapWork(
        df.select(col(idCol).cast("long"), col(blobCol)))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          batchCounter.foreach(_.add(1))
          val feats = model.infer(batch.map(_._2), dims)
          batch.iterator.zip(feats.iterator).map { case ((id, _), f) => (id, f) }
        }
      }
      .toDF(idCol, "features")
  }

  /** End-to-end multimodal pipeline over a text-as-blob table: blob →
    * metadata → stub-decode → stub-features. One projection, no shuffle.
    */
  def pipeline(df: DataFrame, textCol: String, idCol: String): DataFrame =
    // NO fan-out (r18): the r17 placement was inert (estimate-based
    // floor); engaged by the leaf-bytes gate it regressed (q36 A/B
    // 0.198 s off vs 0.277 s on) — the stub decode chain is one cheap
    // codegen projection, unlike batchedFeatures' real mapPartitions
    // decode (which keeps its fan-out). Removed per the measured rule.
    df.select(col(idCol), col(textCol))
      .select(col(idCol), asBlob(col(textCol)).as("blob"))
      .withColumn("meta", blobMetadata(col("blob")))
      .withColumn("decoded", decodeImageStub(col("blob")))
      .withColumn("features", extractFeaturesStub(col("decoded")))
      .select(col(idCol), col("meta.n_bytes").as("n_bytes"),
        col("meta.width").as("width"), col("meta.height").as("height"),
        col("meta.channels").as("channels"),
        col("features.mean").as("feat_mean"),
        col("features.p_min").as("feat_min"),
        col("features.p_max").as("feat_max"))
}
