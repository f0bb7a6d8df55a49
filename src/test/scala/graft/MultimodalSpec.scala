package graft

import org.apache.spark.sql.functions._
import graft.ext.Multimodal

class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  test("blobMetadata: byte length exact, fake dims within header ranges") {
    val df = Seq((1, "hello")).toDF("id", "text")
      .select(Multimodal.blobMetadata(Multimodal.asBlob($"text")).as("m"))
      .select($"m.n_bytes", $"m.width", $"m.height", $"m.channels")
    val r = df.head()
    assert(r.getLong(0) === 5L)
    assert(r.getLong(1) >= 1 && r.getLong(1) <= 1920)
    assert(r.getLong(2) >= 1 && r.getLong(2) <= 1080)
    assert(r.getLong(3) >= 1 && r.getLong(3) <= 3)
  }

  test("decodeImageStub is deterministic with the declared dimensionality") {
    val df = Seq(("img-a", "img-a", "img-b")).toDF("a", "a2", "b")
    val r = df.select(
      Multimodal.decodeImageStub(Multimodal.asBlob($"a")).as("va"),
      Multimodal.decodeImageStub(Multimodal.asBlob($"a2")).as("va2"),
      Multimodal.decodeImageStub(Multimodal.asBlob($"b")).as("vb"))
      .as[(Seq[Double], Seq[Double], Seq[Double])].head()
    assert(r._1.size === 8)
    assert(r._1 === r._2)
    assert(r._1 !== r._3)
    assert(r._1.forall(v => v >= -1.0 && v <= 1.0))
  }

  test("sampleFrames slices every stride-th fixed-size window") {
    val blob = "0123456789abcdef" // 16 bytes
    val frames = Seq(blob).toDF("text")
      .select(Multimodal.sampleFrames(Multimodal.asBlob($"text"), 4, 2).as("f"))
      .select($"f".cast("array<string>")).as[Seq[String]].head()
    assert(frames === Seq("0123", "89ab")) // windows at offsets 0 and 8
  }

  test("batchedFeatures calls the model once per batch, not per row") {
    val acc = spark.sparkContext.longAccumulator("batches")
    val df = (1 to 10).map(i => (i.toLong, s"blob $i")).toDF("doc_id", "text")
      .select($"doc_id", Multimodal.asBlob($"text").as("blob"))
      .repartition(1)
    val out = Multimodal.batchedFeatures(df, "doc_id", "blob",
      batchSize = 4, batchCounter = Some(acc))
    assert(out.count() === 10)
    assert(acc.value === 3) // ceil(10 / 4) batches on one partition
    val feats = out.orderBy($"doc_id").as[(Long, Seq[Float])].collect()
    assert(feats.forall(_._2.size === 8))
    // deterministic: same blob, same features
    val again = Multimodal.batchedFeatures(df, "doc_id", "blob", batchSize = 4)
      .orderBy($"doc_id").as[(Long, Seq[Float])].collect()
    assert(feats.toSeq === again.toSeq)
  }

  test("batched StubModel features match the column-path decode stub") {
    val df = (1 to 20).map(i => (i.toLong, s"document number $i with text"))
      .toDF("doc_id", "text")
      .select($"doc_id", Multimodal.asBlob($"text").as("blob"))
    val colPath = df
      .select($"doc_id", Multimodal.decodeImageStub($"blob").as("px"))
      .as[(Long, Seq[Double])].collect().toMap
    val batched = Multimodal.batchedFeatures(df, "doc_id", "blob")
      .as[(Long, Seq[Float])].collect().toMap
    assert(batched.keySet === colPath.keySet)
    batched.foreach { case (id, fs) =>
      // float(k/1000) vs double(k/1000): equal to ~6e-8
      fs.zip(colPath(id)).foreach { case (f, d) =>
        assert(math.abs(f - d) < 1e-6, s"doc $id: $f vs $d")
      }
    }
  }

  test("Pgm decodes the checked-in fixture byte-for-byte") {
    val bytes = getClass.getResourceAsStream("/fixture.pgm").readAllBytes()
    val img = Multimodal.Pgm.decode(bytes)
    assert(img.width === 4 && img.height === 3 && img.maxVal === 255)
    // 4x3 gradient written as pixel i = 10*i (header carries a #-comment
    // line, so the tokenizer's comment path is exercised too)
    assert(img.pixels.toSeq === (0 until 12).map(_ * 10))
    // malformed input fails loudly, never silently garbles
    intercept[IllegalArgumentException] {
      Multimodal.Pgm.decode("not a pgm".getBytes("UTF-8"))
    }
    intercept[IllegalArgumentException] { // truncated raster
      Multimodal.Pgm.decode(bytes.dropRight(2))
    }
    intercept[IllegalArgumentException] { // w*h overflows Int: 46341² —
      // must fail on the dim check, not NegativeArraySizeException later
      Multimodal.Pgm.decode("P5 46341 46341 255 ".getBytes("US-ASCII"))
    }
  }

  test("resize: nearest-neighbor downscale and upscale, exact pixels") {
    val bytes = getClass.getResourceAsStream("/fixture.pgm").readAllBytes()
    val img = Multimodal.Pgm.decode(bytes) // 4x3, pixel i = 10*i
    val down = Multimodal.resize(img, 2, 1)
    // source index: y*3/1=0... row sy = y*h/newH = 0; x: 0*4/2=0, 1*4/2=2
    assert(down.width === 2 && down.height === 1 && down.maxVal === 255)
    assert(down.pixels.toSeq === Seq(0, 20))
    val up = Multimodal.resize(img, 8, 3)
    assert(up.width === 8 && up.height === 3)
    // each source column doubles: row 0 of source is 0,10,20,30
    assert(up.pixels.take(8).toSeq === Seq(0, 0, 10, 10, 20, 20, 30, 30))
    // identity resize is a no-op
    assert(Multimodal.resize(img, 4, 3).pixels.toSeq === img.pixels.toSeq)
  }

  test("PgmModel rides batchedFeatures exactly like the stub (real codec path)") {
    val bytes = getClass.getResourceAsStream("/fixture.pgm").readAllBytes()
    val df = Seq((1L, bytes), (2L, bytes)).toDF("doc_id", "blob")
    val out = Multimodal.batchedFeatures(df, "doc_id", "blob",
        batchSize = 8, dims = 4, model = Multimodal.PgmModel)
      .orderBy($"doc_id").as[(Long, Seq[Float])].collect()
    assert(out.length === 2)
    // feature d = mean of pixels ≡ d (mod 4), normalized by maxVal:
    // pixels 0,10,…,110 → lane d holds {10d, 10d+40, 10d+80}
    val expected = (0 until 4).map(d => ((10 * d + 40).toDouble / 255).toFloat)
    out.foreach { case (_, f) =>
      assert(f.size === 4)
      f.zip(expected).foreach { case (got, exp) =>
        assert(math.abs(got - exp) < 1e-6, s"$got vs $exp")
      }
    }
  }

  // hand-serialize a canonical PCM16 WAV (optionally with a LIST chunk
  // before data, as real files carry)
  private def wavBytes(rate: Int, channels: Int, samples: Seq[Short],
                       junkChunk: Boolean = false): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(1024)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def chunk(id: String)(body: => Unit): Unit = {
      bb.put(id.getBytes("US-ASCII"))
      val sizePos = bb.position(); bb.putInt(0)
      val start = bb.position(); body
      val sz = bb.position() - start
      bb.putInt(sizePos, sz)
      if (sz % 2 == 1) bb.put(0.toByte)
    }
    bb.put("RIFF".getBytes("US-ASCII")); val riffSize = bb.position()
    bb.putInt(0); bb.put("WAVE".getBytes("US-ASCII"))
    chunk("fmt ") {
      bb.putShort(1); bb.putShort(channels.toShort); bb.putInt(rate)
      bb.putInt(rate * channels * 2); bb.putShort((channels * 2).toShort)
      bb.putShort(16)
    }
    if (junkChunk) chunk("LIST") { bb.put("INFOjunk!".getBytes("US-ASCII")) }
    chunk("data") { samples.foreach(bb.putShort) }
    bb.putInt(riffSize, bb.position() - riffSize - 4)
    java.util.Arrays.copyOf(bb.array(), bb.position())
  }

  test("Wav decodes canonical PCM16, skips junk chunks, rejects corrupt") {
    val square = Seq.fill(4)(Seq(8000.toShort, (-8000).toShort)).flatten
    val a = Multimodal.Wav.decode(wavBytes(8000, 1, square))
    assert(a.sampleRate === 8000 && a.channels === 1)
    assert(a.samples.toSeq === square)
    assert(math.abs(a.durationSec - 8.0 / 8000) < 1e-12)
    // unknown LIST chunk between fmt and data must be skipped
    val b = Multimodal.Wav.decode(wavBytes(8000, 1, square, junkChunk = true))
    assert(b.samples.toSeq === square)
    // corrupt inputs fail cleanly, never mis-index
    intercept[IllegalArgumentException] {
      Multimodal.Wav.decode("RIFFxxxxWAVN".getBytes("US-ASCII"))
    }
    intercept[IllegalArgumentException] { // data chunk claims more than buffer
      val ok = wavBytes(8000, 1, square)
      Multimodal.Wav.decode(ok.dropRight(4))
    }
  }

  test("wavEncode round-trips through Wav.decode sample-exactly and " +
    "agrees with the independent spec writer") {
    val samples = Array[Short](0, 256, -16384, 7680, 32767, -32768, 1)
    val dec = Multimodal.Wav.decode(Multimodal.wavEncode(8000, samples))
    assert(dec.sampleRate === 8000 && dec.channels === 1)
    assert(dec.samples.toSeq === samples.toSeq)
    // byte-identical to this spec's independently-written canonical
    // form (no junk chunk): two writers, one layout
    assert(Multimodal.wavEncode(8000, samples).toSeq ===
      wavBytes(8000, 1, samples.toIndexedSeq).toSeq)
  }

  test("wavFeatures: exact RMS and zero-crossing rate on a square wave") {
    val square = Seq.fill(4)(Seq(8000.toShort, (-8000).toShort)).flatten
    val (dur, rms, zcr) =
      Multimodal.wavFeatures(Multimodal.Wav.decode(wavBytes(8000, 1, square)))
    assert(math.abs(dur - 0.001) < 1e-12)
    assert(math.abs(rms - 8000.0 / 32768) < 1e-12) // |s| constant
    assert(math.abs(zcr - 1.0) < 1e-12)            // crosses every step
  }

  test("WavModel rides batchedFeatures like the image codec") {
    val square = Seq.fill(4)(Seq(8000.toShort, (-8000).toShort)).flatten
    val bytes = wavBytes(8000, 1, square)
    val df = Seq((1L, bytes), (2L, bytes)).toDF("doc_id", "blob")
    val out = Multimodal.batchedFeatures(df, "doc_id", "blob",
        batchSize = 8, dims = 2, model = Multimodal.WavModel)
      .orderBy($"doc_id").as[(Long, Seq[Float])].collect()
    assert(out.length === 2)
    // |amplitude| is constant 8000 → every lane = 8000/32768
    out.foreach { case (_, f) =>
      assert(f.size === 2)
      f.foreach(v => assert(math.abs(v - 8000f / 32768) < 1e-6))
    }
  }

  test("pipeline emits one feature row per document, no shuffle") {
    val df = Seq((1, "doc one"), (2, "doc two")).toDF("doc_id", "text")
    val out = Multimodal.pipeline(df, "text", "doc_id")
    assert(out.count() === 2)
    assert(out.columns.toSeq === Seq("doc_id", "n_bytes", "width", "height",
      "channels", "feat_mean", "feat_min", "feat_max"))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }
}
