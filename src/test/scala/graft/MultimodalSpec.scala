package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._

/** L12: the multimodal binary-column plumbing. PNG (javax.imageio)
  * and WAV (javax.sound.sampled) decode through real pure-JVM codecs;
  * unknown formats fall back to a deterministic stub. Schema,
  * batching, and the mapPartitions seam are the same for all paths. */
class MultimodalSpec extends SparkSuite {

  test("attachMedia produces binary payload + typed metadata") {
    val df = Multimodal.attachMedia(spark, sf0001)
    val schema = df.schema.map(f => f.name -> f.dataType.simpleString).toMap
    assert(schema("payload") === "binary")
    assert(schema("fmt") === "string")
    assert(schema("width") === "int" && schema("height") === "int")
    assert(df.count() === 500)
    assert(df.filter(col("width") < 64 || col("height") < 48).count() === 0)
  }

  test("decodeStub is deterministic and batched per partition") {
    import spark.implicits._
    val media = Multimodal.attachMedia(spark, sf0001)
      .select(col("doc_id"), col("payload"), col("fmt"), col("width"), col("height"))
      .as[Multimodal.MediaRow]
    val out1 = Multimodal.decodeStub(media).collect().sortBy(_.doc_id)
    val out2 = Multimodal.decodeStub(media).collect().sortBy(_.doc_id)
    assert(out1.length === 500)
    assert(out1.map(_.checksum).toSeq === out2.map(_.checksum).toSeq)
    assert(out1.forall(_.features.length === 4))
    assert(out1.forall(r => r.n_bytes > 0))
  }

  test("decodeMedia really decodes PNG: dimensions and pixel stats from the image") {
    import spark.implicits._
    // two golden PNGs built with the same codec family the decoder uses
    def png(w: Int, h: Int)(rgb: (Int, Int) => Int): Array[Byte] = {
      val im = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) im.setRGB(x, y, rgb(x, y))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(im, "png", bos)
      bos.toByteArray
    }
    val red = 0xff0000
    val blue = 0x0000ff
    val halfAndHalf = png(4, 2)((x, _) => if (x < 2) red else blue) // mean R = mean B = 0.5
    val allGreen = png(3, 3)((_, _) => 0x00ff00)
    val media = Seq(
      Multimodal.MediaRow(1L, halfAndHalf, "png", 0, 0), // metadata w/h wrong on purpose
      Multimodal.MediaRow(2L, allGreen, "png", 0, 0),
      Multimodal.MediaRow(3L, "not a png".getBytes("UTF-8"), "wav", 64, 48))
      .toDS()
    val out = Multimodal.decodeMedia(media).collect().sortBy(_.doc_id).toSeq

    val d1 = out(0) // decoded size overrides metadata
    assert(d1.width === 4 && d1.height === 2)
    assert(math.abs(d1.features(0) - 0.5) < 1e-9) // mean red
    assert(d1.features(1) === 0.0) // mean green
    assert(math.abs(d1.features(2) - 0.5) < 1e-9) // mean blue

    val d2 = out(1)
    assert(d2.width === 3 && d2.height === 3)
    assert(d2.features(0) === 0.0 && d2.features(1) === 1.0 && d2.features(2) === 0.0)
    assert(math.abs(d2.features(3) - 0.587) < 1e-9) // luma of pure green

    // non-PNG falls back to the deterministic stub path, keeping its metadata
    val d3 = out(2)
    assert(d3.width === 64 && d3.height === 48)
    val stub = Multimodal.decodeStub(media).collect().sortBy(_.doc_id).apply(2)
    assert(d3.features.toSeq === stub.features.toSeq)
  }

  test("corpus-scale encode→decode roundtrip through the real PNG codec") {
    import spark.implicits._
    val media = Multimodal.synthesizeMedia(spark, sf0001)
    val decoded = Multimodal.decodeMedia(media).collect()
    assert(decoded.length === 500)
    val pngs = decoded.filter(_.fmt == "png")
    assert(pngs.nonEmpty)
    pngs.foreach { d =>
      // dimensions came from the actual decoded image
      assert(d.width === (d.doc_id % 32 + 8).toInt, s"doc ${d.doc_id}")
      assert(d.height === (d.doc_id * 7 % 32 + 8).toInt, s"doc ${d.doc_id}")
      // lossless roundtrip: mean channel == the synthetic fill color
      val rgb = Multimodal.syntheticColor(d.doc_id)
      assert(math.abs(d.features(0) - ((rgb >> 16) & 0xff) / 255.0) < 1e-9)
      assert(math.abs(d.features(1) - ((rgb >> 8) & 0xff) / 255.0) < 1e-9)
      assert(math.abs(d.features(2) - (rgb & 0xff) / 255.0) < 1e-9)
    }
  }

  test("decodeMedia really decodes wav: PCM16 roundtrip recovers exact amplitude stats") {
    import spark.implicits._
    // WAV is lossless PCM: decode must see the exact synthetic samples,
    // so features computed directly from them must match to the bit
    val docId = 5L // doc_id % 3 == 2 → fmt = wav in attachMedia's scheme
    val samples = Multimodal.syntheticSamples(docId)
    val media = Seq(Multimodal.MediaRow(
      docId, Multimodal.encodeWavPcm16(samples, Multimodal.WavRate), "wav", 0, 0)).toDS()
    val d = Multimodal.decodeMedia(media).collect().head
    assert(d.width === 8000, "width must carry the DECODED sample rate")
    assert(d.height === 1, "height must carry the channel count")
    val n = samples.length
    var sumAbs = 0.0; var sumSq = 0.0; var peak = 0; var zc = 0L
    var i = 0
    while (i < n) {
      val s = samples(i).toInt
      sumAbs += math.abs(s); sumSq += s.toDouble * s
      if (math.abs(s) > peak) peak = math.abs(s)
      if (i > 0 && ((s > 0 && samples(i - 1) <= 0) || (s < 0 && samples(i - 1) >= 0))) zc += 1
      i += 1
    }
    assert(d.features(0) === sumAbs / n / 32768.0) // mean |amplitude|
    assert(d.features(1) === math.sqrt(sumSq / n) / 32768.0) // RMS
    assert(d.features(2) === peak / 32768.0) // peak
    assert(d.features(3) === zc.toDouble / n) // zero-crossing rate
  }

  test("corpus-scale wav roundtrip through the real WAVE codec") {
    val media = Multimodal.synthesizeMedia(spark, sf0001)
    val wavs = Multimodal.decodeMedia(media).collect().filter(_.fmt == "wav")
    assert(wavs.nonEmpty)
    wavs.foreach { d =>
      assert(d.width === 8000 && d.height === 1, s"doc ${d.doc_id}")
      // lossless roundtrip: decoded peak == the triangle wave's amplitude
      val peak = Multimodal.syntheticSamples(d.doc_id).map(s => math.abs(s.toInt)).max
      assert(d.features(2) === peak / 32768.0, s"doc ${d.doc_id}")
    }
  }

  test("corrupt wav payloads degrade to the stub path, never crash the stage") {
    import spark.implicits._
    // RIFF magic + garbage: the sound API must throw, the stage must
    // fall back per-row and keep the caller's metadata
    val corrupt = "RIFF".getBytes("UTF-8") ++ Array.fill(64)(0x5a.toByte)
    val media = Seq(Multimodal.MediaRow(1L, corrupt, "wav", 123, 4)).toDS()
    val out = Multimodal.decodeMedia(media).collect()
    assert(out.length === 1)
    assert(out(0).width === 123 && out(0).height === 4)
    val stub = Multimodal.decodeStub(media).collect()
    assert(out(0).features.toSeq === stub(0).features.toSeq)
  }

  test("corrupt PNG payloads degrade to the stub path, never crash the stage") {
    import spark.implicits._
    // PNG signature + garbage body: the codec must throw or return
    // null, and the stage must fall back per-row, not fail the task
    val corrupt = (Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
      ++ Array.fill(64)(0x5a.toByte))
    val media = Seq(
      Multimodal.MediaRow(1L, corrupt, "png", 9, 9),
      Multimodal.MediaRow(2L, Array.emptyByteArray, "png", 0, 0))
      .toDS()
    val out = Multimodal.decodeMedia(media).collect().sortBy(_.doc_id)
    assert(out.length === 2) // stage is total
    assert(out(0).width === 9 && out(0).height === 9) // metadata kept on fallback
    val resized = Multimodal.resizeMedia(media, 4, 4).collect().sortBy(_.doc_id)
    assert(resized(0).payload.toSeq === corrupt.toSeq) // pass-through untouched
  }

  test("resizeMedia resamples real PNGs pixel-exactly (nearest neighbor)") {
    import spark.implicits._
    def png(w: Int, h: Int)(rgb: (Int, Int) => Int): Array[Byte] = {
      val im = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) im.setRGB(x, y, rgb(x, y))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(im, "png", bos)
      bos.toByteArray
    }
    val red = 0xff0000
    val blue = 0x0000ff
    // left half red, right half blue — survives any downscale exactly
    val wide = png(8, 4)((x, _) => if (x < 4) red else blue)
    val media = Seq(
      Multimodal.MediaRow(1L, wide, "png", 8, 4),
      Multimodal.MediaRow(2L, "not a png".getBytes("UTF-8"), "wav", 64, 48))
      .toDS()
    val out = Multimodal.resizeMedia(media, 4, 2).collect().sortBy(_.doc_id)
    val im = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(out(0).payload))
    assert(out(0).width === 4 && out(0).height === 2)
    assert(im.getWidth === 4 && im.getHeight === 2)
    for (y <- 0 until 2; x <- 0 until 4)
      assert((im.getRGB(x, y) & 0xffffff) === (if (x < 2) red else blue), s"($x,$y)")
    // non-PNG passes through untouched
    assert(out(1).payload.toSeq === "not a png".getBytes("UTF-8").toSeq)
    assert(out(1).width === 64)
  }

  test("corpus-scale resize pipeline: synthesize → resize → decode") {
    import spark.implicits._
    val thumbs = Multimodal.resizeMedia(Multimodal.synthesizeMedia(spark, sf0001), 6, 5)
    val decoded = Multimodal.decodeMedia(thumbs).collect().filter(_.fmt == "png")
    assert(decoded.nonEmpty)
    decoded.foreach { d =>
      assert(d.width === 6 && d.height === 5, s"doc ${d.doc_id}")
      // solid-color source → solid-color thumbnail, color preserved
      val rgb = Multimodal.syntheticColor(d.doc_id)
      assert(math.abs(d.features(0) - ((rgb >> 16) & 0xff) / 255.0) < 1e-9)
      assert(math.abs(d.features(2) - (rgb & 0xff) / 255.0) < 1e-9)
    }
  }

  test("imageNearDupPairs equals a brute-force hamming sweep and finds planted dups") {
    import spark.implicits._
    def png(w: Int, h: Int)(rgb: (Int, Int) => Int): Array[Byte] = {
      val im = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) im.setRGB(x, y, rgb(x, y))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(im, "png", bos)
      bos.toByteArray
    }
    // deterministic textured pattern per image id (integer mixing only)
    def pattern(i: Int)(x: Int, y: Int): Int = {
      val v = x * 31 + y * 17 + i * 997
      (((v * 131) % 256) << 16) | (((v * 193) % 256) << 8) | ((v * 239) % 256)
    }
    val base = (0 until 30).map(i =>
      Multimodal.MediaRow(i.toLong, png(16, 16)(pattern(i)), "png", 16, 16))
    // planted exact dups: the same pixels re-encoded under a new id
    val exact = (0 until 5).map(i =>
      Multimodal.MediaRow(100L + i, png(16, 16)(pattern(i)), "png", 16, 16))
    // planted scale dups: a 2× nearest-neighbor upscale samples the
    // SAME source pixels on the 8×8 hash grid, so the signature is
    // identical by construction — resolution invariance, not luck
    val upscaled = Multimodal.resizeMedia(
      (0 until 5).map(i =>
        Multimodal.MediaRow(200L + i, png(16, 16)(pattern(5 + i)), "png", 16, 16)).toDS(),
      32, 32).collect().toSeq
    val noise = Seq(Multimodal.MediaRow(999L, "not a png".getBytes("UTF-8"), "wav", 0, 0))
    val media = (base ++ exact ++ upscaled ++ noise).toDS()

    val pairsDf = Multimodal.imageNearDupPairs(media, maxHamming = 3)
    pairsDf.collect()
    assert(!pairsDf.queryExecution.executedPlan.toString.contains("CartesianProduct"),
      "candidates must come from the block equi-join, never all-pairs")
    val got = pairsDf.collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"), r.getAs[Int]("hamming")))
      .toSet
    // pigeonhole completeness: the banded join must equal the full sweep
    val hs = Multimodal.imageAHash(media).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("ahash")))
    val truth = (for {
      (a, ha) <- hs; (b, hb) <- hs if a < b
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 3
    } yield (a, b, d)).toSet
    assert(got === truth)
    (0 until 5).foreach { i =>
      assert(got.contains((i.toLong, 100L + i, 0)), s"exact dup $i not found")
    }
    (0 until 5).foreach { i =>
      assert(got.contains((5L + i, 200L + i, 0)), s"upscaled dup $i not found")
    }
    // the non-image row never reaches the hash stage
    assert(hs.forall(_._1 != 999L))
  }

  test("audioNearDupPairs equals a brute-force sweep; volume scaling is hash-invariant") {
    import spark.implicits._
    // textured envelopes: 256 samples = 64 fingerprint segments of 4,
    // per-8-sample amplitude from integer mixing (alternating sign,
    // no clipping); truth is the brute-force sweep over the SAME
    // production fingerprint, so the test is segment-count-agnostic
    def clip(i: Int): Array[Short] = Array.tabulate(256) { j =>
      val seg = j / 8
      val amp = 200 + ((seg * 31 + i * 997) * 131) % 8000
      (if (j % 2 == 0) amp else -amp).toShort
    }
    val base = (0 until 25).map(i => Multimodal.MediaRow(i.toLong,
      Multimodal.encodeWavPcm16(clip(i), Multimodal.WavRate), "wav", 0, 0))
    // volume-doubled copies: every segment-sum comparison scales by 2,
    // so the fingerprint is IDENTICAL by construction, not by luck
    val scaled = (0 until 5).map { i =>
      val s = clip(i).map(v => (v * 2).toShort)
      Multimodal.MediaRow(100L + i,
        Multimodal.encodeWavPcm16(s, Multimodal.WavRate), "wav", 0, 0)
    }
    val noise = Seq(Multimodal.MediaRow(999L, "not a wav".getBytes("UTF-8"), "png", 0, 0))
    val media = (base ++ scaled ++ noise).toDS()

    val pairsDf = Multimodal.audioNearDupPairs(media, maxHamming = 3)
    pairsDf.collect()
    assert(!pairsDf.queryExecution.executedPlan.toString.contains("CartesianProduct"))
    val got = pairsDf.collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"), r.getAs[Int]("hamming")))
      .toSet
    val hs = Multimodal.audioFingerprint(media).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("h")))
    val truth = (for {
      (a, ha) <- hs; (b, hb) <- hs if a < b
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 3
    } yield (a, b, d)).toSet
    assert(got === truth)
    (0 until 5).foreach { i =>
      assert(got.contains((i.toLong, 100L + i, 0)), s"volume-scaled dup $i not found")
    }
    assert(hs.forall(_._1 != 999L), "non-audio rows must not reach the hash stage")
  }

  test("hammingBandPairs caps degenerate hot buckets and keeps other pairs") {
    import spark.implicits._
    // the skew guard (r9): a pile of IDENTICAL signatures (a million
    // copies of one logo) lands every copy in the same 10 block-pair
    // buckets — without the cap that is C(pile, 2) candidate pairs
    // from one key. With the pile over MaxBucketDocs every one of its
    // buckets is dropped on both sides, so the pile contributes ZERO
    // pairs, while an unrelated near-dup pair in cold buckets is
    // still found — and a pile UNDER the cap keeps all its pairs.
    val pileHash = 0x0123456789abcdL
    val pairA = 0x00fedcba987654L // distinct from the pile in every block
    val pairB = pairA ^ (1L << 3) ^ (1L << 20) // hamming 2 from pairA
    def hashes(pile: Int) =
      ((0 until pile).map(i => (1000L + i, pileHash)) ++
        Seq((1L, pairA), (2L, pairB))).toDF("doc_id", "h")
    val hot = graft.operators.Multimodal
      .hammingBandPairs(hashes(graft.operators.Dedup.MaxBucketDocs + 50), 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(hot === Set((1L, 2L)),
      s"capped pile must contribute no pairs, cold pair must survive; got $hot")
    val cold = graft.operators.Multimodal.hammingBandPairs(hashes(10), 3).count()
    assert(cold === 45 + 1, "an under-cap pile keeps all C(10,2) exact-dup pairs")
  }

  test("plantedMedia patterns survive the codec roundtrip bit-for-bit") {
    import spark.implicits._
    // The media_neardup oracle's whole premise: the 60-bit image
    // and audio patterns planted from md5 arithmetic are
    // recovered EXACTLY by the production aHash / envelope fingerprint
    // after a real PNG/WAV encode→decode. Any codec, threshold, or
    // bit-order drift breaks equality here before the driver sees it.
    val media = Multimodal.plantedMedia(spark, sf0001).cache()
    val expected = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id")).filter(col("doc_id") % 2 === 0)
      .withColumn("h",
        expr("CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 15), 16, 10) AS BIGINT)"))
      .as[(Long, Long)].collect().toMap
    val got = Multimodal.imageAHash(media).as[(Long, Long)].collect()
    assert(got.nonEmpty)
    got.filter(_._1 < Multimodal.TwinOffset).foreach { case (id, h) =>
      assert(h === expected(id), s"doc $id: codec roundtrip changed the pattern")
    }
    val expectedAud = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id")).filter(col("doc_id") % 2 === 1)
      .withColumn("h",
        expr("CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 15), 16, 10) AS BIGINT)"))
      .as[(Long, Long)].collect().toMap
    val gotAud = Multimodal.audioFingerprint(media).as[(Long, Long)].collect()
    assert(gotAud.nonEmpty)
    gotAud.filter(_._1 < Multimodal.TwinOffset).foreach { case (id, h) =>
      assert(h === expectedAud(id), s"doc $id: wav roundtrip changed the pattern")
    }
    media.unpersist()
  }

  test("sampleChunks explodes payloads into strided fixed-size chunks") {
    val media = Multimodal.attachMedia(spark, sf0001)
    val chunks = Multimodal.sampleChunks(media, chunkBytes = 32, stride = 2)
    assert(chunks.columns.toSeq === Seq("doc_id", "fmt", "chunk_idx", "chunk"))
    assert(chunks.filter(pmod(col("chunk_idx"), lit(2)) =!= 0).count() === 0)
    assert(chunks.count() > 500) // at least one sampled chunk per doc
  }
}
