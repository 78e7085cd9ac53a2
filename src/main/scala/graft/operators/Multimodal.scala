package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Distributed.StageSyntax

/** Multimodal column plumbing (SURVEY.md §2.3 L12): image/audio/video
  * as opaque `binary` payloads + typed metadata, processed in batched
  * per-partition passes.
  *
  * Both codec paths are REAL and pure-JVM: PNG via javax.imageio
  * (pixel-stat features, nearest-neighbor resize) and WAV via
  * javax.sound.sampled (PCM16 amplitude features) — encode→decode
  * roundtrips are golden-tested in MultimodalSpec. Undecodable or
  * unknown-format payloads fall back to a deterministic byte-stat
  * stub (`decodeStub`), so every stage is total. Everything Spark
  * owns — schema, partitioning, batch shape, the mapPartitions seam
  * where a heavier JNI codec would sit — is the same for all formats.
  * At 100 TB the payloads stream through one narrow stage; nothing is
  * collected and metadata travels columnar.
  */
object Multimodal {

  /** Per-partition REUSED PNG reader/writer (r16 optimization, guide
    * §4.5 "initialise heavyweight state once per task, not per row"):
    * `ImageIO.read`/`write` per row pays a plugin-registry scan, a
    * reader/writer allocation and a stream wrapper per image — at
    * ~20k tiny images per run that overhead dominated the actual
    * decode. One instance per partition, `setInput`/`setOutput` per
    * row, SAME plugin (the registry's PNG reader/writer) and default
    * params, so bytes and pixels are identical — MultimodalSpec's
    * golden roundtrips and the media_neardup oracle's arithmetic
    * replay pin that. NOT thread-safe; construct inside
    * mapPartitions. */
  private final class PngIo {
    private val reader =
      javax.imageio.ImageIO.getImageReadersByFormatName("png").next()
    private val writer =
      javax.imageio.ImageIO.getImageWritersByFormatName("png").next()

    /** Decode or None — same outcomes as ImageIO.read: corrupt/non-PNG
      * bytes yield None (the forced reader throws where the registry
      * probe returned null; both land in the caller's fallback). */
    def read(bytes: Array[Byte]): Option[java.awt.image.BufferedImage] =
      try {
        val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
          new java.io.ByteArrayInputStream(bytes))
        try {
          reader.setInput(iis, true, true)
          Option(reader.read(0))
        } finally iis.close()
      } catch { case scala.util.control.NonFatal(_) => None }

    /** Encode with default params — byte-identical to
      * `ImageIO.write(im, "png", out)`. */
    def write(im: java.awt.image.BufferedImage): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
      try {
        writer.setOutput(ios)
        writer.write(im)
        ios.flush()
      } finally ios.close()
      bos.toByteArray
    }
  }

  case class MediaMeta(fmt: String, width: Int, height: Int, n_bytes: Long)
  case class MediaRow(doc_id: Long, payload: Array[Byte], fmt: String, width: Int, height: Int)
  case class DecodedRow(doc_id: Long, fmt: String, width: Int, height: Int,
      n_bytes: Long, checksum: Long, features: Array[Double])

  /** Attach a binary payload + metadata to each document. The payload
    * is the utf-8 text bytes standing in for real media; metadata is
    * derived deterministically so tests can golden-check it. */
  def attachMedia(spark: SparkSession, dir: String): DataFrame =
    graft.sources.Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        encode(col("text"), "UTF-8").as("payload"),
        element_at(array(lit("png"), lit("jpeg"), lit("wav")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("fmt"),
        (pmod(col("doc_id"), lit(64)) * 16 + 64).cast("int").as("width"),
        (pmod(col("doc_id"), lit(48)) * 16 + 48).cast("int").as("height"))

  /** REAL media payloads: for fmt=png an actually-encoded PNG (tiny
    * solid-color image deterministically derived from doc_id — PNG is
    * lossless, so decode recovers the exact color); for fmt=wav an
    * actually-encoded PCM16 WAVE file (deterministic integer triangle
    * wave — lossless, so decode recovers the exact samples); other
    * formats keep the utf-8 text stand-in. Encoders run in the same
    * per-partition seam as decode. Payloads are kept small (8..39 px
    * images, 64..255-sample clips) so the synthetic corpus encodes in
    * milliseconds — the point is a true encode→decode roundtrip
    * through real codecs, not media size. */
  def synthesizeMedia(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    attachMedia(spark, dir)
      .select(col("doc_id"), col("payload"), col("fmt"),
        (pmod(col("doc_id"), lit(32)) + 8).cast("int").as("width"),
        (pmod(col("doc_id") * 7, lit(32)) + 8).cast("int").as("height"))
      .as[MediaRow]
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        rows.map { r =>
          if (r.fmt == "png") {
            val rgb = Multimodal.syntheticColor(r.doc_id)
            val im = new java.awt.image.BufferedImage(
              r.width, r.height, java.awt.image.BufferedImage.TYPE_INT_RGB)
            var y = 0
            while (y < r.height) {
              var x = 0
              while (x < r.width) { im.setRGB(x, y, rgb); x += 1 }
              y += 1
            }
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(im, "png", bos)
            r.copy(payload = bos.toByteArray)
          } else if (r.fmt == "wav") {
            r.copy(payload = encodeWavPcm16(syntheticSamples(r.doc_id), WavRate))
          } else r
        }
      }
  }

  /** Sample rate for all synthetic wav clips. */
  val WavRate: Float = 8000f

  /** Deterministic per-doc PCM16 clip for [[synthesizeMedia]]: an
    * integer triangle wave (no FP, no trig — bit-identical on any
    * JVM) with doc-derived length, period, and amplitude. */
  def syntheticSamples(docId: Long): Array[Short] = {
    val n = 64 + (docId % 192).toInt
    val period = 16 + (docId % 48).toInt
    val amp = (1000 + (docId * 131) % 24000).toInt
    val half = period / 2
    Array.tabulate(n) { i =>
      val ph = i % period
      val v =
        if (ph < half) -amp + (2 * amp * ph) / half
        else amp - (2 * amp * (ph - half)) / half
      v.toShort
    }
  }

  /** Real WAVE encode via javax.sound.sampled: little-endian PCM16
    * mono samples wrapped in an AudioInputStream and written through
    * the JDK's own RIFF writer. */
  def encodeWavPcm16(samples: Array[Short], sampleRate: Float): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate, 16, 1, true, false)
    val raw = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      raw(2 * i) = (samples(i) & 0xff).toByte
      raw(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(raw), fmt, samples.length.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Deterministic per-doc fill color for [[synthesizeMedia]]. */
  def syntheticColor(docId: Long): Int = {
    val red = ((docId * 37) % 256).toInt
    val green = ((docId * 59) % 256).toInt
    val blue = ((docId * 83) % 256).toInt
    (red << 16) | (green << 8) | blue
  }

  private def byteChecksum(bytes: Array[Byte]): Long = {
    var checksum = 0L
    var i = 0
    while (i < bytes.length) { checksum = checksum * 31 + (bytes(i) & 0xff); i += 1 }
    checksum
  }

  /** STUB features: deterministic byte statistics standing in for what
    * a codec would produce — the total-stage fallback for unknown
    * formats and undecodable payloads. */
  private def stubFeatures(bytes: Array[Byte]): Array[Double] =
    Array.tabulate(4) { k =>
      if (bytes.isEmpty) 0.0
      else bytes.iterator.drop(k).grouped(4).map(_.head & 0xff).sum.toDouble / bytes.length
    }

  /** The decode/feature-extract stage: batched per partition, the shape
    * a real codec binding needs. The codec call itself is STUBBED with
    * a deterministic fake (sum/rolling hash of bytes → "features"). */
  def decodeStub(media: Dataset[MediaRow]): Dataset[DecodedRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // real impl: open codec context once per partition, decode batches
      rows.map { r =>
        val bytes = r.payload
        DecodedRow(r.doc_id, r.fmt, r.width, r.height, bytes.length.toLong,
          byteChecksum(bytes), stubFeatures(bytes))
      }
    }
  }

  /** Real PCM16 WAVE decode via javax.sound.sampled (pure JVM, like
    * imageio): parses the RIFF container, streams the frames once, and
    * returns (sampleRate, channels, amplitude features). Features —
    * all normalized to [-1,1] full scale: mean |amplitude|, RMS, peak,
    * zero-crossing rate. None on anything that is not decodable PCM16,
    * so callers can fall back. */
  private def decodeWav(bytes: Array[Byte]): Option[(Int, Int, Array[Double])] =
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val f = ais.getFormat
      if (f.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
        || f.getSampleSizeInBits != 16) None
      else {
        val data = ais.readAllBytes()
        val n = data.length / 2
        if (n == 0) None
        else {
          var sumAbs = 0.0; var sumSq = 0.0; var peak = 0; var zc = 0L
          var prev = 0
          var i = 0
          while (i < n) {
            val s =
              if (f.isBigEndian) (data(2 * i) << 8) | (data(2 * i + 1) & 0xff)
              else (data(2 * i + 1) << 8) | (data(2 * i) & 0xff)
            val a = math.abs(s)
            sumAbs += a
            sumSq += s.toDouble * s
            if (a > peak) peak = a
            if (i > 0 && ((s > 0 && prev <= 0) || (s < 0 && prev >= 0))) zc += 1
            prev = s
            i += 1
          }
          val fs = 32768.0
          Some((f.getSampleRate.toInt, f.getChannels,
            Array(sumAbs / n / fs, math.sqrt(sumSq / n) / fs, peak / fs,
              zc.toDouble / n)))
        }
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** REAL decode via the JVM's own codecs (`javax.imageio` for PNG,
    * `javax.sound.sampled` for WAV — no native library needed). PNG:
    * width/height come from the decoded image and features are actual
    * pixel statistics (mean R, G, B, luma, each in [0,1]). WAV: width
    * carries the decoded sample rate, height the channel count, and
    * features are amplitude statistics (mean |a|, RMS, peak,
    * zero-crossing rate, full-scale normalized). Unknown formats and
    * undecodable payloads fall back to the deterministic stub path, so
    * the stage is total — a corrupt file degrades, never crashes the
    * pipeline. Runs in the same per-partition seam where a JNI codec
    * context would sit. */
  def decodeMedia(media: Dataset[MediaRow]): Dataset[DecodedRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false) // no temp-file cache in executors
      val png = new PngIo // one reader per partition (r16, guide §4.5)
      rows.map { r =>
        val bytes = r.payload
        val img = if (r.fmt == "png") png.read(bytes) else None
        img match {
          case Some(im) =>
            val w = im.getWidth
            val h = im.getHeight
            var sr = 0L; var sg = 0L; var sb = 0L
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val p = im.getRGB(x, y)
                sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
                x += 1
              }
              y += 1
            }
            val n = w.toDouble * h * 255.0
            val (mr, mg, mb) = (sr / n, sg / n, sb / n)
            val luma = 0.299 * mr + 0.587 * mg + 0.114 * mb
            DecodedRow(r.doc_id, r.fmt, w, h, bytes.length.toLong,
              byteChecksum(bytes), Array(mr, mg, mb, luma))
          case None =>
            (if (r.fmt == "wav") decodeWav(bytes) else None) match {
              case Some((rate, channels, features)) =>
                DecodedRow(r.doc_id, r.fmt, rate, channels, bytes.length.toLong,
                  byteChecksum(bytes), features)
              case None =>
                DecodedRow(r.doc_id, r.fmt, r.width, r.height, bytes.length.toLong,
                  byteChecksum(bytes), stubFeatures(bytes))
            }
        }
      }
    }
  }

  /** REAL resize for PNG payloads: decode → nearest-neighbor resample
    * to (tw, th) → re-encode, all through the JVM codec in the same
    * per-partition seam. Nearest-neighbor is chosen deliberately: it
    * is bit-deterministic across JVMs (no filtering arithmetic), which
    * keeps golden tests exact; swapping in an area/bilinear kernel is
    * a local change inside the loop. Non-PNG and undecodable payloads
    * pass through unchanged (total stage, like [[decodeMedia]]),
    * keeping their original metadata; resized rows carry the TARGET
    * dimensions (tw, th) in width/height. */
  def resizeMedia(media: Dataset[MediaRow], tw: Int, th: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      val png = new PngIo // one reader+writer per partition (r16, guide §4.5)
      rows.map { r =>
        val img = if (r.fmt == "png") png.read(r.payload) else None
        img match {
          case Some(im) =>
            val out = new java.awt.image.BufferedImage(
              tw, th, java.awt.image.BufferedImage.TYPE_INT_RGB)
            val sw = im.getWidth
            val sh = im.getHeight
            var y = 0
            while (y < th) {
              val sy = (y.toLong * sh / th).toInt
              var x = 0
              while (x < tw) {
                out.setRGB(x, y, im.getRGB((x.toLong * sw / tw).toInt, sy))
                x += 1
              }
              y += 1
            }
            r.copy(payload = png.write(out), width = tw, height = th)
          case None => r
        }
      }
    }
  }

  /** Perceptual average-hash (aHash) of PNG payloads: decode →
    * 8×8 nearest-neighbor downsample → per-pixel INTEGER luma
    * (299r + 587g + 114b — no floating point, so the hash is
    * bit-identical on any JVM) → bit i set iff pixel luma exceeds the
    * integer mean. Returns (doc_id, ahash) with one 64-bit signature
    * per decodable PNG; non-PNG and undecodable payloads are dropped
    * (they have no pixels to hash). Runs in the same per-partition
    * codec seam as [[decodeMedia]]; downstream of this stage
    * everything is columnar longs. */
  def imageAHash(media: Dataset[MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      val png = new PngIo // one reader per partition (r16, guide §4.5)
      rows.flatMap { r =>
        val img = if (r.fmt == "png") png.read(r.payload) else None
        img.map { im =>
          val sw = im.getWidth
          val sh = im.getHeight
          val luma = new Array[Int](64)
          var sum = 0L
          var y = 0
          while (y < 8) {
            val sy = (y.toLong * sh / 8).toInt
            var x = 0
            while (x < 8) {
              val p = im.getRGB((x.toLong * sw / 8).toInt, sy)
              val l = 299 * ((p >> 16) & 0xff) + 587 * ((p >> 8) & 0xff) + 114 * (p & 0xff)
              luma(8 * y + x) = l
              sum += l
              x += 1
            }
            y += 1
          }
          val mean = sum / 64
          var hash = 0L
          var i = 0
          while (i < 64) {
            if (luma(i) > mean) hash |= (1L << i)
            i += 1
          }
          (r.doc_id, hash)
        }
      }
    }.toDF("doc_id", "ahash")
  }

  /** Bit layout of the 5-block pigeonhole banding: block b of a
    * 64-bit hash covers bits [13b, 13b+13) for b < 4 and bits
    * [52, 64) for b = 4 (12 bits). */
  private[graft] val NumHashBlocks = 5
  private def blockVal(b: Int): Column = {
    val mask = if (b == NumHashBlocks - 1) 0xfffL else 0x1fffL
    expr(s"shiftrightunsigned(h, ${13 * b}) & $mask")
  }

  /** The pigeonhole near-dup join shared by image aHash and audio
    * envelope fingerprints — the generalized (multi-index) pigeonhole:
    * hamming ≤ 3 flips at most 3 of the 5 blocks, so every qualifying
    * pair shares ≥ 2 blocks VERBATIM, and candidates come from an
    * equi-join on the C(5,2) = 10 (block-pair, val, val) keys — never
    * an all-pairs comparison — with one codegen'd bit_count(xor)
    * verify per candidate. Why block PAIRS (r9, the r8 verdict's
    * item 2): the old 4×16-bit single-block join had a CONSTANT 2^16
    * bucket space, so uniform-random in-bucket collisions grew
    * Θ(N²/2^16) — the disease class dedup_embed's fixed sign-buckets
    * had before dynPlanes, measured 7.1× at 10× data. A 64-bit hash
    * cannot widen its blocks past 16 bits under the 1-match rule, but
    * requiring 2 of 5 matches makes the join key two blocks wide
    * (≥ 21 effective bits even when the top nibble is structurally
    * zero, 25-26 on full-width hashes) — the same candidate collapse,
    * bought with bandwidth (10 band rows/doc vs 4) instead of hash
    * width. Recall is EXACT by pigeonhole, not probabilistic. On top,
    * buckets holding more than [[Dedup.MaxBucketDocs]] signatures are
    * dropped from BOTH join sides (the minhash band-key cap pattern,
    * Dedup.scala) — the skew guard for degenerate pile-ups (a million
    * identical logos): a capped bucket's pairs survive only via their
    * other shared block-pairs, exactly like a hot minhash band, and
    * the oracle replays the cap bit-for-bit. The hot-key relation is
    * corpus-shaped (≤ 10N/cap keys), so no broadcast hint — AQE
    * broadcasts while it is small. MultimodalSpec proves the pair set
    * equals a brute-force driver-side sweep for both modalities (no
    * bucket is hot at fixture scale) and pins the cap on a degenerate
    * pile-up; ScaleSpec bounds candidate growth at 10× data.
    * `hashes` must carry (doc_id, h). */
  private[graft] def hammingBandPairs(hashes: DataFrame, maxHamming: Int): DataFrame = {
    require(maxHamming <= NumHashBlocks - 2,
      s"$NumHashBlocks blocks with 2-block keys only cover hamming <= ${NumHashBlocks - 2}")
    hammingCandidates(hashes)
      .withColumn("hamming",
        bit_count(col("h_a").bitwiseXOR(col("h_b"))).cast("int"))
      .filter(col("hamming") <= maxHamming)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
  }

  /** The candidate stage of [[hammingBandPairs]] — the capped
    * block-pair self-join before the hamming verify, exposed so
    * ScaleSpec can bound CANDIDATE growth (the quantity that goes
    * quadratic when the bucket space is too small), not just verified
    * pairs. */
  private[graft] def hammingCandidates(hashes: DataFrame): DataFrame = {
    val combos = for {
      b1 <- 0 until NumHashBlocks; b2 <- b1 + 1 until NumHashBlocks
    } yield (b1, b2)
    // localCheckpoint (the embedCandidates rule): the band relation
    // sits on top of the CODEC mapPartitions seam and feeds the
    // hot-key aggregate plus both self-join sides — without the cut,
    // every consumer would re-decode the payloads
    val bands = hashes
      .select(col("doc_id"), col("h"),
        explode(array(combos.map { case (b1, b2) =>
          struct(lit(b1 * 8 + b2).as("ck"),
            blockVal(b1).as("v1"), blockVal(b2).as("v2"))
        }: _*)).as("c"))
      .select(col("doc_id"), col("h"),
        col("c.ck").as("ck"), col("c.v1").as("v1"), col("c.v2").as("v2"))
      .stage()
    val key = Seq("ck", "v1", "v2")
    val hot = bands.groupBy(key.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .filter(col("n") > Dedup.MaxBucketDocs)
      .select(key.map(col): _*)
    val capped = bands.join(hot, key, "left_anti")
    def side(s: String) = capped.select(col("ck"), col("v1"), col("v2"),
      col("doc_id").as(s"doc_$s"), col("h").as(s"h_$s"))
    side("a")
      .join(side("b"), key)
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("h_a"), col("h_b"))
      .distinct()
  }

  /** Image near-duplicate pairs over the aHash signatures: the
    * 5-block/2-match pigeonhole covers hamming ≤ 3 over the 64-bit
    * hash. */
  def imageNearDupPairs(media: Dataset[MediaRow], maxHamming: Int = 3): DataFrame =
    hammingBandPairs(imageAHash(media).withColumnRenamed("ahash", "h"), maxHamming)

  /** Temporal-envelope fingerprint of WAV payloads, amplitude-scale
    * INVARIANT by construction: the decoded PCM16 stream splits into
    * 32 equal segments, and bit i is set iff segment i+1's |amplitude|
    * sum exceeds segment i's (31 bits used). Comparing integer segment
    * sums — no division, no floating point — means a volume-scaled
    * copy (samples ×k, no clipping) produces the IDENTICAL
    * fingerprint: scaling multiplies both sides of every comparison.
    * Non-WAV / undecodable / too-short payloads are dropped. Runs in
    * the decodeMedia per-partition codec seam. */
  def audioFingerprint(media: Dataset[MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    val nSeg = 64
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        val samplesOpt =
          if (r.fmt != "wav") None
          else try {
            val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
              new java.io.ByteArrayInputStream(r.payload))
            val f = ais.getFormat
            if (f.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
              || f.getSampleSizeInBits != 16) None
            else {
              val data = ais.readAllBytes()
              val n = data.length / 2
              if (n < nSeg) None
              else Some(Array.tabulate(n) { i =>
                if (f.isBigEndian) ((data(2 * i) << 8) | (data(2 * i + 1) & 0xff)).toShort
                else ((data(2 * i + 1) << 8) | (data(2 * i) & 0xff)).toShort
              })
            }
          } catch { case scala.util.control.NonFatal(_) => None }
        samplesOpt.map { s =>
          val seg = new Array[Long](nSeg)
          var i = 0
          while (i < s.length) {
            // equal-width segments; the last partial block folds into
            // segment nSeg-1 deterministically via the min (long
            // arithmetic: i*32 would overflow Int past ~67M samples)
            seg(math.min((i.toLong * nSeg / s.length).toInt, nSeg - 1)) += math.abs(s(i).toInt)
            i += 1
          }
          var h = 0L
          var k = 0
          while (k < nSeg - 1) {
            if (seg(k + 1) > seg(k)) h |= (1L << k)
            k += 1
          }
          (r.doc_id, h)
        }
      }
    }.toDF("doc_id", "h")
  }

  /** Audio near-duplicate pairs over the envelope fingerprints: the
    * same 5-block/2-match geometry as the image side covers hamming
    * ≤ 3 over the 63 used bits (see patternSamples for why the old
    * 8-bit/256-bucket form was superlinear — and hammingBandPairs for
    * why the 16-bit single-block form still was). */
  def audioNearDupPairs(media: Dataset[MediaRow], maxHamming: Int = 3): DataFrame =
    hammingBandPairs(audioFingerprint(media), maxHamming)

  /** Offset separating planted twin doc_ids from their bases in the
    * [[plantedMedia]] fixture. */
  val TwinOffset = 1000000000L

  /** Planted-pattern media fixture for the driver-checked
    * `media_neardup` query — the two-algorithms pattern applied to
    * codecs. Each even doc gets a 16×16 PNG whose 2×2 blocks encode a
    * 60-bit md5-derived pattern P (white block = bit set): nearest-
    * neighbor 8×8 downsample hits each block's top-left corner and the
    * integer-luma mean threshold sits strictly between all-white and
    * all-black, so [[imageAHash]] recovers EXACTLY P — but only by
    * actually round-tripping ImageIO encode→decode→resample→threshold.
    * Each odd doc gets a WAV of 64 constant-amplitude segments doing a
    * ±7 walk driven by a 60-bit pattern Q, so [[audioFingerprint]]'s
    * segment-sum comparisons recover EXACTLY Q through the RIFF codec.
    * Docs with doc_id % 10 ∈ {0,1} also get a TWIN (id + TwinOffset)
    * whose pattern has ≤3 planted bit flips — guaranteed near-dup
    * pairs. The oracle recomputes P/Q arithmetically from md5 hex (no
    * codec) and brute-force sweeps all pairs: agreement proves the
    * whole codec path bit-for-bit, not just the join. */
  def plantedMedia(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    val docs = graft.sources.Tables.documents(spark, dir).select(col("doc_id"))
    val img = docs.filter(col("doc_id") % 2 === 0).withColumn("h",
      expr("CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 15), 16, 10) AS BIGINT)"))
    val aud = docs.filter(col("doc_id") % 2 === 1).withColumn("h",
      expr("CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 15), 16, 10) AS BIGINT)"))
    def twins(base: DataFrame, bits: Int, residue: Int): DataFrame = base
      .filter(col("doc_id") % 10 === residue)
      .select((col("doc_id") + TwinOffset).as("doc_id"),
        expr(s"""h ^ (shiftleft(CAST(1 AS BIGINT), CAST(doc_id * 7 % $bits AS INT))
                    | shiftleft(CAST(1 AS BIGINT), CAST(doc_id * 13 % $bits AS INT))
                    | shiftleft(CAST(1 AS BIGINT), CAST(doc_id * 29 % $bits AS INT)))""").as("h"))
    val all = img.unionByName(twins(img, 60, 0)).withColumn("fmt", lit("png"))
      .unionByName(aud.unionByName(twins(aud, 60, 1)).withColumn("fmt", lit("wav")))
    // Repartition BEFORE the codec seam: the (id, h, fmt) relation is
    // narrow (24 bytes/row — a free shuffle) but the per-row encode is
    // CPU-heavy, and without this it inherits the SCAN's parallelism —
    // a handful of small parquet files would serialize the codec work
    // onto that many cores (the r8 sf1 sweep measured media_neardup at
    // 12.8× for 10× data against a 4-file corpus for exactly this
    // reason). The production rule it encodes: never let an expensive
    // map stage ride a small scan's accidental partitioning.
    all.select(col("doc_id"), col("h"), col("fmt")).as[(Long, Long, String)]
      .repartition(col("doc_id"))
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        val png = new PngIo // one writer per partition (r16, guide §4.5)
        rows.map { case (id, h, fmt) =>
          if (fmt == "png")
            MediaRow(id, png.write(patternImage(h)), "png", 16, 16)
          else
            MediaRow(id, encodeWavPcm16(patternSamples(h), WavRate), "wav", WavRate.toInt, 1)
        }
      }
  }

  /** 16×16 pattern image whose 2×2 blocks spell out the 60-bit
    * pattern: block (x, y) is white iff bit 8y+x of `h` is set (bits
    * 60–63 stay black, keeping the popcount < 64 the threshold
    * argument needs). Encoded by the caller's per-partition [[PngIo]]
    * (r16 — the per-call ImageIO.write paid a registry scan + writer
    * allocation per image). */
  private def patternImage(h: Long): java.awt.image.BufferedImage = {
    val im = new java.awt.image.BufferedImage(16, 16,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var i = 0
    while (i < 64) {
      val rgb = if (((h >>> i) & 1L) == 1L) 0xffffff else 0x000000
      val bx = (i % 8) * 2
      val by = (i / 8) * 2
      im.setRGB(bx, by, rgb); im.setRGB(bx + 1, by, rgb)
      im.setRGB(bx, by + 1, rgb); im.setRGB(bx + 1, by + 1, rgb)
      i += 1
    }
    im
  }

  /** 512 PCM16 samples in 64 constant segments of 8: amplitudes walk
    * a(k+1) = a(k) ± 7 by bit k of `h`, starting at 500 (max deviation
    * 63·7 = 441 keeps every amp positive — |sum| comparisons see the
    * walk direction exactly). 64 segments → a 63-bit usable
    * fingerprint, so the band join gets the same 16-bit blocks as the
    * image side: the r8 sweep caught the old 32-segment/31-bit form
    * banding on 8-bit blocks (256 buckets — occupancy, and with it the
    * candidate pair set, grew with N²). */
  private def patternSamples(h: Long): Array[Short] = {
    val amps = new Array[Int](64)
    amps(0) = 500
    var k = 0
    while (k < 63) {
      amps(k + 1) = amps(k) + (if (((h >>> k) & 1L) == 1L) 7 else -7)
      k += 1
    }
    Array.tabulate(512)(i => amps(i / 8).toShort)
  }

  /** L12b as a driver-checked query: near-dup pairs across BOTH media
    * modalities on the planted fixture, via the production pigeonhole
    * band join + hot-bucket cap + bit_count verify. The fixture is
    * fully planted, so the DuckDB oracle reproduces the hashes
    * arithmetically and replays the SAME banding (the C(5,2)
    * block-pair keys), the SAME cap (buckets > MaxBucketDocs dropped
    * — the dedup_embed oracle-parity trick) and the SAME verify — any
    * codec, hash, banding, cap, or verify drift shows up as a driver
    * hash mismatch. At fixture scale no bucket is hot, so the result
    * equals the old brute-force sweep (MultimodalSpec still proves
    * that equality); the capped form is what survives a growing
    * corpus. */
  def defs: Seq[graft.QueryDef] = Seq(
    graft.QueryDef(
      "media_neardup",
      s"""WITH img AS (
        |  SELECT doc_id,
        |         CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) AS h
        |  FROM documents WHERE doc_id % 2 = 0),
        |aud AS (
        |  SELECT doc_id,
        |         CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) AS h
        |  FROM documents WHERE doc_id % 2 = 1),
        |imga AS (
        |  SELECT doc_id, h FROM img
        |  UNION ALL
        |  SELECT doc_id + 1000000000,
        |         xor(h, (CAST(1 AS BIGINT) << CAST(doc_id * 7 % 60 AS INT))
        |              | (CAST(1 AS BIGINT) << CAST(doc_id * 13 % 60 AS INT))
        |              | (CAST(1 AS BIGINT) << CAST(doc_id * 29 % 60 AS INT)))
        |  FROM img WHERE doc_id % 10 = 0),
        |auda AS (
        |  SELECT doc_id, h FROM aud
        |  UNION ALL
        |  SELECT doc_id + 1000000000,
        |         xor(h, (CAST(1 AS BIGINT) << CAST(doc_id * 7 % 60 AS INT))
        |              | (CAST(1 AS BIGINT) << CAST(doc_id * 13 % 60 AS INT))
        |              | (CAST(1 AS BIGINT) << CAST(doc_id * 29 % 60 AS INT)))
        |  FROM aud WHERE doc_id % 10 = 1),
        |combos AS (SELECT b1.b AS b1, b2.b AS b2
        |           FROM generate_series(0, 4) b1(b), generate_series(0, 4) b2(b)
        |           WHERE b1.b < b2.b),
        |ib AS (SELECT doc_id, h, c.b1 * 8 + c.b2 AS ck,
        |              (h >> CAST(13 * c.b1 AS INT)) & (CASE WHEN c.b1 = 4 THEN 4095 ELSE 8191 END) AS v1,
        |              (h >> CAST(13 * c.b2 AS INT)) & (CASE WHEN c.b2 = 4 THEN 4095 ELSE 8191 END) AS v2
        |       FROM imga, combos c),
        |ihot AS (SELECT ck, v1, v2 FROM ib
        |         GROUP BY ck, v1, v2 HAVING COUNT(*) > ${Dedup.MaxBucketDocs}),
        |ibc AS (SELECT ib.* FROM ib WHERE NOT EXISTS
        |        (SELECT 1 FROM ihot WHERE ihot.ck = ib.ck AND ihot.v1 = ib.v1 AND ihot.v2 = ib.v2)),
        |icand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b, a.h AS ha, b.h AS hb
        |          FROM ibc a JOIN ibc b
        |            ON a.ck = b.ck AND a.v1 = b.v1 AND a.v2 = b.v2 AND a.doc_id < b.doc_id),
        |ab AS (SELECT doc_id, h, c.b1 * 8 + c.b2 AS ck,
        |              (h >> CAST(13 * c.b1 AS INT)) & (CASE WHEN c.b1 = 4 THEN 4095 ELSE 8191 END) AS v1,
        |              (h >> CAST(13 * c.b2 AS INT)) & (CASE WHEN c.b2 = 4 THEN 4095 ELSE 8191 END) AS v2
        |       FROM auda, combos c),
        |ahot AS (SELECT ck, v1, v2 FROM ab
        |         GROUP BY ck, v1, v2 HAVING COUNT(*) > ${Dedup.MaxBucketDocs}),
        |abc AS (SELECT ab.* FROM ab WHERE NOT EXISTS
        |        (SELECT 1 FROM ahot WHERE ahot.ck = ab.ck AND ahot.v1 = ab.v1 AND ahot.v2 = ab.v2)),
        |acand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b, a.h AS ha, b.h AS hb
        |          FROM abc a JOIN abc b
        |            ON a.ck = b.ck AND a.v1 = b.v1 AND a.v2 = b.v2 AND a.doc_id < b.doc_id)
        |SELECT 'image' AS modality, doc_a, doc_b,
        |       CAST(bit_count(xor(ha, hb)) AS INT) AS hamming
        |FROM icand WHERE bit_count(xor(ha, hb)) <= 3
        |UNION ALL
        |SELECT 'audio' AS modality, doc_a, doc_b,
        |       CAST(bit_count(xor(ha, hb)) AS INT) AS hamming
        |FROM acand WHERE bit_count(xor(ha, hb)) <= 3""".stripMargin) { (spark, dir) =>
      val media = plantedMedia(spark, dir).cache()
      imageNearDupPairs(media).withColumn("modality", lit("image"))
        .unionByName(audioNearDupPairs(media).withColumn("modality", lit("audio")))
        .select(col("modality"), col("doc_a"), col("doc_b"), col("hamming"))
    })

  /** Frame/chunk sampling: split each payload into fixed-size chunks →
    * one row per sampled chunk (every `stride`-th), columnar explode. */
  def sampleChunks(media: DataFrame, chunkBytes: Int, stride: Int): DataFrame =
    media
      .select(col("doc_id"), col("fmt"),
        posexplode(split_part_bytes(col("payload"), chunkBytes)).as(Seq("chunk_idx", "chunk")))
      .filter(pmod(col("chunk_idx"), lit(stride)) === 0)

  /** Binary → array<binary> of fixed-size chunks, with builtins only.
    * Empty payloads yield an empty array (sequence(0,-1) would count
    * DOWN in Spark and emit phantom chunks). */
  private def split_part_bytes(payload: org.apache.spark.sql.Column, n: Int) =
    when(length(payload) === 0, array().cast("array<binary>"))
      .otherwise(transform(
        sequence(lit(0), floor((length(payload) - 1) / n).cast("int")),
        i => substring(payload, (i * n + 1).cast("int"), lit(n))))
}
