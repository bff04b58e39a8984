package graft

import graft.fixtures.Fixtures
import graft.operators.Raster

/** Raster/multimodal ops: decode plumbing, the PSNR+caption invariant
  * (exact for lossless PNG, >=40dB for the lossy re-encode), thumbnails,
  * stub features. */
class RasterSpec extends SparkFunSuite {
  import spark.implicits._

  private val N = 300
  private lazy val rows = Fixtures.localImages(N, withBytes = true)
  private lazy val df = rows.toDF().cache()

  test("decodeStats: every fixture image decodes with consistent metadata") {
    val stats = Raster.decodeStats(df).collect()
    assert(stats.length == N)
    assert(stats.forall(_.ok), stats.filterNot(_.ok).take(3).mkString(","))
    // decode is deterministic: same crc on re-run
    val again = Raster.decodeStats(df).collect().map(s => s.image_id -> s.pixelCrc).toMap
    stats.foreach(s => assert(again(s.image_id) == s.pixelCrc))
  }

  // source regenerator: a top-level-style function value capturing only a
  // dims map (the suite itself is not serializable)
  private def srcFn(dims: Map[String, (Int, Int)]): String => Array[Int] = {
    val seed = Fixtures.DefaultSeed
    (id: String) => {
      val n = id.stripPrefix("img_").toLong
      val (w, h) = dims(id)
      Raster.rgb(Raster.decode(Fixtures.makePng(n, seed, w, h)).get)
    }
  }

  test("invariant: lossless PNG decodes EXACTLY (infinite PSNR) + caption agrees") {
    val src = srcFn(rows.map(r => r.image_id -> (r.w, r.h)).toMap)
    val out = Raster.verifyInvariant(df, src).collect()
    assert(out.length == N)
    out.foreach { r =>
      assert(r.psnr.isPosInfinity, s"${r.image_id}: psnr=${r.psnr}")
      assert(r.captionOk, s"${r.image_id}: caption mismatch")
    }
  }

  test("invariant: lossy JPEG re-encode stays above the 40dB bound") {
    // lossy fixture subset uses the smooth source (FIXTURES.md §1)
    val lossy = rows.take(40).map { r =>
      val smooth = Fixtures.makeSmoothPng(r.image_id.stripPrefix("img_").toLong,
        Fixtures.DefaultSeed, r.w, r.h)
      r.copy(bytes = Raster.reencodeJpeg(smooth), fmt = "jpg")
    }
    val dims = rows.map(r => r.image_id -> (r.w, r.h)).toMap
    val seed = Fixtures.DefaultSeed
    val src = (id: String) => {
      val (w, h) = dims(id)
      Raster.rgb(Raster.decode(
        Fixtures.makeSmoothPng(id.stripPrefix("img_").toLong, seed, w, h)).get)
    }
    val out = Raster.verifyInvariant(lossy.toDF(), src).collect()
    out.foreach { r =>
      assert(!r.psnr.isPosInfinity, "jpeg should not be bit-exact")
      assert(r.psnr >= 40.0, s"${r.image_id}: psnr=${r.psnr} < 40dB")
    }
  }

  test("thumbnails: resized per-partition, decodable, right size") {
    val th = Raster.thumbnails(df.limit(50), 8).collect()
    assert(th.length == 50)
    th.foreach { t =>
      val img = Raster.decode(t.thumb).get
      assert(img.getWidth == 8 && img.getHeight == 8)
    }
  }

  // deterministic BROAD-SPECTRUM image: a random-sign 9x9 low-frequency
  // DCT coefficient field rendered to pixels. pHash thresholds DCT
  // coefficients at their median — the contract ("few bits move under
  // re-encode") holds when all hashed coefficients sit well above codec
  // noise, which natural photos' 1/f spectra provide and this synthesizes;
  // a flat gradient or single sine leaves most coefficients ~0 and their
  // bits are codec noise by construction.
  private def texturedPng(id: Int, w: Int = 64, h: Int = 64): Array[Byte] = {
    val rnd = new scala.util.Random(id * 1013904223L + 12345)
    val amp = Array.tabulate(9, 9)((u, v) =>
      (if (rnd.nextBoolean()) 1 else -1) * 60.0 / (1 + u + v))
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      var s = 0.0
      for (u <- 0 until 9; v <- 0 until 9 if u != 0 || v != 0)
        s += amp(u)(v) * math.cos((2 * x + 1) * u * math.Pi / (2.0 * w)) *
          math.cos((2 * y + 1) * v * math.Pi / (2.0 * h))
      val c = math.max(0, math.min(255, 128 + s.toInt))
      img.setRGB(x, y, (c << 16) | (c << 8) | c)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("perceptual hash: invariant to lossy re-encode, far apart for " +
       "different images; near-dup join finds re-encoded planted pairs") {
    val imgs = (0 until 30).map { i =>
      val png = texturedPng(i)
      (f"img_s$i%04d", png, Raster.reencodeJpeg(png, 0.9f))
    }
    imgs.foreach { case (id, png, jpg) =>
      val hp = Raster.perceptualHash(Raster.decode(png).get)
      val hj = Raster.perceptualHash(Raster.decode(jpg).get)
      val d = java.lang.Long.bitCount(hp ^ hj)
      assert(d <= 6, s"$id: re-encode moved pHash by $d bits")
    }
    // distinct frequency content => distinct hashes, far apart on average
    val hs = imgs.map(t => Raster.perceptualHash(Raster.decode(t._2).get))
    val dists = for (i <- hs.indices; j <- (i + 1) until hs.size)
      yield java.lang.Long.bitCount(hs(i) ^ hs(j))
    assert(dists.sum.toDouble / dists.size > 15.0,
      s"mean inter-image distance ${dists.sum.toDouble / dists.size}")
    // distributed near-dup join over (original ++ re-encoded) rows
    val both = imgs.map { case (id, png, _) =>
      Fixtures.imageRow(0, withBytes = false).copy(image_id = id, bytes = png)
    } ++ imgs.map { case (id, _, jpg) =>
      Fixtures.imageRow(0, withBytes = false).copy(image_id = id + "_jpg", bytes = jpg)
    }
    val pairs = Raster.imageNearDup(both.toDF(), maxHamming = 6).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    val found = imgs.count { case (id, _, _) => pairs.contains((id, id + "_jpg")) }
    assert(found >= 27, s"near-dup recall $found/30")
  }

  test("frame sampling: every k-th frame demuxed per partition, decodable, " +
       "bytes identical to the muxed source frames") {
    val vids = (0 until 5).map { v =>
      val frames = (0 until 12).map(i =>
        Fixtures.makePng(v * 100L + i, Fixtures.DefaultSeed, 16, 16))
      (f"vid_$v%04d", Raster.muxFrames(frames), frames)
    }
    val df = vids.map { case (id, blob, _) => (id, blob) }.toDF("video_id", "bytes")
    val out = Raster.sampleFrames(df, everyK = 3).collect()
    assert(out.length == 5 * 4)                       // 12 frames / every 3rd
    out.foreach { f =>
      assert(f.frame_idx % 3 == 0)
      assert(f.w == 16 && f.h == 16)                  // decoded dims real
      val src = vids.find(_._1 == f.video_id).get._3(f.frame_idx)
      assert(java.util.Arrays.equals(f.frame, src), s"${f.video_id}#${f.frame_idx}")
    }
    // k=1 returns the full frame stream
    assert(Raster.sampleFrames(df, everyK = 1).count() == 60)
  }

  test("stub features: deterministic, L2-normalized, fixed dim") {
    val f1 = Raster.extractFeatures(df.limit(60), 64).collect()
      .map(f => f.image_id -> f.feature).toMap
    val f2 = Raster.extractFeatures(df.limit(60), 64).collect()
    assert(f2.forall(f => f1(f.image_id).sameElements(f.feature)))
    f1.values.foreach { v =>
      assert(v.length == 64)
      val n = math.sqrt(v.map(x => x * x.toDouble).sum)
      assert(math.abs(n - 1.0) < 1e-4)
    }
  }
}
