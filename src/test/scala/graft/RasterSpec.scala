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
