package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/**
 * Round-6 optimization measurement harness — SEPARATE from the frozen
 * graft.Bench (guide §1.4: isolate what you measure). Not part of any
 * driver contract; numbers quoted in OPTIMIZATION_r06.md cite this main.
 *
 * Usage:
 *   sbt "runMain graft.BenchExtra [gate ...] [--plans DIR] [--suffix S]
 *                                 [--reps N] [--noop]"
 *
 *  - no gate args = all SparkEntry gates.
 *  - times each gate REPS+1 times (1 cold + REPS warm) with the same
 *    session config and the same mirror-dir input as graft.Bench; prints
 *    cold + each warm + min to stderr and one JSON line to stdout.
 *  - --noop executes via a noop-format write (computes EVERY column)
 *    instead of Bench's .count() action, for plan-shape investigation.
 *  - --plans DIR additionally writes .explain("formatted") for each gate
 *    to DIR/<gate>_<suffix>.txt (suffix defaults to "before").
 */
object BenchExtra {

  private def session(cpus: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-benchextra-$cpus")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", s"${16 * 1024 * 1024}")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Same per-user mirror path scheme as graft.Bench; requires the mirror
    * to exist (run graft.Bench once first) — BenchExtra never rebuilds it,
    * so the two harnesses cannot disagree about the input bytes. */
  private def mirrorDir(sfDir: String): String = {
    val user = System.getProperty("user.name", "u").replaceAll("[^A-Za-z0-9]", "_")
    val dst = s"/tmp/graft_bench_mirror_${user}_" +
      sfDir.replaceAll("[^A-Za-z0-9.]", "_")
    require(Files.exists(Paths.get(dst, "_MIRROR_OK")),
      s"mirror $dst missing — run graft.Bench (or graft.Bench queries) once first")
    dst
  }

  /** The corpus >> batch evidence tier for the stored dedup index
    * (round-5 VERDICT item 1): the sf corpus slice is replicated `r`x
    * with disjoint remapped ids while the batch stays FIXED, so the
    * recompute path's per-batch corpus re-minhash grows r-fold while the
    * index probe's work does not — the crossover corpus size is the
    * index's measured value. Index build time is excluded (it amortizes
    * over every batch, exactly as in graft.Bench's pipeline tier); both
    * paths run with production defaults (hot-bucket caps ON). Timing
    * only — this main is not an oracle surface. */
  private def dedupTier(spark: SparkSession, dir: String,
                        reps: Seq[Int]): Unit = {
    import org.apache.spark.sql.functions._
    import graft.operators.Dedup
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    // same split as graft.Bench pipelineComposites; ids remapped so every
    // replica is disjoint from every other AND from the batch
    val corpus0 = docs.where(pmod(col("doc_id"), lit(10)) =!= 0)
    val batch = docs.where(pmod(col("doc_id"), lit(10)) === 0)
      .select((col("doc_id") * lit(1000L)).as("doc_id"), col("text"))
    val nBatch = batch.count().toDouble
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val rows = reps.map { r =>
      val corpus = corpus0
        .crossJoin(spark.range(r).select(col("id").as("_rep")))
        .select((col("doc_id") * lit(1000L) + col("_rep") + 1L).as("doc_id"),
          col("text"))
      val nCorpus = corpus0.count() * r
      val idxDir = s"/tmp/graft_benchextra_dedup_tier_r$r"
      val buildSec = time { Dedup.writeDedupIndex(corpus, idxDir) }
      def probe(): Unit =
        { Dedup.dedupBatchAgainstIndex(batch, idxDir).count(); () }
      def recompute(): Unit =
        { Dedup.dedupBatchAgainstCorpus(corpus, batch).count(); () }
      probe(); recompute()                        // warm (codegen + cache)
      val idxSec = Seq(time(probe()), time(probe())).min
      val recSec = Seq(time(recompute()), time(recompute())).min
      System.err.println(f"[benchextra] dedup-tier r=$r%-4d corpus=$nCorpus%8d " +
        f"build $buildSec%6.1f s  probe $idxSec%6.2f s (${nBatch / idxSec}%6.0f docs/s)  " +
        f"recompute $recSec%6.2f s (${nBatch / recSec}%6.0f docs/s)")
      (r, nCorpus, buildSec, idxSec, recSec)
    }
    val js = rows.map { case (r, n, b, i, rc) =>
      f"""{"replication":$r,"corpus_docs":$n,"build_sec":$b%.2f,""" +
        f""""index_probe_sec":$i%.3f,"recompute_sec":$rc%.3f,""" +
        f""""index_docs_per_sec":${nBatch / i}%.0f,""" +
        f""""recompute_docs_per_sec":${nBatch / rc}%.0f}"""
    }.mkString("[", ",", "]")
    println(s"""{"metric":"dedup_tier","batch_docs":${nBatch.toLong},"tiers":$js}""")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt

    var plansDir: Option[String] = None
    var suffix = "before"
    var reps = 2
    var noop = false
    val gates = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "--plans" => plansDir = Some(args(i + 1)); i += 2
        case "--suffix" => suffix = args(i + 1); i += 2
        case "--reps" => reps = args(i + 1).toInt; i += 2
        case "--noop" => noop = true; i += 1
        case g => gates += g; i += 1
      }
    }
    if (gates.headOption.contains("dedup-tier")) {
      val spark = session(cpus)
      try dedupTier(spark, mirrorDir(sfDir),
        gates.drop(1).map(_.toInt).toSeq match {
          case Nil => Seq(1, 10, 100); case rs => rs
        })
      finally spark.stop()
      return
    }
    val names =
      if (gates.isEmpty) SparkEntry.queries.keys.toSeq.sorted
      else gates.toSeq
    val unknown = names.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown gates: ${unknown.mkString(", ")}")

    val spark = session(cpus)
    val dir = mirrorDir(sfDir)
    // session warmup identical in spirit to Bench: JIT + codegen + parquet
    try {
      spark.range(1000000).selectExpr("sum(id)").collect()
      spark.read.parquet(s"$dir/region.parquet").count()
    } catch { case _: Throwable => }

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    val results = names.map { name =>
      val fn = SparkEntry.queries(name)
      spark.sparkContext.setJobDescription(s"benchextra:$name")
      def once(): Double = time {
        val df = fn(spark, dir)
        if (noop) df.write.format("noop").mode("overwrite").save()
        else df.count()
      }
      val cold = once()
      val warms = (0 until reps).map(_ => once())
      val best = (cold +: warms).min
      System.err.println(f"[benchextra] $name%-26s cold $cold%8.3f s  warm " +
        warms.map(w => f"$w%.3f").mkString("/") + f"  min $best%8.3f s")
      plansDir.foreach { pd =>
        new java.io.File(pd).mkdirs()
        val txt = fn(spark, dir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.write(Paths.get(pd, s"${name}_$suffix.txt"), txt.getBytes("UTF-8"))
      }
      spark.sparkContext.setJobDescription(null)
      name -> best
    }
    spark.stop()
    val js = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    println(s"""{"metric":"benchextra","unit":"sec","action":"${
      if (noop) "noop" else "count"}","queries":$js}""")
  }
}
