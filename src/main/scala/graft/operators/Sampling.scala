package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Deterministic sampling for training-data pipelines. Membership is a pure
 * function of the row id (hash-threshold), NOT an RNG draw:
 *  - re-running a resumed pipeline yields the SAME sample (idempotent
 *    retries, reproducible experiments);
 *  - growing the table never reshuffles previous membership (each row's
 *    fate is independent of the others);
 *  - the md5 basis makes the sample itself oracle-checkable cross-engine
 *    (the driver gate recomputes membership in DuckDB).
 * All pure column expressions — the filter pushes to the scan.
 */
object Sampling {

  private val Buckets = 10000L

  /** Hash bucket in [0, 10000) from the row id (+ salt): the first 15 hex
    * digits of md5 parsed as an integer (exact in both engines), mod 1e4. */
  def hashBucket(id: Column, salt: String = ""): Column =
    pmod(conv(substring(md5(concat(id.cast("string"), lit(salt))), 1, 15),
      16, 10).cast("long"), lit(Buckets))

  /** Keep each row iff its hash bucket < rate * 10000 (rate resolution
    * 1e-4). `salt` decorrelates independent samples of the same table. */
  def hashSample(df: DataFrame, idCol: String, rate: Double,
                 salt: String = ""): DataFrame = {
    require(rate >= 0.0 && rate <= 1.0)
    df.where(hashBucket(col(idCol), salt) < math.round(rate * Buckets))
  }

  /** FAST-path twin of [[hashSample]]: xxhash64 membership (codegen, no
    * string md5 per row) — same determinism/growth-insensitivity contract,
    * not oracle-checkable cross-engine (DuckDB lacks xxhash64; the md5
    * variant is the gated one, same duality as minhash/simhash). */
  def hashSampleFast(df: DataFrame, idCol: String, rate: Double,
                     seed: Long = 0L): DataFrame = {
    require(rate >= 0.0 && rate <= 1.0)
    df.where(pmod(xxhash64(col(idCol), lit(seed)), lit(Buckets)) <
      math.round(rate * Buckets))
  }

  /** Deterministic fractional UPSAMPLING — the over-1x half of data
    * mixing: `weightBp` is the per-row multiplicity in bucket units
    * (10000 = 1.0x). Each row yields floor(weightBp/10000) copies plus
    * one more iff its hash bucket < weightBp mod 10000, so a stratum's
    * expected multiplicity is exactly weightBp/10000 while every row's
    * fate stays a pure hash function (idempotent retries, oracle-checkable
    * membership — the same contract as [[hashSample]]). Weight 0 drops
    * the row. Emits a 1-based `copy_n` so copies stay distinguishable
    * downstream. One scan, no shuffle; the explode is bounded by the
    * weight. */
  def upsample(df: DataFrame, idCol: String, weightBp: Column,
               salt: String = ""): DataFrame = {
    require(!df.columns.contains("copy_n"),
      "input must not already contain copy_n (the emitted copy index)")
    require(!df.columns.contains("_copies"),
      "input must not already contain _copies (internal scratch)")
    val base = ((weightBp - pmod(weightBp, lit(Buckets))) / lit(Buckets)).cast("long")
    val extra = when(hashBucket(col(idCol), salt) < pmod(weightBp, lit(Buckets)), 1L)
      .otherwise(0L)
    df.withColumn("_copies", base + extra)
      .where(col("_copies") > 0)
      .withColumn("copy_n", explode(sequence(lit(1L), col("_copies"))))
      .drop("_copies")
  }

  /** Stratified deterministic sampling — the data-mixing primitive: each
    * stratum keeps its own rate (e.g. {web -> 0.1, books -> 1.0}). Rows in
    * strata absent from `rates` are DROPPED (explicit mixing weights only;
    * pass 1.0 to keep a stratum whole). One scan, no shuffle: the
    * per-stratum threshold is a CASE expression over the stratum column. */
  def stratifiedSample(df: DataFrame, idCol: String, stratum: Column,
                       rates: Map[String, Double], salt: String = ""): DataFrame = {
    require(rates.values.forall(r => r >= 0.0 && r <= 1.0))
    val threshold = rates.foldLeft(lit(0L)) { case (acc, (k, r)) =>
      when(stratum === k, lit(math.round(r * Buckets))).otherwise(acc)
    }
    df.where(hashBucket(col(idCol), salt) < threshold)
  }
}
