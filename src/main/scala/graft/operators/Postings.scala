package graft.operators

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Stored inverted (postings) index over a document corpus — the
 * retrieval-side sibling of the stored dedup / IVF index patterns: build
 * once, then answer keyword queries by reading ONLY the query terms'
 * partitions, never scanning the corpus text again.
 *
 * Layout: postings rows (word, doc_id, tf) Hive-partitioned on
 * `w_b` = hash bucket of the word, with a `_postings_meta.json` parameter
 * sidecar (bucket count) so probes derive buckets from the SAME modulus
 * the writer used — parameter divergence is impossible (the
 * writeDedupIndex convention). A probe computes its terms' buckets, and
 * the scan carries `w_b IN (...)` as PartitionFilters (PLANS.md section)
 * — at 100 TB a 3-word query reads 3 of `buckets` directories.
 *
 * Tokenization is the corpus-wide `wsWords` parity recipe, so query
 * semantics match the dedup/decontaminate tiers and the DuckDB oracle
 * reproduces results verbatim.
 */
object Postings {

  private def metaPath(path: String) = new Path(path, "_postings_meta.json")

  /** The index's fixed row shape (doc_id is a long, the repo-wide id
    * convention): pinning it on the read side makes probing a
    * legitimately EMPTY index (all-empty first batch: no data files yet)
    * return zero rows instead of failing schema inference. */
  private val PostingsSchema = "word STRING, doc_id BIGINT, tf BIGINT, w_b INT"

  /** The one postings-build pipeline (build and append MUST band into the
    * same layout): explode + map-side combined (word, doc_id) aggregate;
    * `tf` is the term's in-document occurrence count, so downstream
    * ranking (tf sums, df joins) never touches raw text. */
  private def postingsFrame(docs: DataFrame, buckets: Int,
                            textCol: String): DataFrame =
    docs.select(col("doc_id").cast("long").as("doc_id"),
        explode(Dedup.wsWords(col(textCol))).as("word"))
      .groupBy("word", "doc_id").agg(count(lit(1)).as("tf"))
      .withColumn("w_b", pmod(xxhash64(col("word")), lit(buckets.toLong)).cast("int"))
      .repartition(col("w_b"))

  /** Build (overwrite) the postings index. The writer pins STATIC
    * partition-overwrite mode: under a session-wide dynamic mode a
    * rebuild over a shrunk corpus would only truncate the buckets the new
    * postings touch, resurrecting deleted documents from the rest. */
  def writePostingsIndex(docs: DataFrame, path: String, buckets: Int = 64,
                         textCol: String = "text"): Unit = {
    require(buckets >= 1, "buckets must be >= 1")
    postingsFrame(docs, buckets, textCol)
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "static")
      .partitionBy("w_b").parquet(path)
    IndexMeta.write(docs.sparkSession, metaPath(path), Seq("buckets" -> buckets))
  }

  /** Online growth: append the postings of NEW documents (doc_ids not in
    * the index — the caller's contract, same as the dedup-index online
    * loop where a batch is deduped before it is admitted). Appending an
    * already-indexed doc_id would double its tf counts, so it is the one
    * misuse this cannot detect without a full scan; batches land in the
    * same bucket layout read from the meta sidecar. Append == rebuild
    * over the union corpus (spec-proven). */
  def appendToPostingsIndex(docs: DataFrame, path: String,
                            textCol: String = "text"): Unit =
    postingsFrame(docs, readMetaBuckets(docs.sparkSession, path), textCol)
      .write.mode("append").partitionBy("w_b").parquet(path)

  /** True iff `path` holds a [[writePostingsIndex]] store (the parameter
    * sidecar is present) — the bootstrap test for online loops. */
  def hasPostingsIndex(spark: SparkSession, path: String): Boolean =
    IndexMeta.exists(spark, metaPath(path))

  private def readMetaBuckets(spark: SparkSession, path: String): Int =
    IndexMeta.read(spark, metaPath(path), "postings meta",
      "writePostingsIndex", Seq("buckets")).head

  /** Maintenance: rewrite the index in place, collapsing the small files
    * accumulated by [[appendToPostingsIndex]] batches — hash-partitioning
    * on `w_b` puts each bucket in one task, so each bucket directory
    * lands as ONE file, word-sorted for row-group min/max skipping. Row
    * set, bucket layout, and meta are unchanged (query results identical,
    * spec-proven). The current rows are eagerly materialized off the
    * store (persistedCopy) BEFORE the overwrite: a lazy self-overwrite
    * lineage would read files the write is deleting; the block handle is
    * released deterministically. */
  def compactPostingsIndex(spark: SparkSession, path: String): Unit = {
    // refuses non-index dirs AND supplies the meta the root-overwrite is
    // about to delete — it is re-written after the data lands
    val buckets = readMetaBuckets(spark, path)
    val cur = spark.read.schema(PostingsSchema).parquet(path)
    val (frozen, handle) = org.apache.spark.sql.classic.GraftBridge
      .persistedCopy(cur)
    try {
      frozen
        .dropDuplicates("word", "doc_id")  // physical replay repair
        .repartition(col("w_b"))
        .sortWithinPartitions("w_b", "word", "doc_id")
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "static")
        .partitionBy("w_b").parquet(path)
      IndexMeta.write(spark, metaPath(path), Seq("buckets" -> buckets))
    } finally { handle.unpersist(true); () }
  }

  /** The pruned postings scan for `terms`: buckets derive from the meta
    * sidecar via the same xxhash64 modulus the writer used (computed by a
    * tiny Spark job — the diffSync probe convention), and land as literal
    * PartitionFilters. Appends are at-least-once (a replayed streaming
    * batch re-appends byte-identical rows), so the probe drops duplicate
    * (word, doc_id) postings — probes are exactly-once regardless;
    * [[compactPostingsIndex]] repairs the duplication physically.
    * Exposed for plan evidence. */
  private[graft] def termPostings(spark: SparkSession, path: String,
                                  terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty, "at least one query term")
    val buckets = readMetaBuckets(spark, path)
    import spark.implicits._
    val bs = terms.toDF("word")
      .select(pmod(xxhash64(col("word")), lit(buckets.toLong)).cast("int").as("b"))
      .distinct().collect().map(_.getInt(0)).toSeq
    spark.read.schema(PostingsSchema).parquet(path)
      .where(col("w_b").isin(bs: _*) && col("word").isin(terms: _*))
      .dropDuplicates("word", "doc_id")
  }

  /** Conjunctive (AND) keyword search: documents containing EVERY term,
    * with the summed term frequency as a rank basis. Cost: a pruned read
    * of |distinct term buckets| directories + one doc_id aggregate over
    * the matching postings only. */
  def searchAll(spark: SparkSession, path: String, terms: Seq[String]): DataFrame = {
    val distinctTerms = terms.distinct
    termPostings(spark, path, distinctTerms)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("_hits"), sum("tf").as("tf_total"))
      .where(col("_hits") === distinctTerms.size)
      .select(col("doc_id"), col("tf_total"))
  }

  /** Document frequency of each term (postings-only read, same pruning):
    * the df side of tf-idf ranking. Terms absent from the corpus get 0. */
  def docFrequencies(spark: SparkSession, path: String,
                     terms: Seq[String]): DataFrame = {
    import spark.implicits._
    val t = terms.distinct.toDF("word")
    t.join(termPostings(spark, path, terms.distinct)
        .groupBy("word").agg(count(lit(1)).as("df")), Seq("word"), "left")
      .select(col("word"), coalesce(col("df"), lit(0L)).as("df"))
  }
}
