package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/**
 * JSONL (newline-delimited JSON) interchange for document corpora — the
 * de-facto exchange format of training-data pipelines. Thin, deliberately:
 * Spark's native json source is already splittable (per-line records),
 * predicate-pushing on the parsed columns, and codegen-friendly; the
 * value added here is the CONTRACT:
 *
 *  - writes are schema-stable (column order pinned by the caller's frame,
 *    one JSON object per line, gzip optional via `codec`);
 *  - reads REQUIRE an explicit schema (inference is a full extra pass at
 *    100 TB and can silently widen types between deliveries) and run in
 *    FAILFAST mode — a malformed line fails the job instead of becoming a
 *    silent NULL row (PERMISSIVE's default), which is the honest behavior
 *    for a correctness-gated corpus.
 *
 * Round-trip identity is oracle-gated (q_jsonl_roundtrip): parquet ->
 * jsonl -> read == the original rows.
 */
object JsonlTable {

  /** One JSON object per line; `parts` bounds output file count (0 keeps
    * the input partitioning). */
  def write(df: DataFrame, path: String, parts: Int = 0,
            codec: Option[String] = None): Unit = {
    val out = if (parts > 0) df.repartition(parts) else df
    val w = out.write.mode("overwrite")
    codec.fold(w)(c => w.option("compression", c)).json(path)
  }

  /** Schema-required FAILFAST read (see class doc). */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).option("mode", "FAILFAST").json(path)
}
