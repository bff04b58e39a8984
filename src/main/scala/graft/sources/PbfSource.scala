package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions.col

import graft.fixtures.Fixtures.{NodeRow, RelationRow, WayRow}

/**
 * Bounded PBF source + sink over Spark (SURVEY.md §2.1 S1/S5): the
 * reference's entire input surface is PBF (pbf-read.c:227-306), so a user
 * switching to this engine needs a way in from .pbf files without a
 * custom FileFormat.
 *
 * Read path: `spark.read.format("binaryFile")` delivers each file as one
 * row; a flatMap decodes blob frames (zlib inflate + hand-rolled protobuf,
 * PbfCodec) into typed rows. Granularity: one TASK PER FILE — PBF blob
 * framing is not splittable without an index pass, so parallelism comes
 * from file count (planet-scale ingest is fed as many files; the reference
 * itself is one sequential scan, pbf-read.c:239). Phase pruning: a scan
 * that wants only nodes stops reading at the first ways block
 * (PbfCodec.decodeFile, mirroring pbf-read.c:94-135).
 *
 * Write path: one valid .pbf part file per partition, kind-segregated and
 * named so lexicographic part order preserves the nodes -> ways ->
 * relations stream invariant across concatenation. Local-FS API here
 * (sandbox); a real deployment swaps in the Hadoop FileSystem API.
 */
object PbfSource {

  private def fileBytes(spark: SparkSession, path: String): Dataset[Array[Byte]] = {
    import spark.implicits._
    spark.read.format("binaryFile").load(path)
      .where(col("path").endsWith(".pbf"))
      .select("content").as[Array[Byte]]
  }

  /** Decode all three entity kinds as typed Datasets (three passes over the
    * files; each pass phase-prunes, so the nodes pass stops at the first
    * ways block and so on — column pruning at the source). */
  def readNodes(spark: SparkSession, path: String): Dataset[NodeRow] = {
    import spark.implicits._
    fileBytes(spark, path).flatMap(b =>
      PbfCodec.decodeFile(b, PbfCodec.Wanted(nodes = true, ways = false,
        relations = false)).nodes)
  }

  def readWays(spark: SparkSession, path: String): Dataset[WayRow] = {
    import spark.implicits._
    fileBytes(spark, path).flatMap(b =>
      PbfCodec.decodeFile(b, PbfCodec.Wanted(nodes = false, ways = true,
        relations = false)).ways)
  }

  def readRelations(spark: SparkSession, path: String): Dataset[RelationRow] = {
    import spark.implicits._
    fileBytes(spark, path).flatMap(b =>
      PbfCodec.decodeFile(b, PbfCodec.Wanted(nodes = false, ways = false,
        relations = true)).rels)
  }

  /** The planet-ingest entry: PBF files -> the three raw DataFrames that
    * feed PlanetExtract.ingest. */
  def readPlanet(spark: SparkSession, path: String)
      : (DataFrame, DataFrame, DataFrame) =
    (readNodes(spark, path).toDF(),
     readWays(spark, path).toDF(),
     readRelations(spark, path).toDF())

  /** S5 sink: write typed entity Datasets as PBF part files. Part names
    * carry a kind ordinal (0=nodes, 1=ways, 2=relations) so sorted
    * concatenation yields a stream honoring the PBF ordering invariant. */
  def writePlanet(nodes: Dataset[NodeRow], ways: Dataset[WayRow],
                  rels: Dataset[RelationRow], dir: String): Unit = {
    Files.createDirectories(Paths.get(dir))
    writeParts(nodes, dir, 0, "nodes") { (os, rows) =>
      PbfCodec.writePbfFile(os, rows, Seq.empty, Seq.empty) }
    writeParts(ways, dir, 1, "ways") { (os, rows) =>
      PbfCodec.writePbfFile(os, Seq.empty, rows, Seq.empty) }
    writeParts(rels, dir, 2, "relations") { (os, rows) =>
      PbfCodec.writePbfFile(os, Seq.empty, Seq.empty, rows) }
  }

  /** One part file per partition; the task buffers its partition (bounded
    * by the upstream partitioning — size partitions like any file sink). */
  private def writeParts[T](ds: Dataset[T], dir: String, ordinal: Int,
                            kind: String)(
      encode: (java.io.OutputStream, Seq[T]) => Unit): Unit = {
    import org.apache.spark.TaskContext
    ds.toDF().sparkSession.sparkContext.runJob(ds.rdd, (it: Iterator[T]) => {
      val rows = it.toSeq
      if (rows.nonEmpty) {
        val pid = TaskContext.getPartitionId()
        val f = Paths.get(dir, f"part-$ordinal-$kind-$pid%05d.pbf")
        val os = Files.newOutputStream(f)
        try encode(os, rows) finally os.close()
      }
    })
  }

  /** Single-file sink for bounded extracts (the reference's one-file-per-
    * extract shape, vex.c:861-880): driver-side write, caller guarantees
    * the extract is driver-small. */
  def writePbfFileLocal(path: String, nodes: Seq[NodeRow], ways: Seq[WayRow],
                        rels: Seq[RelationRow]): Unit = {
    val os = Files.newOutputStream(Paths.get(path))
    try PbfCodec.writePbfFile(os, nodes, ways, rels) finally os.close()
  }
}
