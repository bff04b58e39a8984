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
 * relations stream invariant across concatenation. Hadoop FileSystem API:
 * the sink works against HDFS/object-store paths the same as local ones.
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
    * feed PlanetExtract.ingest. NOTE: the binaryFile source materializes a
    * whole file per row and caps at 2 GB — for a planet-sized single .pbf
    * use [[readPlanetSplit]], which never loads more than one blob frame
    * (<= ~16 MB zlib, 32 MB inflated) at a time per task. */
  def readPlanet(spark: SparkSession, path: String)
      : (DataFrame, DataFrame, DataFrame) =
    (readNodes(spark, path).toDF(),
     readWays(spark, path).toDF(),
     readRelations(spark, path).toDF())

  // ---- splittable single-file read -------------------------------------------

  /** One frame of a PBF file: [start, start+len) covers the whole
    * [4B len][BlobHeader][Blob] unit, decodable in isolation. */
  final case class BlobFrame(start: Long, len: Int, blobType: String)

  /**
   * Index the blob frames of ONE .pbf file with a header-only scan: each
   * step reads the 4-byte length + BlobHeader and SEEKS past the payload,
   * so the driver touches O(#blobs * headerBytes), not the file body.
   * This is what makes a single planet.pbf SPLITTABLE: the frame list is
   * range-partitioned across tasks and each task re-opens the file and
   * decodes only its frames — the blob is the natural split unit (each
   * PrimitiveBlock is independently parsable by design, osmformat.proto).
   */
  /** Driver header-scan counter (test observability: readPlanetSplit must
    * index the file exactly once for all three kinds). */
  private[graft] val indexPasses = new java.util.concurrent.atomic.AtomicLong(0)

  def indexBlobs(spark: SparkSession, file: String): Seq[BlobFrame] = {
    indexPasses.incrementAndGet()
    val p = new org.apache.hadoop.fs.Path(file)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val size = fs.getFileStatus(p).getLen
    val in = fs.open(p)
    try {
      val frames = Seq.newBuilder[BlobFrame]
      var pos = 0L
      val lenBuf = new Array[Byte](4)
      while (pos + 4 <= size) {
        in.readFully(pos, lenBuf)
        val hLen = ((lenBuf(0) & 0xFF) << 24) | ((lenBuf(1) & 0xFF) << 16) |
                   ((lenBuf(2) & 0xFF) << 8) | (lenBuf(3) & 0xFF)
        val hBytes = new Array[Byte](hLen)
        in.readFully(pos + 4, hBytes)
        val h = new PbfCodec.PbIn(hBytes, 0, hLen)
        var tpe = ""; var dataSize = 0
        while (h.hasNext) {
          val t = h.readTag()
          (t >> 3, t & 7) match {
            case (1, 2) => tpe = new String(h.readBytes(), "UTF-8")
            case (3, 0) => dataSize = h.readVarint().toInt
            case (_, w) => h.skip(w)
          }
        }
        val total = 4 + hLen + dataSize
        frames += BlobFrame(pos, total, tpe)
        pos += total
      }
      frames.result()
    } finally in.close()
  }

  /**
   * Splittable decode of one PBF file: `parallelism` tasks each fetch and
   * decode a contiguous range of OSMData frames (phase-pruned per the
   * `want` projection). Parallelism within ONE file — the answer to "a
   * planet is one 60 GB .pbf", where the per-file binaryFile path would
   * serialize on a single task.
   */
  def decodeFileSplit(spark: SparkSession, file: String,
                      want: PbfCodec.Wanted,
                      parallelism: Int = 0,
                      preIndexed: Seq[BlobFrame] = null): Dataset[(Seq[NodeRow], Seq[WayRow], Seq[RelationRow])] = {
    import spark.implicits._
    val slices = if (parallelism > 0) parallelism
                 else spark.sparkContext.defaultParallelism
    val frames = (if (preIndexed != null) preIndexed
                  else indexBlobs(spark, file)).filter(_.blobType == "OSMData")
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    spark.createDataset(frames.map(f => (f.start, f.len)))
      .repartitionByRange(math.min(slices, math.max(1, frames.size)),
        org.apache.spark.sql.functions.col("_1"))   // contiguous ranges: sequential IO per task
      .mapPartitions { it =>
        val p = new org.apache.hadoop.fs.Path(file)
        val fs = p.getFileSystem(conf.value)
        val in = fs.open(p)
        // drain eagerly inside try/finally: the stream must close even
        // when a corrupt frame makes the read or decode throw
        val materialized =
          try it.map { case (start, len) =>
            val buf = new Array[Byte](len)
            in.readFully(start, buf)
            val (tpe, payload) = PbfCodec.frames(buf).next()
            require(tpe == "OSMData")
            val d = PbfCodec.decodePrimitiveBlock(payload, want)
            (d.nodes, d.ways, d.rels)
          }.toVector
          finally in.close()
        materialized.iterator
      }
  }

  /** Result of a splittable planet read: the three entity tables plus the
    * handle to the shared decoded cache backing them. Call [[unpersist]]
    * once the tables are consumed (or written out) — the derived
    * DataFrames cannot release the parent cache themselves. */
  final case class SplitPlanet(nodes: DataFrame, ways: DataFrame,
                               relations: DataFrame,
                               private val cache: Dataset[(Seq[NodeRow], Seq[WayRow], Seq[RelationRow])]) {
    def unpersist(): Unit = cache.unpersist()
  }

  /** Splittable planet read over one file: ONE driver index pass and ONE
    * decode pass shared by all three entity kinds. The decoded triple is
    * persisted (memory, spill to disk) so the three DataFrames' jobs read
    * the cached partitions instead of re-inflating the whole file per kind
    * — at planet scale the alternative is 3 full zlib passes. */
  def readPlanetSplit(spark: SparkSession, file: String, parallelism: Int = 0)
      : SplitPlanet = {
    import spark.implicits._
    val idx = indexBlobs(spark, file)   // the ONLY header-scan of the file
    val decoded = decodeFileSplit(spark, file,
        PbfCodec.Wanted(nodes = true, ways = true, relations = true),
        parallelism, preIndexed = idx)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    SplitPlanet(decoded.flatMap(_._1).toDF(),
                decoded.flatMap(_._2).toDF(),
                decoded.flatMap(_._3).toDF(), decoded)
  }

  /** S5 sink: write typed entity Datasets as PBF part files. Part names
    * carry a kind ordinal (0=nodes, 1=ways, 2=relations) so sorted
    * concatenation yields a stream honoring the PBF ordering invariant. */
  def writePlanet(nodes: Dataset[NodeRow], ways: Dataset[WayRow],
                  rels: Dataset[RelationRow], dir: String): Unit = {
    val dPath = new org.apache.hadoop.fs.Path(dir)
    dPath.getFileSystem(nodes.sparkSession.sparkContext.hadoopConfiguration)
      .mkdirs(dPath)
    writeParts(nodes, dir, 0, "nodes") { (os, rows) =>
      PbfCodec.writePbfStream(os, rows)(PbfCodec.encodeNodeBlock) }
    writeParts(ways, dir, 1, "ways") { (os, rows) =>
      PbfCodec.writePbfStream(os, rows)(PbfCodec.encodeWayBlock) }
    writeParts(rels, dir, 2, "relations") { (os, rows) =>
      PbfCodec.writePbfStream(os, rows)(PbfCodec.encodeRelationBlock) }
  }

  /** One part file per partition, STREAMED from the partition iterator in
    * 8k-entity blocks (PbfCodec.writePbfStream) — task memory is bounded
    * by one block, never the partition (the reference's own sink streams
    * the same block size, pbf-write.c:103). Hadoop FS create from the
    * TASK: executors write directly to the target filesystem, no driver
    * funnel. */
  private def writeParts[T](ds: Dataset[T], dir: String, ordinal: Int,
                            kind: String)(
      encode: (java.io.OutputStream, Iterator[T]) => Unit): Unit = {
    import org.apache.spark.TaskContext
    val conf = new org.apache.spark.util.SerializableConfiguration(
      ds.sparkSession.sparkContext.hadoopConfiguration)
    ds.toDF().sparkSession.sparkContext.runJob(ds.rdd, (it: Iterator[T]) => {
      if (it.hasNext) {
        val pid = TaskContext.getPartitionId()
        val f = new org.apache.hadoop.fs.Path(dir, f"part-$ordinal-$kind-$pid%05d.pbf")
        // a PRIVATE FileSystem instance: setWriteChecksum on the JVM-cached
        // shared instance would silently disable checksums for every other
        // writer in this executor for the rest of its life
        val fs = org.apache.hadoop.fs.FileSystem.newInstance(f.toUri, conf.value)
        try {
          fs.setWriteChecksum(false)   // no .crc sidecars next to .pbf parts
          val os = fs.create(f, true)
          try encode(os, it) finally os.close()
        } finally fs.close()
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
