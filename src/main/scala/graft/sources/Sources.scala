package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Sources and sinks — the reference's I/O surface re-expressed:
  * headered CSV in (2019reinvent_green.py:19-23 reads
  * format="csv", withHeader), normalized parquet out with source
  * partitioning (2019reinvent_green.py:53 writes parquet; partition
  * columns make the downstream scans prunable, which the reference
  * approximates with per-source S3 prefixes).
  */
object Sources {

  /** Headered CSV with explicit schema (production path: schema is
    * declared, not inferred, so ingest does not pay a discovery pass
    * and type drift fails fast). */
  def readCsv(s: SparkSession, path: String, schema: StructType): DataFrame =
    s.read.option("header", "true").schema(schema).csv(path)

  /** Headered CSV with schema inference — the "crawler" convenience
    * path for discovery work (costs one extra pass over the data). */
  def readCsvInferred(s: SparkSession, path: String): DataFrame =
    s.read.option("header", "true").option("inferSchema", "true").csv(path)

  /** Partitioned parquet sink. Partition columns become directory
    * keys so downstream readers get partition pruning for free;
    * maxRecordsPerFile bounds file sizes at scale. */
  def writePartitioned(df: DataFrame, path: String,
                       partitionCols: Seq[String],
                       maxRecordsPerFile: Long = 5000000L): Unit =
    df.write
      .mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** Read back a partitioned dataset; filters on partition columns
    * prune directories before any file is opened. */
  def readPartitioned(s: SparkSession, path: String): DataFrame =
    s.read.parquet(path)

  /** JSON-Lines source with declared schema — the interchange format
    * document corpora actually ship in. Schema declared, not
    * inferred: corrupt lines land in the permissive-mode corrupt
    * record column instead of failing the scan or silently flipping
    * column types at 100 TB. */
  def readJsonl(s: SparkSession, path: String, schema: StructType): DataFrame =
    s.read.schema(schema).option("mode", "PERMISSIVE").json(path)

  /** JSON-Lines source with schema inference (discovery path; costs
    * an extra pass). */
  def readJsonlInferred(s: SparkSession, path: String): DataFrame =
    s.read.json(path)

  /** JSON-Lines sink, one JSON object per line, optionally
    * partitioned — the dataset-export face ([[graft.ops.TimeSeriesOps
    * .deeparExport]] produces the same shape row-wise). */
  def writeJsonl(df: DataFrame, path: String,
                 partitionCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .json(path)
  }

  /** ORC face of the partitioned sink/source pair — same pruning
    * contract as parquet, for stacks standardized on ORC. */
  def writeOrc(df: DataFrame, path: String,
               partitionCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .orc(path)
  }

  def readOrc(s: SparkSession, path: String): DataFrame = s.read.orc(path)

  /** Schema-evolved parquet read: a long-lived dataset accretes
    * columns over the years; mergeSchema reconciles every file's
    * footer into the union schema (old files surface the new columns
    * as null). Costs a footer pass over all files — use for
    * discovery/backfill reads, not the hot path (declare the target
    * schema there instead). */
  def readEvolved(s: SparkSession, path: String): DataFrame =
    s.read.option("mergeSchema", "true").parquet(path)

  /** Persist a discovered dataset in the session catalog — the
    * crawler→catalog step of the reference (a Glue crawler registers
    * inferred schemas as tables other tools then query by name). The
    * table is EXTERNAL (`LOCATION` points at the files in place, no
    * copy) and registration is idempotent; with a shared metastore the
    * same call makes the dataset queryable across sessions/teams. */
  def registerTable(s: SparkSession, name: String, path: String,
                    format: String = "parquet"): DataFrame = {
    s.sql(s"CREATE TABLE IF NOT EXISTS `$name` USING $format LOCATION '$path'")
    s.table(name)
  }

  /** Small-file compaction — the table-maintenance pass every
    * long-lived ingest needs: streaming/incremental writers
    * accumulate files far below the efficient scan size, and at
    * 100 TB the resulting open/seek overhead and scheduler pressure
    * (one task per tiny file) dominate scan cost. Sizes the output by
    * BYTES (summed from the file listing — only the listing touches
    * the driver, never data), targets `targetFileBytes` per output
    * file, and rewrites to `outPath` via one round-robin
    * repartition. Returns the output file count. Writing to a fresh
    * path (swap-on-success) rather than in place keeps the source
    * readable throughout — the overwrite-while-reading pattern
    * corrupts a dataset if the job dies mid-write. */
  def compact(s: SparkSession, inPath: String, outPath: String,
              targetFileBytes: Long = 128L * 1024 * 1024): Int = {
    require(targetFileBytes > 0, s"targetFileBytes must be > 0: $targetFileBytes")
    val path = new org.apache.hadoop.fs.Path(inPath)
    val fs = path.getFileSystem(s.sparkContext.hadoopConfiguration)
    // the fresh-path guarantee must be enforced, not just documented:
    // compacting a path onto itself — or into a path NESTED under the
    // tree being read (the recursive listing would sum the output's
    // own files on a re-run, and readers of inPath would see the rows
    // twice) — is the overwrite-while-reading corruption pattern
    val qIn = fs.makeQualified(path)
    val qOut = fs.makeQualified(new org.apache.hadoop.fs.Path(outPath))
    def isAncestor(anc: org.apache.hadoop.fs.Path,
                   p: org.apache.hadoop.fs.Path): Boolean = {
      var cur = p.getParent
      while (cur != null) { if (cur == anc) return true; cur = cur.getParent }
      false
    }
    require(qIn != qOut && !isAncestor(qIn, qOut) && !isAncestor(qOut, qIn),
      s"compact must write to a fresh path outside the input tree, " +
        s"got inPath=$qIn outPath=$qOut")
    val it = fs.listFiles(path, true)
    var bytes = 0L
    while (it.hasNext) {
      val f = it.next()
      val name = f.getPath.getName
      if (!name.startsWith("_") && !name.startsWith(".")) bytes += f.getLen
    }
    val nFiles = math.max(1L, (bytes + targetFileBytes - 1) / targetFileBytes)
      .min(Int.MaxValue).toInt
    s.read.parquet(inPath).repartition(nFiles)
      .write.mode("overwrite").parquet(outPath)
    nFiles
  }

  /** Sorted data layout — the read-side half of the 100 TB posture
    * that partitioning and bucketing don't cover: cluster the rows so
    * range/point predicates on the sort columns skip most of the data
    * WITHOUT any engine-side index.
    *
    * `repartitionByRange` makes files globally disjoint on the sort
    * key and `sortWithinPartitions` makes every parquet ROW GROUP's
    * min/max stats a tight, monotone interval — so the reader's
    * pushed predicate (parquet-mr row-group pruning against those
    * stats) skips whole row groups, and at cluster scale whole files.
    * On a random layout every row group spans the full value range
    * and min/max pruning can never reject anything; sorting is what
    * turns the stats parquet already writes into an effective skip
    * index. LayoutSpec measures exactly this: same data, same filter,
    * scanned-row counts orders of magnitude apart.
    *
    * `writerOptions` passes parquet knobs (e.g. `parquet.block.size`
    * to size row groups = the skipping granularity). */
  def writeSorted(df: DataFrame, path: String, sortCols: Seq[String],
                  numFiles: Int = 0,
                  writerOptions: Map[String, String] = Map.empty): Unit = {
    require(sortCols.nonEmpty, "writeSorted needs at least one sort column")
    val cols = sortCols.map(org.apache.spark.sql.functions.col)
    val ranged =
      if (numFiles > 0) df.repartitionByRange(numFiles, cols: _*)
      else df.repartitionByRange(cols: _*)
    ranged.sortWithinPartitions(cols: _*)
      .write.mode("overwrite").options(writerOptions).parquet(path)
  }

  /** Bucketed + sorted table: rows are hash-bucketed on the join key
    * at write time, so equi-joins and aggregations between tables
    * bucketed the same way need no shuffle at read time — the
    * pre-partitioning strategy for fact-fact joins at scale. */
  def writeBucketed(df: DataFrame, table: String, path: String,
                    bucketCol: String, numBuckets: Int = 8): Unit =
    df.write
      .mode("overwrite")
      .option("path", path)
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)
}
