package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

/** Incremental, idempotent ingestion — the reference's scheduled ETL
  * job with bookmarks (etl-cfn-2am-trigger.json: a 2am cron trigger;
  * `transformation_ctx` bookmarks in etl/2019reinvent_green.py:23 make
  * each run process only files that arrived since the last one),
  * re-expressed Spark-first as a checkpointed `Trigger.AvailableNow`
  * file stream: the checkpoint IS the bookmark.
  *
  * Each `ingestOnce` call drains exactly the files not yet recorded in
  * the checkpoint into a partitioned parquet sink and stops. Re-running
  * with no new input is a no-op; a crash between runs re-processes
  * nothing already committed (file-source + file-sink give end-to-end
  * exactly-once). At cluster scale the same call runs from any
  * scheduler tick — idempotence makes retries safe.
  */
object IncrementalIngest {

  /** Process all not-yet-ingested files under `sourceDir`, append them
    * to `sinkDir` partitioned by `partitionCols`, record progress in
    * `checkpointDir`, and return the number of micro-batches run. */
  def ingestOnce(s: SparkSession, sourceDir: String, schema: StructType,
                 sinkDir: String, checkpointDir: String,
                 partitionCols: Seq[String]): Long = {
    val q = s.readStream.schema(schema).parquet(sourceDir)
      .writeStream
      .format("parquet")
      .option("path", sinkDir)
      .option("checkpointLocation", checkpointDir)
      .partitionBy(partitionCols: _*)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q.lastProgress match {
      case null => 0L
      case p    => p.batchId + 1
    }
  }
}
