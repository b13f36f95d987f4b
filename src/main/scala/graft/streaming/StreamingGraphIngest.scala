package graft.streaming

import graft.config.Destination
import graft.engine.{NoopProgress, ProgressListener}
import graft.graph.GraphNormalizer
import graft.model.KindModel
import graft.sink.SnapshotSink
import org.apache.spark.sql.{Dataset, Row, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

/** Continuous ETL: the reference's run-per-snapshot model made streaming.
  * A directory is watched for JSON-lines graph exports; each arriving file
  * is ONE complete inventory snapshot (how periodic collectors publish) and
  * flows through the exact batch pipeline — normalize to kind/link tables,
  * stage, atomic swap — so readers of the destination always see the latest
  * complete snapshot and never a partial one.
  *
  * `maxFilesPerTrigger=1` pins the snapshot boundary to the file boundary:
  * two exports arriving together still commit as two ordered snapshots.
  *
  * Recovery semantics: foreachBatch may replay a batch after a failure;
  * the pipeline is idempotent per batch — staging overwrites
  * `_staging/s<batchId>` and the swap promotes the same content again, so
  * a replayed batch converges to the identical snapshot.
  */
object StreamingGraphIngest {

  def run(
      spark: SparkSession,
      watchDir: String,
      dest: Destination,
      fallback: Option[KindModel] = None,
      progress: ProgressListener = NoopProgress,
      queryName: String = "graft-graph-ingest"): StreamingQuery =
    spark.readStream
      .schema(GraphNormalizer.exportSchema)
      .option("maxFilesPerTrigger", 1)
      .json(watchDir)
      .writeStream
      .queryName(queryName)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        if (!batch.isEmpty) {
          val g = GraphNormalizer.fromExportRecords(batch, fallback)
          val tables = GraphNormalizer.normalize(g)
          val runId = s"s$batchId"
          val staged = SnapshotSink.stage(tables, dest, runId)
          SnapshotSink.committer(dest, runId, staged).commit(batch.sparkSession)
          progress.progress("graph_export", s"snapshot $runId committed: ${staged.size} tables")
        }
      }
      .start()
}
