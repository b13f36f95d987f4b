package graft.engine

import graft.config.{Destination, GraftConfig}
import graft.graph.{Graph, GraphNormalizer}
import graft.sink.SnapshotSink
import org.apache.spark.sql.SparkSession

import java.util.UUID
import java.util.concurrent.Executors
import scala.concurrent.duration.Duration
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.util.{Failure, Success, Try}

/** A pluggable source: produces a typed property graph (reference
  * BaseCollectorPlugin surface, collect.py:48-71 [R]).
  */
trait Source { def name: String; def collect(spark: SparkSession): Graph }

/** Per-source result, mirroring the reference's `(name, nodes, edges)`
  * return (collect.py:193-196).
  */
final case class SourceReport(name: String, nodes: Long, edges: Long)
final case class RunReport(sources: Seq[SourceReport]) {
  def totalNodes: Long = sources.map(_.nodes).sum
  def totalEdges: Long = sources.map(_.edges).sum
}

/** Progress feedback surface (K4) — the reference streams JSON progress
  * messages to a UI thread (collect.py:165-189); we expose the same
  * message points as a listener. Analytics events (K5) default to no-op:
  * this engine never phones home.
  */
trait ProgressListener extends Serializable {
  def progress(source: String, message: String): Unit
}
object NoopProgress extends ProgressListener { def progress(s: String, m: String): Unit = () }

/** The engine runner (SURVEY.md §3.1 Spark-native equivalent):
  * per-source pipelines run as parallel jobs on one SparkSession (the
  * reference's ThreadPoolExecutor(max_workers=4), collect.py:186);
  * all sinks stage first; ONE global barrier; then the atomic snapshot
  * swap (K2). Any failure → no swap, previous snapshot intact (K3).
  */
object Runner {
  val SourceParallelism = 4 // reference max_workers=4 (collect.py:186)

  def run(
      spark: SparkSession,
      config: GraftConfig,
      registry: Map[String, Source],
      progress: ProgressListener = NoopProgress,
      uploader: graft.sink.BucketUploader = graft.sink.HadoopBucketUploader): RunReport = {

    // source-enable filter (B3): only configured sources are instantiated
    val active = registry.filter { case (key, _) => config.sources.contains(key) }
    require(active.nonEmpty, "No source in the configuration is available")

    val runId = UUID.randomUUID().toString.take(8)
    val pool = Executors.newFixedThreadPool(SourceParallelism)
    // silent reporter: after a fail-fast return the pool is shut down and
    // straggler continuations are rejected by design — not an error to log
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool, _ => ())

    try {
      val futures = active.map { case (key, src) =>
        Future {
          progress.progress(key, "collect started")
          val graph = src.collect(spark)
          val tables = GraphNormalizer.normalize(graph)
          // stage all tables; promotion is deferred past the barrier
          val staged = SnapshotSink.stage(tables, config.destination, runId)
          val nodes = graph.nodes.count()
          val edges = graph.edges.count()
          progress.progress(key, s"collect done: $nodes nodes, $edges edges")
          (SourceReport(key, nodes, edges), staged)
        }
      }.toSeq

      // global barrier: reference as_completed drain (collect.py:193-196).
      // Future.sequence fails as soon as ANY source fails — the first error
      // surfaces immediately (true as-completed fail-fast) instead of after
      // every earlier-submitted source happens to finish; no swap happens.
      val results = Await.result(Future.sequence(futures), Duration.Inf)

      // atomic snapshot swap, once, after all sources succeeded (K2)
      progress.progress("engine", "swapping snapshot")
      SnapshotSink.committer(config.destination, runId,
        results.flatMap(_._2), uploader).commit(spark)
      RunReport(results.map(_._1))
    } finally pool.shutdown()
  }
}
