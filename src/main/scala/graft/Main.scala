package graft

import graft.config.GraftConfig
import graft.engine.{ProgressListener, Runner, Source}
import graft.graph.{Graph, GraphNormalizer}
import graft.sources.ExampleSource
import org.apache.spark.sql.SparkSession

import java.nio.file.{Files, Paths}

/** CLI entry — the reference's `cloud2sql --config cfg.yaml` surface
  * (cloud2sql __main__.py:24-97): parse config, resolve sources, run the
  * engine, print the per-source report.
  *
  * Built-in source registry:
  *  - `example`: the deterministic fixture graph (reference test collector)
  *  - `graph_export`: JSON-lines node/edge export ingest (reference A3);
  *    config keys: `path`, plus the example kind model unless extended.
  */
object Main {
  def registry: Map[String, Source] = Map(
    "example" -> new Source {
      val name = "example"
      def collect(s: SparkSession): Graph = ExampleSource.collect(s)
    },
    "graph_export" -> new Source {
      val name = "graph_export"
      def collect(s: SparkSession): Graph =
        throw new IllegalArgumentException("graph_export requires a path (set via config)")
    })

  def main(args: Array[String]): Unit = {
    val configPath = args.toSeq match {
      case Seq("--config", p) => p
      case Seq(p)             => p
      case _ => sys.error("usage: graft.Main --config <config.yaml>")
    }
    val config = GraftConfig.parse(Files.readString(Paths.get(configPath)))

    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[32]"))
      .appName("graft")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // wire config-driven sources: graph_export picks its path from config;
    // its kind model arrives embedded in the export (no hardcoded schema)
    val wired = registry.map {
      case ("graph_export", _) => "graph_export" -> new Source {
        val name = "graph_export"
        def collect(s: SparkSession): Graph = {
          val path = config.sources("graph_export").getOrElse("path",
            throw new IllegalArgumentException("graph_export.path must be defined"))
          GraphNormalizer.fromJsonExport(s, path)
        }
      }
      case other => other
    }

    val stderrProgress: ProgressListener = new ProgressListener {
      def progress(source: String, message: String): Unit =
        System.err.println(s"[progress] $source: $message")
    }

    try {
      val report = Runner.run(spark, config, wired, stderrProgress)
      report.sources.foreach { s =>
        println(s"${s.name}: ${s.nodes} nodes, ${s.edges} edges")
      }
      println(s"total: ${report.totalNodes} nodes, ${report.totalEdges} edges")
    } finally spark.stop()
  }
}
