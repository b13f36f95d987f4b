package graft.config

import scala.collection.mutable

/** Config-driven dataflow (SURVEY.md §1.1, §2.A5): a YAML document with
  * `sources` and `destinations`; exactly one destination. Mirrors the
  * reference's validation surface (cloud2sql collect.py:74-151,
  * util.py:22-59) including error wording, and its normalization of
  * file/s3/gcs destinations into one batched file-output config.
  */
final case class FileDestination(
    format: String,          // "parquet" | "csv"
    path: String,
    batchSize: Int = 100000, // reference default (collect.py:103)
    bucket: Option[String] = None,   // s3/gcs upload target
    region: Option[String] = None)

final case class JdbcDestination(url: String, dialect: String, batchSize: Int = 5000)

sealed trait Destination
final case class ArrowDest(cfg: FileDestination) extends Destination
final case class DbDest(cfg: JdbcDestination) extends Destination

final case class GraftConfig(sources: Map[String, Map[String, String]], destination: Destination)

object GraftConfig {

  /** Dialect alias table kept verbatim from the reference (util.py:62-67). */
  val dialectAliases: Map[String, String] =
    Map("mysql" -> "mysql+pymysql", "mariadb" -> "mariadb+pymysql")

  private val fileFormats = Set("parquet", "csv")

  def parse(yaml: String): GraftConfig = fromTree(MiniYaml.parse(yaml))

  def fromTree(root: Map[String, Any]): GraftConfig = {
    require(root.contains("sources"), "Config invalid: no sources are defined")
    require(root.contains("destinations"), "Config invalid: no destinations are defined")

    val sources = root("sources").asInstanceOf[Map[String, Any]].map {
      case (k, v: Map[_, _]) => k -> v.asInstanceOf[Map[String, Any]].map { case (a, b) => a -> String.valueOf(b) }
      case (k, _)            => k -> Map.empty[String, String]
    }
    val dests = root("destinations").asInstanceOf[Map[String, Any]]
    require(dests.size == 1, "Exactly one destination must be configured")

    val (name, rawv) = dests.head
    val v = rawv match { case m: Map[_, _] => m.asInstanceOf[Map[String, Any]] case _ => Map.empty[String, Any] }
    def str(k: String): Option[String] = v.get(k).map(String.valueOf)
    def int(k: String, dflt: Int): Int = str(k).map(_.toInt).getOrElse(dflt)

    val dest: Destination = name match {
      case "file" =>
        val fmt = str("format").getOrElse("parquet")
        require(fileFormats(fmt), s"Unknown format: $fmt. Possible values: ${fileFormats.mkString(", ")}")
        ArrowDest(FileDestination(fmt, str("path").getOrElse(
          throw new IllegalArgumentException("Path must be defined")), int("batch_size", 100000)))
      case "s3" =>
        val region = str("region").getOrElse(
          throw new IllegalArgumentException("S3 region must be defined"))
        val uri = str("uri").getOrElse(throw new IllegalArgumentException("S3 uri must be defined"))
        val bucket = UriNormalizer.s3Bucket(uri).getOrElse(
          throw new IllegalArgumentException(s"Invalid S3 uri: $uri"))
        ArrowDest(FileDestination(str("format").getOrElse("parquet"),
          str("path").getOrElse("/tmp/graft-stage"), int("batch_size", 100000),
          Some(bucket), Some(region)))
      case "gcs" =>
        val uri = str("uri").getOrElse(throw new IllegalArgumentException("GCS uri must be defined"))
        val bucket = UriNormalizer.gcsBucket(uri).getOrElse(
          throw new IllegalArgumentException(s"Invalid GCS uri: $uri"))
        ArrowDest(FileDestination(str("format").getOrElse("parquet"),
          str("path").getOrElse("/tmp/graft-stage"), int("batch_size", 100000), Some(bucket)))
      case dialect =>
        val canonical = dialectAliases.getOrElse(dialect, dialect)
        val url = str("url").getOrElse {
          val host = str("host").getOrElse("localhost")
          val db = str("database").getOrElse("")
          s"jdbc:$dialect://$host${str("port").map(":" + _).getOrElse("")}/$db"
        }
        DbDest(JdbcDestination(url, canonical, int("batch_size", 5000)))
    }
    GraftConfig(sources, dest)
  }
}

/** The reference's bucket-name normalizers (collect.py:108-149), as total
  * functions returning None on non-matching input.
  */
object UriNormalizer {
  private val S3Plain  = "^s3://([^/]+).*$".r
  private val S3VHost  = "^https?://([^./]+)\\.s3[.-][^/]+.*$".r
  private val S3Path   = "^https?://s3[.-][^/]+/([^/]+).*$".r
  private val S3Arn    = "^arn:aws:s3:::([^/]+)$".r

  def s3Bucket(uri: String): Option[String] = uri match {
    case S3Plain(b) => Some(b)
    case S3VHost(b) => Some(b)
    case S3Path(b)  => Some(b)
    case S3Arn(b)   => Some(b)
    case _          => None
  }

  def gcsBucket(uri: String): Option[String] =
    if (uri.startsWith("gs://")) Some(uri.stripPrefix("gs://").takeWhile(_ != '/')).filter(_.nonEmpty)
    else None
}

/** Minimal YAML-subset parser: nested maps by 2-space indentation, scalar
  * leaves, `key:` / `key: value` lines, `#` comments. Covers the reference
  * config shape (config-template.yaml) without external dependencies —
  * the build is zero-egress and Spark's jars ship no YAML parser.
  */
object MiniYaml {
  def parse(text: String): Map[String, Any] = {
    val lines = text.linesIterator
      .map(l => l.takeWhile(_ != '#'))
      .filter(_.trim.nonEmpty)
      .toVector
    val (tree, rest) = parseBlock(lines, 0, 0)
    require(rest >= lines.size, s"Unparsed config at line $rest: ${lines(rest)}")
    tree
  }

  private def indentOf(l: String): Int = l.takeWhile(_ == ' ').length

  private def parseBlock(lines: Vector[String], from: Int, indent: Int): (Map[String, Any], Int) = {
    val out = mutable.LinkedHashMap.empty[String, Any]
    var i = from
    while (i < lines.size && indentOf(lines(i)) == indent) {
      val line = lines(i).trim
      val colon = line.indexOf(':')
      require(colon > 0, s"Invalid config line: $line")
      val key = line.substring(0, colon).trim
      val value = line.substring(colon + 1).trim
      if (value.nonEmpty) {
        out(key) = scalar(value)
        i += 1
      } else if (i + 1 < lines.size && indentOf(lines(i + 1)) > indent) {
        val (child, next) = parseBlock(lines, i + 1, indentOf(lines(i + 1)))
        out(key) = child
        i = next
      } else {
        out(key) = Map.empty[String, Any]
        i += 1
      }
    }
    (out.toMap, i)
  }

  private def scalar(v: String): Any = {
    val s = v.stripPrefix("\"").stripSuffix("\"").stripPrefix("'").stripSuffix("'")
    if (v == "{}") Map.empty[String, Any]
    else if (s != v) s
    else if (v == "true" || v == "false") v.toBoolean
    else v.toLongOption.getOrElse(v.toDoubleOption.getOrElse(v): Any)
  }
}
