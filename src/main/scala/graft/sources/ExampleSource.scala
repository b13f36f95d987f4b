package graft.sources

import graft.graph.Graph
import graft.model.{Kind, KindModel, KindProperty}
import org.apache.spark.sql.SparkSession

/** The deterministic example graph — reproduces the reference's test
  * fixture shape exactly (resoto-plugin-example-collector, oracle at
  * tests/collect_test.py:26-40 [T]): 1 account, 2 regions, and per region
  * one instance / network / volume, one custom resource, 13 edges.
  */
object ExampleSource {

  private def base(extra: KindProperty*) = KindModel.baseProperties ++ extra

  val model: KindModel = KindModel(Seq(
    Kind("example_account", base()),
    Kind("example_region", base()),
    Kind("example_instance", base(KindProperty("instance_cores", "int64"),
                                  KindProperty("instance_memory", "int64"))),
    Kind("example_volume", base(KindProperty("volume_size", "int64"))),
    Kind("example_network", base(KindProperty("cidr", "string"))),
    Kind("example_custom_resource", base(KindProperty("custom", "string")))))

  private def doc(kind: String, id: String, name: String, extra: (String, Any)*): (String, String, String) = {
    val fields = Seq(
      "id" -> s""""$id"""", "name" -> s""""$name"""", "kind" -> s""""$kind"""",
      "tags" -> """{"owner":"example"}""",
      "ctime" -> """"2023-01-01T00:00:00Z"""") ++
      extra.map { case (k, v) =>
        k -> (v match { case s: String => s""""$s"""" case other => other.toString })
      }
    (id, kind, fields.map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}"))
  }

  def collect(spark: SparkSession): Graph = {
    import spark.implicits._
    val nodes = Seq(
      doc("example_account", "acc1", "Example Account"),
      doc("example_region", "reg1", "us-west"),
      doc("example_region", "reg2", "us-east"),
      doc("example_instance", "i1", "instance-1", "instance_cores" -> 4L, "instance_memory" -> 32L),
      doc("example_instance", "i2", "instance-2", "instance_cores" -> 8L, "instance_memory" -> 64L),
      doc("example_volume", "v1", "volume-1", "volume_size" -> 100L),
      doc("example_volume", "v2", "volume-2", "volume_size" -> 200L),
      doc("example_network", "n1", "network-1", "cidr" -> "10.0.0.0/16"),
      doc("example_network", "n2", "network-2", "cidr" -> "10.1.0.0/16"),
      doc("example_custom_resource", "c1", "custom-1", "custom" -> "yes"))
      .toDF("id", "kind", "reported")

    // 13 edges -> the 7 link tables/counts of the reference oracle [T]
    val edges = Seq(
      ("acc1", "reg1"), ("acc1", "reg2"),               // account -> region  (2)
      ("reg1", "i1"), ("reg2", "i2"),                   // region -> instance (2)
      ("reg1", "n1"), ("reg2", "n2"),                   // region -> network  (2)
      ("reg1", "v1"), ("reg2", "v2"),                   // region -> volume   (2)
      ("n1", "i1"), ("n2", "i2"),                       // network -> instance(2)
      ("i1", "v1"), ("i2", "v2"),                       // instance -> volume (2)
      ("reg1", "c1"))                                   // region -> custom   (1)
      .toDF("from_id", "to_id")

    Graph(nodes, edges, model)
  }

  /** The reference's exact table/count oracle [T: collect_test.py:26-40]. */
  val expectedCounts: Map[String, Long] = Map(
    "example_account" -> 1, "example_custom_resource" -> 1,
    "example_instance" -> 2, "example_network" -> 2,
    "example_region" -> 2, "example_volume" -> 2,
    "link_example_account_example_region" -> 2,
    "link_example_instance_example_volume" -> 2,
    "link_example_network_example_instance" -> 2,
    "link_example_region_example_custom_resource" -> 1,
    "link_example_region_example_instance" -> 2,
    "link_example_region_example_network" -> 2,
    "link_example_region_example_volume" -> 2)
}
