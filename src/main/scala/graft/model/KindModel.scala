package graft.model

import org.apache.spark.sql.types._

/** The resource kind system (SURVEY.md §1.2-§1.3): every node document is
  * typed by a *kind*; kinds declare typed properties and may inherit from
  * base kinds. Table schemas are generated at runtime from the model —
  * mirrors the reference's resotolib kind registry (cloud2sql
  * collect.py:37-45 [D]); the concrete type mapping follows SURVEY §1.2.
  *
  * Unlike the reference, nested structure survives internally: arrays,
  * dictionaries and complex kinds stay ArrayType/MapType/StructType and are
  * JSON-encoded ONLY at the JDBC sink boundary (strictly more capable, same
  * observable SQL output).
  */
final case class KindProperty(name: String, kind: String, required: Boolean = false)

final case class Kind(
    fqn: String,
    properties: Seq[KindProperty],
    bases: Seq[String] = Nil,
    aggregateRoot: Boolean = true)

final case class KindModel(kinds: Seq[Kind]) {
  private val byFqn: Map[String, Kind] = kinds.map(k => k.fqn -> k).toMap

  def apply(fqn: String): Kind = byFqn(fqn)
  def get(fqn: String): Option[Kind] = byFqn.get(fqn)

  /** All properties including inherited ones, base-first (derived kinds
    * override same-named base properties).
    */
  def allProperties(fqn: String): Seq[KindProperty] = {
    // the (path-local) seen set breaks base CYCLES — a user-config error
    // that would otherwise recurse forever; shared bases of a diamond
    // still re-walk (their properties dedup in the groupBy below)
    def walk(k: Kind, seen: Set[String]): Seq[KindProperty] =
      if (seen.contains(k.fqn)) Seq.empty
      else k.bases.flatMap(b =>
        byFqn.get(b).toSeq.flatMap(walk(_, seen + k.fqn))) ++ k.properties
    val props = walk(byFqn(fqn), Set.empty)
    props.groupBy(_.name).map(_._2.last).toSeq
      .sortBy(p => props.indexWhere(_.name == p.name))
  }

  /** Spark type for a model type name (SURVEY §1.2 mapping). */
  def sparkType(kindName: String): DataType = sparkType(kindName, Set.empty)

  private def sparkType(kindName: String, expanding: Set[String]): DataType = kindName match {
    case "string" | "any"          => StringType // `any` carries JSON text
    case "int32"                   => IntegerType
    case "int64"                   => LongType
    case "float"                   => FloatType
    case "double"                  => DoubleType
    case "boolean"                 => BooleanType
    case "datetime"                => TimestampType
    case "date"                    => DateType
    case "duration"                => LongType // seconds
    case a if a.endsWith("[]")     => ArrayType(sparkType(a.dropRight(2), expanding))
    case d if d.startsWith("dictionary[") =>
      val inner = d.stripPrefix("dictionary[").stripSuffix("]")
      val Array(k, v) = inner.split(",", 2).map(_.trim)
      MapType(sparkType(k, expanding), sparkType(v, expanding))
    case complex if byFqn.contains(complex) =>
      // cycle guard, parallel to allProperties' base-inheritance guard: a
      // self/mutually-referential complex property would otherwise recurse
      // to a raw StackOverflowError (Spark's StructType cannot express a
      // recursive schema anyway) — fail as the model-validation error it is
      require(!expanding.contains(complex),
        s"kind '$complex' is part of a property-type cycle " +
          s"(${(expanding + complex).mkString(" -> ")}); recursive " +
          "schemas cannot be expressed as a Spark StructType")
      toStructType(complex, expanding + complex)
    // enum kinds (names the model does not declare) persist as strings —
    // NOTE this also absorbs a typo'd scalar name ("int46") into a string
    // column without error; the reference behaves the same way (enum
    // members are open strings), so a stricter check would reject legal
    // models. Validate type names upstream if that trade is wrong for you.
    case enum_ => StringType
  }

  /** Runtime-generated table schema for a kind. */
  def toStructType(fqn: String): StructType = toStructType(fqn, Set(fqn))

  private def toStructType(fqn: String, expanding: Set[String]): StructType =
    StructType(allProperties(fqn).map(p =>
      StructField(p.name, sparkType(p.kind, expanding), nullable = !p.required)))
}

object KindModel {
  /** Properties shared by every resource (resource base [D, SURVEY §1.2]). */
  val baseProperties: Seq[KindProperty] = Seq(
    KindProperty("id", "string", required = true),
    KindProperty("name", "string"),
    KindProperty("kind", "string", required = true),
    KindProperty("tags", "dictionary[string, string]"),
    KindProperty("ctime", "datetime"))

  val resourceBase: Kind = Kind("resource_base", baseProperties, Nil)
}
