package graft.graph

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.collection.mutable
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Label metadata — one vertex/edge class. Labels form an inheritance
  * DAG (multiple parents), mirroring ag_label + PG table inheritance
  * (reference: src/include/catalog/ag_label.h:29-47,
  * src/backend/commands/graphcmds.c:352-414).
  */
final case class LabelMeta(
    name: String,
    labid: Int,
    kind: Char, // 'v' | 'e'
    parents: Seq[String])

/** A graph = a namespace of label tables backed by Parquet under
  * `<root>/<graph>/<label>/`, with JSON metadata at
  * `<root>/<graph>/_graph.json` (mirrors ag_graph: a graph is a schema;
  * reference src/include/catalog/ag_graph.h:28-43).
  *
  * Scale notes: label tables are ordinary parquet directories — at
  * cluster scale they'd live on object storage and all scans go through
  * Spark's parquet source (column pruning, predicate pushdown, stats).
  * The catalog itself is tiny driver-side state.
  */
final class GraphCatalog(val spark: SparkSession, val root: String) {

  // ------------------------------------------------------------- schemas

  val vertexSchema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("properties", StringType, nullable = true)))

  val edgeSchema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("start", LongType, nullable = false),
    StructField("end", LongType, nullable = false),
    StructField("properties", StringType, nullable = true)))

  // ------------------------------------------------------ graph DDL

  private def graphDir(g: String): Path = Paths.get(root, g)
  private def metaPath(g: String): Path = graphDir(g).resolve("_graph.json")
  private def labelDir(g: String, l: String): Path = graphDir(g).resolve(l)

  /** CREATE GRAPH (graphcmds.c CreateGraphCommand). */
  def createGraph(name: String, ifNotExists: Boolean = false): Unit = {
    if (Files.exists(graphDir(name))) {
      if (ifNotExists) return
      throw new IllegalStateException(s"graph \"$name\" already exists")
    }
    Files.createDirectories(graphDir(name))
    writeMeta(name, GraphMeta(mutable.LinkedHashMap.empty, 1, 0))
  }

  /** DROP GRAPH (RemoveGraphById). */
  def dropGraph(name: String, ifExists: Boolean = false): Unit = {
    if (!Files.exists(graphDir(name))) {
      if (ifExists) return
      throw new IllegalStateException(s"graph \"$name\" does not exist")
    }
    def rm(p: Path): Unit = {
      if (Files.isDirectory(p))
        Files.list(p).forEach(rm(_))
      Files.deleteIfExists(p)
    }
    rm(graphDir(name))
  }

  def graphExists(name: String): Boolean = Files.exists(metaPath(name))

  // ------------------------------------------------------ label DDL

  /** CREATE VLABEL / ELABEL [INHERITS (...)] (graphcmds.c DefineLabel). */
  def createLabel(graph: String, name: String, kind: Char,
      parents: Seq[String] = Nil, ifNotExists: Boolean = false): Unit = {
    val m = readMeta(graph)
    if (m.labels.contains(name)) {
      if (ifNotExists) return
      throw new IllegalStateException(s"label \"$name\" already exists")
    }
    // implicit base labels ag_vertex/ag_edge are represented by Nil parents
    parents.foreach { p =>
      val pm = m.labels.getOrElse(p,
        throw new IllegalStateException(s"parent label \"$p\" does not exist"))
      require(pm.kind == kind, s"parent label \"$p\" has different kind")
    }
    m.labels(name) = LabelMeta(name, m.nextLabid, kind, parents)
    writeMeta(graph, m.copy(nextLabid = m.nextLabid + 1))
    Files.createDirectories(labelDir(graph, name))
  }

  def dropLabel(graph: String, name: String): Unit = {
    val m = readMeta(graph)
    require(m.labels.contains(name), s"label \"$name\" does not exist")
    require(!m.labels.values.exists(_.parents.contains(name)),
      s"label \"$name\" has children")
    m.labels.remove(name)
    writeMeta(graph, m)
    def rm(p: Path): Unit = {
      if (Files.isDirectory(p)) Files.list(p).forEach(rm(_))
      Files.deleteIfExists(p)
    }
    rm(labelDir(graph, name))
  }

  def label(graph: String, name: String): Option[LabelMeta] =
    readMeta(graph).labels.get(name)

  def labels(graph: String): Seq[LabelMeta] = readMeta(graph).labels.values.toSeq

  /** labid -> label name map (for label()/type() functions). */
  def labidNames(graph: String): Map[Int, String] =
    readMeta(graph).labels.values.map(l => l.labid -> l.name).toMap

  /** Transitive descendants (inheritance subtree), self included —
    * scanning a label scans its subtree (PG inheritance expansion).
    */
  def subtree(graph: String, name: String): Seq[LabelMeta] = {
    val m = readMeta(graph)
    val out = mutable.LinkedHashSet[String]()
    def rec(n: String): Unit = if (out.add(n))
      m.labels.values.filter(_.parents.contains(n)).foreach(l => rec(l.name))
    rec(name)
    out.toSeq.flatMap(m.labels.get)
  }

  /** Ancestor closure, self included, DAG-deduped — labels() semantics
    * (graph.c vertex_labels over inheritance diamonds).
    */
  def ancestors(graph: String, name: String): Seq[String] = {
    val m = readMeta(graph)
    val out = mutable.LinkedHashSet[String]()
    def rec(n: String): Unit = if (out.add(n))
      m.labels.get(n).toSeq.flatMap(_.parents).foreach(rec)
    rec(name)
    out.toSeq
  }

  // ------------------------------------------------------- id sequences

  /** Reserve a contiguous locid range for a label (driver-owned
    * sequence; tasks then assign ids per-partition within the range —
    * the distributed-safe analog of the per-label PG sequence).
    */
  def reserveIds(graph: String, label: String, n: Long): Long = synchronized {
    val m = readMeta(graph)
    val cur = m.sequences.getOrElse(label, 1L)
    require(cur + n <= GraphId.LocidMax, "locid budget exhausted")
    m.sequences(label) = cur + n
    writeMeta(graph, m)
    cur
  }

  // ------------------------------------------------------------- scans

  /** Scan one label table (no inheritance expansion). */
  def scanOnly(graph: String, name: String): DataFrame = {
    val lm = readMeta(graph).labels.getOrElse(name,
      throw new IllegalStateException(s"label \"$name\" does not exist"))
    val dir = labelDir(graph, name)
    val schema = if (lm.kind == 'v') vertexSchema else edgeSchema
    if (hasParquet(dir)) spark.read.schema(schema).parquet(dir.toString)
    else spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
  }

  /** Scan a label and its inheritance subtree (default MATCH scan);
    * plan-time union == PG's Append over inheritance children. Empty
    * labels are pruned at plan time (metadata partition-pruning analog).
    */
  def scan(graph: String, name: String): DataFrame =
    subtree(graph, name).map(l => scanOnly(graph, l.name))
      .reduce(_ unionAll _)

  /** Scan every label of a kind ('v' for bare (n), 'e' for [r]). */
  def scanAll(graph: String, kind: Char): DataFrame = {
    val ls = readMeta(graph).labels.values.filter(_.kind == kind).toSeq
    val schema = if (kind == 'v') vertexSchema else edgeSchema
    if (ls.isEmpty) spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
    else ls.map(l => scanOnly(graph, l.name)).reduce(_ unionAll _)
  }

  private def hasParquet(dir: Path): Boolean =
    Files.exists(dir) && Files.list(dir).anyMatch(p =>
      p.getFileName.toString.endsWith(".parquet"))

  // ------------------------------------------------------------- writes

  /** Append rows to a label table. */
  def append(graph: String, label: String, df: DataFrame): Unit =
    df.write.mode("append").parquet(labelDir(graph, label).toString)

  /** Replace a label table's contents (copy-on-write rewrite: write to
    * a staging dir, then swap — keeps the statement-level snapshot
    * semantics of the reference's MVCC heap).
    */
  def overwrite(graph: String, label: String, df: DataFrame): Unit = {
    val dir = labelDir(graph, label)
    val staging = graphDir(graph).resolve(s"_staging_$label")
    df.write.mode("overwrite").parquet(staging.toString)
    def rm(p: Path): Unit = {
      if (Files.isDirectory(p)) Files.list(p).forEach(rm(_))
      Files.deleteIfExists(p)
    }
    rm(dir)
    Files.move(staging, dir, StandardCopyOption.ATOMIC_MOVE)
  }

  // --------------------------------------------------------- graphmeta

  /** Edge-count statistics matrix (start labid, edge labid, end labid)
    * -> count — ag_graphmeta (reference ag_graphmeta.h:30-37). The
    * reference maintains it on write (auto_gather_graphmeta); here it
    * is one aggregation over the edge tables — always fresh, no
    * write-path coupling, and the same shape feeds join-size estimates.
    */
  def graphmeta(graph: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val names = labidNames(graph)
    val nameCol = {
      val m = names.toSeq.flatMap { case (k, v) => Seq(lit(k), lit(v)) }
      if (m.isEmpty) map() else map(m: _*)
    }
    scanAll(graph, 'e')
      .select(shiftrightunsigned(col("id"), 48).cast("int").as("edge_labid"),
        shiftrightunsigned(col("start"), 48).cast("int").as("start_labid"),
        shiftrightunsigned(col("end"), 48).cast("int").as("end_labid"))
      .groupBy("start_labid", "edge_labid", "end_labid")
      .agg(count(lit(1)).as("edgecount"))
      .select(element_at(nameCol, col("start_labid")).as("start"),
        element_at(nameCol, col("edge_labid")).as("edge"),
        element_at(nameCol, col("end_labid")).as("end"),
        col("edgecount"))
  }

  // ------------------------------------------------------- constraints

  /** Label constraints (reference: CreateConstraintCommand
    * graphcmds.c:550; tests cypher_ddl.sql:240-362). kind: "unique"
    * (property expression unique across the label subtree) or "check"
    * (boolean Cypher expression over properties).
    */
  final case class ConstraintMeta(label: String, name: String, kind: String,
      expr: String)

  private def constraintsPath(g: String): Path =
    graphDir(g).resolve("_constraints.json")

  def addConstraint(graph: String, label: String, name: String, kind: String,
      expr: String): Unit = {
    require(Seq("unique", "check").contains(kind), s"bad constraint kind $kind")
    require(this.label(graph, label).isDefined, s"label \"$label\" does not exist")
    val cur = constraints(graph)
    require(!cur.exists(_.name == name), s"constraint \"$name\" already exists")
    writeConstraints(graph, cur :+ ConstraintMeta(label, name, kind, expr))
  }

  def dropConstraint(graph: String, name: String): Unit =
    writeConstraints(graph, constraints(graph).filterNot(_.name == name))

  def constraints(graph: String): Seq[ConstraintMeta] = {
    import graft.jsonb._
    if (!Files.exists(constraintsPath(graph))) return Nil
    Jsonb.parse(Files.readString(constraintsPath(graph))) match {
      case JArr(items) => items.collect { case o: JObj =>
        ConstraintMeta(
          o.get("label").collect { case JStr(s) => s }.get,
          o.get("name").collect { case JStr(s) => s }.get,
          o.get("kind").collect { case JStr(s) => s }.get,
          o.get("expr").collect { case JStr(s) => s }.get)
      }
      case _ => Nil
    }
  }

  private def writeConstraints(g: String, cs: Seq[ConstraintMeta]): Unit = {
    import graft.jsonb._
    val doc = JArr(cs.toVector.map(c => Jsonb.mkObj(Seq(
      "label" -> JStr(c.label), "name" -> JStr(c.name),
      "kind" -> JStr(c.kind), "expr" -> JStr(c.expr)))))
    Files.writeString(constraintsPath(g), doc.render)
  }

  // ----------------------------------------------------- meta (de)ser

  private case class GraphMeta(
      labels: mutable.LinkedHashMap[String, LabelMeta],
      nextLabid: Int,
      unused: Long,
      sequences: mutable.LinkedHashMap[String, Long] = mutable.LinkedHashMap.empty)

  private def writeMeta(g: String, m: GraphMeta): Unit = {
    import graft.jsonb._
    val labelsJson = JArr(m.labels.values.toVector.map { l =>
      Jsonb.mkObj(Seq(
        "name" -> JStr(l.name),
        "labid" -> JNum(java.math.BigDecimal.valueOf(l.labid)),
        "kind" -> JStr(l.kind.toString),
        "parents" -> JArr(l.parents.toVector.map(JStr))))
    })
    val seqJson = Jsonb.mkObj(m.sequences.toSeq.map { case (k, v) =>
      k -> JNum(java.math.BigDecimal.valueOf(v)) })
    val doc = Jsonb.mkObj(Seq(
      "labels" -> labelsJson,
      "nextLabid" -> JNum(java.math.BigDecimal.valueOf(m.nextLabid)),
      "sequences" -> seqJson))
    Files.writeString(metaPath(g), doc.render)
  }

  private def readMeta(g: String): GraphMeta = {
    import graft.jsonb._
    if (!Files.exists(metaPath(g)))
      throw new IllegalStateException(s"graph \"$g\" does not exist")
    val doc = Jsonb.parse(Files.readString(metaPath(g))).asInstanceOf[JObj]
    val labels = mutable.LinkedHashMap[String, LabelMeta]()
    doc.get("labels").foreach {
      case JArr(items) => items.foreach { case o: JObj =>
        val name = o.get("name").collect { case JStr(s) => s }.get
        labels(name) = LabelMeta(
          name,
          o.get("labid").collect { case JNum(n) => n.intValue }.get,
          o.get("kind").collect { case JStr(s) => s.head }.get,
          o.get("parents").collect { case JArr(ps) =>
            ps.collect { case JStr(s) => s } }.getOrElse(Vector.empty))
        case _ => ()
      }
      case _ => ()
    }
    val sequences = mutable.LinkedHashMap[String, Long]()
    doc.get("sequences").foreach {
      case JObj(fields) => fields.foreach {
        case (k, JNum(n)) => sequences(k) = n.longValue
        case _ => ()
      }
      case _ => ()
    }
    GraphMeta(labels,
      doc.get("nextLabid").collect { case JNum(n) => n.intValue }.getOrElse(1),
      0, sequences)
  }
}
