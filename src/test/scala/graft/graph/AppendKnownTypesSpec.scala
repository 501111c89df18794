package graft.graph

import java.nio.file.Files
import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** `GraphCatalog.append(df, knownTypes)` is the bulk-ingest fast path
  * added in r15: a caller that constructs `properties` from typed
  * source columns declares the batch's shred classification up front,
  * skipping the key-discovery/classification scan (one pass over the
  * batch instead of two). The contract: the written layout — shred
  * sidecar columns, their types, the label's shred meta, and the rows
  * a reader sees — must be IDENTICAL to what the inference path
  * produces for the same batch.
  */
class AppendKnownTypesSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def freshCat(): GraphCatalog = {
    val root = Files.createTempDirectory("graft_knowntypes")
    val cat = new GraphCatalog(spark, root.toString)
    cat.createGraph("kg")
    cat
  }

  private def batch(cat: GraphCatalog, label: String) = {
    val base = GraphId.pack(cat.label("kg", label).get.labid, 0L)
    spark.range(0, 50).select(
      (lit(base) + col("id")).as("id"),
      concat(lit("{\"bal\": "), col("id") * 10,
        lit(", \"name\": \"u"), col("id"), lit("\"}")).as("properties"))
  }

  test("knownTypes append writes the same layout as the inference path") {
    val cat = freshCat()
    cat.createLabel("kg", "inferred", 'v', Nil)
    cat.createLabel("kg", "declared", 'v', Nil)
    cat.append("kg", "inferred", batch(cat, "inferred"))
    cat.append("kg", "declared", batch(cat, "declared"),
      knownTypes = Some(Map("bal" -> "n", "name" -> "s")))

    // identical shred meta (the read-side pushdown contract)
    val mi = cat.label("kg", "inferred").get
    val md = cat.label("kg", "declared").get
    assert(mi.shred == md.shred, "declared types must match inference")
    assert(mi.shred == Map("bal" -> "n", "name" -> "s"))

    // identical parquet schema (same sidecar columns, same types)
    val root = cat.root
    val si = spark.read.parquet(s"$root/kg/inferred").schema
    val sd = spark.read.parquet(s"$root/kg/declared").schema
    assert(si.fields.map(f => (f.name, f.dataType)).sortBy(_._1).toSeq ==
      sd.fields.map(f => (f.name, f.dataType)).sortBy(_._1).toSeq)

    // identical rows through the reader, and the typed sidecar agrees
    // with the document on every row
    val di = spark.read.parquet(s"$root/kg/inferred")
      .select(col("properties"), col("__pn_bal"), col("__ps_name"))
      .collect().map(_.toSeq).sortBy(_.toString)
    val dd = spark.read.parquet(s"$root/kg/declared")
      .select(col("properties"), col("__pn_bal"), col("__ps_name"))
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(di.toSeq == dd.toSeq)
  }

  test("empty knownTypes map (propertyless edges) writes no sidecars") {
    val cat = freshCat()
    cat.createLabel("kg", "e1", 'e', Nil)
    val base = GraphId.pack(cat.label("kg", "e1").get.labid, 0L)
    val edges = spark.range(0, 10).select(
      (lit(base) + col("id")).as("id"),
      lit(1L).as("start"), lit(2L).as("end"),
      lit("{}").as("properties"))
    cat.append("kg", "e1", edges, knownTypes = Some(Map.empty))
    assert(cat.label("kg", "e1").get.shred.isEmpty)
    val cols = spark.read.parquet(s"${cat.root}/kg/e1").columns.toSet
    assert(!cols.exists(_.startsWith("__p")), s"unexpected sidecars in $cols")
  }
}
