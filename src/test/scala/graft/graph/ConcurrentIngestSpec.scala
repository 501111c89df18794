package graft.graph

import java.nio.file.Files
import scala.concurrent.{Await, Future}
import scala.concurrent.duration.Duration
import scala.concurrent.ExecutionContext.Implicits.global
import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

/** Parallel bulk ingest: appends to DIFFERENT labels run concurrently
  * (one future per label, the shape GraphQueries.buildGraph uses). The
  * catalog's meta file is a shared read-modify-write — the lock +
  * atomic rename must keep EVERY label's shred metadata across
  * interleaved updates (a stale write would silently drop another
  * label's sidecar columns and break its pushdown path).
  */
class ConcurrentIngestSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  test("concurrent per-label appends keep all shred metas and rows") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_cing").toString
    val cat = new GraphCatalog(spark, root)
    cat.createGraph("cg")
    val labels = (0 until 6).map(i => s"l$i")
    labels.foreach(cat.createLabel("cg", _, 'v'))
    // each label gets its own uniform numeric key -> its own shred entry
    val tasks = labels.zipWithIndex.map { case (l, i) =>
      Future {
        for (batch <- 0 until 3) {
          val rows = (0 until 50).map { r =>
            val id = (i.toLong << 48) | (batch * 50L + r)
            (id, s"""{"k$i": ${batch * 50 + r}}""")
          }
          cat.append("cg", l, rows.toDF("id", "properties"))
        }
      }
    }
    tasks.foreach(Await.result(_, Duration.Inf))
    labels.zipWithIndex.foreach { case (l, i) =>
      val lm = cat.label("cg", l).get
      assert(lm.shred.get(s"k$i").contains("n"),
        s"label $l lost its shred meta: ${lm.shred}")
      assert(cat.scan("cg", l).count() == 150, l)
    }
  }
}
