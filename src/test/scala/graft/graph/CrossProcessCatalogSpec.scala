package graft.graph

import java.nio.file.Files
import scala.concurrent.{Await, Future}
import scala.concurrent.duration.Duration
import scala.concurrent.ExecutionContext.Implicits.global
import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

/** Cross-driver catalog safety. A second Spark driver on the same
  * warehouse has its own GraphCatalog instance, so the instance
  * monitor that used to guard meta read-modify-write cycles protected
  * nothing across drivers — interleaved read-modify-rename could lose
  * updates. Meta mutations now serialize through a JVM-global striped
  * monitor + an OS advisory file lock (`_meta.lock`), and whole-table
  * rewrites take a per-label write lock against in-flight appends.
  * Simulated here with multiple catalog INSTANCES (the exact state a
  * second driver has: no shared object, same files).
  */
class CrossProcessCatalogSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  test("id reservation across catalog instances never hands out overlaps") {
    val root = Files.createTempDirectory("graft_xp1").toString
    val boot = new GraphCatalog(spark, root)
    boot.createGraph("g")
    boot.createLabel("g", "v", 'v')
    // two "drivers" x four threads x many reservations
    val cats = Seq(new GraphCatalog(spark, root), new GraphCatalog(spark, root))
    val tasks = for (c <- cats; _ <- 0 until 4) yield Future {
      (0 until 50).map(_ => c.reserveIds("g", "v", 10))
    }
    val starts = tasks.flatMap(Await.result(_, Duration.Inf))
    assert(starts.distinct.length == starts.length, "duplicate range starts")
    val ranges = starts.sorted
    ranges.sliding(2).foreach {
      case Seq(a, b) => assert(a + 10 <= b, s"overlap: $a..${a + 9} vs $b")
      case _ => ()
    }
    assert(starts.length == 2 * 4 * 50)
  }

  test("label DDL across catalog instances loses no updates") {
    val root = Files.createTempDirectory("graft_xp2").toString
    val boot = new GraphCatalog(spark, root)
    boot.createGraph("g")
    val cats = Seq(new GraphCatalog(spark, root), new GraphCatalog(spark, root))
    val tasks = (0 until 24).map { i =>
      Future { cats(i % 2).createLabel("g", s"l$i", 'v') }
    }
    tasks.foreach(Await.result(_, Duration.Inf))
    val labels = boot.labels("g")
    assert((0 until 24).forall(i => labels.exists(_.name == s"l$i")),
      labels.map(_.name).mkString(","))
    val ids = labels.map(_.labid)
    assert(ids.distinct.length == ids.length, s"duplicate labids: $ids")
  }

  test("constraint add/drop across instances loses no updates") {
    val root = Files.createTempDirectory("graft_xp3").toString
    val boot = new GraphCatalog(spark, root)
    boot.createGraph("g")
    boot.createLabel("g", "v", 'v')
    val cats = Seq(new GraphCatalog(spark, root), new GraphCatalog(spark, root))
    val tasks = (0 until 16).map { i =>
      Future { cats(i % 2).addConstraint("g", "v", s"c$i", "check", s"k > $i") }
    }
    tasks.foreach(Await.result(_, Duration.Inf))
    assert(boot.constraints("g").map(_.name).toSet ==
      (0 until 16).map(i => s"c$i").toSet)
  }

  test("index re-clustering never deletes files of an in-flight same-label append") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_xp4").toString
    val cat = new GraphCatalog(spark, root)
    cat.createGraph("g")
    cat.createLabel("g", "v", 'v')
    def batch(base: Int, n: Int) =
      (0 until n).map(r => ((base + r).toLong, s"""{"k": ${base + r}}"""))
        .toDF("id", "properties")
    cat.append("g", "v", batch(0, 50))
    val nBatches = 12
    val appender = Future {
      for (b <- 1 to nBatches) cat.append("g", "v", batch(b * 1000, 50))
    }
    // concurrent re-cluster storm: each create triggers reindexLabel's
    // whole-table overwrite (rm + swap) of the SAME label
    val reindexer = Future {
      for (i <- 0 until 4) {
        cat.createPropertyIndex("g", "v", Some(s"ix$i"), Seq("k"),
          unique = false)
        cat.dropPropertyIndex("g", s"ix$i")
      }
    }
    Await.result(appender, Duration.Inf)
    Await.result(reindexer, Duration.Inf)
    val got = cat.scan("g", "v").count()
    assert(got == 50L + nBatches * 50L, s"lost rows: $got")
  }

  test("forked JVMs contending on _meta.lock lose no updates") {
    // The in-process tests above share the JVM-global striped monitor,
    // which MASKS the OS advisory lock (overlapping nio FileLocks from
    // one JVM throw, so same-JVM "drivers" never actually exercise it).
    // Genuinely separate processes do: only `_meta.lock` serializes
    // their read-modify-rename cycles here.
    val root = Files.createTempDirectory("graft_xpf").toString
    val boot = new GraphCatalog(spark, root)
    boot.createGraph("g")
    boot.createLabel("g", "v", 'v')
    val javaBin = System.getProperty("java.home") + "/bin/java"
    val cp = System.getProperty("java.class.path")
    val perChild = 60
    val outs = Seq.tabulate(2)(i => s"$root/child$i.txt")
    // stderr goes to a FILE, not a pipe: a pipe the parent only reads
    // after waitFor deadlocks the child once it emits > the OS pipe
    // buffer (JVM warnings, a long stack trace), turning a real
    // failure into a spurious timeout
    val errs = Seq.tabulate(2)(i => s"$root/child$i.err")
    val procs = outs.zip(errs).map { case (o, e) =>
      new ProcessBuilder(javaBin, "-cp", cp,
        "graft.graph.MetaLockContender", root, o, perChild.toString)
        .redirectOutput(ProcessBuilder.Redirect.DISCARD)
        .redirectError(new java.io.File(e))
        .start()
    }
    // the parent contends too, through its own catalog instance
    val mine = (0 until perChild).map(_ => boot.reserveIds("g", "v", 10))
    procs.zip(errs).foreach { case (p, e) =>
      assert(p.waitFor(120, java.util.concurrent.TimeUnit.SECONDS),
        "contender timed out")
      assert(p.exitValue == 0, s"contender failed: ${new String(
        java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(e)))
        .takeRight(500)}")
    }
    val theirs = outs.flatMap { o =>
      Files.readAllLines(java.nio.file.Paths.get(o))
        .toArray(Array.empty[String]).toSeq.filter(_.nonEmpty).map(_.toLong)
    }
    assert(theirs.length == 2 * perChild, s"children wrote ${theirs.length}")
    val all = (mine ++ theirs).sorted
    assert(all.distinct.length == all.length, "duplicate range starts")
    all.sliding(2).foreach {
      case Seq(a, b) => assert(a + 10 <= b, s"overlap: $a..${a + 9} vs $b")
      case _ => ()
    }
    assert(all.length == 3 * perChild)
  }
}
