package graft.graph

/** Forked-JVM meta-lock contender, driven by CrossProcessCatalogSpec.
  * Runs id reservations against a warehouse as a genuinely separate OS
  * process, so the `_meta.lock` advisory file lock — not the in-JVM
  * striped monitor that masks it when both "drivers" share a process —
  * is the only thing serializing the meta read-modify-write cycles.
  * Spark-free on purpose: reserveIds is pure meta file I/O, and a null
  * session keeps the child's startup at bare-JVM cost.
  *
  * args: warehouse-root output-file n-reservations
  */
object MetaLockContender {
  def main(args: Array[String]): Unit = {
    val root = args(0)
    val out = args(1)
    val n = args(2).toInt
    val cat = new GraphCatalog(null, root)
    val sb = new StringBuilder
    var i = 0
    while (i < n) {
      sb.append(cat.reserveIds("g", "v", 10)).append('\n')
      i += 1
    }
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), sb.toString)
  }
}
