package graft.api

import org.apache.spark.sql.SparkSession

/** Session-construction defaults for graft workloads.
  *
  * Some confs a realistic graft workload depends on are STATIC — they
  * are read once when the SparkSession is built and cannot be injected
  * afterwards by `GraftExtensions` or `spark.conf.set`. The one that
  * bites is `spark.sql.codegen.cache.maxEntries`: its default of 100
  * is smaller than a typical graft query suite (this repo's own bench
  * compiles ~250 distinct plan shapes per pass), so every pass misses
  * the generated-class cache and re-Janinos + re-loads every class — a
  * steady bleed of metaspace and JIT code cache that shows up as
  * late-query slowdowns with gc_ms≈0 (classes unload only when their
  * loader is GC'd; the JIT quietly degrades first). Diagnosed in round
  * 8 of this build: sizing the cache to hold the whole suite halved the
  * cold total and eliminated pass-2 inflation.
  *
  * Usage — wrap the builder before `getOrCreate()`:
  * {{{
  * val spark = GraftSession.configure(SparkSession.builder())
  *   .master(...)
  *   .getOrCreate()
  * }}}
  * User-built sessions that skip this helper should set
  * `recommendedConfs` themselves (README "Deployment" note); an
  * already-running session CANNOT be repaired.
  */
object GraftSession {

  /** Static confs every >100-plan graft workload should carry.
    * - codegen.cache.maxEntries: hold the whole workload's generated
    *   classes (default 100 < typical suite size; static conf).
    * - ui.retainedExecutions: the SQL status store retains full
    *   execution details (incl. rendered plan graphs) for the last
    *   1000 executions EVEN WITH THE UI DISABLED — old-gen ballast on
    *   a long-running session. 100 keeps a useful debugging window.
    */
  val recommendedConfs: Seq[(String, String)] = Seq(
    "spark.sql.codegen.cache.maxEntries" -> "2048",
    "spark.sql.ui.retainedExecutions" -> "100")

  /** Apply `recommendedConfs` to a builder (explicit `.config` calls
    * made after this still win — Builder options are last-write).
    */
  def configure(b: SparkSession.Builder): SparkSession.Builder =
    recommendedConfs.foldLeft(b) { case (bb, (k, v)) => bb.config(k, v) }
}
