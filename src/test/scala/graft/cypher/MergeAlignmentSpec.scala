package graft.cypher

import graft.cypher.Kind._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the MERGE join-back precondition (WriteOps.mergeVarsAligned)
  * and the failure contract: a misalignment between the created and
  * matched builds is an internal error that THROWS — it must never
  * fall back to a full re-match, whose bindings diverge from the
  * reference on self-symmetric patterns (execCypherMerge.c:35).
  */
class MergeAlignmentSpec extends AnyFunSuite {

  test("aligned: identical names and kinds") {
    assert(WriteOps.mergeVarsAligned(
      Seq("a" -> KV, "r" -> KE, "b" -> KV),
      Seq("a" -> KV, "r" -> KE, "b" -> KV)))
  }

  test("aligned: anonymous elements may carry different fresh names") {
    assert(WriteOps.mergeVarsAligned(
      Seq("a" -> KV, "__e7" -> KE, "b" -> KV),
      Seq("a" -> KV, "__e3" -> KE, "b" -> KV)))
  }

  test("misaligned: named var drift") {
    assert(!WriteOps.mergeVarsAligned(
      Seq("a" -> KV, "r" -> KE), Seq("a" -> KV, "s" -> KE)))
  }

  test("misaligned: kind drift at same position") {
    assert(!WriteOps.mergeVarsAligned(
      Seq("a" -> KV, "r" -> KE), Seq("a" -> KV, "r" -> KV)))
  }

  test("misaligned: length drift") {
    assert(!WriteOps.mergeVarsAligned(
      Seq("a" -> KV), Seq("a" -> KV, "r" -> KE)))
  }

  test("misaligned: anonymous on one side only") {
    assert(!WriteOps.mergeVarsAligned(
      Seq("__v1" -> KV), Seq("a" -> KV)))
  }

  test("aligned: per-kind pairing bridges the node/edge interleaving") {
    // create() binds both endpoint nodes BEFORE the edge (it needs
    // their ids); buildMatch binds node, edge, node — the SAME pattern
    // vars in a different interleaving must align per kind
    assert(WriteOps.mergeVarsAligned(
      Seq("a" -> KV, "b" -> KV, "__ce_2_1" -> KE),
      Seq("a" -> KV, "__e_1" -> KE, "b" -> KV)))
    val pairs = WriteOps.mergeVarPairs(
      Seq("a" -> KV, "b" -> KV, "__ce_2_1" -> KE),
      Seq("a" -> KV, "__e_1" -> KE, "b" -> KV)).get
    assert(pairs.map { case ((c, _), (m, _)) => c -> m } ==
      Seq("a" -> "a", "b" -> "b", "__ce_2_1" -> "__e_1"))
  }

  test("reached misalignment throws, never proceeds") {
    val e = intercept[IllegalStateException] {
      WriteOps.mergeMisalignmentError(Seq("a", "__e1"), Seq("a", "r"))
    }
    assert(e.getMessage.contains("internal error"))
    assert(e.getMessage.contains("misalignment"))
  }
}
