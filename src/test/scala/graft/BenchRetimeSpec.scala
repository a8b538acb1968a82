package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/** Freeze the bounded ambient-retime contract (VERDICT r16 #6): the
  * re-time rule reads its references from the committed BENCH_LOCAL's
  * `queries{}` map and must go INERT — no references, no retries — when
  * the committed file records a different sf (e.g. a smoke run at
  * sf0.001 must never retime an sf0.1 run against the wrong numbers).
  * round_close.sh additionally checks the committed artifact still
  * carries the disclosing `stream_retimed`/`batch_retimed` fields. */
class BenchRetimeSpec extends AnyFunSuite {

  private def tmpBench(sf: String): String = {
    val f = Files.createTempFile("bench_local", ".json")
    Files.writeString(f,
      s"""{"metric":"total","value":1.0,"unit":"sec","n_queries":2,""" +
      s""""errors":[],"stream_retimed":[],"batch_retimed":[],""" +
      s""""warmup":{"q_alpha":9.99},""" +
      s""""queries":{"q_alpha":1.234,"q_beta":0.100},"sf":"$sf"}""")
    f.toString
  }

  test("references load from the queries map when the sf matches") {
    val p = tmpBench("/root/testdata/sf0.1")
    val ref = Bench.committedRef("/root/testdata/sf0.1", p)
    assert(ref === Map("q_alpha" -> 1.234, "q_beta" -> 0.100))
  }

  test("warmup times never become references (queries{} scope only)") {
    val p = tmpBench("/root/testdata/sf0.1")
    val ref = Bench.committedRef("/root/testdata/sf0.1", p)
    assert(ref("q_alpha") === 1.234) // not the 9.99 warmup row
  }

  test("a committed file at a DIFFERENT sf yields no references") {
    val p = tmpBench("/root/testdata/sf0.001")
    assert(Bench.committedRef("/root/testdata/sf0.1", p).isEmpty)
  }

  test("a missing file yields no references") {
    assert(Bench.committedRef("/root/testdata/sf0.1",
      "/nonexistent/bench.json").isEmpty)
  }

  test("the committed BENCH_LOCAL.json carries the disclosure fields") {
    val txt = Files.readString(java.nio.file.Paths.get("BENCH_LOCAL.json"))
    assert(txt.contains("\"stream_retimed\":"))
    assert(txt.contains("\"batch_retimed\":"))
  }
}
