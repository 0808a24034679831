package graft

import org.scalatest.funsuite.AnyFunSuite

/** The self-policing half of Bench lives or dies on parsing the prior
  * committed artifact — a silent parse failure would quietly disable
  * the contention guard (the r9 failure mode would ship unflagged
  * again). Pure-JVM spec, no Spark session.
  */
class BenchPolicingSpec extends AnyFunSuite {

  private def write(content: String): String = {
    val f = java.nio.file.Files.createTempFile("bench_prior", ".json")
    java.nio.file.Files.writeString(f, content)
    f.toString
  }

  test("readPriorArtifact parses the artifact's queries map") {
    val p = write(
      """{"metric":"total_detail","value":12.3,"unit":"sec","queries":{"q_a":0.123,"q_b":4.5},"runs":{"q_a":{"first":0.2,"second":0.123,"shuffle_mb":1.0,"peak_task_mem_mb":8.0}},"contention":{"flagged":0},"sf":"/root/testdata/sf0.1","n_queries":2}""")
    val m = Bench.readPriorArtifact(p, "/root/testdata/sf0.1")
    assert(m == Map("q_a" -> 0.123, "q_b" -> 4.5))
  }

  test("readPriorArtifact parses the CURRENT committed artifact " +
      "(format drift between Bench's writer and reader fails here, " +
      "not silently in the field)") {
    val committed = java.nio.file.Paths.get("BENCH_per_query.json")
    assume(java.nio.file.Files.exists(committed))
    val txt = java.nio.file.Files.readString(committed)
    val sf = """"sf":"([^"]+)"""".r.findFirstMatchIn(txt).get.group(1)
    val m = Bench.readPriorArtifact(committed.toString, sf)
    assert(m.size > 100, s"only ${m.size} entries parsed")
    assert(m.values.forall(v => v >= 0 && v < 3600))
  }

  test("SF mismatch, missing file, and malformed JSON all degrade to " +
      "no-prior (policing must never fail the bench)") {
    val p = write(
      """{"queries":{"q_a":0.1},"sf":"/root/testdata/sf0.1"}""")
    assert(Bench.readPriorArtifact(p, "/tmp/sf1").isEmpty)
    assert(Bench.readPriorArtifact("/nonexistent/x.json", "sf").isEmpty)
    val bad = write("""{"queries":{"q_a":}garbage""")
    // parseable prefix yields nothing usable; must not throw
    assert(Bench.readPriorArtifact(bad, "sf").isEmpty)
  }
}
