package graft.queries

import java.nio.file.Files

import graft.SparkTestBase

/** VERDICT r10 ask #8 — q28's fixture resolution is lazy-once and
  * follows the documented order: explicit override > repo-walk (gated
  * by the build.sbt marker) > classpath temp copy > canonical path.
  * In package graft.queries to reach the private[queries] resolver. */
class Q28ResolutionSpec extends SparkTestBase {

  test("resolution order: a present override wins; a missing override " +
      "falls through to the repo walk; no override = repo walk") {
    val tmp = Files.createTempFile("q28-override", ".csv")
    Files.writeString(tmp, "category,region,qty,amount\na,N1,1,2.0\n")
    assert(Relational.resolveQ28(Some(tmp.toString)) === tmp.toString)
    // a missing override must NOT be trusted: next branch wins
    val walked = Relational.resolveQ28(Some("/nonexistent/q28.csv"))
    assert(walked !== "/nonexistent/q28.csv")
    assert(walked === Relational.resolveQ28(None))
    // the repo-walk result is the marker-gated checkout file, present
    assert(walked.endsWith("src/test/resources/fixtures/q28_sales.csv"))
    assert(new java.io.File(walked).exists, walked)
  }

  test("Q.oracle is lazy-once: the oracle text renders on first read, " +
      "not at registry construction, and caches for the JVM") {
    val evals = new java.util.concurrent.atomic.AtomicInteger(0)
    val q = graft.Q("lazy_probe", {
      evals.incrementAndGet(); "SELECT 1"
    }) { (s, _) => s.range(1).toDF() }
    assert(evals.get === 0, "oracle thunk ran at construction")
    assert(q.oracle === Some("SELECT 1"))
    assert(q.oracle === Some("SELECT 1"))
    assert(evals.get === 1, "oracle thunk must evaluate exactly once")
  }
}
