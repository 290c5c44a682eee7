package graft

/** Smoke coverage for the CLI surface: the registry listing and the
  * explain path (both driver-visible entry points). The domain commands
  * (snapshot/timeline/...) are exercised through AvailabilitySpec on
  * the same API methods the CLI delegates to.
  */
class CliSpec extends SparkSpec {

  private def captureOut(body: => Unit): String = {
    val bos = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(bos, true, "UTF-8"))(body)
    bos.toString("UTF-8")
  }

  test("list prints the full sorted query registry") {
    val out = captureOut(cli.Main.main(Array("list")))
    val names = out.linesIterator.toSeq
    names should contain("q_f1_snapshot")
    names should contain("q_rankings_pipeline")
    names.size shouldBe SparkEntry.queries.size
    names shouldBe names.sorted
  }

  test("explain prints a physical plan for a registered query") {
    val out = captureOut(
      cli.Main.main(Array("explain", "q_f1_snapshot", "/root/testdata/sf0.001")))
    out should include("Physical Plan")
    out should include("PushedFilters")
  }
}
