package graft

import graft.cli.Main
import graft.engine.report.HtmlWriter

/** K3-analog page fidelity: the serve-less HTML renderer escapes content,
  * types numeric cells, surfaces truncation, and the CLI's --html flag
  * lands the page next to the per-sheet dirs.
  */
class HtmlWriterSpec extends SparkTestBase {

  test("renderRaw escapes, types numerics, and marks truncation") {
    val html = HtmlWriter.renderRaw("T & T", Seq(
      ("Sheet <One>", Seq("name", "n"), Seq(
        Seq[Any]("a<b>&c", 7L),
        Seq[Any](null, 2.5)), false),
      ("Cut", Seq("x"), Seq(Seq[Any]("only")), true)))
    assert(html.contains("<title>T &amp; T</title>"))
    // nav links to every sheet, names escaped
    assert(html.contains("""<a href="#s0">Sheet &lt;One&gt;</a>"""))
    assert(html.contains("""<a href="#s1">Cut</a>"""))
    // cell escaping + numeric class + empty cell for null
    assert(html.contains("<td>a&lt;b&gt;&amp;c</td>"))
    assert(html.contains("""<td class="num">7</td>"""))
    assert(html.contains("<td></td>"))
    // truncation is visible, never silent
    assert(html.contains("""<p class="trunc">sheet truncated at 1 rows</p>"""))
    // no external fetches: a self-contained file
    assert(!html.contains("http://") && !html.contains("https://"))
  }

  test("mongo CLI --html emits a page with the four reference sheets") {
    spark
    val dir = java.nio.file.Files.createTempDirectory("clih").toFile
    val in = new java.io.File(dir, "mongod.log")
    java.nio.file.Files.writeString(in.toPath,
      """{"t":{"$date":"2023-10-25T10:00:00.000Z"},"s":"I","c":"COMMAND","id":1,"ctx":"c","msg":"Slow query","attr":{"ns":"db.users","command":{"find":"users","filter":{"a":1}},"durationMillis":9}}
        |""".stripMargin)
    val out = new java.io.File(dir, "report")
    Main.main(Array("--mode", "mongo", "--input", in.getAbsolutePath,
      "--output", out.getAbsolutePath, "--html"))
    val page = new java.io.File(out, "report.html")
    assert(page.isFile)
    val html = java.nio.file.Files.readString(page.toPath)
    for (sheet <- graft.engine.report.ReportSink.MongoSheets)
      assert(html.contains(s">$sheet"), sheet)
    // the slow query's split namespace lands in the Detailed Metrics table
    assert(html.contains("<td>users</td>"))
    assert(html.contains("""<td class="num">9</td>"""))
  }
}
