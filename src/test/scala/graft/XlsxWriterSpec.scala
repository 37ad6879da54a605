package graft

import java.util.zip.ZipFile
import scala.jdk.CollectionConverters._

import graft.cli.Main
import graft.engine.report.{ReportSink, XlsxWriter}

/** K1/K2 workbook fidelity: the zero-dep OOXML assembler produces a valid
  * xlsx package (right parts, right sheet names, right cell payloads) and
  * the CLI's --xlsx flag lands it next to the per-sheet dirs.
  */
class XlsxWriterSpec extends SparkTestBase {

  private def readZip(path: String): Map[String, String] = {
    val zf = new ZipFile(path)
    try zf.entries().asScala.map { e =>
      e.getName -> new String(zf.getInputStream(e).readAllBytes(), "UTF-8")
    }.toMap
    finally zf.close()
  }

  test("writeRaw assembles a well-formed package with typed cells") {
    val dir = java.nio.file.Files.createTempDirectory("xlsx").toFile
    val path = new java.io.File(dir, "wb.xlsx").getAbsolutePath
    XlsxWriter.writeRaw(path, Seq(
      ("Sheet & One", Seq("name", "n"), Seq(
        Seq[Any]("a<b>", 7L),
        Seq[Any](null, 2.5))),
      ("Second", Seq("flag"), Seq(Seq[Any](true)))))

    val parts = readZip(path)
    assert(parts.keySet === Set("[Content_Types].xml", "_rels/.rels",
      "xl/workbook.xml", "xl/_rels/workbook.xml.rels",
      "xl/worksheets/sheet1.xml", "xl/worksheets/sheet2.xml"))
    // sheet names escaped in the workbook part, in order
    val wb = parts("xl/workbook.xml")
    assert(wb.contains("""<sheet name="Sheet &amp; One" sheetId="1" r:id="rId1"/>"""))
    assert(wb.contains("""<sheet name="Second" sheetId="2" r:id="rId2"/>"""))
    val s1 = parts("xl/worksheets/sheet1.xml")
    // header row + escaped inline string + native number; null cell omitted
    assert(s1.contains("""<c r="A1" t="inlineStr"><is><t xml:space="preserve">name</t></is></c>"""))
    assert(s1.contains("a&lt;b&gt;"))
    assert(s1.contains("""<c r="B2"><v>7</v></c>"""))
    assert(s1.contains("""<row r="3"><c r="B3"><v>2.5</v></c></row>"""))
    assert(parts("xl/worksheets/sheet2.xml")
      .contains("""<c r="A2" t="b"><v>1</v></c>"""))
  }

  test("mongo CLI --xlsx emits a workbook with the four reference sheets") {
    spark
    val dir = java.nio.file.Files.createTempDirectory("clix").toFile
    val in = new java.io.File(dir, "mongod.log")
    java.nio.file.Files.writeString(in.toPath,
      """{"t":{"$date":"2023-10-25T10:00:00.000Z"},"s":"I","c":"COMMAND","id":1,"ctx":"c","msg":"Slow query","attr":{"ns":"db.users","command":{"find":"users","filter":{"a":1}},"durationMillis":9}}
        |""".stripMargin)
    val out = new java.io.File(dir, "report")
    Main.main(Array("--mode", "mongo", "--input", in.getAbsolutePath,
      "--output", out.getAbsolutePath, "--xlsx"))
    val wbPath = new java.io.File(out, "report.xlsx")
    assert(wbPath.isFile)
    val parts = readZip(wbPath.getAbsolutePath)
    val wb = parts("xl/workbook.xml")
    for (sheet <- ReportSink.MongoSheets)
      assert(wb.contains(s"""name="$sheet""""), sheet)
    // the slow query's split namespace lands in the Detailed Metrics part
    val s1 = parts("xl/worksheets/sheet1.xml")
    assert(s1.contains(">users<") && s1.contains("""<c r="E2"><v>9</v></c>"""))
  }
}
