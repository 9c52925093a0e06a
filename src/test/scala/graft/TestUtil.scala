package graft

/** Shared test plumbing (one copy of the temp-dir cleanup and the
  * reference fixtures root — several suites were re-declaring both). */
object TestUtil {
  val fixturesRoot =
    "/root/reference/aegisthus-hadoop/src/test/resources/testdata"

  def deleteRecursively(f: java.io.File): Unit = {
    val kids = f.listFiles()
    if (kids != null) kids.foreach(deleteRecursively)
    f.delete(): Unit
  }
}
