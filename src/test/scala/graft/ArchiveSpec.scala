package graft

import java.io.{File, FileOutputStream}
import java.util.zip.{ZipEntry, ZipOutputStream}
import org.scalatest.funsuite.AnyFunSuite
import graft.ingest.Archive

class ArchiveSpec extends AnyFunSuite {

  private def makeZip(entries: Seq[(String, String)]): String = {
    val f = File.createTempFile("graft-archive", ".zip")
    val zos = new ZipOutputStream(new FileOutputStream(f))
    entries.foreach { case (name, body) =>
      zos.putNextEntry(new ZipEntry(name))
      zos.write(body.getBytes("UTF-8"))
      zos.closeEntry()
    }
    zos.close()
    f.getPath
  }

  test("extractZip restores nested files and reports them in archive order") {
    val zip = makeZip(Seq(
      "dataset/a.csv" -> "id,v\n1,2\n",
      "dataset/sub/b.json" -> """{"k":1}"""))
    val dest = java.nio.file.Files.createTempDirectory("graft-extract").toString
    val paths = Archive.extractZip(zip, dest)
    assert(paths.map(p => p.stripPrefix(dest + File.separator)) ==
      Seq("dataset/a.csv", "dataset/sub/b.json").map(_.replace('/', File.separatorChar)))
    val body = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dest, "dataset", "a.csv")), "UTF-8")
    assert(body == "id,v\n1,2\n")
    assert(new File(zip).exists()) // archive is not deleted (unlike the reference)
  }

  test("extractZip rejects zip-slip entries that escape the dest dir") {
    val zip = makeZip(Seq("../evil.txt" -> "pwned"))
    val dest = java.nio.file.Files.createTempDirectory("graft-slip").toString
    val ex = intercept[RuntimeException](Archive.extractZip(zip, dest))
    assert(ex.getMessage.contains("escapes"))
    assert(!new File(new File(dest).getParentFile, "evil.txt").exists())
  }
}
