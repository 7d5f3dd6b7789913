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

  /** Loopback HTTP server serving `body`; runs `f` against its URL. */
  private def withHttp(body: Array[Byte], status: Int = 200)(f: String => Unit): Unit = {
    val srv = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    srv.createContext("/data.zip", (ex: com.sun.net.httpserver.HttpExchange) => {
      ex.sendResponseHeaders(status, body.length)
      try ex.getResponseBody.write(body) finally ex.close()
    })
    srv.start()
    try f(s"http://127.0.0.1:${srv.getAddress.getPort}/data.zip")
    finally srv.stop(0)
  }

  test("fetch streams a download with monotone progress up to Content-Length (S1)") {
    val payload = Array.tabulate[Byte](50000)(i => (i % 251).toByte)
    withHttp(payload) { url =>
      val dest = java.nio.file.Files.createTempDirectory("graft-fetch").toString + "/got.zip"
      val seen = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
      val path = Archive.fetch(url, dest, (d, t) => seen += ((d, t)))
      assert(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)).sameElements(payload))
      assert(seen.nonEmpty && seen.map(_._1) == seen.map(_._1).sorted, "progress must be monotone")
      assert(seen.last._1 == payload.length.toLong)
      assert(seen.forall(_._2 == payload.length.toLong), "total must come from Content-Length")
    }
  }

  test("fetch fails on non-2xx; fetchAndExtract stages end-to-end and removes its temp") {
    withHttp("nope".getBytes, status = 404) { url =>
      val ex = intercept[RuntimeException](
        Archive.fetch(url, java.nio.file.Files.createTempDirectory("graft-404").toString + "/x"))
      assert(ex.getMessage.contains("404"))
    }
    val zipBytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
      makeZip(Seq("dataset/a.csv" -> "id,v\n1,2\n"))))
    withHttp(zipBytes) { url =>
      val dest = java.nio.file.Files.createTempDirectory("graft-stage").toString + "/unpacked"
      val paths = Archive.fetchAndExtract(url, dest)
      assert(paths.size == 1 && paths.head.endsWith("a.csv"))
      assert(new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(paths.head)), "UTF-8") == "id,v\n1,2\n")
      assert(!new File(dest + ".download.zip").exists(), "staging temp must be cleaned up")
    }
  }
}
