package graft.ingest

import java.io.{BufferedInputStream, BufferedOutputStream, File, FileInputStream, FileOutputStream}
import java.util.zip.ZipInputStream

/** Archive staging utilities (SURVEY §2.1 S1-S2): the reference fetches a
  * dataset zip over HTTP and unzips it before its readers run
  * (`/root/reference/server.py:90-129, 159-173`). In the Spark engine both
  * steps are DRIVER-SIDE staging, out of the distributed plan: executors
  * never see an archive — they read the extracted files through
  * `spark.read` / [[Ingest]], which is where the parallelism belongs.
  *
  * [[fetch]] is the S1 half (`server.py:90-129`): a streaming download in
  * the reference's 8 KiB chunks with a progress callback replacing its
  * polled byte counter (`server.py:107-116, 176-205`). [[extractZip]] is
  * the S2 half, replacing the reference's shell-out with `java.util.zip`
  * and adding the safety the reference lacks: zip-slip entries
  * (`../`-escaping paths) are rejected instead of written, and the
  * archive is NOT deleted on success (the reference deletes it,
  * `server.py:171`) — caller owns lifecycle.
  *
  * Scale note: a single driver-side unzip is a deliberate non-goal to
  * optimize — at 100 TB data arrives as parquet/object-store files, not
  * one zip. This exists for reference-parity ingest of small seed
  * archives only.
  */
object Archive {

  /** Stream `url` to `destPath` (parent dirs created), returning the
    * written path. `progress(bytesDone, bytesTotal)` fires per chunk;
    * `bytesTotal` is -1 when the server sends no Content-Length — the
    * same observability as the reference's polled download counter
    * (`server.py:107-116`), minus the polling. Redirects are followed;
    * non-2xx fails. Driver-side staging only, like [[extractZip]]. */
  def fetch(url: String, destPath: String,
            progress: (Long, Long) => Unit = (_, _) => (),
            connectTimeout: java.time.Duration = java.time.Duration.ofSeconds(30),
            requestTimeout: java.time.Duration = java.time.Duration.ofMinutes(30)): String = {
    // timeouts: a server that accepts the connection but never sends
    // would otherwise block this thread forever — and the control plane's
    // state machine with it (no fetch failure ever fires)
    val client = java.net.http.HttpClient.newBuilder()
      .followRedirects(java.net.http.HttpClient.Redirect.NORMAL)
      .connectTimeout(connectTimeout).build()
    val req = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
      .timeout(requestTimeout).GET().build()
    val resp = client.send(req, java.net.http.HttpResponse.BodyHandlers.ofInputStream())
    val in = resp.body()
    try {
      if (resp.statusCode() / 100 != 2)
        sys.error(s"fetch $url: HTTP ${resp.statusCode()}")
      val total = resp.headers().firstValueAsLong("Content-Length").orElse(-1L)
      val dest = new File(destPath)
      Option(dest.getParentFile).foreach(_.mkdirs())
      val os = new BufferedOutputStream(new FileOutputStream(dest))
      try {
        val buf = new Array[Byte](8192) // reference chunk size, server.py:118
        var done = 0L
        var n = in.read(buf)
        while (n >= 0) {
          os.write(buf, 0, n); done += n; progress(done, total); n = in.read(buf)
        }
      } finally os.close()
      dest.getPath
    } finally in.close()
  }

  /** S1→S2 staging in one call: download the archive next to `destDir`
    * and extract it there. Returns the extracted paths. */
  def fetchAndExtract(url: String, destDir: String,
                      progress: (Long, Long) => Unit = (_, _) => ()): Seq[String] = {
    val zipPath = fetch(url, destDir + ".download.zip", progress)
    try extractZip(zipPath, destDir)
    finally new File(zipPath).delete() // staging temp, unlike caller-owned archives
  }

  /** Extract `zipPath` under `destDir` (created if absent). Returns the
    * extracted file paths in archive order. Rejects entries whose
    * normalized path escapes `destDir`. */
  def extractZip(zipPath: String, destDir: String): Seq[String] = {
    val dest = new File(destDir).getCanonicalFile
    if (!dest.isDirectory && !dest.mkdirs())
      sys.error(s"cannot create extraction dir $destDir")
    val in = new ZipInputStream(new BufferedInputStream(new FileInputStream(zipPath)))
    val out = Seq.newBuilder[String]
    try {
      var entry = in.getNextEntry
      while (entry != null) {
        val target = new File(dest, entry.getName).getCanonicalFile
        if (!target.getPath.startsWith(dest.getPath + File.separator) && target != dest)
          sys.error(s"zip entry escapes extraction dir: ${entry.getName}")
        if (entry.isDirectory) {
          if (!target.isDirectory && !target.mkdirs())
            sys.error(s"cannot create dir ${target.getPath}")
        } else {
          val parent = target.getParentFile
          if (!parent.isDirectory && !parent.mkdirs())
            sys.error(s"cannot create dir ${parent.getPath}")
          val os = new BufferedOutputStream(new FileOutputStream(target))
          try {
            val buf = new Array[Byte](8192) // reference chunk size, server.py:118
            var n = in.read(buf)
            while (n >= 0) { os.write(buf, 0, n); n = in.read(buf) }
          } finally os.close()
          out += target.getPath
        }
        in.closeEntry()
        entry = in.getNextEntry
      }
    } finally in.close()
    out.result()
  }
}
