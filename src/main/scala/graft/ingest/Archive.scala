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
  * The HTTP fetch itself stays out of the engine (the cluster's storage
  * layer delivers files); [[extractZip]] is the kept piece, replacing the
  * reference's shell-out with `java.util.zip` and adding the safety the
  * reference lacks: zip-slip entries (`../`-escaping paths) are rejected
  * instead of written, and the archive is NOT deleted on success (the
  * reference deletes it, `server.py:171`) — caller owns lifecycle.
  *
  * Scale note: a single driver-side unzip is a deliberate non-goal to
  * optimize — at 100 TB data arrives as parquet/object-store files, not
  * one zip. This exists for reference-parity ingest of small seed
  * archives only.
  */
object Archive {

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
