package graft.io

import java.io.{File, FileOutputStream}
import java.nio.file.{Files, Paths}
import java.util.zip.{ZipEntry, ZipException, ZipFile}

/** S4 — driver-side ZIP extraction feeding [[Tables.tabDelimited]].
  *
  * Mirrors the reference's archive stage
  * (`testing_airflow_sec_pipeline.py:169-192`): each `*.zip` in a
  * landing directory is extracted into `destRoot/<archive-stem>/`;
  * a corrupt archive (`BadZipFile` there, [[ZipException]] here) is
  * skipped with its name reported; the archive file itself is
  * deleted afterwards in BOTH cases (the reference's `os.remove` sits
  * outside the try). Returns per-archive outcomes so the caller can
  * build the `extracted_folders` / `year_quarters` lists the
  * reference pushes through XCom.
  *
  * Driver-side on purpose: archives arrive one per quarter (a
  * handful of files), so this is metadata-scale work — the DATA
  * plane starts when the extracted tab-delimited members are read
  * through the distributed CSV source. Entry names are sanitized
  * against zip-slip (`../` escapes) — a concern the reference's
  * `extractall` leaves to Python.
  */
object Zips {

  /** One archive's outcome: where it extracted (None = corrupt/skipped)
    * and how many member files were written. */
  final case class Extraction(archive: String, folder: Option[String], members: Int)

  /** Extract every `*.zip` under `srcDir` into
    * `destRoot/<archive-stem>/`, skipping corrupt archives and
    * deleting each archive afterwards. Deterministic order (sorted
    * by archive name). */
  def extractAll(srcDir: String, destRoot: String): Seq[Extraction] = {
    val zips = Option(new File(srcDir).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.endsWith(".zip"))
      .sortBy(_.getName)
    zips.toSeq.map { zf =>
      val stem = zf.getName.stripSuffix(".zip")
      val dest = new File(destRoot, stem)
      val out =
        try {
          dest.mkdirs()
          var n = 0
          val zip = new ZipFile(zf) // throws ZipException on corrupt archives
          try {
            val entries = zip.entries()
            while (entries.hasMoreElements) {
              val e: ZipEntry = entries.nextElement()
              val target = new File(dest, e.getName).getCanonicalFile
              if (!target.getPath.startsWith(dest.getCanonicalPath + File.separator)
                  && target.getCanonicalPath != dest.getCanonicalPath)
                throw new ZipException(s"zip-slip entry: ${e.getName}")
              if (e.isDirectory) target.mkdirs()
              else {
                Option(target.getParentFile).foreach(_.mkdirs())
                val in = zip.getInputStream(e)
                val os = new FileOutputStream(target)
                try in.transferTo(os)
                finally { os.close(); in.close() }
                n += 1
              }
            }
          } finally zip.close()
          Extraction(zf.getName, Some(dest.getPath), n)
        } catch {
          case _: ZipException =>
            // a corrupt archive (or a zip-slip entry mid-stream) must
            // not leave half-extracted members behind: downstream
            // consumers that glob destRoot would ingest a partial
            // quarter. Remove everything written for this archive.
            deleteRecursively(dest)
            Extraction(zf.getName, None, 0)
        }
      Files.deleteIfExists(Paths.get(zf.getPath)) // reference: os.remove after either branch
      out
    }
  }

  private[graft] def deleteRecursively(f: File): Unit = {
    if (f.isDirectory)
      Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRecursively)
    f.delete()
    ()
  }

  /** The reference's `year_quarters` derivation: basename of each
    * successfully extracted folder. */
  def yearQuarters(extractions: Seq[Extraction]): Seq[String] =
    extractions.flatMap(_.folder).map(p => new File(p).getName)
}
