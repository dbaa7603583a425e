package graft.harness

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

/** Local dataset staging — the offline analog of the reference's S3
  * folder download (/root/reference/timedf/tools/s3_load.py:9-31): walk the
  * source, copy entries matching any of the benchmark's file patterns into
  * the target, skip files that already exist unless `reload`, and report
  * each decision. The control flow (pattern filter → exists check →
  * transfer) is the reference's; only the byte transport differs because
  * this environment has no network.
  */
object DataStaging {

  /** Glob-ish match: `*` is the only wildcard (matches any run, including
    * empty), everything else is literal.
    */
  private[harness] def matches(pattern: String, name: String): Boolean =
    name.matches(pattern.split("\\*", -1).map(java.util.regex.Pattern.quote).mkString(".*"))

  /** Stage every source entry matching ≥ 1 pattern into `targetDir`
    * (created if absent). Directories (partitioned parquet) copy
    * recursively. Returns the staged file names.
    */
  def stage(sourceDir: String, targetDir: String, patterns: Seq[String],
            reload: Boolean): Seq[String] = {
    val src = Paths.get(sourceDir)
    require(Files.isDirectory(src), s"source dir not found: $sourceDir")
    val tgt = Paths.get(targetDir)
    Files.createDirectories(tgt)
    val staged = Seq.newBuilder[String]
    val listing = Files.list(src) // must close: fd leak otherwise
    try listing.forEach { entry =>
      val name = entry.getFileName.toString
      if (!patterns.exists(p => matches(p, name))) ()
      else if (Files.exists(tgt.resolve(name)) && !reload)
        println(s"""Skipping "$name", already exists locally""")
      else {
        copyRecursive(entry, tgt.resolve(name))
        println(s"""Staged "$name" from "$sourceDir"""")
        staged += name
      }
    } finally listing.close()
    staged.result()
  }

  private def copyRecursive(from: Path, to: Path): Unit =
    if (Files.isDirectory(from)) {
      Files.createDirectories(to)
      val listing = Files.list(from) // must close: fd leak otherwise
      try listing.forEach(c => copyRecursive(c, to.resolve(c.getFileName)))
      finally listing.close()
    } else
      Files.copy(from, to, StandardCopyOption.REPLACE_EXISTING)

  /** Extract a .zip archive into `targetDir` with the same traversal
    * guard as [[extractTarGz]] (the reference's Kaggle loader extracts
    * competition zips — timedf/tools/kaggle_load.py:59-63 — without one;
    * zip-slip entries fail the whole archive here). Returns extracted
    * entry names in archive order.
    */
  def extractZip(archive: String, targetDir: String): Seq[String] = {
    val tgt = Paths.get(targetDir).toAbsolutePath.normalize()
    Files.createDirectories(tgt)
    val zip = new java.util.zip.ZipFile(archive)
    val extracted = Seq.newBuilder[String]
    try {
      val entries = zip.entries()
      while (entries.hasMoreElements) {
        val entry = entries.nextElement()
        val dest = tgt.resolve(entry.getName).normalize()
        if (!dest.startsWith(tgt) || dest == tgt && !entry.isDirectory)
          throw new IllegalArgumentException(
            s"Unsafe zip archive, possible security issue with entry ${entry.getName}")
        if (entry.isDirectory) Files.createDirectories(dest)
        else {
          Files.createDirectories(dest.getParent)
          val in = zip.getInputStream(entry)
          try Files.copy(in, dest, StandardCopyOption.REPLACE_EXISTING)
          finally in.close()
        }
        extracted += entry.getName
      }
    } finally zip.close()
    extracted.result()
  }

  /** Extract a .tar.gz archive into `targetDir` with the reference's
    * path-traversal guard (ny_taxi_ml/ny_taxi_ml.py:314-322): every
    * entry's resolved destination must stay under the resolved target
    * directory, otherwise the whole archive is rejected — a "../"-crafted
    * or absolute entry name is a security issue, not a file to skip.
    * Returns the extracted entry names in archive order.
    */
  def extractTarGz(archive: String, targetDir: String): Seq[String] = {
    import org.apache.commons.compress.archivers.tar.TarArchiveInputStream
    val tgt = Paths.get(targetDir).toAbsolutePath.normalize()
    Files.createDirectories(tgt)
    val in = new TarArchiveInputStream(new java.util.zip.GZIPInputStream(
      Files.newInputStream(Paths.get(archive))))
    val extracted = Seq.newBuilder[String]
    try {
      var entry = in.getNextEntry
      while (entry != null) {
        val dest = tgt.resolve(entry.getName).normalize()
        if (!dest.startsWith(tgt) || dest == tgt && !entry.isDirectory)
          throw new IllegalArgumentException(
            s"Unsafe tar archive, possible security issue with entry ${entry.getName}")
        if (entry.isDirectory) Files.createDirectories(dest)
        else {
          Files.createDirectories(dest.getParent)
          Files.copy(in, dest, StandardCopyOption.REPLACE_EXISTING)
        }
        extracted += entry.getName
        entry = in.getNextEntry
      }
    } finally in.close()
    extracted.result()
  }
}

/** CLI mirroring the reference's `benchmark-load` console script
  * (/root/reference/timedf/scripts/benchmark_load.py:19-30):
  *
  *   graft.harness.BenchmarkLoad <benchmark> <target_dir> [-r|--reload]
  *     [-source DIR]
  *
  * `-source` is the offline extension point standing in for the
  * reference's per-benchmark hardcoded public bucket.
  */
/** Offline analog of the reference's Kaggle competition loader
  * (/root/reference/timedf/tools/kaggle_load.py:10-63): resolve
  * `<competition>.zip`, skip the transfer when the archive already exists
  * locally unless `reload` (the reference's `force` flag), then extract
  * everything in place. The byte transport is a local source directory —
  * the stand-in for the authenticated Kaggle API in this zero-egress
  * environment (the reference's interactive auth/rules-acceptance loop is
  * a terminal prompt around exactly this control flow). Extraction adds
  * the zip-slip guard the reference lacks.
  */
object KaggleLoad {

  def load(competition: String, targetDir: String, sourceDir: String,
           reload: Boolean): Seq[String] = {
    val tgt = Paths.get(targetDir)
    Files.createDirectories(tgt)
    val zipName = s"$competition.zip"
    val local = tgt.resolve(zipName)
    if (Files.exists(local) && !reload)
      println(s"""Skipping "$zipName", already exists locally""")
    else {
      val src = Paths.get(sourceDir).resolve(zipName)
      require(Files.exists(src), s"competition archive not found: $src")
      Files.copy(src, local, StandardCopyOption.REPLACE_EXISTING)
      println(s"""Downloaded "$zipName" from "$sourceDir"""")
    }
    println("Unzipping file...")
    DataStaging.extractZip(local.toString, targetDir)
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 3,
      "usage: KaggleLoad <competition> <target_dir> <source_dir> [-r|--reload]")
    val reload = args.length > 3 && (args(3) == "-r" || args(3) == "--reload")
    val files = load(args(0), args(1), args(2), reload)
    println(s"Extracted ${files.size} files into ${args(1)}")
  }
}

object BenchmarkLoad {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: BenchmarkLoad <benchmark> <target_dir> [-r|--reload] [-source DIR]")
    val (benchName, targetDir) = (args(0), args(1))
    var reload = false
    var source: Option[String] = None
    var i = 2
    while (i < args.length) {
      args(i) match {
        case "-r" | "--reload" => reload = true; i += 1
        case "-source" | "--source" => source = Some(args(i + 1)); i += 2
        case other => throw new IllegalArgumentException(s"unknown flag: $other")
      }
    }
    BenchmarkRegistry.create(benchName).loadData(targetDir, reload, source)
    println(s"""Done loading "$benchName" into "$targetDir"""")
  }
}
