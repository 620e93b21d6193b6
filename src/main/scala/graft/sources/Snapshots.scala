package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Manifest-based snapshot versioning — reproducible dataset versions with
  * time travel and incremental reads, the Iceberg/Delta discipline reduced
  * to its load-bearing core. A training run that cannot name the EXACT
  * bytes it trained on cannot be reproduced or audited; at 100 TB the only
  * affordable mechanism is the standard one: immutable data files + a
  * tiny per-version manifest listing which files ARE the table at that
  * version.
  *
  *   <table>/data/v00003-part-....parquet   immutable, never rewritten
  *   <table>/_versions/v00003.manifest      note line + one file path/line
  *
  * Commit = write new files, then write the manifest LAST: the manifest is
  * the commit point, so a crash mid-commit leaves orphan data files but
  * never a corrupt or partially-visible version (readers only follow
  * manifests). Appends REUSE the parent's file list — no data rewrite, the
  * manifest grows by the delta's file count only. Old versions stay
  * readable forever (until an explicit retention vacuum, not implemented
  * here). Single-writer contract: version numbers are claimed by listing,
  * so concurrent committers need an external lock — same stance as Delta
  * without a lock service.
  *
  * `incrementalRead` is the consumer half: "give me only what v added
  * since w" — the delta feed that drives uber/Incremental-style
  * maintenance and NearDupStream-style dedup without rescanning the
  * corpus.
  */
object Snapshots {

  private def fs(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def vdir(table: String) = new Path(table, "_versions")
  private def manifestPath(table: String, v: Int) =
    new Path(vdir(table), f"v$v%05d.manifest")

  /** Latest committed version, 0 if the table has none. */
  def currentVersion(spark: SparkSession, table: String): Int = {
    val d = vdir(table)
    val f = fs(spark, d)
    if (!f.exists(d)) 0
    else f.listStatus(d).map(_.getPath.getName)
      .filter(n => n.startsWith("v") && n.endsWith(".manifest"))
      .map(n => n.stripPrefix("v").stripSuffix(".manifest").toInt)
      .foldLeft(0)(math.max)
  }

  /** The data-file list (absolute paths) of a version. */
  def files(spark: SparkSession, table: String, version: Int): Seq[String] = {
    val mp = manifestPath(table, version)
    val f = fs(spark, mp)
    require(f.exists(mp), s"no version $version at $table")
    val in = f.open(mp)
    val lines = try scala.io.Source.fromInputStream(in, "UTF-8")
      .getLines().toList finally in.close()
    lines.drop(1).map(rel => new Path(table, rel).toString)
  }

  /** Write `df`'s files under data/ with a version-unique prefix and
    * return their table-relative paths (manifest not yet written).
    */
  private def stage(df: DataFrame, table: String, v: Int): Seq[String] = {
    val spark = df.sparkSession
    val staging = new Path(table, f"_staging_v$v%05d")
    val f = fs(spark, staging)
    df.write.mode("overwrite").parquet(staging.toString)
    val dataDir = new Path(table, "data")
    f.mkdirs(dataDir)
    val parts = f.listStatus(staging).map(_.getPath)
      .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
    val rels = parts.map { p =>
      val rel = f"data/v$v%05d-${p.getName}"
      // Hadoop rename reports failure by RETURN VALUE, not exception; an
      // unchecked false here would commit a manifest entry for a file
      // that never arrived, breaking the never-a-corrupt-version invariant
      require(f.rename(p, new Path(table, rel)),
        s"snapshot stage: rename ${p.getName} -> $rel failed")
      rel
    }
    f.delete(staging, true)
    rels.toSeq
  }

  private def writeManifest(
      spark: SparkSession, table: String, v: Int,
      note: String, rels: Seq[String]): Int = {
    val mp = manifestPath(table, v)
    val f = fs(spark, mp)
    f.mkdirs(vdir(table))
    val out = f.create(mp, false) // fail loudly if the version exists
    // the manifest is line-oriented (note line + one path per line): a
    // newline inside the note would shift every file path by one line
    val safeNote = note.replaceAll("[\\r\\n]+", " ")
    try out.write((safeNote +: rels).mkString("", "\n", "\n").getBytes("UTF-8"))
    finally out.close()
    v
  }

  /** Commit `df` as a FULL new table state (prior files stay for time
    * travel but leave the live version). Returns the new version number.
    */
  def commitOverwrite(df: DataFrame, table: String,
      note: String = "overwrite"): Int = {
    val spark = df.sparkSession
    val v = currentVersion(spark, table) + 1
    writeManifest(spark, table, v, note, stage(df, table, v))
  }

  /** Commit `df` as an APPEND: the new version = parent's files + the
    * delta's files; nothing is rewritten. Returns the new version.
    */
  def commitAppend(df: DataFrame, table: String,
      note: String = "append"): Int = {
    val spark = df.sparkSession
    val parent = currentVersion(spark, table)
    val prior =
      if (parent == 0) Seq.empty
      else {
        val tp = new Path(table).toString
        files(spark, table, parent)
          .map(a => a.stripPrefix(tp).stripPrefix("/"))
      }
    val v = parent + 1
    writeManifest(spark, table, v, note, prior ++ stage(df, table, v))
  }

  /** Read the table AT a version (time travel); latest when omitted. */
  def readVersion(spark: SparkSession, table: String,
      version: Option[Int] = None): DataFrame = {
    val v = version.getOrElse(currentVersion(spark, table))
    spark.read.parquet(files(spark, table, v): _*)
  }

  /** Only the rows ADDED between `since` (exclusive) and `until`
    * (inclusive; latest when omitted) — the incremental feed. Reads the
    * file-list difference, so cost scales with the DELTA, not the table.
    */
  def incrementalRead(spark: SparkSession, table: String, since: Int,
      until: Option[Int] = None): DataFrame = {
    val v = until.getOrElse(currentVersion(spark, table))
    val base: Set[String] =
      if (since == 0) Set.empty else files(spark, table, since).toSet
    val added = files(spark, table, v).filterNot(base)
    if (added.isEmpty) spark.read.parquet(files(spark, table, v): _*).limit(0)
    else spark.read.parquet(added: _*)
  }

  /** File-level diff between two versions: (added, removed). */
  def diff(spark: SparkSession, table: String,
      from: Int, to: Int): (Seq[String], Seq[String]) = {
    val a = files(spark, table, from).toSet
    val b = files(spark, table, to).toSet
    ((b -- a).toSeq.sorted, (a -- b).toSeq.sorted)
  }
}
