package graft.ops

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Minimal versioned-manifest commit protocol over immutable parquet —
  * the concurrent-read-safe face of [[Merge.upsertPartitioned]], whose
  * dynamic-partition-overwrite is only per-partition-dir atomic (a crash
  * during commit can leave some partitions swapped and some not).
  *
  * Layout under a table root:
  * {{{
  *   data/v{N}/__p={part}/part-*.parquet   -- immutable; partCol kept IN the rows
  *   _txn/v{N}.manifest                    -- "partValue TAB relativePath" lines
  * }}}
  *
  * The ONLY mutable step is the manifest rename (`tmp -> v{N}.manifest`),
  * which the filesystem makes atomic — readers resolve the latest
  * manifest first and read exactly the files it lists, so a reader can
  * NEVER observe a half-written version: either v{N}.manifest exists
  * (all its data files were fully written first) or the reader sees
  * v{N-1}. Writers that race on the same version fail the rename instead
  * of corrupting state. This is the Delta/Iceberg commit idea reduced to
  * its load-bearing core; MergeSpec proves the reader-isolation claim by
  * reading mid-"crash" (data files present, manifest absent).
  *
  * An upsert rewrites only the partitions the changeset touches and
  * CARRIES FORWARD the untouched partitions' file entries — at 100 TB a
  * daily merge commit costs the affected partitions' rewrite plus an
  * O(#files) manifest write. Manifest handling is driver-side metadata
  * ∝ file count (exactly like Delta's log); swap `java.io.File` for the
  * Hadoop `FileSystem` API to run against HDFS/S3 (rename-atomicity on
  * object stores then needs the usual log-store guard).
  */
object Txn {

  private def txnDir(path: String) = new File(path, "_txn")
  private val ManifestRe = """v(\d+)\.manifest""".r

  /** Latest committed version, or -1 if the table has none. The match is
    * anchored to the WHOLE file name: a torn `.v{N}.manifest.tmp` from a
    * crashed writer contains "v{N}.manifest" as a substring and must
    * never count as committed.
    */
  def latestVersion(path: String): Int =
    Option(txnDir(path).listFiles()).getOrElse(Array.empty[File])
      .flatMap(f => f.getName match {
        case ManifestRe(v) => Some(v.toInt)
        case _ => None
      })
      .foldLeft(-1)(math.max)

  /** (partValue, relativePath) entries of version `v`. */
  private def entries(path: String, v: Int): Seq[(String, String)] =
    Files.readAllLines(new File(txnDir(path), s"v$v.manifest").toPath,
        StandardCharsets.UTF_8).asScala.toSeq
      .filter(_.nonEmpty)
      .map { line =>
        val Array(p, rel) = line.split("\t", 2)
        (p, rel)
      }

  /** Snapshot read of the latest committed version. */
  def read(spark: SparkSession, path: String): DataFrame = {
    val v = latestVersion(path)
    require(v >= 0, s"no committed version under $path")
    readVersion(spark, path, v)
  }

  /** Time travel: snapshot read of a SPECIFIC committed version. Costs
    * the same as a latest-read — resolve one manifest, scan exactly its
    * files — because versions are immutable data + manifest pairs; no
    * log replay, no undo. Old versions stay readable until
    * [[expireVersions]] vacuums them (retention count is the caller's
    * policy); readers of an expired version fail cleanly at manifest
    * resolution below.
    */
  def readVersion(spark: SparkSession, path: String, version: Int): DataFrame = {
    require(version >= 0 &&
      new File(txnDir(path), s"v$version.manifest").exists(),
      s"version $version is not committed under $path")
    spark.read.parquet(entries(path, version).map(e => s"$path/${e._2}"): _*)
  }

  /** Write `df` as version `v`'s data files (one dir per partition value,
    * partCol retained in the rows via the `__p` shadow) and return the
    * manifest entries. Data lands BEFORE any manifest points at it.
    * Overwrite mode IS the crash recovery: `v` is above the committed
    * version, so anything already under `data/v{v}` is debris from a
    * writer that died before publishing — no manifest references it, no
    * reader can see it, clobbering it is safe.
    */
  private def writeData(path: String, v: Int, df: DataFrame,
      partCol: String): Seq[(String, String)] = {
    val stage = new File(path, s"data/v$v")
    df.withColumn("__p", col(partCol).cast("string"))
      .repartition(col("__p"))
      .write.mode("overwrite").partitionBy("__p")
      .parquet(stage.getAbsolutePath)
    for {
      dir <- Option(stage.listFiles()).getOrElse(Array.empty[File]).toSeq
        .filter(d => d.isDirectory && d.getName.startsWith("__p="))
        .sortBy(_.getName)
      f <- dir.listFiles().toSeq
        .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
    } yield (dir.getName.stripPrefix("__p="),
      s"data/v$v/${dir.getName}/${f.getName}")
  }

  /** Atomically publish `v`: all-or-nothing manifest rename. */
  private def publish(path: String, v: Int,
      manifest: Seq[(String, String)]): Unit = {
    txnDir(path).mkdirs()
    val tmp = new File(txnDir(path), s".v$v.manifest.tmp")
    Files.write(tmp.toPath,
      manifest.map { case (p, rel) => s"$p\t$rel" }.asJava,
      StandardCharsets.UTF_8)
    val fin = new File(txnDir(path), s"v$v.manifest")
    require(tmp.renameTo(fin),
      s"commit of v$v lost the race (concurrent writer?): $fin")
  }

  /** Commit `df` as the next full snapshot; returns the new version. */
  def commit(spark: SparkSession, path: String, df: DataFrame,
      partCol: String): Int = {
    val v = latestVersion(path) + 1
    publish(path, v, writeData(path, v, df, partCol))
    v
  }

  /** MERGE as a transaction: rewrite only the changeset's partitions,
    * carry forward every other partition's file entries unchanged, then
    * one atomic manifest swap. The affected-partition values collect to
    * the driver — metadata ∝ partitions touched, never rows.
    */
  def upsertPartitioned(spark: SparkSession, path: String, source: DataFrame,
      keys: Seq[String], partCol: String): Int = {
    val v0 = latestVersion(path)
    require(v0 >= 0, s"upsert needs an initial commit under $path")
    val old = entries(path, v0)
    val affected = source.select(col(partCol).cast("string")).distinct()
      .collect().map(_.getString(0)).toSet
    val affectedFiles = old.collect {
      case (p, rel) if affected(p) => s"$path/$rel"
    }
    val merged =
      if (affectedFiles.isEmpty) source
      else Merge.upsert(spark.read.parquet(affectedFiles: _*), source, keys)
    val v = v0 + 1
    val fresh = writeData(path, v, merged, partCol)
    publish(path, v, old.filterNot { case (p, _) => affected(p) } ++ fresh)
    v
  }

  /** Snapshot retention (VACUUM): keep the latest `keepLast` versions,
    * delete older manifests AND every data file no retained manifest
    * references (files are shared across versions by carry-forward, so
    * reachability — not version directories — decides what is garbage).
    * Ordering makes this safe against concurrent readers of RETAINED
    * versions: unreferenced data files go first, manifests last, so any
    * version whose manifest still exists has all its files. Readers of
    * EXPIRED versions fail cleanly at manifest resolution ([[readVersion]]
    * already requires the manifest). Driver-side metadata work ∝ #files —
    * the same cost class as a commit. Returns the expired version ids.
    */
  def expireVersions(path: String, keepLast: Int): Seq[Int] = {
    require(keepLast >= 1, s"must keep at least one version, got $keepLast")
    val latest = latestVersion(path)
    val all = (0 to latest).filter(v =>
      new File(txnDir(path), s"v$v.manifest").exists())
    val (expired, kept) = all.partition(_ <= latest - keepLast)
    if (expired.nonEmpty) {
      val reachable = kept.flatMap(v => entries(path, v).map(_._2)).toSet
      val garbage = expired.flatMap(v => entries(path, v).map(_._2))
        .distinct.filterNot(reachable)
      garbage.foreach(rel => new File(path, rel).delete())
      expired.foreach(v => new File(txnDir(path), s"v$v.manifest").delete())
    }
    expired
  }
}
