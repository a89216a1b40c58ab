package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** CHANGE DATA FEED over the warehouse generation log (round-14): what
  * changed between two committed generations, as rows tagged
  * `_change_type` (Delta-CDF vocabulary: insert / delete /
  * update_preimage / update_postimage) and `_commit_generation`.
  *
  * The feed is derived METADATA-FIRST from manifest diffs — no
  * write-time change journal, no extra storage:
  *
  *  - append commits: the added files ARE the inserts (read only them);
  *  - metadata DELETE: the removed files ARE the deletes (still on disk
  *    — time travel holds every committed generation readable);
  *  - logical TRUNCATE: removed files → delete, added files → insert;
  *  - copy-on-write commits (`UPDATE_COW`, `DELETE_COW`, `MERGE`): the
  *    row-level delta is the multiset difference between the removed
  *    files' rows and the added files' rows (`EXCEPT ALL` both ways) —
  *    carried files never read, so the diff costs IO proportional to
  *    what the CoW op actually rewrote, never the table;
  *  - row-preserving commits (`OPTIMIZE`, `ADD_COLUMN`,
  *    `RENAME_COLUMN`): emit NOTHING (rows moved or were relabeled, no
  *    row changed).
  *
  * `MERGE` commits interleave inserts, updates, and deletes in one
  * rewrite; splitting the two diffs into the four change types needs the
  * merge key, so [[tableChanges]] REFUSES a MERGE generation unless
  * `keyCols` is given (then: pre-rows whose key survives are
  * update_preimage, vanished keys are delete; post-rows with a pre key
  * are update_postimage, new keys are insert).
  *
  * Rows from pre-evolution generations align to the TARGET generation's
  * schema BY POSITION (evolution only appends or renames; the appended
  * tail fills with the column DEFAULT exactly as a batch read would), so
  * the feed has one uniform schema even across ALTERs.
  *
  * At 100 TB: the per-generation cost is the delta files' IO plus one
  * bounded `EXCEPT ALL` shuffle per CoW commit — the feed of a day of
  * commits against a petabyte table reads the day's files, not the
  * petabyte.
  */
object WarehouseCdc {

  /** DESCRIBE HISTORY for a warehouse table: one row per RETAINED
    * generation (oldest first) with its disposition, file count, exact
    * live row count when every file carries one, and commit time (the
    * manifest's mtime — written once, atomically renamed). Metadata-only:
    * O(generations) manifest reads, zero data IO, served through the
    * parse cache a long-lived driver already holds.
    */
  def history(spark: SparkSession, root: String): DataFrame = {
    val fs = WarehouseMeta.fs(root)
    val rows = WarehouseMeta.generations(root).sorted.map { g =>
      val m = WarehouseMeta.readManifest(root, Some(g)).get
      val live =
        if (m.files.forall(f => m.liveRows(f).isDefined))
          m.files.map(f => m.liveRows(f).get).sum
        else -1L
      val ts = fs.getFileStatus(new org.apache.hadoop.fs.Path(root,
        s"_manifest/manifest-$g")).getModificationTime
      (g, m.jobId, m.disposition, m.files.size.toLong, live,
        new java.sql.Timestamp(ts))
    }
    spark.createDataFrame(rows).toDF("generation", "job_id",
      "disposition", "n_files", "n_live_rows", "committed_at")
  }

  val ChangeTypeCol = "_change_type"
  val GenerationCol = "_commit_generation"

  /** The CDC meta columns a `readChangeFeed` scan appends after the data
    * columns. */
  val MetaFields: Array[org.apache.spark.sql.types.StructField] = Array(
    org.apache.spark.sql.types.StructField(ChangeTypeCol,
      org.apache.spark.sql.types.StringType, nullable = false),
    org.apache.spark.sql.types.StructField(GenerationCol,
      org.apache.spark.sql.types.LongType, nullable = false))

  private val RowPreserving = Set("OPTIMIZE", "ADD_COLUMN", "RENAME_COLUMN")

  private def manifestAt(root: String, g: Long): Manifest =
    try WarehouseMeta.readManifest(root, Some(g)).get
    catch {
      case e: IllegalArgumentException => throw new IllegalStateException(
        s"change feed needs generation $g of $root but it no longer " +
          "exists (VACUUM expired it) — changes can only be served for " +
          s"retained generations [${e.getMessage}]", e)
    }

  /** Align `df` (rows read at some historical generation) to the target
    * schema by POSITION: names take the target's (RENAME-safe), missing
    * trailing columns fill with the target's DEFAULT (or NULL) exactly
    * as the batch reader fills a low-arity file.
    */
  private def align(df: DataFrame, target: Manifest): DataFrame = {
    val have = df.schema.fields
    target.schema.fields.take(have.length).zipWithIndex.foreach {
      case (f, i) => require(have(i).dataType == f.dataType,
        s"generation schema drift at column $i: ${have(i).name}:" +
          s"${have(i).dataType.simpleString} cannot align to ${f.name}:" +
          s"${f.dataType.simpleString}")
    }
    val cols = target.schema.fields.zipWithIndex.map { case (f, i) =>
      if (i < have.length) col(have(i).name).as(f.name)
      else target.defaults.get(f.name)
        .map(d => expr(d).cast(f.dataType).as(f.name))
        .getOrElse(lit(null).cast(f.dataType).as(f.name))
    }
    df.select(cols.toIndexedSeq: _*)
  }

  /** Changes introduced by generations `sinceGen+1 .. toGen` (the stream
    * offset convention: `sinceGen` is the last generation the consumer
    * has; `sinceGen = -1` replays the whole history). Output =
    * target-generation schema + `_change_type` + `_commit_generation`.
    */
  def tableChanges(spark: SparkSession, root: String, sinceGen: Long,
      toGen: Long, keyCols: Seq[String] = Nil): DataFrame = {
    require(sinceGen <= toGen,
      s"sinceGen $sinceGen must be <= toGen $toGen")
    val target = manifestAt(root, toGen)
    def readAt(g: Long, files: Seq[String]): DataFrame = align(
      spark.read.format("graft-warehouse")
        .option("path", root).option("generation", g.toString)
        .option("files", files.mkString(",")).load(), target)
    def tag(df: DataFrame, tpe: String, g: Long): DataFrame =
      df.withColumn(ChangeTypeCol, lit(tpe))
        .withColumn(GenerationCol, lit(g))
    val empty = tag(readAt(toGen, Nil).limit(0), "insert", 0L).limit(0)
    var prevM: Option[Manifest] =
      if (sinceGen < 0) None else Some(manifestAt(root, sinceGen))
    val parts = List.newBuilder[DataFrame]

    /** Rows a DELETE_DV commit newly marked in `f`: read the file under
      * an INVERTED diff bitmap (skip everything EXCEPT the newly-marked
      * ordinals) — the deletes stream straight off the file, no ordinal
      * ever materializes on the driver. The temp bitmap lives under an
      * unreferenced data dir, so VACUUM collects it. */
    def newlyMarked(g: Long, f: String, newRel: String,
        oldRel: Option[String]): DataFrame = {
      val fs = WarehouseMeta.fs(root)
      val newW = WarehouseDv.read(fs, s"$root/$newRel")
      val oldW = oldRel.map(p => WarehouseDv.read(fs, s"$root/$p"))
        .getOrElse(new Array[Long](newW.length))
      val skip = Array.tabulate(newW.length) { i =>
        val old = if (i < oldW.length) oldW(i) else 0L
        ~(newW(i) & ~old)
      }
      val rel = s"data/cdcdiff_${java.util.UUID.randomUUID()
        .toString.take(8)}/diff.dv"
      WarehouseDv.write(fs, s"$root/$rel", skip)
      align(spark.read.format("graft-warehouse")
        .option("path", root).option("generation", g.toString)
        .option("files", f).option("dvOverride", s"$f::$rel")
        .load(), target)
    }

    var g = sinceGen + 1
    while (g <= toGen) {
      val m = manifestAt(root, g)
      val prevFiles = prevM.map(_.files.toSet).getOrElse(Set.empty)
      val added = m.files.filterNot(prevFiles)
      val removed = prevFiles.toList.filterNot(m.files.toSet)
      if (m.disposition == "DELETE_DV" || m.disposition == "UPDATE_MOR") {
        val isUpdate = m.disposition == "UPDATE_MOR"
        // full-drop leg (DELETE_DV files whose every live row matched)
        if (removed.nonEmpty)
          parts += tag(readAt(g - 1, removed), "delete", g)
        // vector leg: each changed bitmap's newly-marked rows are the
        // deletes (or the update pre-images)
        val prevDvs = prevM.map(_.dvs).getOrElse(Map.empty)
        m.dvs.foreach { case (f, (p, _)) =>
          if (!prevDvs.get(f).exists(_._1 == p))
            parts += tag(newlyMarked(g, f, p, prevDvs.get(f).map(_._1)),
              if (isUpdate) "update_preimage" else "delete", g)
        }
        // append leg (UPDATE_MOR): the re-written rows are post-images
        if (added.nonEmpty)
          parts += tag(readAt(g, added),
            if (isUpdate) "update_postimage" else "insert", g)
      } else if (!RowPreserving(m.disposition)) (added.nonEmpty, removed.nonEmpty) match {
        case (true, false) =>
          parts += tag(readAt(g, added), "insert", g)
        case (false, true) =>
          parts += tag(readAt(g - 1, removed), "delete", g)
        case (true, true) if m.disposition == "WRITE_TRUNCATE" =>
          // a logical truncate REPLACES the table: full delete + insert,
          // no row-level diff (the before/after sets are unrelated)
          parts += tag(readAt(g - 1, removed), "delete", g)
          parts += tag(readAt(g, added), "insert", g)
        case (true, true) =>
          val pre = readAt(g - 1, removed)
          val post = readAt(g, added)
          // rows a CoW rewrite CARRIED INSIDE rewritten files cancel
          // here — only genuinely changed rows survive the diffs
          val preD = pre.exceptAll(post)
          val postD = post.exceptAll(pre)
          m.disposition match {
            case "DELETE_COW" =>
              parts += tag(preD, "delete", g) // postD provably empty
            case "UPDATE_COW" =>
              parts += tag(preD, "update_preimage", g)
              parts += tag(postD, "update_postimage", g)
            case "MERGE" =>
              require(keyCols.nonEmpty,
                s"generation $g of $root is a MERGE commit — its diff " +
                  "interleaves inserts, updates, and deletes; pass " +
                  "keyCols to classify them")
              val missing = keyCols.filterNot(target.schema.fieldNames.contains)
              require(missing.isEmpty,
                s"keyCols not in table schema: ${missing.mkString(",")}")
              val ks = keyCols.map(col)
              parts += tag(preD.join(postD.select(ks: _*).distinct(),
                keyCols, "left_semi"), "update_preimage", g)
              parts += tag(preD.join(postD.select(ks: _*).distinct(),
                keyCols, "left_anti"), "delete", g)
              parts += tag(postD.join(pre.select(ks: _*).distinct(),
                keyCols, "left_semi"), "update_postimage", g)
              parts += tag(postD.join(pre.select(ks: _*).distinct(),
                keyCols, "left_anti"), "insert", g)
            case other => throw new IllegalStateException(
              s"generation $g of $root has disposition $other with both " +
                "added and removed files — the change feed cannot " +
                "classify it")
          }
        case (false, false) => () // pure-metadata commit, no row change
      }
      prevM = Some(m)
      g += 1
    }
    parts.result() match {
      case Nil => empty
      case head :: tail => tail.foldLeft(head)(_.union(_))
    }
  }
}
