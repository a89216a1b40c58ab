package graft.sources

import java.io.{DataInputStream, DataOutputStream}

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.sources.{EqualNullSafe, EqualTo, Filter, In}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-file BLOOM FILTER file skipping (round-14): zone maps prune RANGE
  * predicates, but a point lookup on a high-cardinality, non-clustered
  * column (find one doc_id across a hundred thousand files) overlaps
  * every file's [min,max] — the classic warehouse gap that parquet
  * row-group bloom filters / Iceberg puffin blobs exist to close. The
  * warehouse analog:
  *
  *  - the load job's task writers stream each indexed column's values
  *    into a fixed-size split-free bloom (k=5 double-hashed probes over
  *    a 64-bit value hash), zero extra passes;
  *  - each data file commits an immutable `<file>.bloom` SIDECAR next to
  *    it (the manifest stays text-thin: one `fbloom=` line per file/col,
  *    bits live in the sidecar — the puffin-blob shape, not manifest
  *    bloat);
  *  - the scan consults sidecars ON THE DRIVER for `=` / `IN` / `<=>`
  *    filters — including the RUNTIME (DPP) key sets a broadcast join
  *    hands the scan — pruning whole files zone maps cannot
  *    (a parsed-sidecar LRU makes repeat scans metadata-cheap);
  *  - false positives only KEEP a file (correctness never depends on the
  *    bloom); absent sidecars, unsupported types, and NULL probes all
  *    degrade to "might match".
  *
  * The bloom config (`bloomFilters` columns + `bloomBits`) is
  * table-sticky like `clusterBy`: appends and CoW rewrites inherit it
  * from the manifest, so maintenance keeps the index alive. Size
  * `bloomBits` to ~10x the expected distinct values per file (the
  * default 2^20 bits = 128 KiB serves ~100k distinct at ~1% false
  * positives); an undersized bloom silently prunes less, never wrong.
  */
object WarehouseBloom {

  val K = 5
  val DefaultBits = 1 << 20

  /** splitmix64 finalizer — a full-avalanche 64-bit mix. */
  def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** FNV-1a 64 over bytes, then mixed (FNV alone clusters low bits). */
  def hashBytes(b: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < b.length) {
      h = (h ^ (b(i) & 0xff)) * 0x100000001b3L
      i += 1
    }
    mix64(h)
  }

  def supported(dt: DataType): Boolean = dt match {
    case LongType | IntegerType | StringType => true
    case _ => false
  }

  private def setBit(words: Array[Long], h: Long): Unit = {
    val bit = java.lang.Long.remainderUnsigned(h, words.length.toLong * 64)
    words((bit >>> 6).toInt) |= 1L << (bit & 63)
  }

  private def getBit(words: Array[Long], h: Long): Boolean = {
    val bit = java.lang.Long.remainderUnsigned(h, words.length.toLong * 64)
    (words((bit >>> 6).toInt) & (1L << (bit & 63))) != 0
  }

  def add(words: Array[Long], valueHash: Long): Unit = {
    val h2 = mix64(valueHash) | 1L
    var i = 0
    while (i < K) { setBit(words, valueHash + i * h2); i += 1 }
  }

  def mightContain(words: Array[Long], valueHash: Long): Boolean = {
    val h2 = mix64(valueHash) | 1L
    var i = 0
    while (i < K) {
      if (!getBit(words, valueHash + i * h2)) return false
      i += 1
    }
    true
  }

  /** The 64-bit value hash of a pushed-filter constant, in the SAME
    * canonical form the writer hashed (long value for integral columns,
    * UTF-8 bytes for strings). None = unhashable (null or a type this
    * index doesn't cover) → caller must treat as "might match".
    */
  def hashFilterValue(v: Any, dt: DataType): Option[Long] = (v, dt) match {
    case (null, _) => None
    case (l: java.lang.Long, LongType) => Some(mix64(l))
    case (i: java.lang.Integer, IntegerType) => Some(mix64(i.toLong))
    case (i: java.lang.Integer, LongType) => Some(mix64(i.toLong))
    case (l: java.lang.Long, IntegerType) => Some(mix64(l))
    case (s: String, StringType) => Some(hashBytes(s.getBytes("UTF-8")))
    case (s: UTF8String, StringType) => Some(hashBytes(s.getBytes))
    case _ => None
  }

  // ------------------------------------------------------------- sidecar IO

  private val Magic = 0x47424c4d // "GBLM"

  def sidecarPath(dataFile: String): String = s"$dataFile.bloom"

  def writeSidecar(fs: FileSystem, path: String,
      blooms: Seq[(String, Array[Long])]): Unit = {
    val out = new DataOutputStream(
      new java.io.BufferedOutputStream(fs.create(new Path(path), true)))
    try {
      out.writeInt(Magic)
      out.writeInt(blooms.size)
      blooms.foreach { case (col, words) =>
        out.writeUTF(col)
        out.writeInt(K)
        out.writeInt(words.length)
        words.foreach(out.writeLong)
      }
    } finally out.close()
  }

  /** Parsed-sidecar LRU: sidecars are immutable once committed (every
    * rewrite lands at a fresh jobId path), so caching by absolute path
    * is safe; the bound keeps a long-lived driver from accumulating one
    * bitset per file ever scanned.
    */
  private val MaxCached = 256
  private val cache =
    new java.util.LinkedHashMap[String, Map[String, Array[Long]]](
      64, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, Map[String, Array[Long]]]) =
        size() > MaxCached
    }

  def readSidecar(fs: FileSystem, path: String): Map[String, Array[Long]] = {
    cache.synchronized {
      val hit = cache.get(path)
      if (hit != null) return hit
    }
    val in = new DataInputStream(
      new java.io.BufferedInputStream(fs.open(new Path(path))))
    val m =
      try {
        require(in.readInt() == Magic, s"not a bloom sidecar: $path")
        val n = in.readInt()
        (0 until n).map { _ =>
          val col = in.readUTF()
          val k = in.readInt()
          require(k == K, s"bloom sidecar $path: k=$k, expected $K")
          val words = Array.fill(in.readInt())(in.readLong())
          col -> words
        }.toMap
      } finally in.close()
    cache.synchronized { cache.put(path, m) }
    m
  }

  // -------------------------------------------------------- scan-side prune

  /** True iff `file` might hold a row matching EVERY point filter the
    * sidecar indexes; false proves the file cannot match (safe to skip).
    * Conservative everywhere: no sidecar / no indexed column / other
    * filter shapes → true.
    */
  def mightMatchFile(root: String, file: String, cols: Seq[String],
      schema: StructType, filters: Iterable[Filter]): Boolean = {
    if (cols.isEmpty) return true
    val pointy = filters.exists {
      case EqualTo(c, _) => cols.contains(c)
      case EqualNullSafe(c, v) => v != null && cols.contains(c)
      case In(c, vs) => cols.contains(c) && vs.nonEmpty
      case _ => false
    }
    if (!pointy) return true
    val words =
      try readSidecar(WarehouseMeta.fs(root),
        sidecarPath(s"$root/$file"))
      catch {
        // a missing/corrupt sidecar degrades to "might match" — the
        // bloom is an index, never a correctness dependency
        case scala.util.control.NonFatal(_) => return true
      }
    def dt(c: String): Option[DataType] =
      schema.fields.find(_.name == c).map(_.dataType)
    filters.forall {
      case EqualTo(c, v) => probe(words, c, v, dt(c))
      case EqualNullSafe(c, v) if v != null => probe(words, c, v, dt(c))
      case In(c, vs) if vs.nonEmpty =>
        words.get(c) match {
          case None => true
          case Some(w) => vs.exists { v =>
            dt(c).flatMap(hashFilterValue(v, _)) match {
              case Some(h) => mightContain(w, h)
              case None => true // unhashable element might match
            }
          }
        }
      case _ => true
    }
  }

  private def probe(words: Map[String, Array[Long]], c: String, v: Any,
      dt: Option[DataType]): Boolean =
    words.get(c) match {
      case None => true
      case Some(w) => dt.flatMap(hashFilterValue(v, _)) match {
        case Some(h) => mightContain(w, h)
        case None => true
      }
    }
}
