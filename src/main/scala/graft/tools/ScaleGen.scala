package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-up generator for the PLANS.md scaling study: derives an sf×N
  * dataset from a driver-provided SF by replicating every SCALING table N
  * times with consistent key shifts — the TPC-H scaling model (facts AND
  * customer/supplier/part grow with SF; region/nation stay fixed), so
  * joins, graphs, and group cardinalities scale self-similarly instead of
  * piling N copies onto the same keys.
  *
  * Two tables need more than a key shift to stay self-similar:
  *   - documents: replica r > 0 remaps every whitespace token through a
  *     length-preserving md5 rename. A plain copy would make every doc an
  *     EXACT 10-way duplicate — minhash/LSH banding would then measure an
  *     artificial 45×-denser candidate graph, not the engine's scaling.
  *     A per-replica token bijection preserves the token-frequency shape
  *     (dedup/BPE/postings workloads) with zero cross-replica shingle
  *     collisions.
  *   - embeddings: replica r > 0 adds a deterministic hash-derived jitter
  *     (±0.05 per dim) so ANN buckets don't fill with N exact copies.
  *
  * Usage: ScaleGen [srcDir] [dstDir] [factor] [dense]. Writes
  * dstDir/<t>.parquet directories readable by graft.core.Tables like the
  * driver's layout.
  *
  * Key layout modes (round-8, the byte-audit density control):
  *   - default (shift): replica keys are `key + r·10⁸`. Simple, but the
  *     high-bit entropy of shifted keys compresses WORSE under LZ4 than
  *     the base corpus' dense keys — the round-7 market-basket audit
  *     measured 26% of an apparent 12.6× byte growth as exactly this
  *     serialization-density artifact, not plan growth.
  *   - `dense`: replica keys are `key·factor + r` — unique, order- and
  *     distribution-preserving, and only log₂(factor) bits wider than
  *     the base domain, so exchange bytes/row stay comparable across
  *     scale legs and audit ratios isolate PLAN growth. Also keeps every
  *     key far inside the 2³¹ packPair bound at any factor (the shift
  *     scheme crosses it at factor ≈ 21).
  */
object ScaleGen {

  private val Shift = 100000000L // key shift per replica: 1e8 clears
  // every base-key domain (orderkeys at sf0.1 reach ~6e5) and keeps
  // shifted keys well inside int64 for the hash/bucket paths.

  def main(args: Array[String]): Unit = {
    val src = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val dst = args.lift(1).getOrElse("/tmp/graft_sf1")
    val factor = args.lift(2).map(_.toInt).getOrElse(10)
    val dense = args.lift(3).contains("dense")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // through the catalog: events.ts is parquet TIMESTAMP(NANOS), which
    // only Tables.read's nanosAsLong + rebuild path maps losslessly
    def read(t: String): DataFrame = graft.core.Tables.read(spark, src, t)
    def write(df: DataFrame, t: String, parts: Int): Unit =
      df.repartition(parts).write.mode("overwrite")
        .parquet(s"$dst/$t.parquet")

    // cross the base table with replica ids 0..factor-1
    def rep(df: DataFrame): DataFrame =
      df.crossJoin(
        spark.range(factor.toLong).select(col("id").as("r")))
    def shifted(c: String): org.apache.spark.sql.Column =
      if (dense) col(c) * factor + col("r")
      else col(c) + col("r") * Shift

    // fixed dims: straight copy
    for (t <- Seq("region", "nation")) write(read(t), t, 1)

    write(rep(read("supplier"))
      .withColumn("s_suppkey", shifted("s_suppkey")).drop("r"),
      "supplier", 4)
    write(rep(read("customer"))
      .withColumn("c_custkey", shifted("c_custkey")).drop("r"),
      "customer", 4)
    write(rep(read("part"))
      .withColumn("p_partkey", shifted("p_partkey")).drop("r"),
      "part", 4)

    write(rep(read("orders"))
      .withColumn("o_orderkey", shifted("o_orderkey"))
      .withColumn("o_custkey", shifted("o_custkey")).drop("r"),
      "orders", 32)
    write(rep(read("lineitem"))
      .withColumn("l_orderkey", shifted("l_orderkey"))
      .withColumn("l_partkey", shifted("l_partkey"))
      .withColumn("l_suppkey", shifted("l_suppkey")).drop("r"),
      "lineitem", 32)
    // ts goes back out as int64 NANOS (a plain long column) so the
    // catalog's events rebuild (`ts div 1000` → timestamp_micros) reads
    // the scaled dir exactly like the driver's layout
    write(rep(read("events"))
      .withColumn("event_id", shifted("event_id"))
      .withColumn("user_id", shifted("user_id"))
      .withColumn("ts", expr("unix_micros(ts) * 1000")).drop("r"),
      "events", 32)

    // documents: per-replica token bijection (length-preserving so char
    // statistics hold); replica 0 is the original corpus verbatim
    val remappedText = array_join(
      transform(split(col("text"), "\\s+"), w =>
        when(col("r") === 0 || length(w) === 0, w).otherwise(
          md5(concat_ws("|", w, col("r")))
            .substr(lit(1), greatest(length(w), lit(1))))),
      " ")
    write(rep(read("documents"))
      .withColumn("doc_id", shifted("doc_id"))
      .withColumn("text", remappedText)
      .withColumn("n_chars", length(col("text")).cast("long"))
      .drop("r"),
      "documents", 16)

    // embeddings: deterministic jitter off the (vec_id, dim, replica) hash
    val jittered = transform(col("embedding"), (x, i) =>
      when(col("r") === 0, x).otherwise(
        (x + (pmod(hash(col("vec_id"), i, col("r")), lit(1024)) - 512)
          .cast("float") / lit(10000f)).cast("float")))
    write(rep(read("embeddings"))
      .withColumn("vec_id", shifted("vec_id"))
      .withColumn("embedding", jittered)
      .drop("r"),
      "embeddings", 8)

    println(s"scaled $src -> $dst x$factor")
    spark.stop()
  }
}
