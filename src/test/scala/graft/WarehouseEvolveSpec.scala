package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType, LongType, StringType}

import graft.io.Sink
import graft.sources.{WarehouseCow, WarehouseEvolve, WarehouseMeta,
  WarehouseScanStats}

/** ALTER TABLE ADD COLUMN as a zero-IO metadata commit: pre-evolution
  * files decode null-filled via their manifest `farity`, appends carry
  * the new column, every metadata serve degrades conservatively for the
  * evolved column, and refusals happen before anything mutates.
  */
class WarehouseEvolveSpec extends SparkSpec {

  private def fresh(tag: String): String =
    s"/tmp/graft_wh_evo_${tag}_${System.nanoTime()}"

  test("ADD COLUMN is zero-IO (files carry by path), old rows read NULL, " +
    "appends carry values, and time travel keeps the old schema") {
    import spark.implicits._
    val path = fresh("basic")
    val a = (0L until 100L).map(i => (i, i * 2)).toDF("k", "v")
    Sink.overwrite(a.repartition(2), path, format = "graft-warehouse")
    val m0 = WarehouseMeta.readManifest(path).get
    val gen = WarehouseEvolve.addColumn(path, "w", DoubleType)
    val m1 = WarehouseMeta.readManifest(path).get
    assert(gen === m0.generation + 1)
    assert(m1.disposition === "ADD_COLUMN")
    assert(m1.files === m0.files) // ZERO IO: identical file list
    assert(m1.files.forall(f => m1.fileArity(f) === 2))
    assert(m1.schema.fieldNames.toSeq === Seq("k", "v", "w"))
    // old rows decode the new column as NULL
    val t1 = Sink.read(spark, path, "graft-warehouse")
    assert(t1.filter(col("w").isNotNull).count() === 0L)
    assert(t1.count() === 100L)
    // append at the NEW schema; both vintages coexist
    val b = (100L until 150L).map(i => (i, i * 2, i * 0.5))
      .toDF("k", "v", "w")
    Sink.append(b, path, format = "graft-warehouse")
    val t2 = Sink.read(spark, path, "graft-warehouse")
    assert(t2.count() === 150L)
    assert(t2.filter(col("w").isNotNull).count() === 50L)
    assert(t2.agg(sum("w")).head.getDouble(0) ===
      (100L until 150L).map(_ * 0.5).sum)
    // projecting ONLY the new column across vintages works (pruned read)
    assert(t2.select("w").filter(col("w") > 60.0).count() ===
      (100L until 150L).count(_ * 0.5 > 60.0))
    // time travel: the pre-evolution generation has the OLD schema
    val old = Sink.read(spark, path, "graft-warehouse",
      Map("generation" -> m0.generation.toString))
    assert(old.schema.fieldNames.toSeq === Seq("k", "v"))
    assert(old.count() === 100L)
  }

  test("repeated evolution: files written between two ALTERs keep their " +
    "own arity (materialize-on-evolve)") {
    import spark.implicits._
    val path = fresh("twice")
    Sink.overwrite(Seq((1L, 10L)).toDF("k", "v").coalesce(1), path,
      format = "graft-warehouse")
    WarehouseEvolve.addColumn(path, "c3", LongType)
    Sink.append(Seq((2L, 20L, 3L)).toDF("k", "v", "c3").coalesce(1), path,
      format = "graft-warehouse")
    WarehouseEvolve.addColumn(path, "c4", StringType)
    Sink.append(Seq((3L, 30L, 33L, "x")).toDF("k", "v", "c3", "c4")
      .coalesce(1), path, format = "graft-warehouse")
    val m = WarehouseMeta.readManifest(path).get
    assert(m.files.map(m.fileArity).sorted === List(2, 3, 4))
    val rows = Sink.read(spark, path, "graft-warehouse")
      .orderBy("k").collect()
    assert(rows.map(r => (r.getLong(0),
      if (r.isNullAt(2)) -1L else r.getLong(2),
      if (r.isNullAt(3)) "-" else r.getString(3))).toSeq ===
      Seq((1L, -1L, "-"), (2L, 3L, "-"), (3L, 33L, "x")))
  }

  test("metadata serves degrade conservatively: aggregates on an ORIGINAL " +
    "column still serve from the manifest, on the EVOLVED column they " +
    "full-scan — both exact") {
    import spark.implicits._
    val path = fresh("serve")
    val a = (0L until 100L).map(i => (i, i * 2)).toDF("k", "v")
    Sink.overwrite(a.repartition(2), path, format = "graft-warehouse")
    WarehouseEvolve.addColumn(path, "w", LongType)
    Sink.append((100L until 120L).map(i => (i, i * 2, i * 3))
      .toDF("k", "v", "w"), path, format = "graft-warehouse")
    val t = Sink.read(spark, path, "graft-warehouse")
    // original column: stats exist on every file -> manifest serve
    val r1 = t.agg(min("k"), max("k"), count(lit(1))).collect().head
    assert(WarehouseScanStats.lastAggServed)
    assert((r1.getLong(0), r1.getLong(1), r1.getLong(2)) ===
      (0L, 119L, 120L))
    // evolved column: pre-evolution files lack its stats -> refuse the
    // serve, read data, answer exactly (NULLs don't contribute)
    val r2 = t.agg(min("w"), max("w"), count(col("w"))).collect().head
    assert(!WarehouseScanStats.lastAggServed)
    assert((r2.getLong(0), r2.getLong(1), r2.getLong(2)) ===
      (300L, 357L, 20L))
    // zone pruning on the evolved column keeps pre-evolution files
    // (conservative) and the filter is exact above the scan
    assert(t.filter(col("w") >= 330L).count() === 10L)
  }

  test("copy-on-write UPDATE across vintages decodes null-filled rows and " +
    "rewrites them at the full current schema") {
    import spark.implicits._
    val path = fresh("cow")
    Sink.overwrite((0L until 40L).map(i => (i, i)).toDF("k", "v")
      .coalesce(1), path, format = "graft-warehouse")
    WarehouseEvolve.addColumn(path, "w", LongType)
    Sink.append((40L until 80L).map(i => (i, i, i * 10))
      .toDF("k", "v", "w").coalesce(1), path, format = "graft-warehouse")
    // backfill the evolved column on the OLD vintage only
    val n = WarehouseCow.updateWhereCow(spark, path,
      org.apache.spark.sql.sources.LessThan("k", 40L),
      Map("w" -> "k * 10"))
    assert(n === 40L)
    val m = WarehouseMeta.readManifest(path).get
    val t = Sink.read(spark, path, "graft-warehouse")
    assert(t.filter(col("w").isNull).count() === 0L)
    assert(t.agg(sum("w")).head.getLong(0) === (0L until 80L).map(_ * 10).sum)
    // the rewritten file encodes the full schema now (no arity entry or
    // arity = 3), so a later read never under-decodes it
    assert(m.files.forall(f => m.fileArity(f) === 3))
  }

  test("refusals: duplicate column, unsupported type, no manifest — all " +
    "before anything mutates; post-evolution appends at the OLD schema " +
    "refuse (drift check protects the evolved shape)") {
    import spark.implicits._
    val path = fresh("refuse")
    Sink.overwrite(Seq((1L, 2L)).toDF("k", "v"), path,
      format = "graft-warehouse")
    val gen0 = WarehouseMeta.readManifest(path).get.generation
    intercept[IllegalArgumentException] {
      WarehouseEvolve.addColumn(path, "v", LongType)
    }
    intercept[IllegalArgumentException] {
      WarehouseEvolve.addColumn(path, "arr", ArrayType(LongType))
    }
    assert(WarehouseMeta.readManifest(path).get.generation === gen0)
    WarehouseEvolve.addColumn(path, "w", LongType)
    // an old-schema writer (e.g. a pre-ALTER job still running) refuses
    intercept[Exception] {
      Sink.append(Seq((9L, 9L)).toDF("k", "v"), path,
        format = "graft-warehouse")
    }
    assert(Sink.read(spark, path, "graft-warehouse").count() === 1L)
  }
}
