package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{EqualTo, GreaterThanOrEqual, LessThan}

import graft.io.Sink
import graft.sources.{WarehouseDelete, WarehouseMeta}

/** Metadata-only DELETE: provable file drops commit a new generation,
  * partial predicates refuse (copy-on-write territory), old generations
  * stay time-travel readable, and the deleted-row count is exact.
  */
class WarehouseDeleteSpec extends SparkSpec {

  private def fresh(tag: String): String =
    s"/tmp/graft_wh_del_${tag}_${System.nanoTime()}"

  test("a cluster-key equality delete drops whole files exactly") {
    import spark.implicits._
    val path = fresh("eq")
    val df = (0L until 100L).map(i => (i, i % 4)).toDF("k", "bucket")
    Sink.overwrite(df.repartition(4, col("bucket")), path,
      format = "graft-warehouse", options = Map("clusterBy" -> "bucket"))
    val gen0 = WarehouseMeta.readManifest(path).get.generation
    val deleted = WarehouseDelete.deleteWhere(path, EqualTo("bucket", 2L))
    assert(deleted === 25L)
    val m = WarehouseMeta.readManifest(path).get
    assert(m.generation === gen0 + 1 && m.disposition === "DELETE")
    val rest = Sink.read(spark, path, "graft-warehouse")
    assert(rest.count() === 75L)
    assert(rest.filter(col("bucket") === 2L).count() === 0L)
    // time travel: the pre-delete generation still reads every row
    assert(Sink.read(spark, path, "graft-warehouse",
      Map("generation" -> gen0.toString)).count() === 100L)
  }

  test("a range delete over range-clustered files drops the provable " +
    "prefix; a partial range refuses and leaves the table untouched") {
    import spark.implicits._
    val path = fresh("range")
    // 4 range files over k = 0..399: [0,99] [100,199] [200,299] [300,399]
    val df = (0L until 400L).map(i => (i, i * 2)).toDF("k", "v")
    Sink.overwrite(df.repartitionByRange(4, col("k")), path,
      format = "graft-warehouse")
    // k < 200 covers files 1-2 exactly -> provable
    assert(WarehouseDelete.deleteWhere(path, LessThan("k", 200L)) === 200L)
    assert(Sink.read(spark, path, "graft-warehouse").count() === 200L)
    val genAfter = WarehouseMeta.readManifest(path).get.generation
    // k >= 250 splits the [200,299] file -> refuse, nothing changes
    intercept[IllegalArgumentException] {
      WarehouseDelete.deleteWhere(path, GreaterThanOrEqual("k", 250L))
    }
    assert(WarehouseMeta.readManifest(path).get.generation === genAfter)
    assert(Sink.read(spark, path, "graft-warehouse").count() === 200L)
  }

  test("a delete matching nothing is a provable no-op generation") {
    import spark.implicits._
    val path = fresh("noop")
    val df = (0L until 50L).map(i => (i, i % 2)).toDF("k", "b")
    Sink.overwrite(df, path, format = "graft-warehouse")
    assert(WarehouseDelete.deleteWhere(path, EqualTo("k", 999L)) === 0L)
    assert(Sink.read(spark, path, "graft-warehouse").count() === 50L)
  }
}
