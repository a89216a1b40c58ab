package graft

import graft.core.Tables
import graft.ops.Clustering

/** Lloyd k-means: partition-of-corpus invariants and the decimal-exact
  * determinism claim (same result under a different physical partitioning).
  */
class ClusteringSpec extends SparkSpec {

  test("clusters partition the corpus and result is repartition-stable") {
    val emb = Tables.read(spark, sf, "embeddings")
    val out = Clustering.kmeansLloyd(emb, k = 4, iters = 2).collect()
    assert(out.length == 4)
    assert(out.map(_.getLong(1)).sum == emb.count())
    assert(out.forall(_.getDouble(2) > 0))

    // decimal-exact scoring ⇒ identical output when the input is split
    // across a different partition count (no float partial-sum drift)
    val out2 = Clustering.kmeansLloyd(emb.repartition(7), k = 4, iters = 2)
      .collect()
    assert(out.map(_.toSeq).toSeq == out2.map(_.toSeq).toSeq)
  }
}
