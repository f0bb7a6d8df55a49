package graft

import org.apache.spark.sql.functions._

/** q297's oracle join is slice-bounded BY CONSTRUCTION: the sig-frame
  * input filters vec_id < 1000 before planting the +100000 copies, and
  * MakeTenX offsets replica vec_ids past every planted namespace
  * (floor 10^8), so ladder rungs add zero rows to the staged frame and
  * the twin's banded self-join stays scale-constant. This spec pins
  * the invariant against an actually-grown corpus (VERDICT r14 #7) so
  * a future MakeTenX offset change — or a q297SigInput edit that
  * plants before slicing — cannot silently turn the oracle's join
  * corpus-sized.
  */
class Q297SliceInvariantSpec extends SparkTestBase {

  private val sfDir = "/root/testdata/sf0.01"

  test("q297 staged sig frame is scale-constant: a 10x-grown corpus " +
    "adds zero rows") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    // MakeTenX's replica geometry: copy k offsets vec_id by k * 10^8
    val grown = (1 to 9).foldLeft(emb) { (acc, k) =>
      acc.unionByName(emb.select(
        (col("vec_id") + 100000000L * k).as("vec_id"), col("embedding")))
    }
    val baseRows = SparkEntry.q297SigInput(emb).count()
    val grownRows = SparkEntry.q297SigInput(grown).count()
    info(s"sig frame rows: base=$baseRows grown10x=$grownRows")
    // |slice| + 50 planted copies, and ≤ 1050 for ANY corpus
    assert(baseRows <= 1050L, s"slice invariant ceiling broken: $baseRows")
    assert(grownRows === baseRows,
      s"grown corpus changed the staged sig frame ($baseRows → " +
        s"$grownRows) — the oracle join is no longer scale-constant")
  }
}
