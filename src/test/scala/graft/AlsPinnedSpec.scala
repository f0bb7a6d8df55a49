package graft

import org.apache.spark.sql.functions._

/** Pins the EXACT q35 output on the sf0.001 fixture.
  *
  * q35 is permanently rows-only at the driver (an ALS model has no
  * DuckDB-expressible oracle), so this spec is its regression gate: a
  * seeded model on fixed data with fixed partitioning is deterministic,
  * and any change to the training pipeline, the seed plumbing, or the
  * top-k unpack shows up as a hash change here. Scores are rounded to
  * 4 dp before hashing — coarse enough to survive benign float-order
  * noise, fine enough that a real model change (different factors,
  * different ranking) cannot hide.
  */
class AlsPinnedSpec extends SparkTestBase {

  private def md5(rows: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(rows.getBytes("UTF-8"))
      .map(b => f"${b & 0xff}%02x").mkString

  test("q35 recommendations on sf0.001 hash to the pinned fixture") {
    val rows = SparkEntry.queries("q35_als_recommend")(spark, sf)
      .select(col("user_id").cast("long"), col("item_id").cast("long"),
        round(col("predicted_rating"), 4).as("score"))
      .orderBy(col("user_id"), col("item_id"))
      .collect()
      .map(r => s"${r.getLong(0)}|${r.getLong(1)}|${r.getDouble(2)}")
      .mkString("\n")
    val hash = md5(rows)
    assert(hash === PINNED, s"q35 output drifted: hash=$hash\n$rows")
  }

  // captured from two independent JVM runs on 2026-08-13 (500-item
  // vocabulary); both agreed
  private val PINNED = "206a02a6f3c6710743be85b31ee2605e"

  test("q117 implicit-ALS similar items on sf0.001 hash to the pinned " +
    "fixture") {
    // q117's regression gate (same rationale as q35: implicit ALS item
    // factors have no DuckDB-expressible oracle; a seeded model on fixed
    // data with fixed blocks is deterministic). Cosines are re-rounded
    // to 3 dp before hashing — factor floats carry more run-to-run ulp
    // noise than prediction scores; rank (exact-compare ordering) plus
    // 3-dp cosine still cannot hide a real model or ranking change.
    val rows = SparkEntry.queries("q117_similar_items_implicit")(spark, sf)
      .select(col("item_id").cast("long"),
        col("similar_item_id").cast("long"),
        col("rank").cast("long"), round(col("cos"), 3).as("cos"))
      .orderBy(col("item_id"), col("rank"))
      .collect()
      .map(r => s"${r.getLong(0)}|${r.getLong(1)}|${r.getLong(2)}|${r.getDouble(3)}")
      .mkString("\n")
    val hash = md5(rows)
    assert(hash === PINNED_Q117, s"q117 output drifted: hash=$hash\n$rows")
  }

  // captured from two independent JVM runs on 2026-08-13 (500-item
  // vocabulary); both agreed
  private val PINNED_Q117 = "b66c8d7a1b0ff97bfaa559db58dfbaf0"
}
