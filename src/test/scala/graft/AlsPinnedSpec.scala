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

  test("q35 recommendations on sf0.001 hash to the pinned fixture") {
    val rows = SparkEntry.queries("q35_als_recommend")(spark, sf)
      .select(col("user_id").cast("long"), col("item_id").cast("long"),
        round(col("predicted_rating"), 4).as("score"))
      .orderBy(col("user_id"), col("item_id"))
      .collect()
      .map(r => s"${r.getLong(0)}|${r.getLong(1)}|${r.getDouble(2)}")
      .mkString("\n")
    val hash = java.security.MessageDigest.getInstance("MD5")
      .digest(rows.getBytes("UTF-8"))
      .map(b => f"${b & 0xff}%02x").mkString
    assert(hash === PINNED, s"q35 output drifted: hash=$hash\n$rows")
  }

  // captured from two independent JVM runs on 2026-08-12; both agreed
  private val PINNED = "f6599a3d3b309040373a3b3faf5f9ba6"
}
