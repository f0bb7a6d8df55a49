package graft

class EntrySpec extends SparkTestBase {

  test("flagship entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every declared query has an oracle or is explicitly rows-only") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    // rows-only queries (non-SQL-expressible) are allowed but tracked here
    assert(missing.forall(n => SparkEntry.rowsOnly.contains(n)),
      s"queries without oracle or rowsOnly tag: ${missing -- SparkEntry.rowsOnly}")
    assert((SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet).isEmpty,
      "oracle entries without a query")
  }

  test("short qNN prefixes are unique across declared queries") {
    // every bench artifact and CountQ's tiered resolution key on the
    // short prefix ("q29" for q29_fingerprint); a duplicate would emit
    // colliding JSON keys in Bench's per-query maps and silently
    // reintroduce nondeterministic name resolution (ADVICE r16)
    val dup = SparkEntry.queries.keys.toSeq
      .groupBy(_.takeWhile(_ != '_')).filter(_._2.size > 1)
    assert(dup.isEmpty, s"duplicate short prefixes: $dup")
  }

  // The co-engagement graph family is legitimately EMPTY at sf0.001:
  // 15 users share no item pair under the ≥2-user support floor — the
  // corpus-scaled threshold doing its job on a corpus with no repeated
  // co-engagement, not a broken pipeline. Their non-emptiness gates
  // live where the graph is real: the sf0.01 oracle (driver CORRECTNESS)
  // and the sf0.1 bench empty-result tripwire (Bench.scala).
  // (q96/q175 stay out: their COUNT/corr rows exist even over zero edges;
  // q204/q205 need a degree-2 node, q206/q207 an edge — none at sf0.001)
  private val emptyAtTinySf = Set("q83_cooccurrence", "q86_pagerank",
    "q100_label_communities", "q141_bfs_hops", "q174_pagerank_weighted",
    "q202_kcore", "q204_adamic_adar", "q205_clustering_coeff",
    "q206_modularity", "q207_neighbor_jaccard",
    "q233_cooccurrence_chi2")

  test("all queries execute and return rows on sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      assert(n >= 0, s"$name failed")
      withClue(s"$name returned 0 rows: ") {
        assert(n > 0 || name.contains("empty") || emptyAtTinySf(name))
      }
    }
  }

  test("stagedFrame builds at most once per source fingerprint and " +
    "serves a parquet scan after") {
    // the amortized-setup contract the pair lists / codebook rely on: a
    // second call with the same (source, tag) must NOT re-run the
    // builder (it may not run at all if a previous test session staged
    // the same fingerprint — /tmp persists)
    var builds = 0
    def call() =
      SparkEntry.stagedFrame(spark, sf, "documents", "spec_stage_probe") {
        builds += 1
        sources.Tables.load(spark, sf, "documents")
          .select(org.apache.spark.sql.functions.col("doc_id")).limit(5)
      }
    assert(call().count() === 5L)
    assert(call().count() === 5L)
    assert(builds <= 1, s"builder ran $builds times")
  }
}
