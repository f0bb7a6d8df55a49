package graft

import org.apache.spark.sql.functions._
import graft.ext.TextOps

class TextOpsSpec extends SparkTestBase {
  import spark.implicits._

  test("tokenCount counts whitespace tokens, subwordCount splits further") {
    val df = Seq("Hello world", "one  two\tthree", "x9y").toDF("text")
      .select(TextOps.tokenCount($"text").as("n"),
        TextOps.subwordCount($"text").as("s"))
    val rows = df.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows(0) === ((2L, 2L)))
    assert(rows(1)._1 === 3L)
    assert(rows(2) === ((1L, 3L))) // x | 9 | y at letter/digit boundaries
  }

  test("langId identifies each stopword language and falls back to 'und'") {
    val samples = Seq(
      ("the cat sat on the mat and it is that", "en"),
      ("el perro y la casa que es por un", "es"),
      ("le chien et la maison est pour une", "fr"),
      ("der hund und die katze ist ein von", "de"),
      ("qqq www zzz", "und"))
    val out = samples.toDF("text", "expected")
      .select($"expected", TextOps.langId($"text").as("got"))
      .collect()
    out.foreach(r => assert(r.getString(1) === r.getString(0), r.toString))
  }

  test("shingles builds distinct token n-grams") {
    val got = Seq("a b c d e").toDF("text")
      .select(TextOps.shingles($"text", 3).as("sh"))
      .as[Seq[String]].head()
    assert(got === Seq("a b c", "b c d", "c d e"))
  }

  test("shinglesFromTokens on short docs yields NO shingles (oracle parity)") {
    // SQL engines building the n-gram positionally null the concatenation
    // on out-of-bounds t[i+k] and drop it via list_distinct — a truncated
    // shingle here would silently diverge dedup stats on 1-2 token docs
    val got = Seq("a b", "a", "a b c").toDF("text")
      .withColumn("toks", TextOps.tokens($"text"))
      .select(TextOps.shinglesFromTokens($"toks", 3).as("sh"))
      .as[Seq[String]].collect().toSeq
    assert(got === Seq(Seq.empty, Seq.empty, Seq("a b c")))
    // and the codegen ShingleHashes expression agrees bit-for-bit
    val expr = Seq("a b", "a").toDF("text")
      .select(graft.functions.ShingleHashes($"text", 3).as("h"))
      .as[Seq[Long]].collect().toSeq
    assert(expr === Seq(Seq.empty, Seq.empty))
  }

  test("fingerprint: equal texts agree; near-dups share most of the sketch") {
    val df = Seq(
      (1, "the quick brown fox jumps over the lazy dog again and again"),
      (2, "the quick brown fox jumps over the lazy dog again and again"),
      (3, "the quick brown fox jumps over the lazy dog again and MORE"),
      (4, "completely different content with no overlap whatsoever here"))
      .toDF("id", "text")
      .withColumn("toks", TextOps.tokens($"text"))
      .withColumn("sh", TextOps.shinglesFromTokens($"toks", 3))
      .select($"id", TextOps.fingerprintFromShingles($"sh").as("fp"))
    val fp = df.as[(Int, Seq[Long])].collect().toMap
    assert(fp(1) === fp(2))
    assert(fp(1).intersect(fp(3)).size >= fp(1).size / 2)
    assert(fp(1).intersect(fp(4)).isEmpty)
  }

  test("qualityScore stays in [0,1] and ranks clean text above junk") {
    val df = Seq(
      (1, "the cat sat on the mat and the dog ran for it"),
      (2, "!!! ??? ... ;;; ::: !!!"))
      .toDF("doc_id", "text")
    val q = TextOps.qualityScore(df, "text")
      .select($"doc_id", $"quality").as[(Int, Double)].collect().toMap
    assert(q.values.forall(v => v >= 0.0 && v <= 1.0))
    assert(q(1) > q(2))
  }

  test("scrubPii masks emails and long digit runs, counts them, and " +
    "leaves clean text byte-identical") {
    val df = Seq(
      (1L, "mail a.b+c@ex-ample.co.uk and bob@x.io or call 12345678 now"),
      (2L, "short numbers 123456 stay, seven 1234567 goes"),
      (3L, "nothing to scrub here at all"))
      .toDF("doc_id", "text")
    val out = graft.ext.TextOps.scrubPii(df, "doc_id", "text")
      .select($"doc_id", $"text_clean", $"n_emails", $"n_longnums")
      .as[(Long, String, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(out(1L)._2 === "mail <EMAIL> and <EMAIL> or call <NUM> now")
    assert((out(1L)._3, out(1L)._4) === ((2L, 1L)))
    // 6-digit run is below the 7+ threshold and survives
    assert(out(2L)._2 === "short numbers 123456 stay, seven <NUM> goes")
    assert((out(2L)._3, out(2L)._4) === ((0L, 1L)))
    assert(out(3L)._2 === "nothing to scrub here at all")
    assert((out(3L)._3, out(3L)._4) === ((0L, 0L)))
  }

  test("qualityGate keeps each group's top (1-p) by score, groups independent") {
    // group a: scores 1..10, p=0.7 → exact percentile 7.3 → keep 8,9,10
    // group b: scores 100x larger — must not leak into a's threshold
    val df = ((1 to 10).map(i => ("a", i.toLong, i.toDouble)) ++
      (1 to 10).map(i => ("b", 100L + i, i * 100.0)))
      .toDF("grp", "id", "score")
    val kept = graft.ext.TextOps.qualityGate(df, "grp", "score", 0.7)
      .select($"grp", $"id").as[(String, Long)].collect().toSet
    assert(kept === Set(("a", 8L), ("a", 9L), ("a", 10L),
      ("b", 108L), ("b", 109L), ("b", 110L)))
    // the approx variant thresholds at a DATA value (no interpolation),
    // which can only sit at or below the interpolated exact threshold —
    // so its kept set is a superset of the exact gate's, never a subset
    val keptApprox = graft.ext.TextOps
      .qualityGate(df, "grp", "score", 0.7, exact = false)
      .select($"grp", $"id").as[(String, Long)].collect().toSet
    assert(kept.subsetOf(keptApprox))
    assert(keptApprox.size <= kept.size + 2) // one boundary row per group
  }

  test("chunkDocs: 32/24 windows overlap, tail fragment kept") {
    val words = (1 to 70).map(i => s"w$i")
    val df = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
    val out = graft.ext.TextOps.chunkDocs(df, "doc_id", "text", 32, 24)
      .select($"chunk_id", $"n_chunk_tokens", $"chunk_text")
      .as[(Long, Long, String)].collect().sortBy(_._1).toSeq
    assert(out.map(_._1) === Seq(0L, 1L, 2L))
    assert(out.map(_._2) === Seq(32L, 32L, 22L)) // tail: 70 − 48 = 22
    assert(out(0)._3 === words.slice(0, 32).mkString(" "))
    assert(out(1)._3 === words.slice(24, 56).mkString(" ")) // 8-token overlap
    assert(out(2)._3 === words.slice(48, 70).mkString(" "))
  }

  test("repetitionStats: degenerate text flagged, fold == brute force") {
    val df = Seq(
      (1L, "spam spam spam spam spam spam"),
      (2L, "the quick brown fox jumps over a lazy dog today"),
      (3L, "go go go stop go go stop stop go go"))
      .toDF("doc_id", "text")
    val out = graft.ext.TextOps.repetitionStats(df, "doc_id", "text")
      .select($"doc_id", $"n_tokens", $"dup_token_frac", $"top_token_frac",
        $"dup_2gram_frac")
      .as[(Long, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    // doc 1: one token repeated 6x → dup 5/6, top 6/6, all 2-grams equal
    assert(out(1L) === ((1L, 6L, 0.8333, 1.0, 0.8)))
    // doc 2: all distinct → zeros
    assert(out(2L) === ((2L, 10L, 0.0, 0.1, 0.0)))
    // doc 3: brute-force cross-check of every metric
    val toks = "go go go stop go go stop stop go go".split(" ").toSeq
    val n = toks.length
    val top = toks.groupBy(identity).values.map(_.length).max
    val grams = toks.sliding(2).map(_.mkString(" ")).toSeq
    def r4(x: Double) = math.round((x + 1e-9) * 1e4) / 1e4
    assert(out(3L) === ((3L, n.toLong,
      r4(1.0 - toks.distinct.length.toDouble / n),
      r4(top.toDouble / n),
      r4(1.0 - grams.distinct.length.toDouble / grams.length))))
  }

  test("packSequences: hierarchical prefix-sum == one global window") {
    import org.apache.spark.sql.expressions.Window
    // ids with gaps and shuffled insert order; bucketSize=4 forces many
    // buckets so the bucket-offset + within-bucket path really composes
    val df = Seq(7L, 1L, 22L, 3L, 15L, 8L, 2L, 30L, 9L)
      .map(id => (id, ("tok " * (id % 5 + 1).toInt).trim))
      .toDF("doc_id", "text")
    val packed = graft.ext.TextOps.packSequences(df, "doc_id",
        graft.ext.TextOps.tokenCount($"text"), budget = 7L, bucketSize = 4L)
      .select($"doc_id", $"start_off", $"chunk_first", $"chunk_last")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    val global = df
      .withColumn("n", graft.ext.TextOps.tokenCount($"text"))
      .withColumn("start_off", coalesce(sum($"n").over(
        Window.orderBy($"doc_id")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select($"doc_id", $"start_off",
        floor($"start_off" / 7).cast("long").as("cf"),
        floor(($"start_off" + greatest($"n", lit(1L)) - 1) / 7)
          .cast("long").as("cl"))
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(packed.toSeq === global.toSeq)
    // intervals tile the concatenation: each start is the previous end
    val offs = packed.map(_._2)
    assert(offs.head === 0L)
  }

  test("packSequences: boundary straddle and zero-length docs") {
    val df = Seq(
      (1L, 5L),   // [0, 5)   chunk 0
      (2L, 0L),   // [5, 5)   zero-length: occupies chunk 0
      (3L, 10L),  // [5, 15)  straddles the budget-8 boundary: chunks 0-1
      (4L, 1L))   // [15, 16) chunk 1
      .toDF("doc_id", "n")
    val out = graft.ext.TextOps.packSequences(df, "doc_id", $"n",
        budget = 8L, bucketSize = 2L)
      .select($"doc_id", $"chunk_first", $"chunk_last")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(out === Seq((1L, 0L, 0L), (2L, 0L, 0L), (3L, 0L, 1L),
      (4L, 1L, 1L)))
  }

  test("unigramLogProb: hand-computed smoothing, OOV path, full ≡ top-K") {
    // corpus: "a a b" + "a c" → counts a=3, b=1, c=1; N=5, V=3
    val df = Seq((1L, "a a b"), (2L, "a c")).toDF("doc_id", "text")
    def p(c: Long): Double = (c + 1.0) / (5 + 3)
    // mirror the operator's r4 convention (+1e-9 nudge, 4 dp)
    def r4(x: Double): Double = math.round((x + 1e-9) * 1e4) / 1e4
    val exact = graft.ext.TextOps.unigramLogProb(df, "doc_id", "text")
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    val exp1 = r4((2 * math.log(p(3)) + math.log(p(1))) / 3)
    val exp2 = r4((math.log(p(3)) + math.log(p(1))) / 2)
    assert(exact === Seq((1L, 3L, exp1), (2L, 2L, exp2)))
    // K >= V: top-K variant must be bit-identical to the exact join
    val topAll = graft.ext.TextOps.unigramLogProb(df, "doc_id", "text",
        vocabSize = 10)
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(topAll === exact)
    // K=1 keeps only 'a' (count desc); b and c score as OOV count 0,
    // same smoothing denominator → doc 2 drops, doc 1 unchanged less
    val top1 = graft.ext.TextOps.unigramLogProb(df, "doc_id", "text",
        vocabSize = 1)
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    val oov = math.log(1.0 / 8)
    val e1 = r4((2 * math.log(p(3)) + oov) / 3)
    val e2 = r4((math.log(p(3)) + oov) / 2)
    assert(top1 === Seq((1L, 3L, e1), (2L, 2L, e2)))
  }

  test("bigramLogProb: hand-computed conditionals, short docs dropped") {
    // corpus: "a b a b", "b a", "z" → unigrams a:3 b:3 z:1 (V=3),
    // bigrams (a,b):2 (b,a):2; p(b|a) = p(a|b) = (2+1)/(3+3) = 0.5
    val df = Seq((1L, "a b a b"), (2L, "b a"), (3L, "z"))
      .toDF("doc_id", "text")
    def r4(x: Double): Double = math.round((x + 1e-9) * 1e4) / 1e4
    val got = graft.ext.TextOps.bigramLogProb(df, "doc_id", "text")
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    // doc 3 has no bigrams → dropped; its token still counts toward V
    assert(got === Seq((1L, 3L, r4(math.log(0.5))),
      (2L, 1L, r4(math.log(0.5)))))
  }

  test("tokenDistributionDivergence: 0 on identical, ln2 on disjoint") {
    // identical distributions on both sides → JS = 0
    val same = Seq((1L, "a", "x y z"), (2L, "b", "x y z"))
      .toDF("doc_id", "grp", "text")
    val d0 = graft.ext.TextOps.tokenDistributionDivergence(
        same, "text", $"grp" === "a")
      .select($"n_tokens_a", $"n_tokens_b", $"vocab_a", $"vocab_b", $"js_div")
      .as[(Long, Long, Long, Long, Double)].collect().head
    assert(d0 === ((3L, 3L, 3L, 3L, 0.0)))
    // fully disjoint vocabularies → JS = ln 2 (each term p·ln(p/(p/2)))
    val disj = Seq((1L, "a", "x x y"), (2L, "b", "u v w w"))
      .toDF("doc_id", "grp", "text")
    val d1 = graft.ext.TextOps.tokenDistributionDivergence(
        disj, "text", $"grp" === "a")
      .select($"vocab_a", $"vocab_b", $"js_div")
      .as[(Long, Long, Double)].collect().head
    assert(d1._1 === 2L && d1._2 === 3L)
    assert(math.abs(d1._3 - math.log(2.0)) < 1e-4)
  }

  test("sourceDrift: 0 when a group matches the rest, ln2 when disjoint, " +
    "2-group case agrees with tokenDistributionDivergence") {
    // three groups, a and b identical distributions, c disjoint: a-vs-rest
    // still drifts (rest = b + c mixes in c's vocabulary), c-vs-rest = ln2
    val df = Seq(
      (1L, "a", "x y z"), (2L, "b", "x y z"), (3L, "c", "u v w"))
      .toDF("doc_id", "src", "text")
    val got = graft.ext.TextOps.sourceDrift(df, "src", "text")
      .as[(String, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("c")._2 === 3L && got("c")._3 === 3L)
    assert(math.abs(got("c")._4 - math.log(2.0)) < 1e-4) // disjoint rest
    assert(got("a")._4 > 0.0 && got("a")._4 === got("b")._4) // symmetric mix
    // 2-group corpus: one-vs-rest must equal the pairwise divergence
    val two = Seq((1L, "a", "x x y"), (2L, "b", "u v w w"))
      .toDF("doc_id", "src", "text")
    val pair = graft.ext.TextOps.tokenDistributionDivergence(
        two, "text", $"src" === "a")
      .select($"js_div").as[Double].head()
    val drift = graft.ext.TextOps.sourceDrift(two, "src", "text")
      .filter($"src" === "a").select($"js_div").as[Double].head()
    assert(drift === pair)
  }

  test("tfidfTopTerms: smoothed idf, tf weighting, deterministic rank") {
    val df = Seq(
      (1L, "apple apple banana"),
      (2L, "banana cherry"),
      (3L, "cherry cherry cherry")).toDF("doc_id", "text")
    def r4(x: Double): Double = math.round((x + 1e-9) * 1e4) / 1e4
    def idf(dfreq: Int): Double = math.log(4.0 / (dfreq + 1.0)) + 1.0
    val out = graft.ext.TextOps.tfidfTopTerms(df, "doc_id", "text", k = 2)
      .as[(Long, String, Long, Double)].collect()
      .sortBy(t => (t._1, t._3)).toSeq
    assert(out === Seq(
      (1L, "apple", 1L, r4(2 * idf(1))),  // rare + doubled beats banana
      (1L, "banana", 2L, r4(1 * idf(2))),
      (2L, "banana", 1L, r4(1 * idf(2))), // tie on score → token order
      (2L, "cherry", 2L, r4(1 * idf(2))),
      (3L, "cherry", 1L, r4(3 * idf(2)))))
  }

  test("importanceWeights: text-determined, target-like ranks above off-target") {
    // target profile = "the cat sat" bigrams; probes carry the same /
    // a disjoint profile but are NOT target members themselves
    val df = Seq(
      (1L, "en", "the cat sat"), (2L, "en", "the cat sat"),
      (3L, "en", "the cat sat on the mat"),
      (4L, "de", "xyzzy quux blorp"), (5L, "de", "xyzzy quux blorp"),
      (10L, "de", "the cat sat"),       // target-like text, raw-only doc
      (11L, "de", "xyzzy quux blorp"),  // off-target text
      (12L, "de", "solo"))              // <2 tokens → no features
      .toDF("doc_id", "lang", "text")
    val got = graft.ext.TextOps.importanceWeights(df, "doc_id", "text",
        isTarget = $"lang" === "en", buckets = 256, seed = 42L)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(!got.contains(12L), "doc with <2 tokens has no features")
    assert(got(10L)._1 === 2L && got(3L)._1 === 5L, "n_feats = bigram count")
    // the weight is a pure function of the TEXT given fixed corpus
    // distributions: doc 10 (lang de) scores exactly like docs 1-2 (en)
    assert(got(10L)._2 === got(1L)._2 && got(1L)._2 === got(2L)._2)
    // target-profile text scores strictly above off-target text
    assert(got(10L)._2 > got(11L)._2)
    assert(got(11L)._2 === got(4L)._2)
  }

  test("vocabularyOverlap: exact jaccard on hand-counted vocabularies") {
    // a: {the, cat, sat, mat}  b: {the, dog, sat}  c: {xyz}
    val df = Seq(
      ("a", "the cat sat"), ("a", "the mat"),
      ("b", "the dog"), ("b", "the sat"),
      ("c", "xyz"))
      .toDF("source", "text")
    val got = TextOps.vocabularyOverlap(df, "source", "text")
      .as[(String, String, Long, Long, Long, Long, Double)]
      .collect().map(r => (r._1, r._2) -> r).toMap
    // upper triangle only: (a,b), (a,c), (b,c) — but pairs with zero
    // common tokens never form in the token-keyed join
    assert(got.keySet === Set(("a", "b")))
    val (_, _, va, vb, common, union, j) = got(("a", "b"))
    assert(va === 4L && vb === 3L)            // |{the,cat,sat,mat}|, |{the,dog,sat}|
    assert(common === 2L && union === 5L)     // {the, sat}
    assert(j === 0.4)                         // 2/5
  }

  test("tokenEntropy: 0 for repetition, ln k for uniform distributions") {
    val df = Seq((1L, "a a a"), (2L, "a a b b"), (3L, "a b c d"))
      .toDF("doc_id", "text")
    val got = TextOps.tokenEntropy(df, "doc_id", "text")
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1L) === ((3L, 1L, 0.0)))
    assert(got(2L) === ((4L, 2L, 0.6931)))  // ln 2
    assert(got(3L) === ((4L, 4L, 1.3863)))  // ln 4
  }

  test("phrase pre-filter regex is exactly token-pair adjacency (q196 gate)") {
    // q196 gates the tokenize + positional array-walk on
    // lower(text) RLIKE (^|\s)table\s+part(\s|$); the claim is IFF:
    // since tokens are split(lower(text), \s+), token i = "table" and
    // token i+1 = "part" holds exactly when that regex matches. Any
    // drift (substring false-positive like "stable part"/"table parts",
    // or a miss on multi-whitespace / boundary positions) silently
    // changes q196's result set, so pin both directions on the
    // adversarial battery.
    val cases = Seq(
      ("table part", true),            // whole text is the phrase
      ("a table part b", true),        // interior
      ("table  \t part", true),        // multi-whitespace separator
      ("  table part", true),          // leading whitespace (empty token)
      ("a table part", true),          // phrase at end
      ("TABLE PART", true),            // case-folded by lower()
      ("table part table part", true), // repeated
      ("stable part", false),          // left boundary: suffix match only
      ("table parts", false),          // right boundary: prefix match only
      ("table", false),                // single token
      ("part table", false),           // wrong order
      ("table x part", false),         // not adjacent
      ("tablepart", false),            // no separator
      ("", false))
    val rx = "(^|\\s)table\\s+part(\\s|$)"
    val df = cases.toDF("text", "expected")
      .withColumn("toks", TextOps.tokens($"text"))
      .withColumn("n", size($"toks"))
      .withColumn("walk", $"n" >= 2 && size(filter(
        transform(sequence(lit(1), greatest($"n", lit(2)) - 1),
          i => element_at($"toks", i) === lit("table")
            && element_at($"toks", i + 1) === lit("part")),
        x => x)) > 0)
      .withColumn("gate", lower($"text").rlike(rx))
    df.collect().foreach { r =>
      val (text, exp) = (r.getAs[String]("text"), r.getAs[Boolean]("expected"))
      assert(r.getAs[Boolean]("walk") === exp, s"array walk on '$text'")
      assert(r.getAs[Boolean]("gate") === exp, s"regex gate on '$text'")
    }
  }
}
