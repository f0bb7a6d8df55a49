package graft

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** The driver-side `.collect()` census, EXECUTABLE instead of re-done
  * by hand each round: every collect ships a whole DataFrame to the
  * driver, so each one in non-test source carries a proof obligation —
  * the collected frame must be MODEL-sized (k×dim centroids, a d×d
  * Gram matrix, SQ bounds, a candidate-bounded MMR pool), never
  * corpus-sized. The round-12 review established the obligation for
  * all six then-existing sites by reading them; this spec freezes that
  * census so a NEW collect cannot creep in silently — it fails until
  * the new site is either removed or added here with its bound named.
  *
  * Source-level by design: a plan-level probe cannot see collects (they
  * execute eagerly at query-build time), and counting call sites per
  * file is robust to line drift while still localizing a violation to
  * one file.
  */
class DriverCollectCensusSpec extends org.scalatest.funsuite.AnyFunSuite {

  /** file (relative to src/main/scala) → (allowed count, named bound) */
  private val census: Map[String, (Int, String)] = Map(
    "graft/ext/Similarity.scala" -> ((5,
      "k-means centroids k×dim (iterated fixpoint reads), PQ/SQ " +
        "codebooks and bounds (2×d / k×d²ᵇ), MMR candidate pool " +
        "(candidate-bounded ≤ poolK)")),
    "graft/SparkEntry.scala" -> ((1,
      "q289 PCA power iteration: the d×d=64² Gram matrix — one " +
        "aggregate row per matrix CELL, corpus-independent")))

  test("every driver-side collect() in src/main is in the census with " +
    "a named model-size bound") {
    val root = Paths.get("src/main/scala")
    val found = Files.walk(root).iterator().asScala
      .filter(p => p.toString.endsWith(".scala"))
      .map { p =>
        val n = "\\.collect\\(\\)".r
          .findAllIn(Files.readString(p)).size
        root.relativize(p).toString -> n
      }
      .filter(_._2 > 0).toMap
    val unexpected = found.filter { case (f, n) =>
      census.get(f).forall(_._1 != n)
    }
    assert(unexpected.isEmpty,
      "collect() sites outside the census (a collect ships the frame " +
        "to the driver — prove the frame is model-sized and add it " +
        "here with its bound, or make the operator distributed):\n" +
        unexpected.map { case (f, n) =>
          s"$f: $n site(s), census allows ${census.get(f).map(_._1).getOrElse(0)}"
        }.mkString("\n"))
    val stale = census.keySet -- found.keySet
    assert(stale.isEmpty,
      s"census entries match no file with collects (stale): $stale")
  }
}
