package graft

import org.scalatest.funsuite.AnyFunSuite
import RegistryMeta.{entries, sections}

/** Pins the invariants that make [[RegistryMeta]] a trustworthy index
  * over the driver registry (round 12, VERDICT ask #8): metadata that
  * drifts from `SparkEntry.queries` is worse than none. */
class RegistryMetaSpec extends AnyFunSuite {

  test("every registry key carries metadata, tagged oracle=sql") {
    val missing = SparkEntry.queries.keySet -- entries.keySet
    assert(missing.isEmpty, s"queries keys without metadata: $missing")
    val misTagged = SparkEntry.queries.keySet
      .filter(k => entries(k).oracle != "sql")
    assert(misTagged.isEmpty, s"registry keys not tagged sql: $misTagged")
  }

  test("every sql-mode metadata row IS a registered queries+oracleSql " +
       "entry (no phantom inventory)") {
    val sqlKeys = entries.collect { case (k, m) if m.oracle == "sql" => k }
    val phantoms = sqlKeys.filterNot(SparkEntry.queries.contains)
    assert(phantoms.isEmpty, s"sql metadata without a queries entry: $phantoms")
    val unoracled = sqlKeys.filterNot(SparkEntry.oracleSql.contains)
    assert(unoracled.isEmpty, s"sql metadata without oracle SQL: $unoracled")
  }

  test("spec-mode rows stay OFF the driver registry (they are API " +
       "surface, not oracled entries)") {
    val overlap = entries.collect {
      case (k, m) if m.oracle == "spec" && SparkEntry.queries.contains(k) => k
    }
    assert(overlap.isEmpty, s"spec-tagged keys that are registry entries: $overlap")
  }

  test("sections and oracle modes are from the closed vocabularies") {
    val badSec = entries.filter { case (_, m) => !sections.contains(m.section) }
    assert(badSec.isEmpty, s"unknown section tags: ${badSec.keys}")
    val badMode = entries.filter { case (_, m) => !Set("sql", "spec")(m.oracle) }
    assert(badMode.isEmpty, s"unknown oracle modes: ${badMode.keys}")
    assert(entries.forall(_._2.desc.nonEmpty))
  }

  test("every declared scale-tier partner resolves to a registered entry " +
       "and the pair spans the Routing dial's exact/scale contract") {
    entries.foreach { case (k, m) =>
      m.scalePartner.foreach { p =>
        assert(SparkEntry.queries.contains(p),
          s"$k declares unregistered scale partner $p")
        assert(p != k, s"$k is its own scale partner")
      }
    }
    // the Routing-dial pairs all surface here (the dial IS the API;
    // its pairs must be enumerable from the metadata)
    val declared = entries.collect {
      case (k, m) if m.scalePartner.isDefined => k -> m.scalePartner.get
    }.toMap
    val routed = Map(
      "graph_triangles"     -> "graph_triangles_sampled",
      "q_dau_wau"           -> "q_dau_wau_approx",
      "rec_item_cosine"     -> "rec_item_cosine_dimsum",
      "ann_bruteforce_topk" -> "ann_ivf_topk",
      // the ANN ladder's four rungs in routing order: past the build
      // dial the exact-fit IVF hands to the linear sampled build,
      // past the memory dial to the composed IVF*PQ tier
      "ann_ivf_topk"        -> "ann_ivf_topk_sampled",
      "ann_ivf_topk_sampled" -> "ann_ivfpq_topk",
      "dedup_embedding"     -> "dedup_embedding_lsh",
      "q_percentiles"       -> "q_percentiles_approx",
      "etl_profile"         -> "etl_profile_approx",
      "dedup_decontaminate" -> "dedup_decontaminate_bloom",
      // the span locator's dial: broadcast probe under the reference
      // budget, symmetric gram join past it
      "dedup_decontaminate_spans" -> "dedup_decontaminate_spans_bcast",
      "ml_knn_classify"     -> "ml_knn_classify_ivf")
    routed.foreach { case (k, p) =>
      assert(declared.get(k).contains(p), s"Routing pair $k -> $p missing")
    }
  }
}
