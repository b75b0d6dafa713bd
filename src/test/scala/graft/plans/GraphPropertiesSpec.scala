package graft.plans

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/** Property tests mirroring the reference's quickcheck graph invariants
  * (mycelial `graph/src/lib.rs:250-632`): subgraph splitting conserves
  * nodes and edges, components are truly disconnected from each other,
  * spec hashing is permutation-stable, and topo order respects edges. */
object GraphPropertiesSpec extends Properties("PipelineSpec graph") {

  /** Random forest of chain pipelines: n chains of random lengths, which
    * exercises split/merge without generating cycles or multi-output
    * nodes (both rejected by validate, tested separately). */
  private val genForest: Gen[PipelineSpec] = for {
    nChains <- Gen.choose(1, 5)
    lengths <- Gen.listOfN(nChains, Gen.choose(1, 4))
  } yield {
    val sections = for {
      (len, c) <- lengths.zipWithIndex
      i <- 0 until len
    } yield SectionSpec(s"c${c}_s$i",
      if (i == 0) "parquet_source" else "tagging",
      Map("path" -> s"/p$c", "column" -> "t", "text" -> "v"))
    val edges = for {
      (len, c) <- lengths.zipWithIndex
      i <- 0 until len - 1
    } yield (s"c${c}_s$i", s"c${c}_s${i + 1}")
    PipelineSpec(sections, edges)
  }

  property("components conserve nodes and edges") = forAll(genForest) { spec =>
    val comps = spec.components
    comps.flatMap(_.sections).map(_.id).sorted == spec.sections.map(_.id).sorted &&
      comps.flatMap(_.edges).sorted == spec.edges.sorted
  }

  property("component count equals chain count") = forAll(genForest) { spec =>
    val nChains = spec.sections.map(_.id.split("_")(0)).distinct.size
    spec.components.size == nChains
  }

  property("components are closed: no edge crosses components") =
    forAll(genForest) { spec =>
      spec.components.forall { c =>
        val ids = c.sections.map(_.id).toSet
        c.edges.forall { case (f, t) => ids(f) && ids(t) }
      }
    }

  property("hash is stable under section/edge permutation") =
    forAll(genForest) { spec =>
      val shuffled = PipelineSpec(spec.sections.reverse, spec.edges.reverse)
      shuffled.specHash == spec.specHash
    }

  property("hash differs when any config value changes") =
    forAll(genForest) { spec =>
      val mutated = spec.copy(sections = spec.sections.updated(0,
        spec.sections.head.copy(config =
          spec.sections.head.config + ("path" -> "/CHANGED"))))
      mutated.specHash != spec.specHash
    }

  property("topoOrder respects every edge") = forAll(genForest) { spec =>
    val pos = spec.topoOrder.zipWithIndex.toMap
    spec.edges.forall { case (f, t) => pos(f) < pos(t) }
  }
}
