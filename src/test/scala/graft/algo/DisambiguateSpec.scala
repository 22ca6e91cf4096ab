package graft.algo

import org.scalatest.funsuite.AnyFunSuite

/** Port of the reference's pure-algorithm het-disambiguation tests
  * (`/root/reference/test/groovy/haplorec/test/util/pipeline/AlgorithmTest.groovy`).
  */
class DisambiguateSpec extends AnyFunSuite {

  def matrixOf(gene: String, snpIds: Seq[String],
      haps: Seq[(String, Seq[String])]): GeneHaplotypeMatrix = {
    val long = haps.flatMap { case (h, alleles) =>
      snpIds.zip(alleles).map { case (s, a) => (h, s, a) }
    }.sortBy(r => (r._1, r._2)).toVector
    GeneHaplotypeMatrix(gene, snpIds.toVector, long)
  }

  // G6PD fixture (AlgorithmTest.groovy:10-32)
  val g6pdSnps = Seq("rs1050828", "rs1050829", "rs5030868", "rs137852328", "rs76723693", "rs2230037")
  val g6pd = matrixOf("G6PD", g6pdSnps, Seq(
    "B (wildtype)" -> Seq("C", "T", "G", "C", "A", "G"),
    "A-202A_376G" -> Seq("T", "C", "G", "C", "A", "G"),
    "A- 680T_376G" -> Seq("C", "C", "G", "A", "A", "G"),
    "A-968C_376G" -> Seq("C", "C", "G", "C", "G", "G"),
    "Mediterranean Haplotype" -> Seq("C", "T", "A", "C", "A", "A")))

  def hets(pairs: (String, String)*): Seq[Variant] =
    pairs.flatMap { case (snp, alleles) =>
      alleles.map(a => Variant(snp, a.toString))
    }

  def expectCombos(snpIds: Seq[String], pairs: Seq[(Seq[String], Seq[String])]): Set[Set[PhasedVariant]] =
    pairs.map { case (s1, s2) =>
      (s1.zip(snpIds).map { case (a, s) => PhasedVariant("A", s, a) } ++
        s2.zip(snpIds).map { case (a, s) => PhasedVariant("B", s, a) }).toSet
    }.toSet

  def asSets(combos: List[List[PhasedVariant]]): Set[Set[PhasedVariant]] =
    combos.map(_.toSet).toSet

  test("empty het variants") {
    val d = Disambiguate.disambiguateHets(g6pd, Nil)
    assert(d.aKnownBKnown.isEmpty && d.aKnownBNovel.isEmpty)
  }

  test("single het SNP splits arbitrarily (1-het special case)") {
    val d = Disambiguate.disambiguateHets(g6pd, hets("rs1050828" -> "CT"))
    assert(asSets(d.aKnownBKnown) ==
      expectCombos(Seq("rs1050828"), Seq(Seq("C") -> Seq("T"))))
    assert(d.aKnownBNovel.isEmpty)
  }

  test("3 SNPs: known/known + known/novel, ambiguous dropped") {
    val d = Disambiguate.disambiguateHets(g6pd,
      hets("rs1050828" -> "CT", "rs1050829" -> "TC", "rs5030868" -> "AG"))
    val snps = Seq("rs1050828", "rs1050829", "rs5030868")
    assert(asSets(d.aKnownBKnown) ==
      expectCombos(snps, Seq(Seq("C", "T", "A") -> Seq("T", "C", "G"))))
    assert(asSets(d.aKnownBNovel) ==
      expectCombos(snps, Seq(Seq("C", "T", "G") -> Seq("T", "C", "A"))))
  }

  test("1 known + 1 novel haplotype") {
    val d = Disambiguate.disambiguateHets(g6pd,
      hets("rs1050828" -> "TC", "rs1050829" -> "CG"))
    val snps = Seq("rs1050828", "rs1050829")
    assert(d.aKnownBKnown.isEmpty)
    assert(asSets(d.aKnownBNovel) ==
      expectCombos(snps, Seq(Seq("T", "C") -> Seq("C", "G"))))
  }

  test("two potential haplotype combos both reported") {
    val m = matrixOf("g1", Seq("rs1", "rs2"), Seq(
      "*1" -> Seq("A", "A"), "*2" -> Seq("T", "T"),
      "*3" -> Seq("A", "T"), "*4" -> Seq("T", "A")))
    val d = Disambiguate.disambiguateHets(m, hets("rs1" -> "AT", "rs2" -> "AT"))
    assert(asSets(d.aKnownBKnown) == expectCombos(Seq("rs1", "rs2"),
      Seq(Seq("A", "A") -> Seq("T", "T"), Seq("A", "T") -> Seq("T", "A"))))
    assert(d.aKnownBNovel.isEmpty)
  }

  test("single-combination matrix: 3 scenarios") {
    val m = matrixOf("g1", Seq("rs1", "rs2", "rs3"), Seq(
      "*1" -> Seq("A", "C", "T"), "*2" -> Seq("A", "G", "A"),
      "*3" -> Seq("T", "G", "T"), "*4" -> Seq("G", "C", "A")))

    val d1 = Disambiguate.disambiguateHets(m, hets("rs2" -> "CG", "rs3" -> "TA"))
    assert(asSets(d1.aKnownBKnown) == expectCombos(Seq("rs2", "rs3"),
      Seq(Seq("C", "A") -> Seq("G", "T"), Seq("C", "T") -> Seq("G", "A"))))
    assert(d1.aKnownBNovel.isEmpty)

    val d2 = Disambiguate.disambiguateHets(m, hets("rs1" -> "CT"))
    assert(d2.aKnownBKnown.isEmpty)
    assert(asSets(d2.aKnownBNovel) == expectCombos(Seq("rs1"),
      Seq(Seq("T") -> Seq("C"))))

    val d3 = Disambiguate.disambiguateHets(m, hets("rs1" -> "AT", "rs2" -> "CG"))
    assert(asSets(d3.aKnownBKnown) == expectCombos(Seq("rs1", "rs2"),
      Seq(Seq("A", "C") -> Seq("T", "G"))))
    assert(asSets(d3.aKnownBNovel) == expectCombos(Seq("rs1", "rs2"),
      Seq(Seq("A", "G") -> Seq("T", "C"))))
  }

  test("het_combo canonical ordering: AKnownBKnown first, A has lesser sequence") {
    val m = matrixOf("g1", Seq("rs1", "rs2"), Seq(
      "*1" -> Seq("A", "A"), "*2" -> Seq("T", "T"),
      "*3" -> Seq("A", "T"), "*4" -> Seq("T", "A")))
    val d = Disambiguate.disambiguateHets(m, hets("rs1" -> "AT", "rs2" -> "AT"))
    // Canonical: combos sorted by (seqA, seqB); A side lexicographically lesser.
    assert(d.aKnownBKnown.map(_.filter(_.physicalChromosome == "A").map(_.allele)) ==
      List(List("A", "A"), List("A", "T")))
  }

  test("bad input: snp not appearing exactly twice") {
    intercept[IllegalArgumentException] {
      Disambiguate.disambiguateHets(g6pd, Seq(Variant("rs1050828", "C")))
    }
    intercept[IllegalArgumentException] {
      Disambiguate.disambiguateHets(g6pd,
        Seq(Variant("rs1050828", "C"), Variant("rs1050829", "T")))
    }
  }

  test("bad input: unknown snp") {
    intercept[IllegalArgumentException] {
      Disambiguate.disambiguateHets(g6pd, hets("rsX" -> "CT"))
    }
  }

  test("variantsToHaplotypes: known / novel / ambiguous / untouched") {
    // Known singleton
    assert(g6pd.variantsToHaplotypes(Seq(Variant("rs1050828", "T"))) ==
      Some(Set("A-202A_376G")))
    // Novel via unseen allele at a known SNP
    assert(g6pd.variantsToHaplotypes(Seq(Variant("rs1050828", "G"))) ==
      Some(Set.empty[String]))
    // Novel via known alleles in an unseen combination
    assert(g6pd.variantsToHaplotypes(
      Seq(Variant("rs1050828", "T"), Variant("rs1050829", "T"))) ==
      Some(Set.empty[String]))
    // Ambiguous: subset matching several haplotypes
    assert(g6pd.variantsToHaplotypes(Seq(Variant("rs1050829", "C"))) ==
      Some(Set("A-202A_376G", "A- 680T_376G", "A-968C_376G")))
    // No variant touches this gene => None, not empty
    assert(g6pd.variantsToHaplotypes(Seq(Variant("rs9999", "C"))) == None)
    // Empty input => None
    assert(g6pd.variantsToHaplotypes(Nil) == None)
  }
}
