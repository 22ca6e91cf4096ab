package graft.algo

/** A het variant phased onto a physical chromosome. */
case class PhasedVariant(physicalChromosome: String, snpId: String, allele: String)

/** Result of het disambiguation: each element of the outer list is one
  * possible phasing ("combo") of all het variants; rows are ordered
  * chromosome A first (SNPs in sorted order) then chromosome B.
  */
case class Disambiguation(
    aKnownBKnown: List[List[PhasedVariant]],
    aKnownBNovel: List[List[PhasedVariant]]
) {
  def comboCount: Int = aKnownBKnown.size + aKnownBNovel.size

  /** All combos in canonical order (AKnownBKnown first), matching the
    * reference's het_combo numbering (`Pipeline.groovy:374-392`).
    */
  def allCombos: List[List[PhasedVariant]] = aKnownBKnown ++ aKnownBNovel
}

/** Heterozygote phasing: distribute a patient's het calls onto physical
  * chromosomes A/B such that at least chromosome A matches a known haplotype.
  *
  * Pure function of (matrix, het variants) — deliberately engine-free for
  * testability, mirroring the reference's design
  * (`/root/reference/src/groovy/haplorec/util/pipeline/Algorithm.groovy:73-255`).
  * In the Spark pipeline it runs inside `flatMapGroups` per (patient, gene)
  * group against a broadcast matrix.
  */
object Disambiguate {

  private implicit val seqOrd: Ordering[List[String]] =
    Ordering.Implicits.seqOrdering[List, String]

  /** Enumerate the possible phasings of `hetVariants`.
    *
    * @param matrix       the gene's haplotype matrix
    * @param hetVariants  het calls: each snp_id must appear exactly twice
    *                     (once per allele of the het call)
    * @throws IllegalArgumentException on SNPs unknown to the matrix or SNPs
    *                                  not appearing exactly twice
    *                                  (`Algorithm.groovy:74-85`)
    */
  def disambiguateHets(
      matrix: GeneHaplotypeMatrix,
      hetVariants: Seq[Variant]
  ): Disambiguation = {
    hetVariants.foreach { v =>
      if (!matrix.snpIdSet.contains(v.snpId))
        throw new IllegalArgumentException(
          s"The gene-haplotype matrix for ${matrix.geneName} has no SNP ${v.snpId}")
    }
    hetVariants.groupBy(_.snpId).foreach { case (snp, vs) =>
      if (vs.size != 2)
        throw new IllegalArgumentException(
          s"Expected a list of heterozygote snps (i.e. 2 variants with the same snp_id), but saw $snp with ${vs.size} variants")
    }

    val sortedHets = hetVariants.sortBy(v => (v.snpId, v.allele)).toVector
    val vh = matrix.variantToHaplotypes
    val geneHaplotypes = matrix.haplotypeSet
    val hetSnps = sortedHets.map(_.snpId).distinct.toList
    val numHets = hetSnps.size

    /* The complement strand: for each het SNP, the one of its two alleles not
     * used by the given strand (`Algorithm.groovy:114-127`).
     */
    def otherStrand(aAlleles: List[String]): List[String] =
      aAlleles.zipWithIndex.map { case (a, i) =>
        val h1 = sortedHets(2 * i); val h2 = sortedHets(2 * i + 1)
        if (a == h1.allele) h2.allele
        else { require(a == h2.allele); h1.allele }
      }

    /* Depth-first enumeration of allele sequences (one allele per het SNP)
     * that uniquely identify a known haplotype (`Algorithm.groovy:139-182`).
     * Special case: a single het SNP always splits arbitrarily as long as at
     * least one allele choice is known (`:143-153`).
     */
    val hetSequences = scala.collection.mutable.LinkedHashSet[List[String]]()
    def uniqueSnps(i: Int, acc: List[String], haplotypes: Set[String]): Unit = {
      if (i >= sortedHets.size &&
          (haplotypes.size == 1 || (sortedHets.size == 2 && haplotypes.nonEmpty))) {
        hetSequences += acc.reverse
      } else if (haplotypes.isEmpty) ()
      else if (i >= sortedHets.size) ()
      else {
        def recurse(v: Variant): Unit = {
          val retain = vh.getOrElse((v.snpId, v.allele), Set.empty[String])
          uniqueSnps(i + 2, v.allele :: acc, haplotypes.intersect(retain))
        }
        recurse(sortedHets(i))
        recurse(sortedHets(i + 1))
      }
    }
    uniqueSnps(0, Nil, geneHaplotypes)

    /* Pair each surviving sequence with its complement: both known =>
     * AKnownBKnown (canonically ordered: A = lesser sequence); complement not
     * in the set => AKnownBNovel (`Algorithm.groovy:193-213`).
     */
    val remaining = scala.collection.mutable.LinkedHashSet[List[String]](hetSequences.toSeq: _*)
    val aKnown = List.newBuilder[(List[String], List[String])]
    val aKnownBNovel = List.newBuilder[(List[String], List[String])]
    while (remaining.nonEmpty) {
      val s = remaining.head
      remaining -= s
      val sOther = otherStrand(s)
      if (remaining.contains(sOther)) {
        remaining -= sOther
        val List(s1, s2) = List(s, sOther).sorted
        aKnown += ((s1, s2))
      } else {
        aKnownBNovel += ((s, sOther))
      }
    }

    /* Annotate sequences with chromosome + snp, pairs in canonical order
     * (`Algorithm.groovy:230-249`).
     */
    def asVariants(chrom: String, alleles: List[String]): List[PhasedVariant] =
      alleles.zip(hetSnps).map { case (a, snp) => PhasedVariant(chrom, snp, a) }
    def pairsAsRows(pairs: List[(List[String], List[String])]): List[List[PhasedVariant]] =
      pairs
        .sortBy(p => (p._1, p._2))(Ordering.Tuple2(seqOrd, seqOrd))
        .map { case (s1, s2) => asVariants("A", s1) ++ asVariants("B", s2) }

    Disambiguation(pairsAsRows(aKnown.result()), pairsAsRows(aKnownBNovel.result()))
  }
}
