package graft.algo

/** A variant call: one allele observed at one SNP. */
case class Variant(snpId: String, allele: String)

/** A gene–haplotype matrix: rows = known haplotypes, columns = SNPs, cells =
  * alleles. Built from long-format `(haplotype_name, snp_id, allele)` rows and
  * used to resolve which haplotype a set of same-chromosome variants
  * identifies.
  *
  * Semantics match the reference implementation
  * (`/root/reference/src/groovy/haplorec/util/data/GeneHaplotypeMatrix.groovy:36-249`),
  * re-expressed as an immutable, serializable Scala value so the whole
  * per-gene matrix collection can be broadcast to Spark executors and probed
  * inside `flatMapGroups` without any per-group database round trips.
  *
  * @param geneName          gene this matrix is for
  * @param snpIds            the gene's SNPs, sorted ascending (matrix column order)
  * @param haplotypeVariants long-form rows ordered by (haplotype_name, snp_id)
  */
final case class GeneHaplotypeMatrix(
    geneName: String,
    snpIds: Vector[String],
    haplotypeVariants: Vector[(String, String, String)] // (haplotype, snp, allele)
) extends Serializable {

  /** Known haplotype names in matrix row order (first-appearance order of the
    * ordered long-form input, i.e. sorted by haplotype_name).
    */
  @transient lazy val haplotypes: Vector[String] =
    haplotypeVariants.map(_._1).distinct

  /** Inverted index (snp_id, allele) -> set of haplotypes containing that
    * variant. Reference: `GeneHaplotypeMatrix.groovy:193-206`.
    */
  @transient lazy val variantToHaplotypes: Map[(String, String), Set[String]] =
    haplotypeVariants
      .groupBy(v => (v._2, v._3))
      .map { case (k, vs) => k -> vs.map(_._1).toSet }

  /** snp -> (haplotype -> allele), for matrix-style iteration. */
  @transient lazy val haplotypeAlleles: Map[String, Map[String, String]] =
    haplotypeVariants.groupBy(_._1).map { case (h, vs) =>
      h -> vs.map(v => v._2 -> v._3).toMap
    }

  /** One matrix row: haplotype name plus alleles aligned to `snpIds`
    * (None for blank cells). Reference: `GeneHaplotypeMatrix.groovy:140-191`.
    */
  def rows: Vector[(String, Vector[Option[String]])] =
    haplotypes.map { h =>
      val cells = haplotypeAlleles.getOrElse(h, Map.empty)
      h -> snpIds.map(cells.get)
    }

  /** Given variants on ONE physical chromosome, the set of known haplotypes
    * they may identify.
    *
    * Returns:
    *  - `None` when no variant touches this gene's SNPs at all ("don't know
    *    anything about this gene", NOT "novel") —
    *    `GeneHaplotypeMatrix.groovy:241-247`;
    *  - `Some(empty)` when the variants force a novel haplotype, either via an
    *    allele unseen at a known SNP (`:234-239`) or a known-allele
    *    combination no haplotype has (`:225-233`);
    *  - `Some(set)` of the remaining candidates otherwise (singleton = called
    *    haplotype; larger = ambiguous).
    */
  def variantsToHaplotypes(variants: Iterable[Variant]): Option[Set[String]] = {
    var hasAtLeastOneSnp = false
    var haps: Set[String] = haplotypes.toSet
    val it = variants.iterator
    while (it.hasNext) {
      val v = it.next()
      val geneContainsSnp = snpIds.contains(v.snpId)
      hasAtLeastOneSnp = hasAtLeastOneSnp || geneContainsSnp
      variantToHaplotypes.get((v.snpId, v.allele)) match {
        case Some(h) =>
          haps = haps.intersect(h)
          if (haps.isEmpty) return Some(Set.empty)
        case None =>
          if (geneContainsSnp) return Some(Set.empty)
      }
    }
    if (!hasAtLeastOneSnp) None else Some(haps)
  }
}

object GeneHaplotypeMatrix {

  /** Build per-gene matrices from long-form `gene_haplotype_variant` rows
    * (any order). The result is small (largest real-world gene is a 133×151
    * matrix) and meant to be broadcast.
    */
  def fromLongRows(
      rows: Iterable[(String, String, String, String)] // (gene, haplotype, snp, allele)
  ): Map[String, GeneHaplotypeMatrix] =
    rows.toVector.groupBy(_._1).map { case (gene, rs) =>
      val ordered = rs.map(r => (r._2, r._3, r._4)).sortBy(r => (r._1, r._2))
      val snps = rs.map(_._3).distinct.sorted.toVector
      gene -> GeneHaplotypeMatrix(gene, snps, ordered)
    }
}
