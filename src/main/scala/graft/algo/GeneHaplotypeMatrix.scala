package graft.algo

/** A variant call: one allele observed at one SNP. */
case class Variant(snpId: String, allele: String)

/** A gene–haplotype matrix: rows = known haplotypes, columns = SNPs, cells =
  * alleles. Built from long-format `(haplotype_name, snp_id, allele)` rows and
  * used to resolve which haplotype a set of same-chromosome variants
  * identifies.
  *
  * Semantics match the reference implementation
  * (`/root/reference/src/groovy/haplorec/util/data/GeneHaplotypeMatrix.groovy:36-249`).
  * Storage is dictionary-encoded (`cells(h * nSnps + s)` = allele index, -1
  * for blank): at the reference's load-test scale (151 snps × 132 haplotypes
  * × 100 genes ≈ 2M cells) the whole matrix set serializes to a few MB, so
  * collecting and broadcasting it to every executor is cheap — the
  * alternative (per-(gene, patient) lookups, as the reference does over JDBC)
  * would shuffle the large side instead.
  *
  * @param geneName   gene this matrix is for
  * @param snpIds     the gene's SNPs, sorted ascending (matrix column order)
  * @param haplotypes known haplotype names in matrix row order
  * @param alleleDict distinct alleles (cell values index into this)
  * @param cells      row-major (haplotype × snp) allele indices, -1 = blank
  */
final case class GeneHaplotypeMatrix(
    geneName: String,
    snpIds: Vector[String],
    haplotypes: Vector[String],
    alleleDict: Vector[String],
    cells: Array[Short]
) extends Serializable {

  private def nSnps: Int = snpIds.length

  /** Set views of the SNP/haplotype vectors, built once per JVM copy:
    * [[variantsToHaplotypes]] runs once per (patient, gene, chromosome,
    * combo) group inside `flatMapGroups`, so a per-call `toSet` (and a
    * linear `Vector.contains` per variant) is allocation the hot loop
    * pays millions of times at load-test scale for a value that never
    * changes. */
  @transient lazy val snpIdSet: Set[String] = snpIds.toSet
  @transient lazy val haplotypeSet: Set[String] = haplotypes.toSet

  /** Long-form rows ordered by (haplotype_name, snp_id) — the reference's
    * canonical iteration order (`GeneHaplotypeMatrix.groovy:71-76`).
    */
  def haplotypeVariants: Vector[(String, String, String)] =
    (for {
      h <- haplotypes.indices
      s <- 0 until nSnps
      a = cells(h * nSnps + s)
      if a >= 0
    } yield (haplotypes(h), snpIds(s), alleleDict(a))).toVector

  /** Inverted index (snp_id, allele) -> set of haplotypes containing that
    * variant. Reference: `GeneHaplotypeMatrix.groovy:193-206`. Built lazily
    * once per JVM copy (executors pay it once per broadcast deserialize).
    */
  @transient lazy val variantToHaplotypes: Map[(String, String), Set[String]] = {
    val m = scala.collection.mutable.Map[(String, String), Set[String]]()
    var h = 0
    while (h < haplotypes.length) {
      var s = 0
      while (s < nSnps) {
        val a = cells(h * nSnps + s)
        if (a >= 0) {
          val k = (snpIds(s), alleleDict(a))
          m(k) = m.getOrElse(k, Set.empty) + haplotypes(h)
        }
        s += 1
      }
      h += 1
    }
    m.toMap
  }

  /** One matrix row: haplotype name plus alleles aligned to `snpIds`
    * (None for blank cells). Reference: `GeneHaplotypeMatrix.groovy:140-191`.
    */
  def rows: Vector[(String, Vector[Option[String]])] =
    haplotypes.zipWithIndex.map { case (hName, h) =>
      hName -> (0 until nSnps).map { s =>
        val a = cells(h * nSnps + s)
        if (a >= 0) Some(alleleDict(a)) else None
      }.toVector
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
    var haps: Set[String] = haplotypeSet
    val it = variants.iterator
    while (it.hasNext) {
      val v = it.next()
      val geneContainsSnp = snpIdSet.contains(v.snpId)
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

  /** Build one matrix from long-form `(haplotype, snp, allele)` rows (any
    * order); SNP columns are sorted, haplotype rows ordered by name.
    */
  def apply(
      geneName: String,
      snpIds: Vector[String],
      haplotypeVariants: Vector[(String, String, String)]): GeneHaplotypeMatrix = {
    val haplotypes = haplotypeVariants.map(_._1).distinct.sorted
    val snpIdx = snpIds.zipWithIndex.toMap
    val hapIdx = haplotypes.zipWithIndex.toMap
    val dict = scala.collection.mutable.LinkedHashMap[String, Int]()
    val cells = Array.fill[Short](haplotypes.length * snpIds.length)(-1)
    haplotypeVariants.foreach { case (h, s, a) =>
      val ai = dict.getOrElseUpdate(a, dict.size)
      require(ai <= Short.MaxValue, "allele dictionary overflow")
      cells(hapIdx(h) * snpIds.length + snpIdx(s)) = ai.toShort
    }
    GeneHaplotypeMatrix(geneName, snpIds, haplotypes, dict.keys.toVector, cells)
  }

  /** Build per-gene matrices from long-form `gene_haplotype_variant` rows
    * (any order). Small by construction; meant to be broadcast.
    */
  def fromLongRows(
      rows: Iterable[(String, String, String, String)] // (gene, haplotype, snp, allele)
  ): Map[String, GeneHaplotypeMatrix] =
    rows.toVector.groupBy(_._1).map { case (gene, rs) =>
      val long = rs.map(r => (r._2, r._3, r._4))
      val snps = rs.map(_._3).distinct.sorted.toVector
      gene -> apply(gene, snps, long)
    }
}
