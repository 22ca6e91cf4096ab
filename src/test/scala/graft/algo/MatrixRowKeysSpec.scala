package graft.algo

import org.scalatest.funsuite.AnyFunSuite

/** Port of the reference's minimal-key discovery tests
  * (`/root/reference/test/python/matrix_row_keys_test.py`).
  */
class MatrixRowKeysSpec extends AnyFunSuite {
  import MatrixRowKeys.matrixRowKeys

  def cols(n: Int): Seq[String] = (1 to n).map("x" + _)
  def rows(n: Int): Seq[String] = (1 to n).map("y" + _)

  test("1x1 matrix") {
    assert(matrixRowKeys(cols(1), rows(1), Seq(Seq(1))) ==
      Map("y1" -> Set(Set("x1" -> 1))))
  }

  test("5x4 matrix: single minimal key per row") {
    val got = matrixRowKeys(cols(4), rows(5), Seq(
      Seq(1, 2, 3, 4),
      Seq(2, 2, 3, 4),
      Seq(1, 2, 3, 5),
      Seq(2, 2, 3, 5),
      Seq(2, 3, 3, 5)))
    assert(got == Map(
      "y1" -> Set(Set("x1" -> 1, "x4" -> 4)),
      "y2" -> Set(Set("x1" -> 2, "x4" -> 4)),
      "y3" -> Set(Set("x1" -> 1, "x4" -> 5)),
      "y4" -> Set(Set("x1" -> 2, "x2" -> 2, "x4" -> 5)),
      "y5" -> Set(Set("x2" -> 3))))
  }

  test("3x4 matrix: multiple minimal keys per row") {
    val got = matrixRowKeys(cols(4), rows(3), Seq(
      Seq(1, 2, 1, 2),
      Seq(1, 2, 3, 4),
      Seq(3, 4, 1, 2)))
    assert(got == Map(
      "y1" -> Set(
        Set("x1" -> 1, "x3" -> 1),
        Set("x2" -> 2, "x4" -> 2),
        Set("x2" -> 2, "x3" -> 1),
        Set("x1" -> 1, "x4" -> 2)),
      "y2" -> Set(Set("x3" -> 3), Set("x4" -> 4)),
      "y3" -> Set(Set("x1" -> 3), Set("x2" -> 4))))
  }

  test("3x3 matrix: mutually exclusive keys of different sizes") {
    val got = matrixRowKeys(cols(3), rows(3), Seq(
      Seq(1, 1, 1),
      Seq(2, 1, 2),
      Seq(3, 3, 1)))
    assert(got == Map(
      "y1" -> Set(Set("x1" -> 1), Set("x2" -> 1, "x3" -> 1)),
      "y2" -> Set(Set("x1" -> 2), Set("x3" -> 2)),
      "y3" -> Set(Set("x1" -> 3), Set("x2" -> 3))))
  }

  test("tag-SNP discovery over the G6PD fixture matrix") {
    val g6pd = GeneHaplotypeMatrix("G6PD",
      Vector("rs1050828", "rs1050829", "rs5030868", "rs137852328", "rs76723693", "rs2230037"),
      Vector(
        ("B (wildtype)", "rs1050828", "C"), ("B (wildtype)", "rs1050829", "T"),
        ("B (wildtype)", "rs5030868", "G"), ("B (wildtype)", "rs137852328", "C"),
        ("B (wildtype)", "rs76723693", "A"), ("B (wildtype)", "rs2230037", "G"),
        ("A-202A_376G", "rs1050828", "T"), ("A-202A_376G", "rs1050829", "C"),
        ("A-202A_376G", "rs5030868", "G"), ("A-202A_376G", "rs137852328", "C"),
        ("A-202A_376G", "rs76723693", "A"), ("A-202A_376G", "rs2230037", "G")))
    val keys = MatrixRowKeys.forMatrix(g6pd)
    // the two haplotypes differ at rs1050828 and rs1050829 — each alone tags
    assert(keys("B (wildtype)").contains(Set("rs1050828" -> "C")))
    assert(keys("B (wildtype)").contains(Set("rs1050829" -> "T")))
    assert(keys("A-202A_376G").contains(Set("rs1050828" -> "T")))
  }

  test("matrix row iteration: full G6PD fixture (ReportTest.groovy:92-155)") {
    // The reference iterates known-haplotype rows with per-SNP allele
    // vectors; cells the haplotype doesn't define come back blank. Our
    // canonical row order is by haplotype name (the reference uses map
    // insertion order — an order the engine makes deterministic instead).
    val snps = Vector("rs1050828", "rs1050829", "rs5030868", "rs137852328",
      "rs76723693", "rs2230037")
    val fixture = Vector(
      "B (wildtype)" -> Vector("C", "T", "G", "C", "A", "G"),
      "A-202A_376G" -> Vector("T", "C", "G", "C", "A", "G"),
      "A- 680T_376G" -> Vector("C", "C", "G", "A", "A", "G"),
      "A-968C_376G" -> Vector("C", "C", "G", "C", "G", "G"),
      "Mediterranean Haplotype" -> Vector("C", "T", "A", "C", "A", "A"))
    val long = for {
      (h, alleles) <- fixture
      (s, a) <- snps.zip(alleles)
    } yield (h, s, a)
    val m = GeneHaplotypeMatrix("G6PD", snps, long)
    assert(m.rows.map(_._1) == Vector("A- 680T_376G", "A-202A_376G",
      "A-968C_376G", "B (wildtype)", "Mediterranean Haplotype"))
    val byName = m.rows.toMap
    fixture.foreach { case (h, alleles) =>
      assert(byName(h) == alleles.map(Option(_)), h)
    }
    // A haplotype defined on a subset of SNPs leaves the rest blank (the
    // NovelHaplotype null-padding in ReportTest's expected rows).
    val partial = GeneHaplotypeMatrix("G6PD", snps,
      Vector(("p1-A", "rs1050828", "T"), ("p1-A", "rs1050829", "T"),
        ("p1-A", "rs5030868", "G")))
    assert(partial.rows.head._2 == Vector(Some("T"), Some("T"), Some("G"),
      None, None, None))
  }
}
