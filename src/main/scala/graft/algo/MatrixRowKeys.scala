package graft.algo

/** Minimal unique-key discovery over a matrix: for each row, every minimal
  * set of (column, value) cells that uniquely identifies it — the
  * reference's tag-SNP discovery utility
  * (`/root/reference/script/matrix_row_keys.py:52-114`).
  *
  * Driver-side by design: the input is a (small) gene–haplotype matrix, not
  * distributed data.
  */
object MatrixRowKeys {

  /** @return row name -> set of minimal keys, each a set of (column, value) */
  def matrixRowKeys[C, Y, V](
      columnNames: Seq[C],
      rowNames: Seq[Y],
      rows: Seq[Seq[V]]): Map[Y, Set[Set[(C, V)]]] = {
    // column -> value -> rows having that value
    val X: Map[C, Map[V, Set[Y]]] = columnNames.zipWithIndex.map { case (c, i) =>
      c -> rowNames.zip(rows).groupBy(_._2(i)).map { case (v, ys) =>
        v -> ys.map(_._1).toSet
      }
    }.toMap

    rowNames.zip(rows).map { case (y, row) =>
      // per column: (this row's value, rows sharing it)
      val xy: Vector[(V, Set[Y])] = columnNames.zip(row).map { case (c, v) =>
        (v, X(c)(v))
      }.toVector

      val candidates = scala.collection.mutable.Set[Set[Int]]()

      def record(key: Set[Int]): Unit = {
        if (candidates.exists(k => k.subsetOf(key))) () // equal or superset of existing
        else {
          candidates.retain(k => !key.subsetOf(k)) // drop dominated supersets
          candidates += key
        }
      }

      def intrsct(key: Set[Int], remaining: List[Int], r: Set[Y]): Unit = {
        if (r.size == 1) record(key)
        else if (r.isEmpty || remaining.isEmpty) ()
        else {
          var rest = remaining
          while (rest.nonEmpty) {
            val i = rest.head
            rest = rest.tail
            val intr = r.intersect(xy(i)._2)
            if (intr.size < math.min(r.size, xy(i)._2.size))
              intrsct(key + i, rest, intr)
          }
        }
      }

      var remaining = columnNames.indices.toList
      columnNames.indices.foreach { i =>
        remaining = remaining.filterNot(_ == i)
        intrsct(Set(i), remaining, xy(i)._2)
      }

      y -> candidates.map(k => k.map(i => (columnNames(i), xy(i)._1))).toSet
    }.toMap
  }

  /** Convenience over a gene–haplotype matrix: minimal (snp, allele) tag
    * sets per haplotype (blank cells excluded via a sentinel).
    */
  def forMatrix(m: GeneHaplotypeMatrix): Map[String, Set[Set[(String, String)]]] =
    matrixRowKeys(
      m.snpIds,
      m.haplotypes,
      m.rows.map(_._2.map(_.getOrElse(""))))
}
