package graft.pipeline

import org.apache.spark.sql.DataFrame

/** Make-style DAG of named stage materializations.
  *
  * Reference: `/root/reference/src/groovy/haplorec/util/dependency/Dependency.groovy:74-128`
  * (DFS post-order build with memoized `built` set and cycle detection) plus
  * the input-override mechanism (`Pipeline.groovy:671-684`): any stage can be
  * *given* as input, replacing its rule and building only downstream stages.
  *
  * Spark's lazy evaluation makes rule composition free; explicit
  * materialization boundaries (persist/write, injected via `materialize`)
  * keep per-stage observability and partial-build parity.
  */
final class StageGraph(stages: Map[String, StageGraph.Stage]) {
  import StageGraph._

  /** Stages no other stage depends on (build roots, `Dependency.groovy:123-128`). */
  def leaves: Seq[String] = {
    val depended = stages.values.flatMap(_.deps).toSet
    stages.keys.filterNot(depended).toSeq.sorted
  }

  /** Build `targets` (default: all leaves), memoizing each stage once.
    *
    * @param overrides stage name -> provided input frame; its rule is skipped
    *                  and only downstream stages run
    * @param materialize hook applied to every built frame (persist/write)
    * @return every built stage's frame (incl. overridden inputs)
    */
  def build(
      targets: Seq[String] = Nil,
      overrides: Map[String, DataFrame] = Map.empty,
      materialize: (String, DataFrame) => DataFrame = (_, df) => df
  ): Map[String, DataFrame] = {
    val built = scala.collection.mutable.LinkedHashMap[String, DataFrame]()
    val inProgress = scala.collection.mutable.Set[String]()
    def go(name: String): DataFrame = built.getOrElse(name, {
      if (inProgress(name))
        throw new IllegalStateException(s"dependency cycle at stage $name")
      inProgress += name
      val stage = stages.getOrElse(name,
        throw new NoSuchElementException(s"unknown stage $name"))
      val df = overrides.get(name) match {
        case Some(input) => materialize(name, input)
        case None =>
          val depFrames = stage.deps.map(d => d -> go(d)).toMap
          materialize(name, stage.rule(depFrames))
      }
      inProgress -= name
      built(name) = df
      df
    })
    (if (targets.nonEmpty) targets else leaves).foreach(go)
    built.toMap
  }

  /** Shortest-path-to-leaf levels, for display/layout parity
    * (`Dependency.groovy:136-171`).
    */
  def levels: Map[String, Int] = {
    val memo = scala.collection.mutable.Map[String, Int]()
    val deps = dependants
    def lvl(name: String): Int = memo.getOrElseUpdate(name, {
      val ds = deps(name)
      if (ds.isEmpty) 0 else ds.map(lvl).min + 1
    })
    stages.keys.map(k => k -> lvl(k)).toMap
  }

  /** Stage -> the stages that depend on it (`Dependency.groovy:178-194`). */
  def dependants: Map[String, Set[String]] =
    stages.keys.map { k =>
      k -> stages.collect { case (n, s) if s.deps.contains(k) => n }.toSet
    }.toMap

  /** 2-D layout row assignment within each column level
    * (`Dependency.groovy:204-317` `rowLvls`/`numberNodes`, used by the
    * reference GUI): per column, within-level roots (stages with no
    * within-level dependency) are sorted by name and each DFS-numbers its
    * within-level dependants (children visited name-sorted, later roots
    * overwrite earlier assignments, exactly as the reference's unconditional
    * re-assignment does); groups concatenate in root order, each sorted by
    * DFS number; a stage's row is its position in that concatenation.
    */
  def rowLevels: Map[String, Int] = {
    if (stages.isEmpty) return Map.empty
    val colLvls = levels
    val allDependants = dependants
    val out = scala.collection.mutable.Map[String, Int]()
    (0 to colLvls.values.max).foreach { n =>
      val level = stages.keys.filter(colLvls(_) == n).toSeq.sorted
      val levelSet = level.toSet
      val within = level.map(k =>
        k -> allDependants(k).filter(levelSet).toSeq.sorted).toMap
      val roots = level.filter(k => !stages(k).deps.exists(levelSet)).sorted
      val verNum = scala.collection.mutable.Map[String, Int]()
      val verGrp = scala.collection.mutable.Map[String, Int]()
      roots.zipWithIndex.foreach { case (r, g) => verNum(r) = 0; verGrp(r) = g }
      roots.zipWithIndex.foreach { case (r, g) =>
        var i = 0
        def visit(d: String): Unit = {
          verNum(d) = i; verGrp(d) = g; i += 1
          within(d).foreach(visit)
        }
        visit(r)
      }
      val ordered = roots.indices.flatMap { g =>
        level.filter(k => verGrp.get(k).contains(g)).sortBy(verNum)
      }
      ordered.zipWithIndex.foreach { case (k, idx) => out(k) = idx }
    }
    out.toMap
  }
}

object StageGraph {
  /** One stage: its upstream dependencies and a rule computing it from them. */
  final case class Stage(deps: Seq[String], rule: Map[String, DataFrame] => DataFrame)

  def apply(stages: (String, Stage)*): StageGraph = new StageGraph(stages.toMap)
}
