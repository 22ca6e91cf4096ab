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

  /** The stage definitions, for graph composition/inspection. */
  def stageDefs: Map[String, Stage] = stages

  /** Stages no other stage depends on (build roots, `Dependency.groovy:123-128`). */
  def leaves: Seq[String] = {
    val depended = stages.values.flatMap(_.deps).toSet
    stages.keys.filterNot(depended).toSeq.sorted
  }

  /** Build `targets` (default: all leaves), memoizing each stage once.
    *
    * Handler semantics match the reference executor
    * (`Dependency.groovy:49-54` declarations, `:101-116` firing order):
    * `beforeBuild` handlers fire in registration order immediately before the
    * rule, after all dependencies built; on a rule exception the `onFail`
    * handlers fire (in order, with the exception) and the exception is
    * rethrown iff `propagateFailure`; `afterBuild` handlers fire when the
    * rule succeeded OR when the failure was swallowed (`propagateFailure`
    * false) — exactly the reference's fall-through. A stage that failed
    * non-propagating is recorded as failed (not retried) and omitted from
    * its dependants' input maps and from the result, so a dependant's rule
    * sees the missing key and decides for itself — the DataFrame analogue of
    * the reference's "dependant's SQL fails on the missing table".
    *
    * @param overrides stage name -> provided input frame; its rule is skipped
    *                  and only downstream stages run (handlers still fire:
    *                  the override IS the stage's rule for this build)
    * @param materialize hook applied to every built frame (persist/write)
    * @return every successfully built stage's frame (incl. overridden inputs)
    */
  def build(
      targets: Seq[String] = Nil,
      overrides: Map[String, DataFrame] = Map.empty,
      materialize: (String, DataFrame) => DataFrame = (_, df) => df
  ): Map[String, DataFrame] = {
    val built = scala.collection.mutable.LinkedHashMap[String, DataFrame]()
    val failed = scala.collection.mutable.Set[String]()
    val inProgress = scala.collection.mutable.Set[String]()
    def go(name: String): Option[DataFrame] = built.get(name).map(Some(_)).getOrElse {
      if (failed(name)) None
      else {
        if (inProgress(name))
          throw new IllegalStateException(s"dependency cycle at stage $name")
        inProgress += name
        val stage = stages.getOrElse(name,
          throw new NoSuchElementException(s"unknown stage $name"))
        // Dependencies first (Dependency.groovy:90-100), then handlers+rule.
        val depFrames = overrides.get(name) match {
          case Some(_) => Map.empty[String, DataFrame] // override replaces the rule; deps not needed
          case None    => stage.deps.flatMap(d => go(d).map(d -> _)).toMap
        }
        stage.beforeBuild.foreach(_(name))
        val frame: Option[DataFrame] =
          try Some(overrides.get(name) match {
            case Some(input) => materialize(name, input)
            case None        => materialize(name, stage.rule(depFrames))
          })
          catch {
            case e: Throwable =>
              stage.onFail.foreach(_(name, e))
              if (stage.propagateFailure) { inProgress -= name; throw e }
              None
          }
        stage.afterBuild.foreach(_(name, frame))
        inProgress -= name
        frame match {
          case Some(df) => built(name) = df
          case None     => failed += name
        }
        frame
      }
    }
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
  /** One stage: its upstream dependencies, a rule computing it from them, and
    * the per-stage build handlers (`Dependency.groovy:49-54`):
    *
    * @param beforeBuild fired (in order) immediately before the rule, after
    *                    all dependencies have been built
    * @param afterBuild  fired after the rule, with `Some(frame)` on success or
    *                    `None` when the rule failed but `propagateFailure` is
    *                    false (the reference calls afterBuild in that case too)
    * @param onFail      fired when the rule throws, before any rethrow
    * @param propagateFailure rethrow the rule's exception after `onFail`
    *                    (default true, as in the reference); false swallows it
    *                    and lets independent subtrees keep building
    */
  final case class Stage(
      deps: Seq[String],
      rule: Map[String, DataFrame] => DataFrame,
      beforeBuild: Seq[String => Unit] = Nil,
      afterBuild: Seq[(String, Option[DataFrame]) => Unit] = Nil,
      onFail: Seq[(String, Throwable) => Unit] = Nil,
      propagateFailure: Boolean = true
  )

  def apply(stages: (String, Stage)*): StageGraph = new StageGraph(stages.toMap)
}
