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
    val dependants = stages.keys.map { k =>
      k -> stages.collect { case (n, s) if s.deps.contains(k) => n }.toSeq
    }.toMap
    def lvl(name: String): Int = memo.getOrElseUpdate(name, {
      val ds = dependants(name)
      if (ds.isEmpty) 0 else ds.map(lvl).min + 1
    })
    stages.keys.map(k => k -> lvl(k)).toMap
  }
}

object StageGraph {
  /** One stage: its upstream dependencies and a rule computing it from them. */
  final case class Stage(deps: Seq[String], rule: Map[String, DataFrame] => DataFrame)

  def apply(stages: (String, Stage)*): StageGraph = new StageGraph(stages.toMap)
}
