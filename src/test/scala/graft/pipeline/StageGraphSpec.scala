package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** Dependency-graph executor tests mirroring the reference's DependencyTest
  * layer (`/root/reference/test/groovy/haplorec/test/util/dependency/DependencyTest.groovy`):
  * build order, memoization, partial builds via overrides, cycle detection,
  * levels.
  */
class StageGraphSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .appName("graft-stagegraph-spec")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  def df(tag: String): DataFrame = {
    import spark.implicits._
    Seq(tag).toDF("tag")
  }

  def graph(log: scala.collection.mutable.Buffer[String]): StageGraph = {
    def rule(name: String, deps: Seq[String] = Nil): (String, StageGraph.Stage) =
      name -> StageGraph.Stage(deps, { _ => log += name; df(name) })
    StageGraph(
      rule("a"),
      rule("b", Seq("a")),
      rule("c", Seq("a")),
      rule("d", Seq("b", "c")),
      rule("e", Seq("d")))
  }

  test("post-order build runs each rule exactly once") {
    val log = scala.collection.mutable.Buffer[String]()
    val built = graph(log).build()
    assert(built.keySet == Set("a", "b", "c", "d", "e"))
    assert(log.count(_ == "a") == 1) // memoized despite two dependants
    assert(log.indexOf("a") < log.indexOf("b"))
    assert(log.indexOf("d") < log.indexOf("e"))
  }

  test("input override short-circuits upstream rules") {
    val log = scala.collection.mutable.Buffer[String]()
    val built = graph(log).build(
      targets = Seq("e"),
      overrides = Map("d" -> df("given-d")))
    // providing d means a/b/c never run
    assert(log.toList == List("e"))
    assert(built("d").collect().head.getString(0) == "given-d")
  }

  test("partial build of an intermediate target") {
    val log = scala.collection.mutable.Buffer[String]()
    graph(log).build(targets = Seq("b"))
    assert(log.toList == List("a", "b"))
  }

  test("cycle detection") {
    val g = StageGraph(
      "x" -> StageGraph.Stage(Seq("y"), _ => df("x")),
      "y" -> StageGraph.Stage(Seq("x"), _ => df("y")))
    intercept[IllegalStateException] { g.build(targets = Seq("x")) }
  }

  test("levels: shortest path to a leaf") {
    val log = scala.collection.mutable.Buffer[String]()
    val levels = graph(log).levels
    assert(levels("e") == 0)
    assert(levels("d") == 1)
    assert(levels("b") == 2 && levels("c") == 2)
    assert(levels("a") == 3)
  }

  /** The haplorec pipeline shape (`Pipeline.groovy:484-525`), for the layout
    * methods (`Dependency.groovy:178-317`).
    */
  private def pipelineShape: StageGraph = {
    def s(name: String, deps: String*): (String, StageGraph.Stage) =
      name -> StageGraph.Stage(deps, _ => df(name))
    StageGraph(
      s("variant"),
      s("hetVariant", "variant"),
      s("haplotypeCalls", "variant", "hetVariant"),
      s("geneHaplotype", "haplotypeCalls"),
      s("novelHaplotype", "haplotypeCalls"),
      s("genotype", "geneHaplotype"),
      s("genePhenotype", "genotype"),
      s("genotypeDrugRecommendation", "genotype"),
      s("phenotypeDrugRecommendation", "genePhenotype"))
  }

  test("dependants: reverse adjacency (Dependency.groovy:178-194)") {
    val d = pipelineShape.dependants
    assert(d("variant") == Set("hetVariant", "haplotypeCalls"))
    assert(d("haplotypeCalls") == Set("geneHaplotype", "novelHaplotype"))
    assert(d("genotype") == Set("genePhenotype", "genotypeDrugRecommendation"))
    assert(d("phenotypeDrugRecommendation") == Set())
  }

  /** A <- B <- C chain with `numHandlers` handlers of each kind per stage,
    * mirroring the reference's `buildHandlerTest`/`onFailTest` fixtures
    * (`DependencyTest.groovy` testBeforeBuild/testAfterBuild/
    * testOnFailWithPropagation). Handlers log "<stage><i>" so both
    * registration order and dependency order are asserted.
    */
  private def handlerChain(
      fail: Set[String],
      propagate: Boolean,
      before: scala.collection.mutable.Buffer[String],
      after: scala.collection.mutable.Buffer[String],
      onFail: scala.collection.mutable.Buffer[String],
      numHandlers: Int = 2): StageGraph = {
    def stage(name: String, deps: String*): (String, StageGraph.Stage) =
      name -> StageGraph.Stage(
        deps,
        rule = dfs => {
          deps.foreach(dfs(_)) // missing (failed) dep key throws, as in the reference's missing table
          if (fail(name)) throw new RuntimeException(s"fail $name") else df(name)
        },
        beforeBuild = (1 to numHandlers).map(i => (n: String) => before += s"$n$i"),
        afterBuild = (1 to numHandlers).map(i => (n: String, _: Option[DataFrame]) => after += s"$n$i"),
        onFail = (1 to numHandlers).map(i => (n: String, _: Throwable) => onFail += s"$n$i"),
        propagateFailure = propagate)
    StageGraph(stage("a"), stage("b", "a"), stage("c", "b"))
  }

  private def expected(names: String*): List[String] =
    names.toList.flatMap(n => Seq(s"${n}1", s"${n}2"))

  test("beforeBuild/afterBuild fire in registration + dependency order (testBeforeBuild/testAfterBuild)") {
    val (b, a, f) = (scala.collection.mutable.Buffer[String](),
      scala.collection.mutable.Buffer[String](), scala.collection.mutable.Buffer[String]())
    handlerChain(Set.empty, propagate = true, b, a, f).build(targets = Seq("c"))
    assert(b.toList == expected("a", "b", "c"))
    assert(a.toList == expected("a", "b", "c"))
    assert(f.isEmpty)
  }

  test("onFail with propagation (testOnFailWithPropagation)") {
    // (stages that fail, expected onFail stages, expected beforeBuild stages)
    val scenarios = Seq(
      (Set("a"), Seq("a"), Seq("a")),
      (Set("b"), Seq("b"), Seq("a", "b")),
      (Set("c"), Seq("c"), Seq("a", "b", "c")),
      (Set("a", "b", "c"), Seq("a"), Seq("a")))
    scenarios.foreach { case (fail, expFail, expBefore) =>
      val (b, a, f) = (scala.collection.mutable.Buffer[String](),
        scala.collection.mutable.Buffer[String](), scala.collection.mutable.Buffer[String]())
      val g = handlerChain(fail, propagate = true, b, a, f)
      intercept[RuntimeException] { g.build(targets = Seq("c")) }
      assert(f.toList == expected(expFail: _*), s"onFail for fail=$fail")
      assert(b.toList == expected(expBefore: _*), s"beforeBuild for fail=$fail")
      // afterBuild never fires for the failing stage when propagating, and
      // dependants of the failure never start.
      assert(a.toList == expected(expBefore.filterNot(fail): _*), s"afterBuild for fail=$fail")
    }
  }

  test("propagateFailure=false: afterBuild still fires, dependants see the missing frame, independent subtrees build") {
    val (b, a, f) = (scala.collection.mutable.Buffer[String](),
      scala.collection.mutable.Buffer[String](), scala.collection.mutable.Buffer[String]())
    // a fails (swallowed); b's rule then throws on the missing "a" input
    // (swallowed); c likewise. An independent stage z still builds.
    val chain = handlerChain(Set("a"), propagate = false, b, a, f)
    val zLog = scala.collection.mutable.Buffer[String]()
    val g = StageGraph(
      (chain.stageDefs.toSeq :+
        ("z" -> StageGraph.Stage(Nil, _ => { zLog += "z"; df("z") }))): _*)
    val built = g.build() // both leaves: c and z
    assert(built.keySet == Set("z"))
    assert(zLog.toList == List("z"))
    // reference fall-through: afterBuild fires even though the rule failed
    assert(f.toList == expected("a", "b", "c"))
    assert(a.toList == expected("a", "b", "c"))
    assert(b.toList == expected("a", "b", "c"))
  }

  test("rowLevels: per-column 2-D layout rows (Dependency.groovy:204-317)") {
    val g = pipelineShape
    // column levels first (min distance to a no-dependant leaf)
    val lv = g.levels
    assert(Seq("novelHaplotype", "genotypeDrugRecommendation",
      "phenotypeDrugRecommendation").forall(lv(_) == 0))
    assert(Seq("genotype", "genePhenotype", "haplotypeCalls").forall(lv(_) <= 1))
    val rows = g.rowLevels
    // level 0: three leaves, no within-level deps -> name-sorted rows
    assert(rows("genotypeDrugRecommendation") == 0)
    assert(rows("novelHaplotype") == 1)
    assert(rows("phenotypeDrugRecommendation") == 2)
    // level 1: genotype chains to genePhenotype within the level; the
    // haplotypeCalls root follows as its own group
    assert(rows("genotype") == 0)
    assert(rows("genePhenotype") == 1)
    assert(rows("haplotypeCalls") == 2)
    // level 2: geneHaplotype is a lone root; variant -> hetVariant chain
    assert(rows("geneHaplotype") == 0)
    assert(rows("variant") == 1)
    assert(rows("hetVariant") == 2)
  }
}
