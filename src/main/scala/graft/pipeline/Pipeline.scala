package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Top-level pipeline: wires the stage rules into a [[StageGraph]] with
  * input-override semantics matching the reference's `Pipeline.pipelineJob`
  * (`/root/reference/src/groovy/haplorec/util/pipeline/Pipeline.groovy:554-702`).
  *
  * Graph shape (`Pipeline.groovy:484-525`):
  * {{{
  *   genotypeDrugRecommendation ← genotype ← geneHaplotype ← hetVariant ← variant
  *   phenotypeDrugRecommendation ← genePhenotype ← genotype
  *   novelHaplotype ← (same calls pass as geneHaplotype)
  * }}}
  *
  * A "job" is one run over one input batch; `job_id` is a plain column and
  * re-running a job is overwrite-by-job_id (`Pipeline.groovy:554-576`) — on a
  * partitioned sink that is a partition overwrite, here the caller simply
  * replaces the returned frames.
  */
object Pipeline {

  /** Direct-input stages (`PipelineInput.groovy:15-24`): rows provided for a
    * stage table get `job_id` injected and `het_combo = het_combos = 1`
    * defaults where the table carries combo fields
    * (`Pipeline.groovy:578-619`).
    */
  def withJobDefaults(df: DataFrame, jobId: Long, hetComboFields: Boolean): DataFrame = {
    val withJob =
      if (df.columns.contains("job_id")) df else df.withColumn("job_id", lit(jobId))
    if (!hetComboFields) withJob
    else {
      val withCombo =
        if (withJob.columns.contains("het_combo")) withJob
        else withJob.withColumn("het_combo", lit(1))
      if (withCombo.columns.contains("het_combos")) withCombo
      else withCombo.withColumn("het_combos", lit(1))
    }
  }

  /** Run one job. Any of the four input kinds may be provided
    * (`variant` is the usual entry; later stages short-circuit their
    * upstream rules exactly like the reference's input overrides).
    *
    * @return stage alias -> materialized frame for all 8 stage tables that
    *         were buildable from the provided inputs
    */
  def runJob(
      spark: SparkSession,
      refs: ReferenceTables,
      jobId: Long,
      variants: Option[DataFrame] = None,
      geneHaplotypes: Option[DataFrame] = None,
      genotypes: Option[DataFrame] = None,
      genePhenotypes: Option[DataFrame] = None,
      persistLevel: StorageLevel = StorageLevel.MEMORY_AND_DISK
  ): Map[String, DataFrame] = {
    val matrices = refs.broadcastMatrices(spark)

    val graph = StageGraph(
      "variant" -> StageGraph.Stage(Nil, _ =>
        throw new IllegalArgumentException("variant input required")),
      "hetVariant" -> StageGraph.Stage(Seq("variant"), deps =>
        PipelineStages.variantToHetVariant(spark, deps("variant"), refs, matrices)),
      "haplotypeCalls" -> StageGraph.Stage(Seq("variant", "hetVariant"), deps =>
        PipelineStages.variantToHaplotypeCalls(
          spark, deps("variant"), deps("hetVariant"), refs, matrices)),
      "geneHaplotype" -> StageGraph.Stage(Seq("haplotypeCalls"), deps =>
        PipelineStages.geneHaplotypeFromCalls(deps("haplotypeCalls"))),
      "novelHaplotype" -> StageGraph.Stage(Seq("haplotypeCalls"), deps =>
        PipelineStages.novelHaplotypeFromCalls(deps("haplotypeCalls"))),
      "genotype" -> StageGraph.Stage(Seq("geneHaplotype"), deps =>
        PipelineStages.geneHaplotypeToGenotype(deps("geneHaplotype"))),
      "genePhenotype" -> StageGraph.Stage(Seq("genotype"), deps =>
        PipelineStages.genotypeToGenePhenotype(deps("genotype"), refs)),
      "genotypeDrugRecommendation" -> StageGraph.Stage(Seq("genotype"), deps =>
        PipelineStages.genotypeToGenotypeDrugRecommendation(deps("genotype"), refs)),
      "phenotypeDrugRecommendation" -> StageGraph.Stage(Seq("genePhenotype"), deps =>
        PipelineStages.genePhenotypeToPhenotypeDrugRecommendation(
          deps("genePhenotype"), refs)))

    val overrides = Seq(
      variants.map("variant" -> withJobDefaults(_, jobId, hetComboFields = false)),
      geneHaplotypes.map("geneHaplotype" -> withJobDefaults(_, jobId, hetComboFields = true)),
      genotypes.map("genotype" -> withJobDefaults(_, jobId, hetComboFields = true)),
      genePhenotypes.map("genePhenotype" -> withJobDefaults(_, jobId, hetComboFields = true))
    ).flatten.toMap

    require(overrides.nonEmpty, "at least one input stage must be provided")

    // Only build leaves reachable from the provided inputs: e.g. a genotype
    // input cannot (re)build geneHaplotype/novelHaplotype upstream.
    val buildable = reachableTargets(overrides.keySet)

    graph.build(
      targets = buildable,
      overrides = overrides,
      materialize = (_, df) => df.persist(persistLevel))
  }

  /** The fixed stage dependency shape (`Pipeline.groovy:484-525`). */
  val stageDeps: Map[String, Seq[String]] = Map(
    "variant" -> Nil,
    "hetVariant" -> Seq("variant"),
    "haplotypeCalls" -> Seq("variant", "hetVariant"),
    "geneHaplotype" -> Seq("haplotypeCalls"),
    "novelHaplotype" -> Seq("haplotypeCalls"),
    "genotype" -> Seq("geneHaplotype"),
    "genePhenotype" -> Seq("genotype"),
    "genotypeDrugRecommendation" -> Seq("genotype"),
    "phenotypeDrugRecommendation" -> Seq("genePhenotype"))

  /** The pipeline graph with introspection-only rules — for layout/levels/
    * dependants queries (`Dependency.groovy:136-317` parity) without a job.
    */
  def graphShape: StageGraph = new StageGraph(stageDeps.map { case (name, ds) =>
    name -> StageGraph.Stage(ds, _ =>
      throw new UnsupportedOperationException(s"shape-only graph: $name"))
  })

  /** Downstream closure of the provided stages over the fixed graph shape. */
  private def reachableTargets(provided: Set[String]): Seq[String] = {
    val deps = stageDeps.filter(_._2.nonEmpty)
    val buildable = scala.collection.mutable.Set[String](provided.toSeq: _*)
    var changed = true
    while (changed) {
      changed = false
      deps.foreach { case (stage, ds) =>
        if (!buildable(stage) && ds.forall(buildable)) {
          buildable += stage; changed = true
        }
      }
    }
    val order = Seq("variant", "hetVariant", "haplotypeCalls", "geneHaplotype",
      "novelHaplotype", "genotype", "genePhenotype",
      "genotypeDrugRecommendation", "phenotypeDrugRecommendation")
    order.filter(buildable)
  }
}
