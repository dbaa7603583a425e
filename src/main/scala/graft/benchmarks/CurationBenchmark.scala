package graft.benchmarks

import org.apache.spark.sql.functions._

import graft.harness._
import graft.operators.{Dedup, TextOps}

/** Training-data curation benchmark — the engine's own extended workload
  * (no reference analog: timedf stops at tabular analytics). Stages the
  * full governance pipeline over the documents fixture with the same
  * nested stage timer / laziness-fencing discipline as the ported
  * benchmarks, so curation throughput is measured the way the reference
  * measures its workloads:
  *
  *   load → quality+repetition scoring → exact dedup → near-dup pairs →
  *   decontamination → manifest.
  *
  * `-validation` cross-checks stage outputs against each other (manifest
  * exclusions really excluded), mirroring ny_taxi's validation flag.
  */
final class CurationBenchmark extends BaseBenchmark {
  override def name: String = "curation"

  override protected def runBenchmark(params: RunParams): BenchmarkResults = {
    val tm = new TimerManager
    val s = SparkBackend.session(params.numThreads, name)
    val dir = params.dataDir
    var manifestCount = 0L
    var purgedCount = 0L
    tm.timeit("total") {
      val docs = tm.timeit("load_data") {
        SparkBackend.triggerLoading(graft.Tables.documents(s, dir))
      }
      tm.timeit("quality_scoring") {
        SparkBackend.triggerExecution(TextOps.qualityScore(s, dir))
        SparkBackend.triggerExecution(TextOps.repetition(s, dir))
      }
      tm.timeit("dedup_exact") {
        SparkBackend.triggerExecution(Dedup.exact(s, dir))
      }
      tm.timeit("dedup_near") {
        Dedup.releasePairs() // charge the pair pipeline to this stage
        purgedCount = Dedup.purge(s, dir).filter(col("purge")).count()
      }
      tm.timeit("decontaminate") {
        SparkBackend.triggerExecution(TextOps.decontaminate(s, dir))
      }
      tm.timeit("manifest") {
        manifestCount = TextOps.trainingManifest(s, dir).count()
      }
      docs.unpersist()
    }
    if (params.validation) {
      val manifestIds = TextOps.trainingManifest(s, dir)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      val purged = Dedup.purge(s, dir).filter(col("purge"))
        .select("doc_id").collect().map(_.getLong(0)).toSet
      require((manifestIds & purged).isEmpty,
        s"validation failed: ${(manifestIds & purged).size} purged docs in manifest")
      println(s"[curation] validation OK: ${manifestIds.size} manifest docs, " +
        s"${purged.size} purged, overlap 0")
    }
    BenchmarkResults(tm.results,
      Map("backend" -> params.backend,
        "manifest_docs" -> manifestCount.toString,
        "purged_docs" -> purgedCount.toString))
  }
}
