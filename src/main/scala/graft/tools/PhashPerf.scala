package graft.tools

/** Dev micro-benchmark: the phash signature stage, declarative pipeline
  * (explode per byte offset → gram hash → graft_simhash aggregate) vs
  * the one-pass per-payload kernel, interleaved reps in one JVM so host
  * noise hits both arms. Equality is asserted before timing.
  *
  * Usage: runMain graft.tools.PhashPerf [sfDir] [reps]
  */
object PhashPerf {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(3)
    val spark = graft.GraftSession.builder("graft-phash-perf",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"), dir).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    val payload = graft.operators.Multimodal.asBinaryPayload(spark, dir)
      .localCheckpoint(true)

    val pipe = () => graft.operators.Multimodal.phashSignatures(
      payload, graft.functions.TextFunctions.portableTokenHash(_))
    val kern = () => graft.operators.Multimodal.phashSignaturesKernel(
      payload, portable = true)
    val pipeX = () => graft.operators.Multimodal.phashSignatures(payload, xxhash64(_))
    val kernX = () => graft.operators.Multimodal.phashSignaturesKernel(
      payload, portable = false)

    // equality before timing, BOTH arms (r11 ADVICE: the xx arm was
    // previously pinned only by the spec, so the probe could in principle
    // time a diverging kernel)
    val diff = pipe().exceptAll(kern()).count() + kern().exceptAll(pipe()).count()
    println(s"[phashperf] portable mismatches=$diff (must be 0)")
    val diffX = pipeX().exceptAll(kernX()).count() + kernX().exceptAll(pipeX()).count()
    println(s"[phashperf] xxhash64 mismatches=$diffX (must be 0)")
    require(diff == 0 && diffX == 0, "kernel/pipeline divergence — do not time")

    // plan evidence for the r11 record: the signature STAGE's plans
    // (the public operators materialize eagerly, so their own explain
    // shows only the checkpoint scan)
    // r12: dump to the CURRENT round dir — this probe overwrote the
    // committed r11 artifacts when re-run (round dirs are append-only records)
    val planDir = java.nio.file.Paths.get("plans/r12")
    java.nio.file.Files.createDirectories(planDir)
    def dump(name: String, df: org.apache.spark.sql.DataFrame): Unit =
      java.nio.file.Files.write(planDir.resolve(name),
        df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode).getBytes("UTF-8"))
    dump("phash_sig_stage_pipeline.txt", pipe())
    dump("phash_sig_stage_kernel.txt", kern())
    dump("token_simhash_sig_stage_pipeline.txt",
      graft.operators.Dedup.simhashSignatures(
        graft.Tables.documents(spark, dir), xxhash64(_)))
    dump("token_simhash_sig_stage_kernel.txt",
      graft.operators.Dedup.simhashSignaturesKernel(
        graft.Tables.documents(spark, dir), portable = false))

    def time(tag: String, f: () => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      f().write.format("noop").mode("overwrite").save()
      println(f"[phashperf] $tag ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    for (_ <- 1 to reps) {
      time("pipeline-md5", pipe)
      time("kernel-md5  ", kern)
      time("pipeline-xx ", pipeX)
      time("kernel-xx   ", kernX)
    }
    spark.stop()
  }
}
