package graft.tools

/** Dev probe (r12, verdict item 6): the pigeonhole bucket-join + hamming
  * verify tail shared by the simhash/phash families — dumps its plan
  * (join strategy / build side) and times it with the signature stage
  * pre-materialized, for both the token-simhash and phash signature sets.
  *
  * Usage: runMain graft.tools.BucketVerifyProbe [sfDir] [reps]
  */
object BucketVerifyProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = graft.GraftSession.builder("graft-bucket-verify-probe",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"), dir).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // signature stages pre-materialized so the probe times the verify alone
    val tokSigs = graft.operators.Dedup.simhashSignaturesKernel(
      graft.Tables.documents(spark, dir), portable = false)
      .localCheckpoint(true)
    val phSigs = graft.operators.Multimodal.phashSignaturesKernel(
      graft.operators.Multimodal.asBinaryPayload(spark, dir), portable = false)
      .localCheckpoint(true)

    val planDir = java.nio.file.Paths.get("plans/r12")
    java.nio.file.Files.createDirectories(planDir)
    def stage(sigs: org.apache.spark.sql.DataFrame) =
      graft.operators.Dedup.simhashBucketVerifyPlan(sigs, 100000)._1
    def dump(name: String, df: org.apache.spark.sql.DataFrame): Unit =
      java.nio.file.Files.write(planDir.resolve(name),
        df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode).getBytes("UTF-8"))
    dump("bucket_verify_token_stage.txt", stage(tokSigs))
    dump("bucket_verify_phash_stage.txt", stage(phSigs))

    def time(tag: String, f: () => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      f().write.format("noop").mode("overwrite").save()
      println(f"[bucketverify] $tag ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    for (_ <- 1 to reps) {
      time("token-verify", () => stage(tokSigs))
      time("phash-verify", () => stage(phSigs))
    }
    spark.stop()
  }
}
