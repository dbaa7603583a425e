package graft.operators

import org.apache.spark.sql.functions._

/** Dev profiler for the BPE family: attributes tok_bpe_encode time to its
  * stages (tokenize, per-round pair count / merge / total). Test-scoped
  * (`sbt "Test/runMain graft.operators.ProfileBpe [sfDir]"`).
  */
object ProfileBpe {
  def time[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[prof] $name%-32s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.builder("graft-prof-bpe", "32").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm-up
    spark.range(1000000).selectExpr("sum(id)").collect()

    for (rep <- 1 to 2) {
      println(s"== rep $rep ==")
      time("whole bpeEncode") {
        graft.operators.FamilyCache.release()
        Features.bpeEncode(spark, dir).collect().length
      }
      time("whole bpeTrain (cached family)") {
        Features.bpeTrain(spark, dir).collect().length
      }
    }
    spark.stop()
  }
}
