package graft.tools

import org.apache.spark.sql.functions._

/** Dev micro-benchmark: the oracle-portable md5-prefix token hash, column
  * form (`conv(substring(md5(x),1,15),16,10)`) vs a compiled kernel
  * building the same 60-bit value straight from the digest bytes — no hex
  * string, no base-16 parse. Equality is asserted on every row before any
  * timing is trusted.
  *
  * Usage: runMain graft.tools.HashPerf [nRows]
  */
object HashPerf {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(5000000L)
    val spark = graft.GraftSession.builder("graft-hash-perf",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = spark.range(n)
      .select(concat(lit("tok_"), col("id") % 100000).cast("binary").as("b"))
      .localCheckpoint(true)

    val colForm = graft.functions.TextFunctions.portableTokenHashColumnForm(col("b"))
    val kernel = graft.functions.TextFunctions.portableTokenHash(col("b"))

    // correctness first: bit-identical on every row
    val diff = df.select(colForm.as("a"), kernel.as("k"))
      .filter(col("a") =!= col("k") || col("a").isNull =!= col("k").isNull)
      .count()
    println(s"[hashperf] mismatches=$diff (must be 0)")

    def time(tag: String)(c: org.apache.spark.sql.Column): Unit = {
      for (rep <- 1 to 3) {
        val t0 = System.nanoTime()
        df.select(c.as("h")).agg(expr("bit_xor(h)")).collect()
        println(f"[hashperf] $tag rep=$rep ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }
    time("column-form")(colForm)
    time("kernel     ")(kernel)
    spark.stop()
  }
}
