package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object BucketBalance {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions","8")
      .config("spark.ui.enabled","false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    import graft.functions.VectorFunctions
    for (d <- Seq("/root/testdata/sf0.1", "/root/repo/testdata_sf1")) {
      val e = s.read.parquet(s"$d/embeddings.parquet")
      val b = e.select(VectorFunctions.bucketKernel(
        VectorFunctions.hyperplanesFlat(8, 64), 64)(col("embedding")).as("bkt"))
        .groupBy("bkt").count()
      val stats = b.agg(count(lit(1)).as("nb"), max("count").as("mx"),
        sum(col("count")*col("count")).as("pairs")).collect()(0)
      println(s"[bb] $d buckets=${stats.getLong(0)} maxBucket=${stats.getLong(1)} sumSq=${stats.getLong(2)}")
    }
    s.stop()
  }
}
