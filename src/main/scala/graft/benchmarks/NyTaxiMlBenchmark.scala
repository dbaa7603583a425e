package graft.benchmarks

import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.regression.GBTRegressor
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.harness._

/** ny_taxi_ml benchmark (reference
  * /root/reference/timedf_benchmarks/ny_taxi_ml/ny_taxi_ml.py): CSV ETL →
  * 17-predicate filter → feature engineering → day<25 split → gradient-
  * boosted-tree regression on fare_amount. Stages: `load_data`, `filter_df`,
  * `feature_engineering`, `split_time`, `train_time` (last two skipped by
  * `-no_ml`, reference :264-278).
  *
  * Offline the taxi frame is derived deterministically from the events
  * fixture (same 10-column keep_cols shape, FIXTURES.md §A2); xgboost is not
  * in the offline jars, so MLlib GBTRegressor stands in (same tree-boosting
  * family; hyperparameters mapped from reference :222-237, iterations
  * reduced 100→20 for the local harness — recorded in params).
  */
final class NyTaxiMlBenchmark extends BaseBenchmark {
  override def name: String = "ny_taxi_ml"

  /** Staged inputs: yellow-tripdata CSVs when present, else the events
    * fixture the offline mapping reads (analog of the reference's
    * ny_taxi_ml tar.gz staging, ny_taxi_ml.py:314-322).
    */
  override def dataFiles: Seq[String] = Seq("*yellow_tripdata*.csv*", "events.parquet")

  override protected def runBenchmark(params: RunParams): BenchmarkResults = {
    val tm = new TimerManager
    val s = SparkBackend.session(params.numThreads, name)
    var extraParams = Map("backend" -> params.backend, "ml" -> (!params.noMl).toString)
    tm.timeit("total") {
      val raw = tm.timeit("load_data") {
        SparkBackend.triggerLoading(loadFrame(s, params.dataDir))
      }
      // P8: conjunctive range filter incl. disjunctive pair + col-vs-col
      // (reference :117-163)
      val filtered = tm.timeit("filter_df") {
        val f = raw.filter(
          col("fare_amount") > 1 && col("fare_amount") < 500 &&
          col("passenger_count") >= 1 && col("passenger_count") <= 6 &&
          col("pickup_longitude") > -75 && col("pickup_longitude") < -73 &&
          col("pickup_latitude") > 40 && col("pickup_latitude") < 42 &&
          col("dropoff_longitude") > -75 && col("dropoff_longitude") < -73 &&
          col("dropoff_latitude") > 40 && col("dropoff_latitude") < 42 &&
          col("trip_distance") > 0 && col("trip_distance") < 500 &&
          (col("trip_distance") <= 50 || col("fare_amount") >= 50) &&
          (col("fare_amount") <= 500 || col("trip_distance") >= 10) &&
          col("dropoff_datetime") > col("pickup_datetime"))
        SparkBackend.triggerLoading(f)
      }
      raw.unpersist()
      // F2/F3/F6/P6/P7: day, epoch diff (seconds), 0.01°-grid cells,
      // euclidean distance (reference :171-183)
      val featured = tm.timeit("feature_engineering") {
        val gridCols = Seq("pickup_longitude", "pickup_latitude",
          "dropoff_longitude", "dropoff_latitude")
        var fe = filtered
          .withColumn("day", dayofmonth(col("pickup_datetime")))
          .withColumn("diff",
            col("dropoff_datetime").cast("long") - col("pickup_datetime").cast("long"))
        for (c <- gridCols)
          fe = fe.withColumn(c + "_r", floor(col(c) / 0.0001))
        fe = fe
          .withColumn("e_distance", sqrt(
            pow(col("pickup_longitude") - col("dropoff_longitude"), 2) +
              pow(col("pickup_latitude") - col("dropoff_latitude"), 2)))
          .drop("pickup_datetime", "dropoff_datetime")
        SparkBackend.triggerLoading(fe)
      }
      filtered.unpersist()
      if (!params.noMl) {
        // P9 split + M3 regression
        val (train, test) = tm.timeit("split_time") {
          val tr = featured.filter(col("day") < 25)
          val te = featured.filter(col("day") >= 25)
          (SparkBackend.triggerLoading(tr), SparkBackend.triggerLoading(te))
        }
        tm.timeit("train_time") {
          val features = train.columns.filterNot(_ == "fare_amount")
          val asm = new VectorAssembler()
            .setInputCols(features).setOutputCol("features")
          val gbt = new GBTRegressor()
            .setLabelCol("fare_amount").setFeaturesCol("features")
            .setMaxDepth(8).setMaxIter(20).setStepSize(0.3)
            .setSubsamplingRate(0.6).setSeed(126)
          val model = gbt.fit(asm.transform(train))
          val mse = model.transform(asm.transform(test))
            .select(avg(pow(col("prediction") - col("fare_amount"), 2)))
            .collect()(0).getDouble(0)
          extraParams += "test_mse" -> f"$mse%.4f"
        }
        train.unpersist(); test.unpersist()
      }
      featured.unpersist()
    }
    BenchmarkResults(tm.results, extraParams)
  }

  /** Derive the 10-column taxi-ml frame (FIXTURES.md §A2) from whatever is
    * available: real CSVs if present, else a deterministic projection of the
    * events fixture.
    */
  private def loadFrame(s: SparkSession, dir: String): DataFrame = {
    val csvs = Option(new java.io.File(dir).list())
      .getOrElse(Array.empty[String]).filter(_.matches(".*yellow_tripdata.*\\.csv.*"))
    if (csvs.nonEmpty) {
      // S3: header + partial schema (rest inferred), names normalized (P4)
      val raw = s.read.option("header", "true").option("inferSchema", "true")
        .csv(csvs.map(f => s"$dir/$f").sorted.toIndexedSeq: _*)
      val norm = raw.toDF(raw.columns.toIndexedSeq.map(_.trim.toLowerCase): _*)
      norm.withColumnRenamed("tpep_pickup_datetime", "pickup_datetime")
        .withColumnRenamed("tpep_dropoff_datetime", "dropoff_datetime")
    } else {
      graft.Tables.events(s, dir).select(
        col("ts").as("pickup_datetime"),
        timestamp_seconds(col("ts").cast("long") + (col("value") * 60).cast("long"))
          .as("dropoff_datetime"),
        (pmod(col("user_id"), lit(6)) + 1).cast("int").as("passenger_count"),
        pmod(col("event_id"), lit(5)).cast("int").as("rate_code"),
        (col("value") / 10).cast("float").as("trip_distance"),
        (lit(-74.0) + pmod(col("event_id"), lit(1000)) / 10000).cast("float").as("pickup_longitude"),
        (lit(40.7) + pmod(col("user_id"), lit(1000)) / 10000).cast("float").as("pickup_latitude"),
        (lit(-74.0) + pmod(col("event_id") * 7, lit(1000)) / 10000).cast("float").as("dropoff_longitude"),
        (lit(40.7) + pmod(col("user_id") * 3, lit(1000)) / 10000).cast("float").as("dropoff_latitude"),
        col("value").cast("float").as("fare_amount"))
    }
  }
}
