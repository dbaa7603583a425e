package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.StructType

/** CSV scan surface of the reference (SURVEY.md §2.1 S1–S6):
  *
  *  - S1: full explicit schema, headerless, gzip auto-detected by extension,
  *    optional row limit, timestamp parsing.
  *  - S2 collapses into S1 (the HDK dtype downgrades were a backend fork).
  *  - S3: header + partial schema — explicit columns override inferred ones.
  *  - S4: skiprows — skip the first N data rows in file order.
  *  - S5/S6: multi-file scan — Spark natively unions and parallelizes a
  *    path list; globs cover directory iteration.
  */
object CsvSource {

  /** S1: headerless CSV with a full explicit schema. `nrows` mirrors the
    * reference's optional row cap (None → all).
    */
  def readFull(s: SparkSession, schema: StructType, paths: Seq[String],
               nrows: Option[Int] = None,
               timestampFormat: String = "yyyy-MM-dd HH:mm:ss"): DataFrame = {
    val df = s.read.schema(schema)
      .option("header", "false")
      .option("timestampFormat", timestampFormat)
      .csv(paths: _*)
    nrows.map(df.limit).getOrElse(df)
  }

  /** S3: header row + partial schema: read with inference, then cast the
    * explicitly-typed columns (the reference passes dtype for a subset and
    * lets pandas infer the rest, ny_taxi_ml.py:53-69).
    */
  def readPartial(s: SparkSession, partial: StructType, paths: Seq[String]): DataFrame = {
    val inferred = s.read.option("header", "true")
      .option("inferSchema", "true").csv(paths: _*)
    partial.fields.foldLeft(inferred) { (df, f) =>
      if (df.columns.contains(f.name))
        df.withColumn(f.name, df(f.name).cast(f.dataType))
      else df
    }
  }

  /** S4: skip the first `n` data rows in file order. File order is only
    * meaningful per input split, so this zips a stable index over the RDD
    * (zipWithIndex preserves partition order = file order for file sources)
    * and filters — the same semantics as the reference's `skiprows`
    * (plasticc_pandas_modin.py:76-81) without collecting anything.
    */
  def skipRows(df: DataFrame, n: Long): DataFrame = {
    val spark = df.sparkSession
    val schema = df.schema
    val rdd = df.rdd.zipWithIndex().filter(_._2 >= n).map(_._1)
    spark.createDataFrame(rdd, schema)
  }

  /** S5: per-file cleaning then union-by-name (ny_taxi_ml reads files with
    * differing header conventions and concats, ny_taxi_ml.py:88-109).
    */
  def unionByName(parts: Seq[DataFrame]): DataFrame =
    parts.reduce(_.unionByName(_, allowMissingColumns = true))
}
