package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables

/** Dev profiler for the co-purchase graph family — per-stage timings for
  * the shared pair build and each consumer so suite entries attribute to
  * stages. Test-scoped (`sbt "Test/runMain graft.operators.ProfileGraph"`),
  * not shipped. Mirrors the CURRENT Graph.scala formulations; keep in
  * sync when those change.
  */
object ProfileGraph {
  def time[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[prof] $name%-32s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .appName("graft-prof")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "10000000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()
    val par = spark.sparkContext.defaultParallelism

    val scan = time("scan+repartition") {
      val d = Tables.lineitem(spark, dir)
        .select(col("l_orderkey"), col("l_partkey"))
        .repartition(par).persist()
      d.count(); d
    }
    val byOrder = time("collect_set") {
      val b = scan.groupBy("l_orderkey")
        .agg(collect_set(col("l_partkey")).as("ps"))
        .filter(size(col("ps")) >= 2).persist()
      println(s"  orders=${b.count()}"); b
    }
    val pairs = time("explode+distinct") {
      val p = byOrder.select(col("ps"), explode(col("ps")).as("src"))
        .select(col("src"), explode(col("ps")).as("dst"))
        .filter(col("src") < col("dst"))
        .distinct()
        .repartition(par).persist()
      println(s"  edges=${p.count()}"); p
    }
    val deg = time("degrees") {
      val d = pairs.select(col("src").as("node"))
        .union(pairs.select(col("dst").as("node")))
        .groupBy("node").agg(count(lit(1)).as("deg")).persist()
      println(s"  nodes=${d.count()}"); d
    }
    val edges = pairs.union(pairs.select(col("dst").as("src"), col("src").as("dst")))

    // ---- common neighbors stages (grouped-array wedge form, r7)
    val byCenter = time("cn byCenter") {
      val b = edges.filter(col("dst") % 4 === 0)
        .groupBy(col("src").as("b"))
        .agg(sort_array(collect_set(col("dst"))).as("ns"))
        .filter(size(col("ns")) >= 2)
        .join(broadcast(deg), col("b") === col("node"))
        .select((lit(1.0) / log(col("deg"))).as("w"), col("ns"))
        .persist()
      println(s"  centers=${b.count()}"); b
    }
    val cn = time("cn wedge agg") {
      val c = byCenter
        .select(col("w"), col("ns"), explode(col("ns")).as("a"))
        .select(col("w"), col("a"), explode(col("ns")).as("c"))
        .filter(col("a") < col("c"))
        .repartition(col("a"))
        .groupBy(col("a"), col("c"))
        .agg(count(lit(1)).as("cn"), round(sum(col("w")), 6).as("aa"))
        .filter(col("cn") >= 2).persist()
      println(s"  cn-pairs=${c.count()}"); c
    }
    time("cn rank window") {
      import org.apache.spark.sql.expressions.Window
      val scored = cn
        .join(broadcast(deg.select(col("node").as("a"), col("deg").as("da"))), Seq("a"))
        .join(broadcast(deg.select(col("node").as("c"), col("deg").as("dc"))), Seq("c"))
        .select(col("a").as("part_a"), col("c").as("part_b"), col("cn"),
          round(col("cn") / (col("da") + col("dc") - col("cn")).cast("double"), 6)
            .as("jaccard"),
          col("aa"))
      val w = Window.partitionBy("part_a")
        .orderBy(col("jaccard").desc, col("cn").desc, col("part_b"))
      println(s"  topk=${scored.withColumn("rank", row_number().over(w).cast("int"))
        .filter(col("rank") <= 5).count()}")
    }
    cn.unpersist(false)

    // ---- triangles stages
    val withDeg = pairs
      .join(deg.select(col("node").as("src"), col("deg").as("ds")), Seq("src"))
      .join(deg.select(col("node").as("dst"), col("deg").as("dd")), Seq("dst"))
    val oriented = withDeg.select(
      when(col("ds") <= col("dd"), col("src")).otherwise(col("dst")).as("lo"),
      when(col("ds") <= col("dd"), col("dst")).otherwise(col("src")).as("hi"))
    val adjOut = time("tri adjacency") {
      val a = oriented.groupBy(col("lo").as("node"))
        .agg(collect_list(col("hi")).as("nbrs")).persist()
      a.count(); a
    }
    time("tri intersect+agg") {
      val inter = adjOut
        .select(col("node").as("lo"), col("nbrs").as("ln"),
          explode(col("nbrs")).as("hi"))
        .join(broadcast(adjOut.select(col("node").as("hi"), col("nbrs").as("hn"))),
          Seq("hi"))
        .select(col("lo"), col("hi"),
          array_intersect(col("ln"), col("hn")).as("third"))
      val corners = inter.select(explode(concat(
          array(struct(col("lo").as("node"), size(col("third")).cast("long").as("c")),
                struct(col("hi").as("node"), size(col("third")).cast("long").as("c"))),
          transform(col("third"), x => struct(x.as("node"), lit(1L).as("c"))))).as("e"))
        .filter(col("e.c") > 0)
        .groupBy(col("e.node").as("node")).agg(sum(col("e.c")).as("tri"))
      println(s"  tri-nodes=${corners.count()}")
    }
    spark.stop()
  }
}
