package graft.harness

/** CLI entry mirroring the reference's `benchmark-run` console script
  * (/root/reference/timedf/scripts/benchmark_run.py:40-112 and
  * timedf/arg_parser.py:100-192): positional benchmark name + flags, an
  * iteration loop with a run id and memory tracking, stdout results, and an
  * optional JSONL results sink.
  *
  * Usage:
  *   graft.harness.BenchmarkRun <bench_name> [-data_file DIR]
  *     [-iterations N] [-no_ml] [-num_threads N] [-backend LABEL]
  *     [-save_results PATH] [-tag TAG] [-validation]
  */
object BenchmarkRun {

  def parse(args: Array[String]): (String, RunParams, Option[String], String) = {
    require(args.nonEmpty, "usage: BenchmarkRun <bench_name> [flags]")
    val benchName = args(0)
    // benchmark-declared flags (reference add_benchmark_args): resolved
    // from the registry so `parse` stays a pure function of args
    val specs: Map[String, ArgSpec] = BenchmarkRegistry.all.get(benchName)
      .map(_().benchmarkArgs.map(a => a.name -> a).toMap)
      .getOrElse(Map.empty)
    var p = RunParams(dataDir = "/root/testdata/sf0.001")
    var save: Option[String] = None
    var tag = ""
    var extra = Map.empty[String, String]
    var dbName: Option[String] = None
    var i = 1
    while (i < args.length) {
      val flag = args(i).dropWhile(_ == '-')
      args(i) match {
        case "-data_file" | "--data_file" => p = p.copy(dataDir = args(i + 1)); i += 2
        case "-iterations" | "--iterations" => p = p.copy(iterations = args(i + 1).toInt); i += 2
        case "-no_ml" | "--no_ml" => p = p.copy(noMl = true); i += 1
        case "-num_threads" | "--num_threads" => p = p.copy(numThreads = args(i + 1).toInt); i += 2
        case "-backend" | "--backend" => p = p.copy(backend = args(i + 1)); i += 2
        case "-save_results" | "--save_results" => save = Some(args(i + 1)); i += 2
        // reference -db_name (arg_parser.py:94-99); embedded Derby here,
        // so the "name" is a database directory path
        case "-db_name" | "--db_name" => dbName = Some(args(i + 1)); i += 2
        case "-tag" | "--tag" => tag = args(i + 1); i += 2
        case "-validation" | "--validation" => p = p.copy(validation = true); i += 1
        case _ if specs.contains(flag) =>
          if (specs(flag).takesValue) { extra += flag -> args(i + 1); i += 2 }
          else { extra += flag -> "true"; i += 1 }
        case other => throw new IllegalArgumentException(s"unknown flag: $other")
      }
    }
    specs.values.foreach { a =>
      if (!extra.contains(a.name)) a.default.foreach(d => extra += a.name -> d)
    }
    dbName.foreach(d => extra += "db_name" -> d)
    (benchName, p.copy(extra = extra), save, tag)
  }

  def main(args: Array[String]): Unit = {
    val (benchName, params, save, tag) = parse(args)
    val benchmark = BenchmarkRegistry.create(benchName)
    val runId = System.currentTimeMillis() / 1000
    val host = Results.hostInfo()
    // SQL sink (reference BenchmarkDb): embedded Derby at -db_name
    val db = params.extra.get("db_name")
      .map(d => new BenchmarkDb(BenchmarkDb.embeddedUrl(d)))
    // -validation: cross-iteration result comparison (the reference declares
    // this flag but never compares; here each iteration's per-query result
    // digests must agree)
    val validationDigests =
      scala.collection.mutable.Map.empty[String, scala.collection.mutable.Set[String]]
    for (iter <- 1 to params.iterations) {
      val tracker = new MemoryTracker()
      tracker.start()
      val res = benchmark.run(params)
      val peakMb = tracker.stop()
      res.params.foreach { case (k, v) =>
        if (k.startsWith("validation_"))
          validationDigests.getOrElseUpdate(k,
            scala.collection.mutable.Set.empty) += v
      }
      println(s"== $benchName iteration $iter/${params.iterations} ==")
      Results.printResults(res.measurements)
      println(f"max_memory_mb${" " * 27} = $peakMb%10d MB")
      val record = Results.Iteration(
        benchmark = benchName,
        backend = params.backend,
        iterationNo = iter,
        runId = runId,
        dateIso = java.time.Instant.ofEpochSecond(runId).toString,
        hostInfo = host + ("max_memory_mb" -> peakMb.toString),
        params = res.params ++ params.extra ++ Map(
          "data_file" -> params.dataDir,
          "num_threads" -> params.numThreads.toString,
          "tag" -> tag),
        measurements = res.measurements.toSeq.sortBy(_._1)
          .map { case (n, d) => Results.Measurement(n, d) })
      save.foreach(Results.append(_, record))
      db.foreach(_.report(record))
    }
    db.foreach(_.close())
    if (params.validation && params.iterations > 1) {
      val diverging = validationDigests.filter(_._2.size > 1).keys.toSeq.sorted
      if (diverging.isEmpty)
        println(s"validation: PASS (${validationDigests.size} queries stable across ${params.iterations} iterations)")
      else {
        println(s"validation: FAIL — diverging results for ${diverging.mkString(", ")}")
        sys.exit(2)
      }
    }
  }
}
