package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      // events.parquet carries TIMESTAMP(NANOS) — see Readers.table
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the JVM (codegen, shuffle, parquet reader paths) so the
    // first timed query doesn't absorb session init + JIT cost.
    locally {
      import org.apache.spark.sql.functions._
      val w = spark.range(0, 200000).select(col("id"), (col("id") % 97).as("k"))
      w.groupBy("k").count().count()
      w.join(w.limit(1000), "id").count()
      // JSON parser (Jackson) class-load + JIT — ~3 s on first use otherwise
      w.limit(50000)
        .select(from_json(concat(lit("{\"k\": "), col("k"), lit("}")),
          new org.apache.spark.sql.types.StructType().add("k", "int")).getField("k"))
        .agg(count(lit(1))).count()
    }
    // SPARK_GRAFT_ONLY=q1,q2 → time just those (repeated per
    // SPARK_GRAFT_REPS) for local isolation; driver runs never set it.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "1").toInt
    val selected = SparkEntry.queries.filter { case (n, _) => only.forall(_(n)) }
    // Dry-run every selected query at a small SF first: each plan's
    // whole-stage-codegen classes get compiled + JIT'd outside the
    // timed region, so per-query numbers reflect steady-state execution
    // rather than which query happened to run first. (The generic
    // warmup above covers shared infrastructure; this covers per-plan
    // generated code.) ONE pass: a second pass was A/B'd under a
    // dropped page cache (r7: 110.5 s one-pass vs 116.6 s two-pass)
    // and does not repay its block-manager/GC pressure — the same
    // result as round 6's rejected warm-at-target-SF experiment.
    // Disable with SPARK_GRAFT_WARM_SF=""; tune with
    // SPARK_GRAFT_WARM_REPS.
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_SF", "/root/testdata/sf0.001")
    val warmReps = sys.env.get("SPARK_GRAFT_WARM_REPS")
      .filter(_.nonEmpty).map(_.toInt).getOrElse(1)
    if (warmDir.nonEmpty && new java.io.File(warmDir).isDirectory)
      (1 to warmReps).foreach { _ =>
        selected.foreach { case (_, fn) =>
          try fn(spark, warmDir).count() catch { case _: Throwable => () }
        }
      }
    // Round 16 (r15 verdict item 5 — per-key attribution for shared
    // builds): materialize every SessionCache family HERE, each timed
    // as its own entry, so the alphabetically-first consumer key no
    // longer absorbs its family's build cost. The suite total still
    // counts every build second (the accounting moves, the honesty
    // doesn't); per-key numbers become steady-state marginal costs —
    // the same quantity the isolated SPARK_GRAFT_ONLY protocol
    // reports. Full runs only by default: ONLY-isolation keeps the
    // historical key-pays-its-builds protocol (BASELINE.md rows were
    // recorded under it) unless SPARK_GRAFT_PREBUILD=1 asks for the
    // marginal form.
    val prebuild = sys.env.get("SPARK_GRAFT_PREBUILD")
      .map(_ == "1").getOrElse(only.isEmpty)
    val builds: Seq[(String, Double)] =
      if (!prebuild) Seq.empty
      else graft.ops.SharedBuilds.all.map { case (kind, fn) =>
        System.gc()
        val t0 = System.nanoTime()
        try fn(spark, sfDir)
        catch { case e: Throwable =>
          System.err.println(s"[bench] build $kind failed: ${e.getMessage}")
        }
        kind -> (System.nanoTime() - t0) / 1e9
      }
    val errors = scala.collection.mutable.ListBuffer.empty[String]
    // Cumulative collector time NOW — sampled around each key's timed
    // loop (round 19, r18 verdict item 2): the delta separates "this
    // key is hot" from "this key absorbed the window's GC pressure"
    // from the artifact alone, which three rounds of driver-read
    // adjudication needed BASELINE cross-referencing for.
    def gcNow(): Long = try {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(_.getCollectionTime).filter(_ > 0).sum
    } catch { case _: Throwable => 0L }
    val gcByKey = scala.collection.mutable.Map.empty[String, Long]
    // r19 ADVICE: an unwritable keylog path must never abort the
    // measurement run mid-suite — warn once and disable the sink.
    var keylogOk = true
    val results = selected.map { case (name, fn) =>
      var last = 0.0
      (1 to reps).foreach { _ =>
        // Collect other queries' garbage outside the timed region so a
        // query's number reflects its own allocation behavior.
        System.gc()
        val g0 = gcNow()
        val t0 = System.nanoTime()
        try fn(spark, sfDir).count()
        catch { case e: Throwable =>
          // A failed query would otherwise clock near-zero and silently
          // flatter the total — surface it in the JSON and on stderr.
          if (!errors.contains(name)) errors += name
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
        }
        last = (System.nanoTime() - t0) / 1e9
        // collector centiseconds INSIDE this key's timed region (last
        // rep, matching `last`); the System.gc() above is outside both
        gcByKey(name) = (gcNow() - g0) / 10
      }
      // Per-key progress, opt-in (SPARK_GRAFT_VERBOSE=1 → stderr;
      // SPARK_GRAFT_KEYLOG=path → timestamped file, append+flush per
      // key, for correlating keys against an external monitor — sbt
      // buffers stderr too coarsely for that). Local diagnosis only;
      // stderr lines land BEFORE the final JSON println, so the
      // driver's 2000-char output tail still ends with the artifact.
      if (sys.env.get("SPARK_GRAFT_VERBOSE").contains("1"))
        System.err.println(
          f"[bench-key] $name $last%.2f s gc=${gcByKey(name)}cs")
      if (keylogOk) sys.env.get("SPARK_GRAFT_KEYLOG").foreach { p =>
        try {
          val w = new java.io.FileWriter(p, true)
          try w.write(f"${System.currentTimeMillis()} $name $last%.3f ${gcByKey(name)}\n")
          finally w.close()
        } catch { case e: Throwable =>
          keylogOk = false
          System.err.println(s"[bench] keylog disabled (${e.getMessage})")
        }
      }
      name -> last
    }
    // The whole JSON line must survive the driver's 2000-char output
    // tail (r01's full per-query map was ~3 KB and parsed as null):
    // name only the 10 slowest, but carry EVERY query's timing as
    // centiseconds in ALPHABETICAL key order ("all_cs") — ~600 chars
    // for 139 keys, so any regression is attributable from the round
    // artifact alone (decode: sort the key names, zip with the CSV).
    def r3(v: Double): String = "%.3f".format(v)
    // Machine fingerprint (r7 verdict "Next round" #2): the fixed
    // 79.2 s bound proved to measure VM lottery — a judge-replicated
    // 1.41× swing with ZERO code change between round VMs. Carry the
    // normalization evidence IN the artifact: cpu model, 1-min
    // loadavg, and a fixed single-thread xorshift calibration loop
    // (~0.5 s; run twice, second timing reported, so JIT is outside
    // the measure). Cross-VM normalization = ratio of cal_ms values.
    def calibrate(): Long = {
      var x = 0x9E3779B97F4A7C15L
      var acc = 0L
      val t0 = System.nanoTime()
      var i = 0
      while (i < 200000000) {
        x ^= x << 13; x ^= x >>> 7; x ^= x << 17; acc += x; i += 1
      }
      val ms = (System.nanoTime() - t0) / 1000000
      if (acc == 42L) System.err.println("") // keep acc live
      ms
    }
    calibrate()
    val calMs = calibrate()
    val cpuModel = try {
      scala.io.Source.fromFile("/proc/cpuinfo").getLines()
        .collectFirst { case l if l.startsWith("model name") =>
          // whitelist: the string is embedded in a hand-built JSON line,
          // so any JSON-special byte (backslash, quote, control) must go
          l.split(":", 2)(1).trim.replaceAll("[^A-Za-z0-9 ()@._-]", "").take(40) }
        .getOrElse("unknown")
    } catch { case _: Throwable => "unknown" }
    val load = try {
      scala.io.Source.fromFile("/proc/loadavg").getLines().next().split(" ")(0)
    } catch { case _: Throwable => "-1" }
    // GC/heap fingerprint (round 18): three consecutive rounds of
    // driver-artifact anomalies were adjudicated as memory/GC
    // pressure by inference (the 8 GiB reproduction row) — carry the
    // evidence IN the artifact. gc_ms = cumulative collector time for
    // the whole run (suite-wide allocation pressure), heap_mb = -Xmx
    // actually in effect (the r17 anomaly hypothesis space included
    // the driver running a smaller heap than the builder).
    val gcMs = try {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(_.getCollectionTime).filter(_ > 0).sum
    } catch { case _: Throwable => -1L }
    val heapMb = Runtime.getRuntime.maxMemory() / (1024 * 1024)
    val fp = s""""fp":{"cpu":"$cpuModel","load":$load,"cal_ms":$calMs,"gc_ms":$gcMs,"heap_mb":$heapMb}"""
    val top = results.toSeq.sortBy(-_._2).take(10)
    val qs = top.map { case (k, v) => "\"" + k + "\":" + r3(v) }
      .mkString("{", ",", "}")
    val allCs = results.toSeq.sortBy(_._1)
      .map { case (_, v) => Math.round(v * 100).toString }
      .mkString(",")
    // builds ride as one compact field (centiseconds, dependency
    // order preserved, entries < 0.05 s elided) — the whole line must
    // stay within the driver's 2000-char output tail, so the field is
    // bounded to the 12 largest entries (~250 chars worst case).
    val buildsJson = {
      val big = builds.filter(_._2 >= 0.05)
      val kept = if (big.size <= 12) big
        else big.sortBy(-_._2).take(12).sortBy(b => builds.indexWhere(_._1 == b._1))
      if (kept.isEmpty) ""
      else kept.map { case (k, v) => "\"" + k + "\":" + Math.round(v * 100) }
        .mkString(""","builds":{""", ",", "}")
    }
    val total = (if (results.nonEmpty) results.values.sum else 0.0) +
      builds.map(_._2).sum
    val errs = if (errors.isEmpty) ""
      else errors.map("\"" + _ + "\"").mkString(""","errors":[""", ",", "]")
    // Per-stage attribution for the curation composite (round 18 —
    // the r17 verdict's #1 item: the one key whose driver reads
    // diverged from every in-tree measurement had no decomposition).
    // Centiseconds in chain order: 0_raw, 1_quality, 2_exact_dedup,
    // 3_near_dedup, 4_substring_remove, 5_decontaminate,
    // 6_temperature, 7_split, 7_pack_train, 8_bpe_tokens — the last
    // timed run in this JVM, i.e. the timed rep above.
    val stageJson = {
      val ss = graft.ops.CurationPipeline.lastStageSeconds
      if (ss.isEmpty) ""
      else ss.map(s => Math.round(s._2 * 100).toString)
        .mkString(""","stage_cs":"""", ",", "\"")
    }
    // Per-key GC absorbers (round 19 — r18 verdict item 2). A full
    // 286-key centisecond CSV like all_cs costs ~600-750 chars and the
    // assembled line already runs 1700-1800 — it would ALWAYS fall to
    // the degradation rule, i.e. never ship. Emit the signal that
    // fits instead: the top absorbers as "alphaIndex:cs" pairs
    // (index into the sorted key names — the same decode table all_cs
    // already requires), entries >= 10 cs, at most 8. A clean run
    // emits few or none; a storm run names exactly the keys that ate
    // the window.
    val gcTopJson = {
      val keysAlpha = results.toSeq.sortBy(_._1).map(_._1).zipWithIndex.toMap
      val hot = gcByKey.toSeq.filter(_._2 >= 10).sortBy(-_._2).take(8)
      if (hot.isEmpty) ""
      else hot.map { case (k, v) => s"${keysAlpha(k)}:$v" }
        .mkString(""","gc_i":"""", ",", "\"")
    }
    // stage_cs, builds and gc_i ride the SAME 2000-char tail budget as
    // everything else (r18 review): if the assembled line would
    // overflow — and truncate from the end, the r01 unparseable-
    // artifact failure — degrade field by field: drop gc_i first
    // (newest), then stage_cs, then builds (the per-key all_cs map is
    // the one field a round artifact cannot lose).
    def line(builds: String, stages: String, gcTop: String) =
      s"""{"metric":"total","value":${r3(total)},"unit":"sec","n_queries":${results.size}$errs,$fp,"queries":$qs,"all_order":"alpha","all_cs":"$allCs"$builds$stages$gcTop,"sf":"$sfDir"}"""
    val candidates = Seq(line(buildsJson, stageJson, gcTopJson),
      line(buildsJson, stageJson, ""), line(buildsJson, "", ""),
      line("", "", ""))
    println(candidates.find(_.length <= 1990).getOrElse(candidates.last))
    spark.stop()
  }
}
