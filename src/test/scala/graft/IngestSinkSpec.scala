package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema-enforced ingest with quarantine + partitioned sink
  * (SURVEY §2.1 `ingest_csv_schema` / `ingest_json_lines` /
  * `sink_parquet_partitioned` — fixture-backed, so unit-tested rather
  * than driver-oracle'd).
  */
class IngestSinkSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(prefix: String) = {
    val d = Files.createTempDirectory(prefix).toFile
    d.deleteOnExit(); d.getAbsolutePath
  }

  private val schema = StructType(Seq(
    StructField("id", IntegerType), StructField("name", StringType),
    StructField("amount", DoubleType)))

  test("schema-evolution parquet read: added column NULL on old files, pruning/pushdown intact") {
    val dir = tmpDir("evolve")
    // epoch 1: producer writes (id, amount); epoch 2 adds `status`
    Seq((1, 10.0), (2, 20.0)).toDF("id", "amount")
      .write.mode("overwrite").parquet(s"$dir/e1")
    Seq((3, 30.0, "ok"), (4, 40.0, "late")).toDF("id", "amount", "status")
      .write.mode("overwrite").parquet(s"$dir/e2")
    // move files under one root (two epochs of the same dataset)
    val root = tmpDir("evolve_all")
    for (e <- Seq("e1", "e2");
        f <- new java.io.File(s"$dir/$e").listFiles.filter(_.getName.endsWith(".parquet")))
      java.nio.file.Files.copy(f.toPath,
        java.nio.file.Paths.get(root, s"$e-${f.getName}"))
    val merged = io.Readers.parquetMerged(spark, root)
    assert(merged.columns.toSet === Set("id", "amount", "status"))
    val rows = merged.select("id", "amount", "status").orderBy("id")
      .collect().map(r => (r.getInt(0), r.getDouble(1), Option(r.getString(2))))
    assert(rows.toSeq === Seq((1, 10.0, None), (2, 20.0, None),
      (3, 30.0, Some("ok")), (4, 40.0, Some("late"))))
    // a plain (non-merge) read of the union root must NOT silently
    // show the new column when it samples an old file's schema —
    // mergeSchema is the explicit contract, not an ambient default
    // (Spark picks an arbitrary file's footer; we only assert the
    // merged read, which is deterministic)
    // pruning + pushdown still reach the scan through the merged schema
    val filtered = merged.filter(col("id") > 2).select("id", "status")
    val scan = filtered.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(scan.contains("GreaterThan(id,2)"), scan)
    assert(scan.contains("ReadSchema: struct<id:int,status:string>"), scan)
    assert(filtered.count() === 2L)
  }

  test("CSV ingest quarantines malformed rows, keeps good ones typed") {
    val dir = tmpDir("csv")
    Files.writeString(java.nio.file.Paths.get(dir, "in.csv"),
      "id,name,amount\n1,alice,10.5\nnotint,bob,2.5\n2,carol,7.25\n3,dave,notadouble\n")
    val df = io.Readers.csvWithQuarantine(spark, s"$dir/in.csv", schema).cache()
    val good = df.filter(col("_corrupt_record").isNull)
    val bad = df.filter(col("_corrupt_record").isNotNull)
    assert(good.count() === 2)
    assert(bad.count() === 2)
    assert(good.select("id").as[Int].collect().toSet === Set(1, 2))
    // raw line preserved for the quarantine channel
    assert(bad.select("_corrupt_record").as[String].collect().exists(_.contains("notint")))
  }

  test("JSONL ingest quarantines syntax + type errors") {
    val dir = tmpDir("json")
    Files.writeString(java.nio.file.Paths.get(dir, "in.jsonl"),
      """{"id": 1, "name": "alice", "amount": 10.5}
        |{"id": "x", "name": "bob", "amount": 2.5}
        |this is not json
        |{"id": 3, "name": "carol", "amount": 1.0}
        |""".stripMargin)
    val df = io.Readers.jsonWithQuarantine(spark, s"$dir/in.jsonl", schema).cache()
    assert(df.filter(col("_corrupt_record").isNull).count() === 2)
    assert(df.filter(col("_corrupt_record").isNotNull).count() === 2)
  }

  test("partitioned parquet sink: round-trip, dt directories, pruned read") {
    val dir = tmpDir("sink") + "/out"
    val df = Seq(
      (1L, ts("2024-03-01 10:00:00"), 5.0), (2L, ts("2024-03-01 23:00:00"), 6.0),
      (3L, ts("2024-03-02 00:30:00"), 7.0)).toDF("id", "ts", "v")
    io.Sinks.writePartitionedByDate(df, "ts", dir)
    val dirs = new java.io.File(dir).listFiles().filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.toSeq === Seq("dt=2024-03-01", "dt=2024-03-02"))
    val all = io.Sinks.readPartitioned(spark, dir, None)
    assert(all.count() === 3)
    val oneDay = io.Sinks.readPartitioned(spark, dir, Some("2024-03-01"))
    assert(oneDay.select("id").as[Long].collect().toSet === Set(1L, 2L))
    // the day filter must land as a partition filter, not a data filter
    val plan = oneDay.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("dt"))
  }

  test("CSV/JSONL export round-trips through the matching ingest reader") {
    val dir = tmpDir("export")
    val df = Seq((1, "al,ice \"q\"", 10.5), (2, null.asInstanceOf[String], 7.25))
      .toDF("id", "name", "amount")
    io.Sinks.exportCsv(df, s"$dir/csv")
    val backCsv = io.Readers.csvWithQuarantine(spark, s"$dir/csv", schema).cache()
    assert(backCsv.filter(col("_corrupt_record").isNotNull).count() === 0,
      "exported CSV must re-ingest cleanly (quotes, commas, nulls)")
    assert(backCsv.select("id", "name", "amount").orderBy("id")
      .as[(Int, Option[String], Double)].collect().toSeq ===
      Seq((1, Some("al,ice \"q\""), 10.5), (2, None, 7.25)))
    io.Sinks.exportJsonl(df, s"$dir/jsonl")
    val backJson = io.Readers.jsonWithQuarantine(spark, s"$dir/jsonl", schema).cache()
    assert(backJson.filter(col("_corrupt_record").isNotNull).count() === 0)
    assert(backJson.select("id", "name", "amount").orderBy("id")
      .as[(Int, Option[String], Double)].collect().toSeq ===
      Seq((1, Some("al,ice \"q\""), 10.5), (2, None, 7.25)))
  }

  test("export timestamps survive the CSV/JSONL round-trip to the microsecond") {
    val dir = tmpDir("exportts")
    val tsSchema = StructType(Seq(
      StructField("id", IntegerType), StructField("at", TimestampType)))
    val df = Seq((1, ts("2024-03-01 10:00:00.123")), (2, ts("2024-12-31 23:59:59.999")))
      .toDF("id", "at")
    io.Sinks.exportCsv(df, s"$dir/csv")
    val backCsv = io.Readers.csvWithQuarantine(spark, s"$dir/csv", tsSchema).cache()
    assert(backCsv.filter(col("_corrupt_record").isNotNull).count() === 0)
    assert(backCsv.select("id", "at").orderBy("id").collect().toSeq ===
      df.orderBy("id").collect().toSeq)
    io.Sinks.exportJsonl(df, s"$dir/jsonl")
    val backJson = io.Readers.jsonWithQuarantine(spark, s"$dir/jsonl", tsSchema).cache()
    assert(backJson.filter(col("_corrupt_record").isNotNull).count() === 0)
    assert(backJson.select("id", "at").orderBy("id").collect().toSeq ===
      df.orderBy("id").collect().toSeq)
  }

  test("ORC export round-trips byte-identically and pushes filters at the scan") {
    val dir = tmpDir("orc")
    val src = io.Readers.table(spark, "/root/testdata/sf0.001", "lineitem")
      .select("l_orderkey", "l_linenumber", "l_extendedprice", "l_shipdate")
    io.Sinks.exportOrc(src, s"$dir/orc")
    val back = io.Sinks.readOrc(spark, s"$dir/orc")
    // schema + value fidelity (timestamps included)
    assert(back.schema === src.schema)
    assert(back.orderBy(back.columns.map(col).toIndexedSeq: _*).collect().toSeq ===
      src.orderBy(src.columns.map(col).toIndexedSeq: _*).collect().toSeq)
    // same pushdown contract as the parquet scans
    val filtered = back.filter(col("l_extendedprice") > 30000.0)
      .select("l_orderkey", "l_extendedprice")
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_extendedprice)"),
      s"ORC scan must push the predicate:\n$plan")
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("l_shipdate"),
      s"ORC scan must prune unused columns: $readSchema")
  }

  test("bucketed tables join without a shuffle exchange") {
    val left = (1L to 2000L).map(k => (k, s"l$k")).toDF("k", "lv")
    val right = (1L to 2000L).map(k => (k, k * 2.5)).toDF("k", "rv")
    io.Sinks.writeBucketed(left, "bt_left", "k", 8)
    io.Sinks.writeBucketed(right, "bt_right", "k", 8)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force the shuffle path
    try {
      val j = spark.table("bt_left").join(spark.table("bt_right"), "k")
      j.collect()
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")
      assert(j.count() === 2000)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS bt_left")
      spark.sql("DROP TABLE IF EXISTS bt_right")
    }
  }
}
