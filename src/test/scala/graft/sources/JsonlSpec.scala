package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class JsonlSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = "/root/testdata/sf0.001"

  test("documents round-trip through JSONL bit-exactly") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val out = java.nio.file.Files.createTempDirectory("jsonl").toString + "/docs"
    Jsonl.write(docs, out)
    val back = Jsonl.read(spark, out, docs.schema)
    assert(back.count() == docs.count())
    assert(back.exceptAll(docs).count() == 0 && docs.exceptAll(back).count() == 0)
    // the on-disk form is genuine one-object-per-line JSON
    val firstLine = spark.read.text(out).limit(1).collect()(0).getString(0)
    assert(firstLine.startsWith("{") && firstLine.endsWith("}"))
  }

  test("nulls survive the round trip (omitted on disk, restored on read)") {
    import spark.implicits._
    val df = Seq((1L, Some("a")), (2L, None)).toDF("id", "s")
    val out = java.nio.file.Files.createTempDirectory("jsonl").toString + "/n"
    Jsonl.write(df, out)
    val back = Jsonl.read(spark, out, df.schema).orderBy("id").collect()
    assert(back(0).getString(1) == "a" && back(1).isNullAt(1))
  }

  test("FAILFAST read refuses a malformed shard; PERMISSIVE nulls it") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("jsonl").toString + "/bad"
    Seq("""{"id":1,"s":"ok"}""", """{"id":oops""").toDF("value")
      .coalesce(1).write.text(out)
    val schema = new org.apache.spark.sql.types.StructType()
      .add("id", "long").add("s", "string")
    intercept[org.apache.spark.SparkException] {
      Jsonl.read(spark, out, schema).count()
    }
    val loose = Jsonl.read(spark, out, schema, mode = "PERMISSIVE")
    assert(loose.count() == 2)
    assert(loose.filter(col("id").isNull).count() == 1)
  }

  test("explicit schema prunes: only requested JSON fields are parsed") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val out = java.nio.file.Files.createTempDirectory("jsonl").toString + "/p"
    Jsonl.write(docs, out)
    val plan = Jsonl.read(spark, out, docs.schema).select("doc_id")
      .queryExecution.executedPlan.toString
    // column pruning reaches the JSON scan: the read schema mentions
    // doc_id but not the text payload
    assert(plan.contains("doc_id") && !plan.contains("text"))
  }

  test("writeShards: named gz shards round-trip through the reader, report consistent") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id") < 80)
    val out = java.nio.file.Files.createTempDirectory("jsonl_sh").toString
    val report = Jsonl.writeShards(docs, "doc_id", out, nShards = 4)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2),
        r.getLong(3)))
    assert(report.map(_._1).toSet == Set(0, 1, 2, 3))
    assert(report.map(_._3).sum == 80, "every row lands in a shard")
    report.foreach { case (_, path, _, bytes) =>
      assert(path.endsWith(".jsonl.gz"))
      assert(java.nio.file.Files.size(java.nio.file.Paths.get(path)) == bytes)
    }
    // spark.read.json decompresses .gz transparently: full row parity
    val back = Jsonl.read(spark, out, docs.schema)
    assert(back.count() == 80)
    assert(back.exceptAll(docs).count() == 0 && docs.exceptAll(back).count() == 0)
    // shard membership equals shardAssign's (the export manifest rule)
    val want = graft.text.TextOps.shardAssign(docs, "doc_id", 4)
      .groupBy("shard").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(report.map(r => r._1 -> r._3).toMap == want)
  }

  test("manifest: per-shard line_bytes (+newlines) sums equal the " +
      "uncompressed shard file lengths") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id") < 80).select(col("doc_id"), col("text"))
    val out = java.nio.file.Files.createTempDirectory("jsonl_m").toString
    val report = Jsonl.writeShards(docs, "doc_id", out, 4, gzip = false)
      .collect().map(r => r.getInt(0) -> (r.getString(1), r.getLong(2),
        r.getLong(3))).toMap
    val m = Jsonl.manifest(docs, "doc_id", 4, gzip = false).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getString(3),
        r.getLong(4)))
    assert(m.length == 80)
    m.groupBy(_._2).foreach { case (shard, rows) =>
      val (path, nLines, bytes) = report(shard)
      // each line plus its trailing newline
      assert(rows.map(_._5).sum + rows.length == bytes,
        s"shard $shard: manifest ${rows.map(_._5).sum + rows.length} " +
          s"vs written $bytes")
      assert(nLines == rows.length)
      assert(path.endsWith(rows.head._4))
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length).toSeq)
    }
  }

  test("writeShards is reproducible: identical bytes across runs and partitionings") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id") < 40)
    val d1 = java.nio.file.Files.createTempDirectory("jsonl_r1").toString
    val d2 = java.nio.file.Files.createTempDirectory("jsonl_r2").toString
    Jsonl.writeShards(docs, "doc_id", d1, 2).collect()
    Jsonl.writeShards(docs.repartition(7), "doc_id", d2, 2).collect()
    (0 until 2).foreach { sh =>
      val p = f"shard-$sh%06d.jsonl.gz"
      val a = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(s"$d1/$p"))
      val b = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(s"$d2/$p"))
      assert(java.util.Arrays.equals(a, b),
        s"$p must be bit-identical across runs")
    }
    // plain (uncompressed) mode emits .jsonl and stays line-readable
    val d3 = java.nio.file.Files.createTempDirectory("jsonl_r3").toString
    Jsonl.writeShards(docs, "doc_id", d3, 2, gzip = false).collect()
    val first = java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get(s"$d3/shard-000000.jsonl")).get(0)
    assert(first.startsWith("{") && first.endsWith("}"))
  }
}
