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
}
