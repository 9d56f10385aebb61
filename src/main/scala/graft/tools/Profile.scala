package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.text.TextOps

/** Micro-profiling of the text pipeline stages. */
object Profile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    def time(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s  ($r)")
    }
    time("count docs") { docs.count() }
    time("tokens size sum") {
      docs.select(size(TextOps.tokens(col("text"))).as("n")).agg(sum("n")).collect()(0).getLong(0)
    }
    time("shingles size sum (materialized)") {
      docs.select(TextOps.tokens(col("text")).as("w"))
        .select(size(TextOps.shingles(col("w"), 3)).as("n"))
        .agg(sum("n")).collect()(0).getLong(0)
    }
    time("explode count") {
      docs.select(TextOps.tokens(col("text")).as("w"))
        .select(explode(TextOps.shingles(col("w"), 3)).as("sh")).count()
    }
    time("full minhash k=8") {
      TextOps.minhashSignature(docs, "doc_id", "text", 8).count()
    }
    time("simhash16") {
      TextOps.simhash16(docs, "doc_id", "text").count()
    }
    spark.stop()
  }
}
