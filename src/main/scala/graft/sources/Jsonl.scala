package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** JSONL (newline-delimited JSON) ingest/export — the interchange
  * format of LLM corpus tooling (one JSON object per line; what the
  * reference's CSV bundles are to petrology data).
  *
  * Read contract: an explicit schema is REQUIRED. `spark.read.json`
  * without one runs a full schema-inference pass over the input —
  * at 100 TB that is a second complete scan before the first useful
  * one — and a drifting inferred schema is exactly the failure the
  * events.ts adaptive reader exists to prevent. With the schema given,
  * the JSON scan prunes columns like any other source (only the
  * requested fields are parsed).
  *
  * Write contract: `to_json` over a struct of all columns through the
  * text sink — one shard per partition. For controlled shard counts
  * and sizes, compose with [[graft.text.TextOps.shardAssign]] +
  * `repartition(n, col("shard"))` before writing.
  */
object Jsonl {

  /** Read JSONL at `path` with the given schema. `mode` follows the
    * Spark JSON option: FAILFAST (default here — corpus ingest should
    * fail loudly, not silently null a malformed shard), PERMISSIVE
    * (malformed lines become nulls, retrievable via a
    * `_corrupt_record` field if the schema declares one), DROPMALFORMED. */
  def read(spark: SparkSession, path: String, schema: StructType,
      mode: String = "FAILFAST"): DataFrame =
    spark.read.schema(schema).option("mode", mode).json(path)

  /** Write `df` as JSONL under `path` (one part file per partition).
    * Field order follows the DataFrame's column order; nulls are
    * omitted per JSON-source convention (Spark's to_json drops null
    * fields), so a round trip restores them as nulls. */
  def write(df: DataFrame, path: String, compression: String = "none"): Unit =
    df.select(to_json(struct(df.columns.map(col): _*)).as("value"))
      .write.mode("overwrite").option("compression", compression).text(path)
}
