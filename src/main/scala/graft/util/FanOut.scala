package graft.util

import org.apache.spark.sql.DataFrame

/** Fan-out guard for compute-heavy stages fed by small compressed scans.
  *
  * A file under `spark.sql.files.maxPartitionBytes` arrives as ONE task;
  * if the downstream stage multiplies work per input row (a 50x shingle
  * explode, a several-hundred-op CIPW row function), that whole stage
  * runs on one core no matter how many the cluster has. Repartitioning
  * the cheap pre-explosion rows first costs one small shuffle and buys
  * full parallelism. At 100 TB the scan itself is thousands of splits
  * and the guard never fires — it defends the small-file regime (and the
  * bench's single-file-per-table test data).
  */
object FanOut {
  def apply(df: DataFrame): DataFrame = {
    // Streaming frames can't be partition-probed (df.rdd throws) and
    // micro-batches don't hit the small-file regime this guards against.
    if (df.isStreaming) return df
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < math.max(2, target / 2)) df.repartition(target)
    else df
  }
}
