package graft.sources

import java.io.{IOException, ObjectInputStream, ObjectOutputStream, OutputStream}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.TaskContext
import org.apache.spark.sql.DataFrame

/** Shared shard-commit machinery for the export tier ([[Jsonl]],
  * [[TfRecord]], [[graft.multimodal.WebDataset]]): every named-shard
  * writer opens its files through here so the sink is deployable on a
  * real cluster, not just `local[*]`.
  *
  * Cluster contract (the r14 verdict's "local-FS-only" gap, closed):
  *  - All paths go through the Hadoop [[FileSystem]] API, so `outDir`
  *    is scheme-portable — `file:/`, `hdfs:/`, or any object-store
  *    connector on the classpath resolves from the SAME writer code.
  *  - Directories are created on the EXECUTOR side (`fs.mkdirs` from
  *    the task), because on a multi-node cluster a driver-side mkdir
  *    only exists on the driver's local disk.
  *  - Each task attempt writes to an attempt-unique hidden temp name
  *    (`.<shard>.<taskAttemptId>.tmp`) and promotes it with a single
  *    rename on commit — rename IS the commit for a single-file shard.
  *    A speculative twin or retried attempt therefore never interleaves
  *    bytes with its sibling: both write private temps, the first
  *    rename wins, and the loser just discards its temp. Because every
  *    shard is bit-reproducible (the export tier's standing contract —
  *    md5 membership, per-shard seq order, mtime-0 gzip/tar headers),
  *    WHICH attempt wins is unobservable in the committed artifact.
  */
object ShardIO {

  /** Minimal serializable carrier for the Hadoop configuration (the
    * task side needs the driver's conf to resolve `hdfs:/`/object-store
    * schemes; [[Configuration]] itself is not [[Serializable]]). Same
    * shape as Spark's internal wrapper, reimplemented here because that
    * one is `private[spark]`. */
  final class SerializableHadoopConf(@transient var value: Configuration)
      extends Serializable {
    private def writeObject(out: ObjectOutputStream): Unit = {
      out.defaultWriteObject()
      value.write(out)
    }
    private def readObject(in: ObjectInputStream): Unit = {
      in.defaultReadObject()
      value = new Configuration(false)
      value.readFields(in)
    }
  }

  /** Capture the session's Hadoop conf on the driver, for closure
    * capture into the writing tasks. */
  def conf(df: DataFrame): SerializableHadoopConf =
    new SerializableHadoopConf(
      df.sparkSession.sparkContext.hadoopConfiguration)

  /** One in-flight shard file: `raw` is the temp-file stream (callers
    * may wrap it — gzip, buffering); [[commit]] promotes temp → final. */
  final class ShardStream private[ShardIO] (fs: FileSystem, tmp: Path,
      dst: Path, val raw: OutputStream) {

    /** Close the raw stream (idempotent — callers that wrapped `raw`
      * close the wrapper first, which closes `raw` underneath; a
      * second close of an FS stream is a no-op) and atomically promote
      * the temp file to the final shard name. A close failure is NOT
      * swallowed: a failed flush must fail the task, never promote a
      * truncated temp. Returns the committed file's length in bytes.
      *
      * A rename that fails because `dst` exists means a TWIN ATTEMPT of
      * this same job already committed the shard — [[prepareDir]]
      * cleared the directory before the job, so no stale prior-run file
      * can be squatting there — and the temp is discarded: the bytes
      * are identical by the reproducibility contract. */
    def commit(): Long = {
      raw.close()
      if (!fs.rename(tmp, dst)) {
        if (!fs.exists(dst)) {
          throw new IOException(
            s"shard commit failed: cannot rename $tmp -> $dst")
        }
        fs.delete(tmp, false) // lost the race to a bit-identical twin
      }
      fs.getFileStatus(dst).getLen
    }

    /** Best-effort cleanup for abandon paths — registered as a task
      * failure listener by [[begin]], so a failed/killed attempt does
      * not leak its `.tmp` file into the output directory. */
    def abort(): Unit = {
      try raw.close() catch { case _: IOException => () }
      try fs.delete(tmp, false) catch { case _: IOException => () }
    }
  }

  /** DRIVER-side output-directory preparation — overwrite semantics for
    * the whole export (the `write.mode("overwrite")` contract): delete
    * any existing files matching the sink's shard naming under
    * `outDir`, plus stranded `.tmp` files, and create the directory.
    * Called at plan-build time by every `writeShards`, so an in-task
    * rename-to-existing can ONLY mean a concurrent twin attempt of
    * this job (bit-identical bytes), never a stale shard from a
    * previous run over different data. */
  def prepareDir(hc: SerializableHadoopConf, outDir: String): Unit = {
    val dir = new Path(outDir)
    val fs = dir.getFileSystem(hc.value)
    if (fs.exists(dir)) {
      fs.listStatus(dir).foreach { st =>
        val n = st.getPath.getName
        if (n.startsWith("shard-") || n.endsWith(".tmp"))
          fs.delete(st.getPath, false)
      }
    } else fs.mkdirs(dir)
  }

  /** Open a shard stream whose commit target is `finalPath`. Creates
    * the parent directory (executor-side), names the temp with the
    * Spark task attempt id so concurrent attempts never collide, and
    * registers temp cleanup on task failure. */
  def begin(hc: SerializableHadoopConf, finalPath: String): ShardStream = {
    val dst = new Path(finalPath)
    val fs = dst.getFileSystem(hc.value)
    val parent = dst.getParent
    if (parent != null) fs.mkdirs(parent)
    val tc = TaskContext.get()
    val attempt = Option(tc).map(_.taskAttemptId()).getOrElse(0L)
    val tmp = new Path(parent, s".${dst.getName}.$attempt.tmp")
    val ss = new ShardStream(fs, tmp, dst, fs.create(tmp, true))
    if (tc != null) {
      tc.addTaskFailureListener(
        new org.apache.spark.util.TaskFailureListener {
          override def onTaskFailure(context: TaskContext,
              error: Throwable): Unit = ss.abort()
        })
    }
    ss
  }
}
