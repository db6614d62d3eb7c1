package graft.log

import org.apache.hadoop.fs.{FileSystem, Path}
import java.nio.charset.StandardCharsets.UTF_8

/** The one place the control plane reads/writes small whole files as
  * UTF-8: txn markers and records ([[Transactions]]), lease epoch files
  * ([[WriterLease]]), the storage probe's scratch ([[StorageProbe]]). One
  * seat so a fix (length races, >2 GiB truncation, charset) cannot drift
  * between near-identical copies. Control-plane docs are all tiny — the
  * whole-file read is deliberate. */
private[log] object FsIO {

  def readString(fs: FileSystem, p: Path): String = {
    val in = fs.open(p)
    try {
      val len = fs.getFileStatus(p).getLen.toInt
      val buf = new Array[Byte](len)
      in.readFully(0, buf)
      new String(buf, UTF_8)
    } finally in.close()
  }

  /** Plain create+write (overwrite per flag). With `overwrite = false`
    * this is the EXCLUSIVE-create arbiter primitive — the create throws if
    * the path exists. */
  def writeString(p: Path, text: String, overwrite: Boolean): Unit = {
    val out = p.getFileSystem(HadoopConf.shared).create(p, overwrite)
    try out.write(text.getBytes(UTF_8))
    finally out.close()
  }
}
