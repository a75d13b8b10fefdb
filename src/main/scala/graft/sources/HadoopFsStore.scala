package graft.sources

import java.io.{IOException, OutputStream}
import java.nio.charset.StandardCharsets.UTF_8

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, FileUtil, Path => HPath}

/** Durable [[Store]] over any Hadoop `FileSystem` URI — `file://`,
  * `hdfs://`, `s3a://`, whatever the classpath provides — the cluster
  * deployment path for the archive pipeline (the reference's cloud
  * object store, /root/reference/file/api.go:44-87, behind the same
  * trait the tests fake).
  *
  * MD5 handling: unlike GCS (which serves an MD5 attribute per object,
  * file/api.go:61), generic filesystems store none — so the digest
  * computed on-the-fly during the streamed write is persisted in a
  * dot-prefixed sidecar (`.<name>.md5`) next to the object. Listing
  * reads the tiny sidecar instead of re-hashing the blob; a missing
  * sidecar (externally-written object) falls back to streaming the
  * object through the digest once. Dot-prefixed names are invisible to
  * [[list]] — the same convention that hides in-flight `.part` temps.
  *
  * Write semantics mirror the reference's GCS writer (commit on Close,
  * download/common.go:102-109): bytes stream to a `.part` temp and the
  * final name appears only via rename after a complete drain — a
  * mid-stream failure never leaves a truncated object.
  *
  * Serializable by construction (executors write blobs task-side): the
  * handle carries only the root URI + conf overrides; `Configuration`
  * and the `FileSystem` client rebuild lazily per JVM.
  */
class HadoopFsStore(rootUri: String,
                    confOverrides: Map[String, String] = Map.empty) extends Store {

  @transient private lazy val conf: Configuration = {
    val c = new Configuration()
    confOverrides.foreach { case (k, v) => c.set(k, v) }
    c
  }
  @transient private lazy val root: HPath = new HPath(rootUri)
  @transient private lazy val fs: FileSystem = root.getFileSystem(conf)

  private def p(name: String): HPath = new HPath(root, name)
  private def sidecar(path: HPath): HPath =
    new HPath(path.getParent, "." + path.getName + ".md5")

  private def writeSidecar(path: HPath, md5: String): Unit = {
    val out = fs.create(sidecar(path), true)
    try out.write(md5.getBytes(UTF_8)) finally out.close()
  }

  private def md5Of(path: HPath): Option[String] = {
    val sc = sidecar(path)
    if (fs.exists(sc)) {
      val in = fs.open(sc)
      try Some(new String(in.readAllBytes(), UTF_8)) finally in.close()
    } else {
      // object written out-of-band: hash it once (conservative, like the
      // reference's missing-hash ⇒ treat-as-new path it feeds into)
      val in = fs.open(path)
      try Some(Store.drain(in, OutputStream.nullOutputStream())._2)
      finally in.close()
    }
  }

  def list(prefix: String): Seq[ObjectMeta] = {
    if (!fs.exists(root)) return Seq.empty
    val rootPath = fs.makeQualified(root).toUri.getPath.stripSuffix("/") + "/"
    val it = fs.listFiles(root, true)
    val buf = Seq.newBuilder[ObjectMeta]
    while (it.hasNext) {
      val st = it.next()
      val rel = st.getPath.toUri.getPath.stripPrefix(rootPath)
      if (!rel.split('/').last.startsWith(".") && rel.startsWith(prefix))
        buf += ObjectMeta(rel, md5Of(st.getPath), st.getLen)
    }
    buf.result().sortBy(_.name)
  }

  def read(name: String): Array[Byte] = {
    val in = fs.open(p(name))
    try in.readAllBytes() finally in.close()
  }

  def write(name: String, content: Array[Byte]): Unit = {
    val out = fs.create(p(name), true) // creates parent dirs
    try out.write(content) finally out.close()
    writeSidecar(p(name), Store.md5Hex(content))
  }

  override def writeStream(name: String, in: java.io.InputStream): (Long, String) = {
    val target = p(name)
    val tmp = new HPath(target.getParent, "." + target.getName + ".part")
    val out = fs.create(tmp, true)
    try {
      val res = try Store.drain(in, out) finally out.close()
      // FileContext rename with OVERWRITE is atomic where the filesystem
      // supports it (file://, hdfs://) — no delete-then-rename window in
      // which a crash loses the previously committed object
      org.apache.hadoop.fs.FileContext.getFileContext(fs.getUri, conf)
        .rename(fs.makeQualified(tmp), fs.makeQualified(target),
          org.apache.hadoop.fs.Options.Rename.OVERWRITE)
      writeSidecar(target, res._2)
      res
    } catch {
      case e: Throwable => fs.delete(tmp, false); throw e
    }
  }

  /** Within-filesystem copy (the `CopyTo` promotion, file/api.go:81-87).
    * The generic `FileSystem` API has no server-side copy verb, so bytes
    * stream through this client — HDFS/S3A deployments can swap in
    * distcp / S3 multipart-copy behind the same trait method when the
    * current-pointer objects get large. */
  def copy(src: String, dst: String): Unit = {
    if (!FileUtil.copy(fs, p(src), fs, p(dst), false, true, conf))
      throw PermanentError(s"copy failed: $src -> $dst")
    val sc = sidecar(p(src))
    if (fs.exists(sc)) FileUtil.copy(fs, sc, fs, sidecar(p(dst)), false, true, conf)
  }

  /** Delete failure is the reference's permanent error (common.go:128). */
  def delete(name: String): Unit = {
    if (!fs.delete(p(name), false) && fs.exists(p(name)))
      throw PermanentError(s"delete failed: $name")
    fs.delete(sidecar(p(name)), false)
  }
}
