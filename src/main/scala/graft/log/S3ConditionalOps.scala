package graft.log

import org.apache.hadoop.fs.Path

/**
 * S3-NATIVE backing for the control plane's two filesystem primitives —
 * without a consistency layer (VERDICT r15 directive 4).
 *
 * Raw S3A fails [[StorageProbe]] because Hadoop maps `create(p,
 * overwrite=false)` to HEAD-then-PUT (racy) and rename to copy+delete
 * (non-atomic for directories, and historically unguarded). But S3 itself
 * now provides what the engine actually needs, as PUBLIC API:
 *
 *  - **Conditional PUT `If-None-Match: *`** — create-only-if-absent,
 *    arbitrated server-side. This IS the exclusive-create arbiter (txn
 *    `terminal.json`, lease epoch files): exactly one of N concurrent
 *    creators succeeds, the rest get 412.
 *  - **Atomic single-object PUT + strong read-after-write consistency** —
 *    a whole-object PUT is all-or-nothing and immediately visible; a
 *    reader sees the old doc or the new doc, never a prefix. That is
 *    precisely the guarantee the engine's rename-onto-existing doc swap
 *    exists to provide (root docs, group docs, finalize records are
 *    single small objects), so "rename" maps to read-src → put-dst →
 *    delete-src with no copy+delete visibility hole. A crash between put
 *    and delete leaves the src object behind — the same benign residue
 *    as a crashed rename's tmp file, reclaimed by the next writer's
 *    unique-tmp naming discipline.
 *  - **Conditional PUT `If-Match: <etag>`** — compare-and-swap on an
 *    existing object, which a full S3 binding would use to map the root
 *    doc's version CAS directly (publish = put-if-match on the pointer,
 *    manifests under versioned names are immutable anyway).
 *
 * [[ConditionalStore]] models exactly those primitives, so the adapter's
 * logic is verified against an in-memory mock with true CAS semantics
 * ([[graft.log.S3ConditionalOpsSpec]]) and a production binding is a
 * ~five-method delegation to any S3 client — no SDK dependency here
 * (zero-egress build), no change to the engine's disciplines.
 */
object S3ConditionalStore {

  /** The S3 server-side primitives (public API: conditional writes,
    * strong consistency). Implementations must make each method atomic —
    * S3 does, and the in-memory mock uses real CAS. */
  trait ConditionalStore {
    /** PUT `If-None-Match: *`: create only if absent. False = 412 (an
      * object already exists — first writer won). */
    def putIfAbsent(key: String, content: String): Boolean
    /** PUT `If-Match: etag`: replace only if the object still carries
      * `etag`. Returns the new etag, or None on 412 (lost the CAS). */
    def putIfMatch(key: String, content: String, etag: String): Option[String]
    /** Unconditional PUT (atomic whole-object replace). Returns the etag. */
    def put(key: String, content: String): String
    /** GET: (content, etag), or None for 404. */
    def get(key: String): Option[(String, String)]
    /** LIST by prefix (lexicographic, like S3 ListObjectsV2). */
    def list(prefix: String): Seq[String]
    /** DELETE (idempotent). */
    def delete(key: String): Unit
  }
}

/** [[StorageProbe.Ops]] over a [[S3ConditionalStore.ConditionalStore]] —
  * the engine's two primitives rebuilt on S3's own guarantees. Paths map
  * to keys verbatim (S3 has no directories; `mkdirs` is a no-op). */
private[log] class S3ConditionalOps(
    store: S3ConditionalStore.ConditionalStore) extends StorageProbe.Ops {

  // authority-qualified keys: a ConditionalStore may serve many buckets
  // (one S3 client usually does) — dropping the authority would collide
  // s3x://bucket-a/root/doc with s3x://bucket-b/root/doc onto one key,
  // letting one root's lease or terminal.json arbitrate the other's
  private def key(p: Path): String = {
    val u = p.toUri
    Option(u.getAuthority).getOrElse("") + u.getPath
  }

  /** Exclusive create = conditional PUT `If-None-Match: *`. Server-side
    * arbitration — no HEAD-then-PUT race window, unlike S3A. */
  def createExclusive(p: Path, content: String): Unit =
    if (!store.putIfAbsent(key(p), content))
      throw new java.io.IOException(
        s"create(${p}, overwrite=false): object already exists (412)")

  /** Rename-onto-existing = read src, atomic PUT dst, delete src. The
    * PUT is the commit point: readers of dst see old-or-new, never a
    * partial (single-object PUT atomicity + strong consistency). The
    * src delete is cleanup — a crash before it leaves the same benign
    * residue as a crashed POSIX rename's tmp file. */
  def renameOverwrite(src: Path, dst: Path): Unit = {
    val (content, _) = store.get(key(src)).getOrElse(
      throw new java.io.FileNotFoundException(s"rename source missing: $src"))
    store.put(key(dst), content): Unit
    store.delete(key(src))
  }

  def read(p: Path): String =
    store.get(key(p)).map(_._1).getOrElse(
      throw new java.io.FileNotFoundException(p.toString))

  def delete(p: Path): Unit = {
    // recursive subtree delete (the probe cleans its scratch dir this
    // way): list with a '/'-bounded prefix — a raw startsWith would also
    // sweep SIBLINGS that merely share the name prefix (deleting
    // /w/topic must not touch /w/topic-archive/...), unlike
    // fs.delete(p, recursive) which removes only the subtree
    val k = key(p)
    store.list(k + "/").foreach(store.delete)
    store.delete(k)
  }

  /** S3 has no directories — prefixes exist implicitly. */
  def mkdirs(p: Path): Unit = ()
}
