package graft.log

import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite
import java.util.concurrent.{ConcurrentHashMap, CountDownLatch, Executors, TimeUnit}
import java.util.concurrent.atomic.AtomicLong

/**
 * The S3 conditional-write backing for the control plane's primitives,
 * verified against an in-memory mock with REAL compare-and-swap
 * semantics (every mutation is a single atomic `compute` on the map —
 * the same all-or-nothing per-object guarantee S3 gives).
 */
class S3ConditionalOpsSpec extends AnyFunSuite {

  /** In-memory S3: object map keyed by name, values (content, etag);
    * etags from a global counter. Conditional PUTs are atomic CAS. */
  private final class MemStore extends S3ConditionalStore.ConditionalStore {
    private val objects = new ConcurrentHashMap[String, (String, String)]()
    private val etags = new AtomicLong()
    private def newTag(): String = "e" + etags.incrementAndGet()

    def putIfAbsent(key: String, content: String): Boolean = {
      val tag = newTag()
      objects.putIfAbsent(key, (content, tag)) == null
    }
    def putIfMatch(key: String, content: String, etag: String): Option[String] = {
      var won: Option[String] = None
      objects.computeIfPresent(key, (_, cur) =>
        if (cur._2 == etag) { val t = newTag(); won = Some(t); (content, t) }
        else cur): Unit
      won
    }
    def put(key: String, content: String): String = {
      val t = newTag()
      objects.put(key, (content, t)): Unit
      t
    }
    def get(key: String): Option[(String, String)] = Option(objects.get(key))
    def list(prefix: String): Seq[String] = {
      val it = objects.keySet().iterator()
      val out = Seq.newBuilder[String]
      while (it.hasNext) { val k = it.next(); if (k.startsWith(prefix)) out += k }
      out.result().sorted
    }
    def delete(key: String): Unit = { objects.remove(key): Unit }
  }

  test("the storage probe passes against the S3 conditional adapter") {
    val r = StorageProbe.run("s3x://bucket/warehouse", new S3ConditionalOps(new MemStore))
    assert(r.exclusiveCreate, r.details.mkString("; "))
    assert(r.atomicRenameOverwrite, r.details.mkString("; "))
    assert(r.compliant)
  }

  test("conditional create arbitrates N racing contenders to exactly one winner") {
    val store = new MemStore
    val ops = new S3ConditionalOps(store)
    val p = new Path("s3x://b/root/_txn/t1/terminal.json")
    val n = 16
    val pool = Executors.newFixedThreadPool(n)
    val go = new CountDownLatch(1)
    val wins = new AtomicLong()
    val done = new CountDownLatch(n)
    (0 until n).foreach { i =>
      pool.execute(() => {
        go.await()
        try { ops.createExclusive(p, s"winner-$i"); wins.incrementAndGet(): Unit }
        catch { case _: java.io.IOException => () }
        finally done.countDown()
      })
    }
    go.countDown()
    assert(done.await(30, TimeUnit.SECONDS))
    pool.shutdown()
    assert(wins.get() === 1L, "exactly one contender may decide")
    val content = ops.read(p)
    assert(content.startsWith("winner-"), content)
    // the winner's content is never altered by the losers; keys carry
    // the bucket authority so two buckets' docs can never collide
    assert(store.get("b/root/_txn/t1/terminal.json").exists(_._1 == content))
  }

  test("put-if-match is a true CAS: an interleaved update fails the stale writer") {
    val store = new MemStore
    val t0 = store.put("/doc", "v0")
    // writer A reads etag t0; writer B lands first
    val t1 = store.putIfMatch("/doc", "v1-from-B", t0)
    assert(t1.isDefined)
    // A's CAS with the stale etag must fail, content untouched
    assert(store.putIfMatch("/doc", "v1-from-A", t0).isEmpty)
    assert(store.get("/doc").exists(_._1 == "v1-from-B"))
    // and A retries from the fresh read — the root-doc CAS loop's shape
    val (cur, tag) = store.get("/doc").get
    assert(cur === "v1-from-B")
    assert(store.putIfMatch("/doc", "v2-from-A", tag).isDefined)
    assert(store.get("/doc").exists(_._1 == "v2-from-A"))
  }

  test("doc swap: concurrent readers see old or new content, never a partial or a miss") {
    val store = new MemStore
    val ops = new S3ConditionalOps(store)
    val dst = new Path("s3x://b/root/topic/_manifests/root.json")
    ops.createExclusive(dst, "doc-0")
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val bad = new java.util.concurrent.atomic.AtomicReference[String](null)
    val reader = new Thread(() => {
      while (!stop.get()) {
        val c = ops.read(dst) // must NEVER throw (strong consistency) …
        if (!c.startsWith("doc-")) bad.compareAndSet(null, c): Unit
      }
    })
    reader.start()
    (1 to 500).foreach { i =>
      val tmp = new Path(s"s3x://b/root/topic/_manifests/root.json.tmp-$i")
      ops.createExclusive(tmp, s"doc-$i")
      ops.renameOverwrite(tmp, dst)
    }
    stop.set(true)
    reader.join(10000)
    assert(bad.get() === null, s"reader saw a torn doc: ${bad.get()}")
    assert(ops.read(dst) === "doc-500")
    // tmp residue is gone (the delete leg ran)
    assert(store.list("b/root/topic/_manifests/root.json.tmp").isEmpty)
  }

  test("buckets are separate namespaces; subtree delete never touches name-prefix siblings") {
    val ops = new S3ConditionalOps(new MemStore)
    // same path on two buckets: BOTH exclusive creates must win
    ops.createExclusive(new Path("s3x://bucket-a/root/doc"), "A")
    ops.createExclusive(new Path("s3x://bucket-b/root/doc"), "B")
    assert(ops.read(new Path("s3x://bucket-a/root/doc")) === "A")
    assert(ops.read(new Path("s3x://bucket-b/root/doc")) === "B")
    // deleting /w/topic must not sweep /w/topic-archive (shared name
    // prefix, different subtree)
    ops.createExclusive(new Path("s3x://bucket-a/w/topic/d1"), "gone")
    ops.createExclusive(new Path("s3x://bucket-a/w/topic-archive/d1"), "keep")
    ops.delete(new Path("s3x://bucket-a/w/topic"))
    intercept[java.io.FileNotFoundException](
      ops.read(new Path("s3x://bucket-a/w/topic/d1")))
    assert(ops.read(new Path("s3x://bucket-a/w/topic-archive/d1")) === "keep")
  }

  test("rename of a missing source fails loudly; delete is prefix-recursive") {
    val ops = new S3ConditionalOps(new MemStore)
    intercept[java.io.FileNotFoundException](
      ops.renameOverwrite(new Path("s3x://b/none"), new Path("s3x://b/dst")))
    val d = new Path("s3x://b/scratch")
    ops.createExclusive(new Path(d, "a"), "1")
    ops.createExclusive(new Path(d, "b"), "2")
    ops.delete(d)
    intercept[java.io.FileNotFoundException](ops.read(new Path(d, "a")))
    intercept[java.io.FileNotFoundException](ops.read(new Path(d, "b")))
  }
}
