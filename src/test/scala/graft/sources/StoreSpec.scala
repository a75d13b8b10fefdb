package graft.sources

import java.io.ByteArrayInputStream
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** Behavior matrix over every Store implementation — the same contract
  * the reference pins via its fake store
  * (/root/reference/download/common_test.go:23-82): prefix-scoped
  * listing with md5 metadata, streamed writes with on-the-fly digest,
  * copy, delete, hidden temp files.
  */
class StoreSpec extends AnyFunSuite {

  private def stores: Seq[(String, () => Store)] = Seq(
    ("InMemoryStore", () => new InMemoryStore),
    ("LocalFsStore",
      () => new LocalFsStore(Files.createTempDirectory("graft_store").toString)),
    ("HadoopFsStore(file://)",
      () => new HadoopFsStore(
        "file://" + Files.createTempDirectory("graft_hstore").toString)))

  for ((label, mk) <- stores) {
    test(s"$label: streamed write computes size+md5 on the fly") {
      val store = mk()
      val payload = Array.tabulate[Byte](100000)(i => (i * 31).toByte)
      val (n, md5) = store.writeStream("a/b/blob.bin", new ByteArrayInputStream(payload))
      assert(n == payload.length)
      assert(md5 == Store.md5Hex(payload)) // on-the-fly digest == full digest
      assert(store.read("a/b/blob.bin").toSeq == payload.toSeq)
      assert(store.list("a/").head.md5.contains(md5))
    }

    test(s"$label: empty stream yields empty object with the empty-input md5") {
      val store = mk()
      val (n, md5) = store.writeStream("x", new ByteArrayInputStream(Array.empty))
      assert(n == 0L && md5 == "d41d8cd98f00b204e9800998ecf8427e")
    }

    test(s"$label: prefix listing honors partial-filename prefixes, sorted") {
      val store = mk()
      store.write("d/2017/06/a.gz", "one".getBytes)
      store.write("d/2017/06/b.gz", "two".getBytes)
      store.write("d/2017/07/c.gz", "three".getBytes)
      store.write("other/x", "x".getBytes)
      assert(store.list("d/2017/06/").map(_.name) ==
        Seq("d/2017/06/a.gz", "d/2017/06/b.gz"))
      assert(store.list("d/2017/06/a").map(_.name) == Seq("d/2017/06/a.gz"))
      assert(store.list("d/").map(_.name).length == 3)
      assert(store.list("").map(_.name).length == 4)
    }

    test(s"$label: copy carries bytes+md5, delete removes object and metadata") {
      val store = mk()
      val payload = "promote-me".getBytes
      store.writeStream("src/file.gz", new ByteArrayInputStream(payload))
      store.copy("src/file.gz", "current/file.gz")
      assert(store.read("current/file.gz").toSeq == payload.toSeq)
      assert(store.list("current/").head.md5.contains(Store.md5Hex(payload)))
      store.delete("src/file.gz")
      assert(store.list("src/").isEmpty)
      assert(store.list("current/").map(_.name) == Seq("current/file.gz"))
      // deleting a nonexistent object is a no-op, not an error
      store.delete("src/file.gz")
    }

    test(s"$label: overwrite replaces bytes and digest") {
      val store = mk()
      store.writeStream("k", new ByteArrayInputStream("v1".getBytes))
      store.writeStream("k", new ByteArrayInputStream("v2-longer".getBytes))
      assert(new String(store.read("k")) == "v2-longer")
      assert(store.list("k").head.md5.contains(Store.md5Hex("v2-longer".getBytes)))
    }

    test(s"$label: failed stream leaves no committed object") {
      val store = mk()
      val bad = new java.io.InputStream {
        private var n = 0
        def read(): Int = {
          n += 1
          if (n > 10) throw new java.io.IOException("mid-stream failure") else 'x'
        }
      }
      intercept[java.io.IOException](store.writeStream("part/victim.bin", bad))
      assert(store.list("part/").isEmpty)
    }
  }

  test("HadoopFsStore: externally-written object still lists with computed md5") {
    val dir = Files.createTempDirectory("graft_hext")
    Files.createDirectories(dir.resolve("raw"))
    Files.write(dir.resolve("raw/outside.bin"), "external-bytes".getBytes)
    val store = new HadoopFsStore("file://" + dir.toString)
    val got = store.list("raw/")
    assert(got.map(_.name) == Seq("raw/outside.bin"))
    assert(got.head.md5.contains(Store.md5Hex("external-bytes".getBytes)))
  }
}
