package graft.sources

import java.io.ByteArrayInputStream
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

class StoreSpec extends AnyFunSuite {

  private def roundTrip(store: Store): Unit = {
    val payload = Array.tabulate[Byte](100000)(i => (i * 31).toByte)
    val (n, md5) = store.writeStream("a/b/blob.bin", new ByteArrayInputStream(payload))
    assert(n == payload.length)
    assert(md5 == Store.md5Hex(payload)) // on-the-fly digest == full digest
    assert(store.read("a/b/blob.bin").toSeq == payload.toSeq)
    assert(store.list("a/").head.md5.contains(md5))
  }

  test("InMemoryStore streamed write computes size+md5 on the fly") {
    roundTrip(new InMemoryStore)
  }

  test("LocalFsStore streams straight to disk with identical digest") {
    roundTrip(new LocalFsStore(Files.createTempDirectory("graft_store").toString))
  }

  test("empty stream yields empty object with the empty-input md5") {
    val store = new InMemoryStore
    val (n, md5) = store.writeStream("x", new ByteArrayInputStream(Array.empty))
    assert(n == 0L && md5 == "d41d8cd98f00b204e9800998ecf8427e")
  }
}
