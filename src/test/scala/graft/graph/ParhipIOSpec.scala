package graft.graph

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** ParHiP binary round-trip (SURVEY S2): write + read = identity, and the reader
  * agrees with the METIS parser on the vendored Walshaw fixture.
  */
class ParhipIOSpec extends AnyFunSuite {

  test("round-trip preserves the Walshaw data graph exactly") {
    val csr = MetisIO.readCsrFile("src/test/resources/data.graph")
    val tmp = Files.createTempDirectory("parhip").resolve("data.parhip").toString
    ParhipIO.writeCsrFile(csr, tmp)
    val back = ParhipIO.readCsrFile(tmp)
    assert(back.n === csr.n && back.m === csr.m)
    assert(back.xadj.toSeq === csr.xadj.toSeq)
    assert(back.adjncy.toSeq === csr.adjncy.toSeq)
    assert(back.adjwgt.toSeq === csr.adjwgt.toSeq)
    assert(back.vwgt.toSeq === csr.vwgt.toSeq)
  }

  test("header bit-field: 32-bit ids and absent weights decode correctly") {
    // hand-built file: version = bits {ewAbsent=1, vwAbsent=2, eid32=4, nid32=8} = 15,
    // n=2, m=2 (edge 0<->1), offsets 32-bit file-relative, adjacency 32-bit
    val tmp = Files.createTempFile("parhip", ".bin")
    val bb = java.nio.ByteBuffer.allocate(24 + 3 * 4 + 2 * 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putLong(15L).putLong(2L).putLong(2L)
    val adjBase = 24 + 3 * 4
    bb.putInt(adjBase).putInt(adjBase + 4).putInt(adjBase + 8) // offsets
    bb.putInt(1).putInt(0) // adjacency: 0->1, 1->0
    Files.write(tmp, bb.array())
    val g = ParhipIO.readCsrFile(tmp.toString)
    assert(g.n === 2 && g.m === 2)
    assert(g.adjncy.toSeq === Seq(1, 0))
    assert(g.vwgt.toSeq === Seq(1L, 1L)) // absent => unit
    assert(g.adjwgt.toSeq === Seq(1L, 1L))
  }
}
