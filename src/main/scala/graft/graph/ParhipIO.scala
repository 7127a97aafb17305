package graft.graph

import graft.model.CsrGraph
import java.io.{DataInputStream, DataOutputStream, BufferedInputStream, BufferedOutputStream, FileInputStream, FileOutputStream}
import java.nio.{ByteBuffer, ByteOrder}

/** ParHiP binary graph reader/writer (SURVEY S2; format per the reference's public
  * spec `/root/reference/docs/graph_file_format.md:27-52`): a 24-byte header of three
  * little-endian u64 fields (version bit-field, n, m), then the offsets array
  * ((n+1) * EID bytes of file-relative addresses of each node's first neighbor), the
  * adjacency lists (m * NID bytes), optional node weights, optional edge weights.
  *
  * Version bit-field (LSB first): bit0 = edge weights ABSENT, bit1 = node weights
  * ABSENT, bit2 = 32-bit edge ids, bit3 = 32-bit node ids, bit4 = 32-bit node
  * weights, bit5 = 32-bit edge weights.
  *
  * Driver-side like MetisIO: binary graph files are interchange fixtures; the
  * production source is the page table. Both directions of every undirected edge are
  * stored, as in the reference.
  */
object ParhipIO {

  def readCsrFile(path: String): CsrGraph = {
    val in = new DataInputStream(new BufferedInputStream(new FileInputStream(path), 1 << 20))
    try {
      def readLong(): Long = {
        val b = new Array[Byte](8)
        in.readFully(b)
        ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN).getLong
      }
      def readInt(): Int = {
        val b = new Array[Byte](4)
        in.readFully(b)
        ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN).getInt
      }
      val version = readLong()
      val hasEW = (version & 1L) == 0L
      val hasVW = (version & 2L) == 0L
      val eid32 = (version & 4L) != 0L
      val nid32 = (version & 8L) != 0L
      val vw32 = (version & 16L) != 0L
      val ew32 = (version & 32L) != 0L
      val n64 = readLong()
      val m64 = readLong()
      // the 64-bit header exists exactly so files can exceed 2^31 entries — refuse
      // loudly instead of silently wrapping the Int-indexed arrays below
      require(n64 >= 0 && n64 <= Int.MaxValue - 1 && m64 >= 0 && m64 <= Int.MaxValue - 1,
        s"graph too large for array-backed CsrGraph: n=$n64 m=$m64 (driver reader caps at 2^31-2)")
      val n = n64.toInt
      val m = m64.toInt

      def readId(is32: Boolean): Long = if (is32) readInt().toLong else readLong()

      // offsets are FILE-RELATIVE byte addresses of each node's first neighbor
      val headerBytes = 24L
      val eidBytes = if (eid32) 4 else 8
      val nidBytes = if (nid32) 4 else 8
      val adjBase = headerBytes + (n + 1).toLong * eidBytes
      val xadj = new Array[Int](n + 1)
      var i = 0
      while (i <= n) {
        val addr = readId(eid32)
        xadj(i) = ((addr - adjBase) / nidBytes).toInt
        i += 1
      }
      require(xadj(0) == 0 && xadj(n) == m, s"ParHiP offsets inconsistent: ${xadj(0)}..${xadj(n)} vs m=$m")
      val adj = new Array[Int](m)
      i = 0
      while (i < m) { adj(i) = readId(nid32).toInt; i += 1 }
      val vw =
        if (hasVW) Array.fill(n)(readId(vw32))
        else Array.fill(n)(1L)
      val ew =
        if (hasEW) Array.fill(m)(readId(ew32))
        else Array.fill(m)(1L)
      new CsrGraph(xadj, adj, ew, vw)
    } finally in.close()
  }

  /** Write a CsrGraph in ParHiP format (64-bit fields, weights always written). */
  def writeCsrFile(g: CsrGraph, path: String): Unit = {
    val out = new DataOutputStream(new BufferedOutputStream(new FileOutputStream(path), 1 << 20))
    try {
      def writeLong(v: Long): Unit = {
        val b = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN).putLong(v).array()
        out.write(b)
      }
      writeLong(0L) // version: weights present, all fields 64-bit
      writeLong(g.n.toLong)
      writeLong(g.m.toLong)
      val adjBase = 24L + (g.n + 1).toLong * 8L
      var i = 0
      while (i <= g.n) { writeLong(adjBase + g.xadj(i).toLong * 8L); i += 1 }
      i = 0
      while (i < g.m) { writeLong(g.adjncy(i).toLong); i += 1 }
      i = 0
      while (i < g.n) { writeLong(g.vwgt(i)); i += 1 }
      i = 0
      while (i < g.m) { writeLong(g.adjwgt(i)); i += 1 }
    } finally out.close()
  }
}
