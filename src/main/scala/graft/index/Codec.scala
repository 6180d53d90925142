package graft.index

import scala.collection.mutable.ArrayBuffer

/** Variable-byte (VByte) integer codec: 7 data bits per byte, high bit set on
  * the terminal byte (Lucene vint convention, SURVEY.md §4.2 — format chosen
  * per north_rule: docID-delta + frequency compressed with variable-byte
  * blocks plus skip pointers and block-max metadata).
  */
object VByte {
  def writeLong(v0: Long, out: ArrayBuffer[Byte]): Unit = {
    require(v0 >= 0, s"vbyte encodes non-negative values: $v0")
    var v = v0
    while (v >= 0x80L) {
      out += (v & 0x7f).toByte
      v >>>= 7
    }
    out += ((v & 0x7f) | 0x80).toByte
  }

  def writeInt(v: Int, out: ArrayBuffer[Byte]): Unit = writeLong(v.toLong, out)

  /** Mutable cursor decode. */
  final class Reader(bytes: Array[Byte]) {
    private var p = 0
    def hasNext: Boolean = p < bytes.length
    def readLong(): Long = {
      var v = 0L
      var shift = 0
      var b = bytes(p); p += 1
      while ((b & 0x80) == 0) {
        v |= (b & 0x7fL) << shift
        shift += 7
        b = bytes(p); p += 1
      }
      v | ((b & 0x7fL) << shift)
    }
    def readInt(): Int = readLong().toInt
  }

  def encodeInts(vs: Array[Int]): Array[Byte] = {
    val out = new ArrayBuffer[Byte](vs.length + 4)
    var i = 0
    while (i < vs.length) { writeInt(vs(i), out); i += 1 }
    out.toArray
  }

  def decodeInts(bytes: Array[Byte], n: Int): Array[Int] = {
    val r = new Reader(bytes)
    Array.fill(n)(r.readInt())
  }
}

/** One compressed posting block for a `(field, term)` run: up to
  * [[PostingCodec.BlockSize]] documents in ascending docId order.
  *
  * Skip pointer = (`firstDocId`, `lastDocId`) per block; block-max metadata =
  * `maxTf` + `minDlq` which bound the block's best achievable BM25
  * contribution (block-max WAND, SURVEY.md §4.2/§4.4). The quantized document
  * length (`dlq`, Lucene-norm equivalent — see [[graft.util.SmallFloat]]) is
  * stored inline per posting so scoring never joins back to the doc store.
  *
  * Blob layout (all VByte):
  *  - docsBlob:      docId deltas, first delta relative to `firstDocId` (=0)
  *  - freqsBlob:     term frequency per doc
  *  - normsBlob:     quantized field length per doc
  *  - positionsBlob: per doc, `freq` position deltas (first = absolute);
  *                   empty array when positions are not indexed
  */
final case class PostingBlock(
    field: String,
    term: String,
    firstDocId: Long,
    lastDocId: Long,
    numDocs: Int,
    maxTf: Int,
    sumTf: Long,
    minDlq: Int,
    docsBlob: Array[Byte],
    freqsBlob: Array[Byte],
    normsBlob: Array[Byte],
    positionsBlob: Array[Byte]
)

/** One decoded posting entry. */
final case class Posting(docId: Long, tf: Int, dlq: Int, positions: Array[Int])

/** One raw posting as it flows through the build shuffle: positions are
  * ALREADY delta-VByte-encoded by the tokenize pass (first delta absolute),
  * so the block encoder just concatenates them — the shuffle carries compact
  * bytes, not int arrays.
  */
final case class RawPosting(docId: Long, tf: Int, dlq: Int, posBlob: Array[Byte])

object PostingCodec {
  val BlockSize = 128

  /** Delta-VByte-encode an ascending position list (first delta absolute). */
  def encodePositions(positions: Array[Int]): Array[Byte] = {
    if (positions == null || positions.isEmpty) return Array.empty
    val out = new ArrayBuffer[Byte](positions.length + 2)
    var prev = 0
    var j = 0
    while (j < positions.length) {
      VByte.writeInt(positions(j) - prev, out)
      prev = positions(j)
      j += 1
    }
    out.toArray
  }

  /** Encode one ≤BlockSize run of raw postings (ascending docId). */
  def encodeRaw(field: String, term: String, run: Seq[RawPosting]): PostingBlock = {
    require(run.nonEmpty && run.length <= BlockSize)
    val docs = new ArrayBuffer[Byte](run.length * 2)
    val freqs = new ArrayBuffer[Byte](run.length)
    val norms = new ArrayBuffer[Byte](run.length)
    val poss = new ArrayBuffer[Byte]()
    var prevDoc = run.head.docId
    var maxTf = 0
    var sumTf = 0L
    var minDlq = Int.MaxValue
    var i = 0
    while (i < run.length) {
      val p = run(i)
      require(i == 0 || p.docId > prevDoc, s"postings must be strictly ascending at ${p.docId}")
      VByte.writeLong(p.docId - prevDoc, docs) // first delta = 0
      prevDoc = p.docId
      VByte.writeInt(p.tf, freqs)
      VByte.writeInt(p.dlq, norms)
      if (p.posBlob != null) poss ++= p.posBlob
      if (p.tf > maxTf) maxTf = p.tf
      sumTf += p.tf
      if (p.dlq < minDlq) minDlq = p.dlq
      i += 1
    }
    PostingBlock(field, term, run.head.docId, run.last.docId, run.length, maxTf, sumTf, minDlq,
      docs.toArray, freqs.toArray, norms.toArray, poss.toArray)
  }

  /** Encode from decoded postings (tests/small paths). */
  def encodeBlock(field: String, term: String, run: Seq[Posting]): PostingBlock =
    encodeRaw(field, term,
      run.map(p => RawPosting(p.docId, p.tf, p.dlq, encodePositions(p.positions))))

  /** Split an ascending posting iterator for one (field, term) run into
    * encoded blocks of BlockSize.
    */
  def encodeRun(field: String, term: String, postings: Iterator[Posting]): Iterator[PostingBlock] =
    postings.grouped(BlockSize).map(g => encodeBlock(field, term, g))

  /** Decode the scoring columns only (docIds, tfs, norms) — callers project
    * away `positionsBlob` so the parquet scan never reads it.
    */
  def decodeScore(firstDocId: Long, numDocs: Int, docsBlob: Array[Byte],
      freqsBlob: Array[Byte], normsBlob: Array[Byte]): Array[Posting] = {
    val docs = new VByte.Reader(docsBlob)
    val freqs = new VByte.Reader(freqsBlob)
    val norms = new VByte.Reader(normsBlob)
    val out = new Array[Posting](numDocs)
    var doc = firstDocId
    var i = 0
    while (i < numDocs) {
      doc += docs.readLong()
      out(i) = Posting(doc, freqs.readInt(), norms.readInt(), null)
      i += 1
    }
    out
  }

  /** Decode only the docIds of a block (facet/docvalue reconstruction). */
  def decodeDocIds(firstDocId: Long, numDocs: Int, docsBlob: Array[Byte]): Array[Long] = {
    val docs = new VByte.Reader(docsBlob)
    val out = new Array[Long](numDocs)
    var doc = firstDocId
    var i = 0
    while (i < numDocs) { doc += docs.readLong(); out(i) = doc; i += 1 }
    out
  }

  /** Decode a block. `withPositions=false` skips position materialization. */
  def decodeBlock(b: PostingBlock, withPositions: Boolean): Array[Posting] = {
    val docs = new VByte.Reader(b.docsBlob)
    val freqs = new VByte.Reader(b.freqsBlob)
    val norms = new VByte.Reader(b.normsBlob)
    val poss = new VByte.Reader(b.positionsBlob)
    val hasPos = b.positionsBlob.nonEmpty
    val out = new Array[Posting](b.numDocs)
    var doc = b.firstDocId
    var i = 0
    while (i < b.numDocs) {
      doc += docs.readLong()
      val tf = freqs.readInt()
      val dlq = norms.readInt()
      val positions: Array[Int] =
        if (hasPos) {
          var prev = 0
          val arr = new Array[Int](tf)
          var j = 0
          while (j < tf) { prev += poss.readInt(); arr(j) = prev; j += 1 }
          if (withPositions) arr else null
        } else null
      out(i) = Posting(doc, tf, dlq, positions)
      i += 1
    }
    out
  }
}
