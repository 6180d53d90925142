package graft.util

/** Lossy small-integer quantization matching Lucene's norm encoding
  * (SmallFloat.intToByte4 / byte4ToInt): values < 8 are exact; larger values
  * keep only their top 4 significant bits (3 mantissa bits + implicit
  * leading 1), packed with the shift amount into one byte.
  *
  * BM25 score parity with the reference requires per-doc field lengths to be
  * quantized through exactly this table before entering the tf normalization
  * (SURVEY.md §4.3; reference scores delegate to Lucene BM25Similarity, e.g.
  * the pinned 0.648349 at /root/reference/tests/test_graphql.py:60-65).
  */
object SmallFloat {

  /** Encode a non-negative int into one byte, monotone and lossy. */
  def intToByte4(i: Int): Byte = {
    require(i >= 0, s"only non-negative values: $i")
    val numBits = 32 - Integer.numberOfLeadingZeros(i)
    if (numBits < 4) i.toByte
    else {
      // 3 explicit mantissa bits (leading 1 implicit) + biased shift
      val shift = numBits - 4
      ((((i >>> shift) & 0x07) | ((shift + 1) << 3)) & 0xff).toByte
    }
  }

  /** Decode back to the quantized int. */
  def byte4ToInt(b: Byte): Int = {
    val e = b & 0xff
    val bits = e & 0x07
    val shift = (e >>> 3) - 1
    if (shift == -1) bits else (bits | 0x08) << shift
  }

  /** Quantized document length: decode(encode(len)) — i.e. len with only its
    * top 4 significant bits kept. This closed form is what the SQL oracle
    * mirrors: len < 8 ? len : (len >> (numBits-4)) << (numBits-4).
    */
  def quantizeLength(len: Int): Int = byte4ToInt(intToByte4(len))
}
