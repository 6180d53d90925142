package graft.util

/** Lossy small-integer quantization matching Lucene's norm encoding
  * (SmallFloat.intToByte4 / byte4ToInt): values < 16 are exact; larger values
  * keep only their top 5 significant bits (4 explicit mantissa bits + the
  * implicit leading 1), packed with a biased shift into one byte.
  *
  * BM25 score parity with the reference requires per-doc field lengths to be
  * quantized through exactly this table before entering the tf normalization
  * (SURVEY.md §4.3). The mantissa width is pinned empirically by the
  * reference's exact-score gold 0.648349 for `text:right` on the
  * constitution corpus (/root/reference/tests/test_graphql.py:60-65): doc 33
  * has dl=50 and the corpus sumTotalTermFreq=7401, which reproduces the gold
  * only if quantize(50) == 50 (5 significant bits), not 48 (4 bits).
  */
object SmallFloat {

  /** Max encodable value: mantissa 0x1F << max shift 14 (byte-range bound). */
  val MaxValue: Int = 0x1f << 14

  /** Encode a non-negative int into one byte, monotone and lossy. */
  def intToByte4(i0: Int): Byte = {
    require(i0 >= 0, s"only non-negative values: $i0")
    val i = math.min(i0, MaxValue)
    val numBits = 32 - Integer.numberOfLeadingZeros(i)
    if (numBits < 5) i.toByte
    else {
      // 4 explicit mantissa bits (leading 1 implicit) + biased shift
      val shift = numBits - 5
      ((((i >>> shift) & 0x0f) | ((shift + 1) << 4)) & 0xff).toByte
    }
  }

  /** Decode back to the quantized int. */
  def byte4ToInt(b: Byte): Int = {
    val e = b & 0xff
    val bits = e & 0x0f
    val shift = (e >>> 4) - 1
    if (shift == -1) bits else (bits | 0x10) << shift
  }

  /** Quantized document length: decode(encode(len)) — len with only its top
    * 5 significant bits kept. Closed form mirrored by the SQL oracle:
    * len < 16 ? len : (len >> (numBits-5)) << (numBits-5).
    */
  def quantizeLength(len: Int): Int = byte4ToInt(intToByte4(len))
}
