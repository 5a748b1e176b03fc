package graft.kernels

/** PNG row-filter reconstruction (None/Sub/Up/Average/Paeth) shared by
  * the PDF /Predictor path (predictors 10-15 decode exactly this way)
  * and the PNG image decoder — one copy of the Paeth math to keep
  * correct.
  */
object PngFilters {

  /** Input: `nRows` scanlines of (1 filter-tag byte + rowLen filtered
    * bytes); output: nRows * rowLen reconstructed bytes. None on a
    * length mismatch or an invalid tag.
    */
  def unfilter(data: Array[Byte], rowLen: Int, bpp: Int): Option[Array[Byte]] = {
    if (rowLen <= 0) return None
    val stride = rowLen + 1
    val nRows = data.length / stride
    if (nRows.toLong * stride != data.length) return None
    val out = new Array[Byte](nRows * rowLen)
    val prior = new Array[Byte](rowLen)
    val row = new Array[Byte](rowLen)
    var r = 0
    while (r < nRows) {
      val tag = data(r * stride) & 0xff
      System.arraycopy(data, r * stride + 1, row, 0, rowLen)
      var i = 0
      while (i < rowLen) {
        val raw = row(i) & 0xff
        val left = if (i >= bpp) row(i - bpp) & 0xff else 0
        val up = prior(i) & 0xff
        val upLeft = if (i >= bpp) prior(i - bpp) & 0xff else 0
        val recon = tag match {
          case 0 => raw
          case 1 => raw + left
          case 2 => raw + up
          case 3 => raw + ((left + up) / 2)
          case 4 =>
            val p = left + up - upLeft
            val pa = math.abs(p - left); val pb = math.abs(p - up); val pc = math.abs(p - upLeft)
            raw + (if (pa <= pb && pa <= pc) left else if (pb <= pc) up else upLeft)
          case _ => return None
        }
        row(i) = (recon & 0xff).toByte
        i += 1
      }
      System.arraycopy(row, 0, out, r * rowLen, rowLen)
      System.arraycopy(row, 0, prior, 0, rowLen)
      r += 1
    }
    Some(out)
  }
}
