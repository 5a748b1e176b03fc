package graft.kernels

/** Greedy longest-match-first WordPiece segmentation (Wu et al. 2016,
  * GNMT §3.1; the tokenizer BERT ships): at each position take the
  * LONGEST vocabulary entry matching the remaining word — word-initial
  * positions match plain entries, word-internal positions match `##`
  * continuation entries — and emit `[UNK]` for the whole word when no
  * entry matches. This is real subword TOKENIZATION (the `q_bpe_tokens`
  * ladder only counts pretokenizer splits); the downstream token-budget
  * and packing operators consume exactly these counts in a real
  * pipeline.
  *
  * The vocabulary is a fixed literal (model artifact); matching is two
  * hash sets probed longest-first, O(|word|·maxLen) per word with no
  * allocation beyond the output — and segmentation is per DISTINCT
  * word, so callers dictionary-encode first (31 distinct words in the
  * synthetic corpus; low millions on the real web — a broadcast-sized
  * dim, never per-occurrence work).
  */
object WordPieceKernel {

  /** Word-initial entries (single letters keep totality on a-z). */
  val Base: Set[String] =
    ('a' to 'z').map(_.toString).toSet ++
      Set("scan", "sort", "key", "join", "col", "or", "qu",
        "win", "val", "mer", "li", "pa", "ag", "gr")

  /** Continuation entries, stored WITHOUT the ## prefix. */
  val Cont: Set[String] =
    ('a' to 'z').map(_.toString).toSet ++
      Set("umn", "der", "t", "in", "ery", "up", "dow", "ue", "ge", "ne", "rt")

  private val MaxBase = Base.iterator.map(_.length).max
  private val MaxCont = Cont.iterator.map(_.length).max

  val Unk = "[UNK]"

  /** Segment one word; `[UNK]` alone when any position has no match. */
  def segment(word: String): Seq[String] = {
    if (word.isEmpty) return Seq.empty
    val out = Seq.newBuilder[String]
    var pos = 0
    while (pos < word.length) {
      val initial = pos == 0
      val vocab = if (initial) Base else Cont
      val maxLen = math.min(if (initial) MaxBase else MaxCont, word.length - pos)
      var len = maxLen
      var hit: String = null
      while (len >= 1 && hit == null) {
        val cand = word.substring(pos, pos + len)
        if (vocab.contains(cand)) hit = cand else len -= 1
      }
      if (hit == null) return Seq(Unk)
      out += (if (initial) hit else "##" + hit)
      pos += hit.length
    }
    out.result()
  }
}
