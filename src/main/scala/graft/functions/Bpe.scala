package graft.functions

import java.nio.charset.StandardCharsets

import scala.collection.mutable

/** Byte-pair-encoding tokenizer — train, encode, decode — implemented
  * from the published algorithm (Sennrich, Haddow & Birch, "Neural
  * Machine Translation of Rare Words with Subword Units", ACL 2016,
  * with the rank-greedy encode loop popularized by GPT-2's tokenizer
  * and SentencePiece's `<0xNN>` byte-fallback convention for characters
  * unseen in training). Pure deterministic Scala on the driver /
  * inside executors — no RNG, no partition-order dependence, so every
  * query built on it is reproducible run-to-run.
  *
  * Training operates on a WORD-FREQUENCY table, not the raw corpus —
  * the standard formulation: Spark reduces the corpus to (word, count)
  * in one shuffle (the distinct-word table is Heaps-law small relative
  * to any corpus), the table is capped to the top-K words
  * (deterministic count-desc/word-asc cut), and the merge loop runs
  * driver-side bounded by `numMerges` — the same bounded-driver-loop
  * shape as IVF's k-means centroids (Similarity.ivfIndex). Each word is
  * a char-symbol sequence with a separate end-of-word marker `</w>`
  * (Sennrich's formulation), so merges can learn suffix units like
  * `est</w>`.
  *
  * Vocabulary ids are 1-BASED: id 0 is reserved as the OOV/padding
  * sentinel (the same invariant q81's whole-word encoding relies on)
  * and is never assigned. Ids 1–256 are the byte-fallback tokens
  * `<0x00>`–`<0xFF>` — always present, which is what makes encode
  * TOTAL: any character unseen in training decomposes into its UTF-8
  * bytes rather than an OOV. Decode therefore inverts encode exactly:
  * `decode(encode(text))` equals the whitespace-normalized text
  * (lowercased, tokens joined by single spaces — the same
  * normalization as TextFns.tokens). Pathological caveat, documented
  * not hidden: input text that literally contains the marker string
  * `</w>` or a `<0xNN>` byte-token literal is not round-trippable
  * (Sennrich's representation shares this).
  */
object Bpe extends Serializable {

  val EndOfWord = "</w>"

  /** Reserved OOV/padding id — never assigned to any symbol. */
  val OovId = 0

  private def byteTok(b: Int): String = f"<0x$b%02X>"
  private def isByteTok(sym: String): Boolean =
    sym.length == 6 && sym.startsWith("<0x") && sym.charAt(5) == '>'

  /** A trained tokenizer: ordered merge list, 1-based symbol vocabulary
    * (0 = OOV sentinel, ids 1–256 = byte tokens), and the rank table
    * driving the greedy encode. Serializable so executors can apply it
    * via a broadcast.
    */
  final case class Model(
      merges: IndexedSeq[(String, String)],
      vocab: Map[String, Int],
      inverse: Map[Int, String],
      ranks: Map[(String, String), Int]) extends Serializable {
    require(!vocab.valuesIterator.contains(OovId),
      "vocab ids are 1-based; id 0 is the reserved OOV sentinel")
    def encode(text: String): IndexedSeq[Int] = Bpe.encode(text, this)
    def decode(ids: Seq[Int]): String = Bpe.decode(ids, this)
    def vocabSize: Int = vocab.size
  }

  /** Merge every non-overlapping occurrence of `pair`, left to right. */
  private def mergeOnce(syms: Vector[String],
                        pair: (String, String)): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == pair._1 && syms(i + 1) == pair._2) {
        out += syms(i) + syms(i + 1); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** Train `numMerges` merges over a (word, count) table. Deterministic:
    * the best pair each round is max count with lexicographic (left,
    * right) tiebreak; stops early when no adjacent pair remains.
    */
  def train(wordCounts: Seq[(String, Long)], numMerges: Int): Model = {
    require(numMerges >= 0)
    var words: Vector[(Vector[String], Long)] = wordCounts.toVector.map {
      case (w, c) => (w.map(_.toString).toVector :+ EndOfWord, c)
    }
    val mergeBuf = mutable.ArrayBuffer.empty[(String, String)]
    var continue = numMerges > 0
    while (continue) {
      val counts = mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          counts(p) = counts.getOrElse(p, 0L) + c
          i += 1
        }
      }
      if (counts.isEmpty) continue = false
      else {
        val best = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }._1
        mergeBuf += best
        words = words.map { case (syms, c) => (mergeOnce(syms, best), c) }
        continue = mergeBuf.length < numMerges
      }
    }
    val mergeList = mergeBuf.toIndexedSeq
    val baseChars =
      wordCounts.flatMap(_._1.toSeq).distinct.sorted.map(_.toString)
    val symbols = ((0 until 256).map(byteTok) ++ (EndOfWord +: baseChars) ++
      mergeList.map { case (a, b) => a + b }).distinct
    val vocab = symbols.zipWithIndex.map { case (s, i) => (s, i + 1) }.toMap
    Model(mergeList, vocab, vocab.map(_.swap), mergeList.zipWithIndex.toMap)
  }

  /** Encode one word: greedy lowest-rank merging (the GPT-2 loop), then
    * symbol → id with UTF-8 byte fallback for unseen characters.
    */
  private def encodeWord(w: String, m: Model): Seq[Int] = {
    var syms = (w.map(_.toString) :+ EndOfWord).toVector
    var continue = true
    while (continue && syms.length > 1) {
      var bestRank = Int.MaxValue
      var best: (String, String) = null
      var i = 0
      while (i < syms.length - 1) {
        val r = m.ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; best = (syms(i), syms(i + 1)) }
        i += 1
      }
      if (best == null) continue = false
      else syms = mergeOnce(syms, best)
    }
    syms.flatMap { sym =>
      m.vocab.get(sym) match {
        case Some(id) => Seq(id)
        case None => // single unseen char — decompose to byte tokens
          sym.getBytes(StandardCharsets.UTF_8).toSeq
            .map(b => m.vocab(byteTok(b & 0xff)))
      }
    }
  }

  /** Whitespace-normalize (as TextFns.tokens) and encode every word. */
  def encode(text: String, m: Model): IndexedSeq[Int] =
    text.trim.toLowerCase.split("\\s+").toIndexedSeq
      .flatMap(w => encodeWord(w, m))

  /** Exact inverse of [[encode]] up to whitespace normalization: byte
    * tokens are buffered and UTF-8-decoded in runs; `</w>` markers
    * become the single spaces encode normalized to. Unknown ids (the
    * OOV sentinel 0 included) decode to nothing.
    */
  def decode(ids: Seq[Int], m: Model): String = {
    val sb = new StringBuilder
    val bytes = mutable.ArrayBuffer.empty[Byte]
    def flush(): Unit = if (bytes.nonEmpty) {
      sb.append(new String(bytes.toArray, StandardCharsets.UTF_8))
      bytes.clear()
    }
    ids.foreach { id =>
      m.inverse.get(id) match {
        case Some(sym) if isByteTok(sym) =>
          bytes += Integer.parseInt(sym.substring(3, 5), 16).toByte
        case Some(sym) => flush(); sb.append(sym)
        case None => // OOV sentinel / unknown id: nothing to emit
      }
    }
    flush()
    sb.toString.replace(EndOfWord, " ").trim
  }
}
