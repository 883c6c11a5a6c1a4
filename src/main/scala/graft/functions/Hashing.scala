package graft.functions

/** Deterministic 64-bit hashing primitives for MinHash / SimHash.
  *
  * Standard public constructions: FNV-1a for string→64-bit base hashes,
  * SplitMix64 (Steele et al., "Fast Splittable Pseudorandom Number
  * Generators") as the per-permutation mixer. Seeds are fixed so
  * signatures are stable across runs and executors.
  */
object Hashing {

  /** SplitMix64 finalizer — a high-quality 64-bit mix. */
  @inline def splitmix64(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  private val md5Local =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  /** Oracle-replayable md5-derived 64-bit hash of one string: the
    * little-endian uint64 of the FIRST 8 digest bytes — bit-for-bit
    * DuckDB's `md5_number_upper` (single-value form of
    * [[md5TokenHashes]]; thread-local digest, reset per call).
    */
  def md5Hash64(s: String): Long = {
    val md = md5Local.get()
    md.reset()
    val d = md.digest(s.getBytes("UTF-8"))
    java.nio.ByteBuffer.wrap(d)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getLong(0)
  }

  /** FNV-1a 64-bit over UTF-8 bytes. */
  def stringHash64(s: String): Long = {
    var h = 0xCBF29CE484222325L
    val bytes = s.getBytes("UTF-8")
    var i = 0
    while (i < bytes.length) {
      h = (h ^ (bytes(i) & 0xffL)) * 0x100000001B3L
      i += 1
    }
    h
  }

  /** Distinct k-word shingles of the lowercased, whitespace-tokenized
    * text; shorter-than-k docs get one whole-text shingle. Semantics match
    * the SQL oracle form (string_split_regex + list_distinct) exactly.
    * One JVM pass: the expression form re-evaluates the captured token
    * array inside every `element_at` of the transform lambda — the text
    * was re-split ~3·(n-k) times per row (measured ~9 s for 5000 docs).
    */
  /** Winnowed fingerprint selection (MOSS): md5 every stride-1 k-gram,
    * keep the MINIMUM hash of each sliding window of w hashes, distinct.
    * Shorter-than-k docs select nothing. Semantics — including the
    * partial final windows when the hash count is below w, and md5's
    * lowercase-hex string ordering — match the q82 SQL oracle exactly.
    *
    * One JVM pass, O(n·w) with tiny constants. The expression form
    * (`transform` over `sequence` for the hash array, then a second
    * `transform` taking window minima) is CollapseProject-inlined: the
    * FULL O(n·k) md5-array subtree is re-evaluated inside every window
    * position's lambda — O(n²·k) md5 calls per document (measured 207 s
    * at sf0.1 vs ~1 s for this kernel; same trap as the MinHash
    * signature note above).
    */
  def winnowedFingerprints(text: String, k: Int, w: Int): Array[String] = {
    val toks = text.trim.toLowerCase.split("\\s+")
    if (toks.length < k) return Array.empty
    val md = java.security.MessageDigest.getInstance("MD5")
    val n = toks.length - k + 1
    val hs = new Array[String](n)
    var i = 0
    while (i < n) {
      val sb = new java.lang.StringBuilder
      var j = 0
      while (j < k) { if (j > 0) sb.append(' '); sb.append(toks(i + j)); j += 1 }
      val dig = md.digest(sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      md.reset()
      val hex = new java.lang.StringBuilder(32)
      dig.foreach { b =>
        hex.append(Character.forDigit((b >> 4) & 0xf, 16))
        hex.append(Character.forDigit(b & 0xf, 16))
      }
      hs(i) = hex.toString
      i += 1
    }
    val seen = new java.util.LinkedHashSet[String]()
    var p = 0
    val last = math.max(n - w, 0)
    while (p <= last) {
      var min = hs(p)
      var q = p + 1
      val end = math.min(p + w, n)
      while (q < end) { if (hs(q).compareTo(min) < 0) min = hs(q); q += 1 }
      seen.add(min)
      p += 1
    }
    seen.toArray(new Array[String](seen.size))
  }

  /** Position-carrying winnowing for the cross-shard dedup-cut tier:
    * MOSS window-min selection ([[winnowedFingerprints]]'s rule) over
    * fixed-length CHARACTER grams — md5 of every `gramLen`-char
    * substring (stride 1), one selected site per sliding window of `w`
    * consecutive gram positions. Char grams, not token grams, on
    * purpose (r17 verdict #1): the dedup-cut family's contract is
    * "duplicated run of ≥ minLen CHARS", and a selected recurring
    * char gram of exactly gramLen = minLen IS a minLen-char duplicated
    * substring — the cut grain equals the contract's unit, so a
    * recurring short phrase below minLen can never be cut (the old
    * k-token grain cut ~20-char grams against a 40-char contract).
    * Returns `(fingerprint, charStart, charEndExclusive)` per distinct
    * selected SITE (1-based substring positions, the suffix-array
    * convention); every span has length exactly gramLen. Window ties
    * select the LEFTMOST minimal hash (DuckDB `list_position`'s
    * first-index rule — the oracle replays the selection exactly:
    * per-position substr+md5, per-window list_min + list_position).
    * Docs shorter than gramLen have no gram and select nothing — they
    * cannot contain a ≥ gramLen-char duplicated run.
    *
    * One JVM pass per document, O(n·w) with small constants — kept as
    * a kernel-in-UDF for the same measured reason as
    * [[winnowedFingerprints]]: the two-phase expression form gets the
    * whole hash-array subtree CollapseProject-inlined into every
    * window lambda (O(n²·gramLen) md5 calls per doc).
    */
  def winnowedCharGramSpans(text: String, gramLen: Int,
                            w: Int): Array[(String, Long, Long)] = {
    val n = text.length - gramLen + 1
    if (n <= 0) return Array.empty
    val md = java.security.MessageDigest.getInstance("MD5")
    val hs = new Array[String](n)
    var i = 0
    while (i < n) {
      val dig = md.digest(text.substring(i, i + gramLen)
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      md.reset()
      val hex = new java.lang.StringBuilder(32)
      dig.foreach { b =>
        hex.append(Character.forDigit((b >> 4) & 0xf, 16))
        hex.append(Character.forDigit(b & 0xf, 16))
      }
      hs(i) = hex.toString
      i += 1
    }
    // leftmost-min window selection over gram INDEXES (strict < keeps
    // the first occurrence of the minimal hash — list_position parity)
    val sel = new java.util.TreeSet[Integer]()
    var p = 0
    val last = math.max(n - w, 0)
    while (p <= last) {
      var minIdx = p
      var q = p + 1
      val end = math.min(p + w, n)
      while (q < end) { if (hs(q).compareTo(hs(minIdx)) < 0) minIdx = q; q += 1 }
      sel.add(minIdx)
      p += 1
    }
    val out = new Array[(String, Long, Long)](sel.size)
    val it = sel.iterator()
    var o = 0
    while (it.hasNext) {
      val g = it.next().intValue()
      out(o) = (hs(g), g + 1L, g + 1L + gramLen)
      o += 1
    }
    out
  }

  def shingleSet(text: String, k: Int): Array[String] = {
    val toks = text.trim.toLowerCase.split("\\s+")
    if (toks.length >= k) {
      val seen = new java.util.LinkedHashSet[String]()
      var i = 0
      while (i + k <= toks.length) {
        val sb = new java.lang.StringBuilder
        var j = 0
        while (j < k) { if (j > 0) sb.append(' '); sb.append(toks(i + j)); j += 1 }
        seen.add(sb.toString)
        i += 1
      }
      seen.toArray(new Array[String](seen.size))
    } else Array(toks.mkString(" "))
  }

  /** Densified one-permutation MinHash signature (OPH — Li, Owen &
    * Zhang NIPS'12; densification per Shrivastava, "Optimal
    * Densification for Fast and Accurate Minwise Hashing", ICML'17):
    * hash every shingle ONCE, route it by its high bits into one of
    * `numPerms` bins, keep the per-bin min, then fill each empty bin by
    * borrowing from an occupied bin found by a (bin, attempt)-keyed
    * pseudo-random probe sequence shared by all documents.
    *
    * Probe densification, NOT the ICML'14 rotation walk (r14): on
    * documents with fewer shingles than bins — the common case for
    * short documents at numPerms=128 — rotation makes every run of
    * consecutive empty bins borrow from the SAME next-occupied bin, so
    * whole LSH bands become functions of one slot value and the band
    * collision probability degrades from J^rows toward J. Measured on
    * the sf0.1 corpus (median 52 shingles/doc): rotation produced
    * 26,720 candidate pairs where classic 128-perm MinHash produced
    * 257 — a 104× verify-join inflation. The random probe gives each
    * empty bin its own borrow source (distinct w.h.p. once a handful
    * of bins are occupied), restoring near-independent band slots;
    * same O(shingles + numPerms) build cost.
    *
    * Same (numPerms-slot, banded-LSH-ready) signature contract as
    * [[minhashSignature]] at O(shingles + numPerms) work per document
    * instead of O(shingles × numPerms) — at 128 perms that's the
    * difference between one pass and 128 passes over every shingle of
    * a 100 TB corpus, and signature build IS the dominant map-side
    * cost of MinHash dedup. Collision statistics per slot are the OPH
    * estimator's (unbiased for Jaccard; slightly higher variance than
    * k independent perms, why the LSH consumer keeps the exact-verify
    * stage).
    */
  def dophSignature(shingleHashes: Array[Long], numPerms: Int): Array[Long] = {
    val sig = Array.fill(numPerms)(Long.MaxValue) // MaxValue = empty bin
    var i = 0
    while (i < shingleHashes.length) {
      val h = splitmix64(shingleHashes(i))
      val bin = (((h >>> 32) % numPerms).toInt + numPerms) % numPerms
      if (h < sig(bin)) sig(bin) = h
      i += 1
    }
    if (shingleHashes.nonEmpty) {
      // borrow only from ORIGINALLY occupied bins (paper semantics), so
      // the borrow value never depends on densification order
      val occupied = sig.map(_ != Long.MaxValue)
      val maxAttempts = 4L * numPerms // covers m=1 occupied bin w.p. ~98%
      var b = 0
      while (b < numPerms) {
        if (!occupied(b)) {
          // (bin, attempt)-keyed universal probe — identical sequence
          // for every document, so two docs with the same occupancy
          // pattern borrow from the same source and the slot keeps the
          // J collision probability
          var attempt = 1L
          var j = -1
          while (j < 0 && attempt <= maxAttempts) {
            val cand = (((splitmix64(b * 0x9E3779B97F4A7C15L + attempt) >>> 33)
              % numPerms).toInt + numPerms) % numPerms
            if (occupied(cand)) j = cand else attempt += 1
          }
          if (j < 0) { // deterministic rotation fallback (probe exhausted)
            j = (b + 1) % numPerms
            while (!occupied(j)) j = (j + 1) % numPerms
          }
          sig(b) = splitmix64(sig(j) ^ splitmix64(attempt))
        }
        b += 1
      }
    }
    sig
  }

  /** MinHash signature: sig(p) = min over shingles of mix(h(s), p). */
  def minhashSignature(shingleHashes: Array[Long], numPerms: Int): Array[Long] = {
    val sig = new Array[Long](numPerms)
    var p = 0
    while (p < numPerms) {
      var best = Long.MaxValue
      var i = 0
      while (i < shingleHashes.length) {
        val h = splitmix64(shingleHashes(i) ^ splitmix64(p.toLong))
        if (h < best) best = h
        i += 1
      }
      sig(p) = best
      p += 1
    }
    sig
  }

  /** LSH band buckets: fold each band of the signature into one 64-bit
    * bucket id. Band index is mixed in, so buckets from different bands
    * occupy disjoint (w.h.p.) key spaces and can be joined on the bare
    * bucket value.
    */
  def bandBuckets(sig: Array[Long], bands: Int): Array[Long] = {
    val rowsPerBand = sig.length / bands
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var acc = splitmix64(0x5851F42D4C957F2DL + b)
      var r = 0
      while (r < rowsPerBand) {
        acc = splitmix64(acc ^ sig(b * rowsPerBand + r))
        r += 1
      }
      out(b) = acc
      b += 1
    }
    out
  }

  /** Deterministic pseudo-random hyperplanes for sign-LSH over dense
    * vectors: `nbits` planes of `dim` components, each uniform in
    * [-0.5, 0.5) from splitmix64(plane, dim). Memoized per (nbits, dim) —
    * executors build the matrix once, then each row is a plain
    * matrix-vector product (no per-element hashing in the hot loop).
    */
  private val planeCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Array[Double]]]()
  def hyperplanes(nbits: Int, dim: Int): Array[Array[Double]] =
    planeCache.computeIfAbsent((nbits, dim), { key =>
      Array.tabulate(key._1, key._2) { (p, i) =>
        (splitmix64(splitmix64(p.toLong) ^ i.toLong) >>> 11).toDouble /
          (1L << 53).toDouble - 0.5
      }
    })

  /** Hyperplane-LSH band buckets for a dense vector: `bands` bands of
    * `bitsPerBand` sign bits each, every band folded into one 64-bit
    * bucket id (band index mixed in so bands occupy disjoint key spaces,
    * same contract as [[bandBuckets]]).
    *
    * Collision math (Goemans–Williamson): P(sign match per bit) =
    * 1 - angle/π, so a pair at cosine τ shares a band with
    * p = (1 - acos(τ)/π)^bitsPerBand and is missed by all bands with
    * (1-p)^bands. Exactness-tuned (4, 64) at τ=0.45 → miss ≤ 8e-6 per
    * pair; pruning-tuned (16, 32) at τ=0.9 → miss ≤ 1e-3 while a random
    * pair collides anywhere with only ~5e-4.
    */
  def hyperplaneBandBuckets(v: Seq[Float], bitsPerBand: Int,
                            bands: Int): Array[Long] = {
    val planes = hyperplanes(bitsPerBand * bands, v.length)
    val arr = v.toArray
    val out = new Array[Long](bands)
    var p = 0
    var b = 0
    while (b < bands) {
      var key = 0L
      var r = 0
      while (r < bitsPerBand) {
        val plane = planes(p)
        var dot = 0.0
        var i = 0
        while (i < arr.length) { dot += arr(i) * plane(i); i += 1 }
        key = (key << 1) | (if (dot >= 0) 1L else 0L)
        r += 1
        p += 1
      }
      out(b) = splitmix64(key ^ splitmix64(0x517CC1B727220A95L + b))
      b += 1
    }
    out
  }

  /** Oracle-replayable 64-bit hashes of EVERY stride-1 `gramLen`-char
    * substring (index i → gram starting at 1-based position i+1) —
    * [[md5Hash64]] per gram, so DuckDB replays each element as
    * `md5_number_upper(substr(text, i, gramLen))`. The EXACT-matching
    * complement of [[winnowedCharGramSpans]]: no window selection, all
    * positions — used by the cross-set substring decontamination cut
    * ([[graft.operators.Dedup.evalSubstringCut]]), where the probe
    * side must carry every position so a ≥ gramLen-char overlap is
    * found at its exact offsets. Docs shorter than gramLen return
    * empty (they cannot contain a ≥ gramLen-char overlap). One
    * MessageDigest per call, reset between grams — one hash per gram,
    * O(n·gramLen) per doc, map-side.
    */
  def charGramHashes(text: String, gramLen: Int): Array[Long] = {
    val n = text.length - gramLen + 1
    if (n <= 0) return Array.empty
    val md = java.security.MessageDigest.getInstance("MD5")
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      val d = md.digest(text.substring(i, i + gramLen)
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      md.reset()
      out(i) = java.nio.ByteBuffer.wrap(d)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).getLong(0)
      i += 1
    }
    out
  }

  /** Oracle-replayable 64-bit token hashes: the little-endian uint64 of
    * each token's FIRST 8 md5 bytes — bit-for-bit DuckDB's
    * `md5_number_upper`, so SQL can recompute signatures exactly. Used
    * by the SimHash operators (q26/q35), whose OUTPUT is the hash bits
    * themselves; the MinHash/KMV paths keep FNV+SplitMix because their
    * oracles verify semantics (Jaccard / distinct counts), not bits,
    * and FNV is ~10× cheaper per token. One MessageDigest per call
    * (per document), reset between tokens.
    */
  def md5TokenHashes(toks: Array[String]): Array[Long] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    toks.map { t =>
      md.reset()
      val d = md.digest(t.getBytes("UTF-8"))
      java.nio.ByteBuffer.wrap(d)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).getLong(0)
    }
  }

  /** 64-bit SimHash over token hashes, as a Long (bit k set iff the
    * weighted bit-k vote over tokens is positive).
    */
  def simhash64(tokenHashes: Array[Long]): Long = {
    val counts = new Array[Int](64)
    var i = 0
    while (i < tokenHashes.length) {
      val h = tokenHashes(i)
      var k = 0
      while (k < 64) {
        if (((h >>> k) & 1L) == 1L) counts(k) += 1 else counts(k) -= 1
        k += 1
      }
      i += 1
    }
    var sig = 0L
    var k = 0
    while (k < 64) {
      if (counts(k) > 0) sig |= (1L << k)
      k += 1
    }
    sig
  }

  /** 64-bit SimHash over token hashes, as a bit string (MSB first). */
  def simhashBits(tokenHashes: Array[Long]): String = {
    val counts = new Array[Int](64)
    var i = 0
    while (i < tokenHashes.length) {
      val h = tokenHashes(i)
      var k = 0
      while (k < 64) {
        if (((h >>> k) & 1L) == 1L) counts(k) += 1 else counts(k) -= 1
        k += 1
      }
      i += 1
    }
    val sb = new java.lang.StringBuilder(64)
    var k = 63
    while (k >= 0) {
      sb.append(if (counts(k) > 0) '1' else '0')
      k -= 1
    }
    sb.toString
  }
}
