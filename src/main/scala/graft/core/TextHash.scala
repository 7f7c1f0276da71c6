package graft.core

/**
 * Byte-level hashing primitives for document fingerprinting and dedup.
 * Static, allocation-free methods callable from generated code (same
 * pattern as [[ClusterHash]]).
 */
object TextHash {

  /** Karp-Rabin polynomial rolling-hash parameters (public constants). */
  final val Base = 257L
  final val Mod = 2147483647L // 2^31 - 1, Mersenne prime

  /**
   * Minimum Karp-Rabin hash over all `window`-byte substrings — a
   * winnowing-style document fingerprint: stable under small edits
   * anywhere outside the minimizing window. Shorter docs hash whole.
   */
  def rollingMin(bytes: Array[Byte], window: Int): Long = {
    val n = bytes.length
    if (n == 0) return 0L
    val w = if (window < n) window else n
    var h = 0L
    var i = 0
    while (i < w) { h = (h * Base + (bytes(i) & 0xff)) % Mod; i += 1 }
    var min = h
    // precompute Base^(w-1) mod Mod for the roll-off term
    var pow = 1L
    i = 1
    while (i < w) { pow = (pow * Base) % Mod; i += 1 }
    i = w
    while (i < n) {
      h = (h - ((bytes(i - w) & 0xff) * pow) % Mod + Mod) % Mod
      h = (h * Base + (bytes(i) & 0xff)) % Mod
      if (h < min) min = h
      i += 1
    }
    min
  }

  /**
   * Mod-sampled rolling-fingerprint set (the winnowing/MOSS copy-
   * detection family): Karp-Rabin hashes of every `window`-byte
   * substring, keeping those ≡ 0 (mod `modP`) — a deterministic,
   * position-independent 1/modP downsample, so two documents sharing
   * any long-enough substring share its sampled fingerprints
   * regardless of where it occurs. Distinct, sorted (set semantics).
   * Same Base/Mod chain as [[rollingMin]]; docs shorter than `window`
   * contribute their single whole-text hash (subject to the filter).
   */
  def fingerprintSet(bytes: Array[Byte], window: Int, modP: Int): Array[Long] = {
    val n = bytes.length
    if (n == 0) return Array.emptyLongArray
    val w = if (window < n) window else n
    val out = new Array[Long](n - w + 1)
    var m = 0
    var h = 0L
    var i = 0
    while (i < w) { h = (h * Base + (bytes(i) & 0xff)) % Mod; i += 1 }
    if (h % modP == 0) { out(m) = h; m += 1 }
    var pow = 1L
    i = 1
    while (i < w) { pow = (pow * Base) % Mod; i += 1 }
    i = w
    while (i < n) {
      h = (h - ((bytes(i - w) & 0xff) * pow) % Mod + Mod) % Mod
      h = (h * Base + (bytes(i) & 0xff)) % Mod
      if (h % modP == 0) { out(m) = h; m += 1 }
      i += 1
    }
    val trimmed = java.util.Arrays.copyOf(out, m)
    java.util.Arrays.sort(trimmed)
    var uniq = 0
    var j = 0
    while (j < m) {
      if (j == 0 || trimmed(j) != trimmed(j - 1)) { trimmed(uniq) = trimmed(j); uniq += 1 }
      j += 1
    }
    if (uniq == m) trimmed else java.util.Arrays.copyOf(trimmed, uniq)
  }

  /**
   * 64-bit SimHash over whitespace tokens: each token's 64-bit hash votes
   * ±1 per bit position; the signature sets bits with positive vote sums.
   * Near-duplicate docs differ in few bits (small Hamming distance).
   */
  def simHash64(tokens: Array[AnyRef]): Long = {
    val votes = new Array[Int](64)
    var t = 0
    while (t < tokens.length) {
      val h = fnv1a64(tokens(t).toString)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      t += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  /**
   * Distinct 64-bit FNV-1a hashes of all `n`-word shingles, computed in
   * one pass over the UTF-8 bytes: token spans are located byte-wise
   * (ASCII whitespace, same class as Java regex `\s`), each window is
   * hashed as `w1␠w2␠…␠wn` without materializing token or shingle
   * strings. Shingle semantics mirror [[graft.operators.Dedup.shingles]]
   * including edges: no tokens → one hash of ""; fewer than n tokens →
   * one hash of all tokens joined.
   */
  def wordShingleHashes(bytes: Array[Byte], n: Int): Array[Long] = {
    val len = bytes.length
    def isSpace(b: Byte): Boolean = b == 0x20 || (b >= 0x09 && b <= 0x0d)
    // count tokens
    var nTok = 0
    var i = 0
    while (i < len) {
      if (!isSpace(bytes(i)) && (i == 0 || isSpace(bytes(i - 1)))) nTok += 1
      i += 1
    }
    if (nTok == 0) return Array(fnv1a64Bytes(bytes, 0, 0))
    val starts = new Array[Int](nTok)
    val ends = new Array[Int](nTok)
    var t = 0
    i = 0
    while (i < len) {
      if (!isSpace(bytes(i))) {
        if (i == 0 || isSpace(bytes(i - 1))) { starts(t) = i; t += 1 }
        ends(t - 1) = i + 1
      }
      i += 1
    }
    val count = if (nTok <= n) 1 else nTok - n + 1
    val out = new Array[Long](count)
    var s = 0
    while (s < count) {
      var h = 0xcbf29ce484222325L
      val last = math.min(s + n, nTok) - 1
      var w = s
      while (w <= last) {
        var p = starts(w)
        while (p < ends(w)) { h ^= (bytes(p) & 0xff).toLong; h *= 0x100000001b3L; p += 1 }
        if (w != last) { h ^= 0x20L; h *= 0x100000001b3L }
        w += 1
      }
      out(s) = h
      s += 1
    }
    // distinct via sort + in-place dedup (order is irrelevant to set ops)
    java.util.Arrays.sort(out)
    var uniq = 0
    var j = 0
    while (j < count) {
      if (j == 0 || out(j) != out(j - 1)) { out(uniq) = out(j); uniq += 1 }
      j += 1
    }
    if (uniq == count) out else java.util.Arrays.copyOf(out, uniq)
  }

  private def fnv1a64Bytes(bytes: Array[Byte], from: Int, until: Int): Long = {
    var h = 0xcbf29ce484222325L
    var i = from
    while (i < until) { h ^= (bytes(i) & 0xff).toLong; h *= 0x100000001b3L; i += 1 }
    h
  }

  /**
   * FNV-1a64 + murmur3's fmix64 finalizer. FNV alone is too non-uniform
   * in its high bits on short keys for order-statistics sketches (KMV's
   * k-th-minimum estimator was off 6× on sequential keys); the
   * xor-shift/multiply finalizer restores uniformity while every step
   * stays SQL-recomputable (xor, shifts, and a 32-bit-limb multiply
   * mod 2^64).
   */
  def fnv1a64Mixed(s: String): Long =
    fnv1a64Mixed(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  /** Byte-based form — the hot path for expressions, which already hold
    * UTF-8 bytes and must not round-trip through a java String. */
  def fnv1a64Mixed(bytes: Array[Byte]): Long = {
    var h = fnv1a64(bytes)
    h ^= h >>> 33; h *= 0xff51afd7ed558ccdL
    h ^= h >>> 33; h *= 0xc4ceb9fe1a85ec53L
    h ^ (h >>> 33)
  }

  /** Hashing-trick count vector (one pass): bucket `floorMod(fnv1a64(t),
    * dim)` per token, counts as doubles. The deterministic text→vector
    * featurizer behind the curated-corpus index (s72) — every count is
    * a small integer, so an independent SQL recompute (per-token FNV
    * fold mod dim) reproduces the vector bit-for-bit. `dim` MUST be a
    * power of two: the oracle-reproducibility argument is that signed
    * floorMod equals the SQL's unsigned mod because 2^64 ≡ 0 (mod dim),
    * which holds ONLY for power-of-two dims — a dim like 10 would
    * silently diverge from a DuckDB recompute on tokens whose FNV hash
    * is negative, so it is rejected here rather than documented away. */
  def hashedCounts(tokens: Array[AnyRef], dim: Int): Array[Double] = {
    require(dim > 0 && (dim & (dim - 1)) == 0,
      s"hashed count vector dim must be a power of two (unsigned-mod " +
        s"reproducibility needs 2^64 ≡ 0 mod dim), got $dim")
    val out = new Array[Double](dim)
    var t = 0
    while (t < tokens.length) {
      val b = java.lang.Math.floorMod(fnv1a64(tokens(t).toString), dim.toLong).toInt
      out(b) += 1.0
      t += 1
    }
    out
  }

  /** FNV-1a 64-bit over UTF-8 bytes (public-domain hash). */
  def fnv1a64(s: String): Long =
    fnv1a64(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  /** Byte-based form (see [[fnv1a64Mixed(bytes*]]). */
  def fnv1a64(bytes: Array[Byte]): Long =
    fnv1a64Bytes(bytes, 0, bytes.length)
}
