"""Text-analysis kernels for the training-data pipeline ops.

These back the ``documents``-table operators (language ID, quality scoring,
token counting, fingerprinting, shingling for MinHash).  Pure python/numpy;
wrapped as pandas UDFs in ``ocr_spark.operators``.  Where an operator must
match a DuckDB oracle, the Spark side uses built-in SQL functions instead —
these kernels cover the non-SQL-expressible parts (minhash, simhash,
rolling-hash fingerprints) and are checked by pytest goldens.
"""

from __future__ import annotations

from zlib import crc32 as _crc32

import numpy as np

# ---------------------------------------------------------------------------
# deterministic 64-bit hashing (splitmix64) — stable across runs/processes
# ---------------------------------------------------------------------------
_MASK64 = (1 << 64) - 1


def splitmix64(x: int) -> int:
    x = (x + 0x9E3779B97F4A7C15) & _MASK64
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & _MASK64
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & _MASK64
    return x ^ (x >> 31)


def hash64(s: str, seed: int = 0) -> int:
    """Deterministic 64-bit string hash at C speed: two independent crc32
    passes (different init values) form the hi/lo words, then a splitmix64
    finalizer.  Stable across processes/runs (unlike builtin hash())."""
    b = s.encode("utf-8")
    lo = _crc32(b)
    hi = _crc32(b, 0x9E3779B9)
    return splitmix64(((hi << 32) | lo) ^ splitmix64(seed))


# ---------------------------------------------------------------------------
# shingles / minhash / simhash
# ---------------------------------------------------------------------------
def char_shingles(text: str, k: int = 5) -> set[str]:
    t = " ".join(text.split()).lower()
    if len(t) < k:
        return {t} if t else set()
    return {t[i : i + k] for i in range(len(t) - k + 1)}


def word_ngrams(text: str, n: int = 3) -> set[str]:
    words = text.lower().split()
    if len(words) < n:
        return {" ".join(words)} if words else set()
    return {" ".join(words[i : i + n]) for i in range(len(words) - n + 1)}


_PERM_SEEDS_CACHE: dict[int, np.ndarray] = {}


def _perm_seeds(num_perm: int) -> np.ndarray:
    if num_perm not in _PERM_SEEDS_CACHE:
        _PERM_SEEDS_CACHE[num_perm] = np.array(
            [splitmix64(i + 1) for i in range(num_perm)], dtype=np.uint64
        )
    return _PERM_SEEDS_CACHE[num_perm]


def minhash_signature(shingles: set[str], num_perm: int = 64) -> np.ndarray:
    """num_perm 64-bit min-hashes: one splitmix64 round per (perm, shingle)
    over the base hashes, fully vectorized as a (num_perm, n) matrix."""
    if not shingles:
        return np.full(num_perm, _MASK64, dtype=np.uint64)
    base = np.array([hash64(s) for s in shingles], dtype=np.uint64)
    with np.errstate(over="ignore"):
        x = base[None, :] + _perm_seeds(num_perm)[:, None]  # (num_perm, n)
        x = x + np.uint64(0x9E3779B97F4A7C15)
        x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        x = x ^ (x >> np.uint64(31))
    return x.min(axis=1)


def lsh_bands(sig: np.ndarray, bands: int = 16) -> list[int]:
    """Band the signature; each band hashes to one 63-bit bucket key."""
    rows = len(sig) // bands
    out = []
    for b in range(bands):
        h = 0xCBF29CE484222325
        for v in sig[b * rows : (b + 1) * rows]:
            h = ((h ^ int(v)) * 0x100000001B3) & _MASK64
        out.append((b << 56) ^ (h >> 8))  # band id in the key; fits int64
    return out


_BIT_SHIFTS = np.arange(64, dtype=np.uint64)


def simhash64(text: str) -> int:
    """64-bit SimHash over word features (vectorized bit unpack)."""
    words = text.lower().split()
    if not words:
        return 0
    hashes = np.array([hash64(w) for w in words], dtype=np.uint64)
    # bits[i, j] = bit j of hash i  -> column sums vs n/2 give the sign
    bits = (hashes[:, None] >> _BIT_SHIFTS) & np.uint64(1)
    votes = bits.sum(axis=0, dtype=np.int64) * 2 - len(words)
    out = 0
    for j in np.nonzero(votes > 0)[0]:
        out |= 1 << int(j)
    return out


def hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & _MASK64).count("1")


# ---------------------------------------------------------------------------
# rolling-hash fingerprint (winnowing-style document fingerprint)
# ---------------------------------------------------------------------------
def rolling_fingerprints(text: str, k: int = 7, window: int = 4) -> list[int]:
    """Winnowing (Schleimer et al. 2003): k-gram rolling hashes, min per
    window, deduped consecutive — a compact order-robust fingerprint."""
    t = " ".join(text.split()).lower()
    if len(t) < k:
        return [hash64(t)] if t else []
    hashes = [hash64(t[i : i + k]) for i in range(len(t) - k + 1)]
    if len(hashes) <= window:
        return [min(hashes)]
    out: list[int] = []
    prev = None
    for i in range(len(hashes) - window + 1):
        m = min(hashes[i : i + window])
        if m != prev:
            out.append(m)
            prev = m
    return out


# ---------------------------------------------------------------------------
# language ID (n-gram heuristic over stopword profiles)
# ---------------------------------------------------------------------------
_LANG_STOPWORDS: dict[str, frozenset[str]] = {
    "en": frozenset("the of and to in a is that it for on with as are was be".split()),
    "fr": frozenset("le la les de des et un une est que pour dans sur avec au du".split()),
    "de": frozenset("der die das und ist von zu mit den im für auf ein eine".split()),
    "es": frozenset("el la los las de y un una es que para en con del por".split()),
    "ar": frozenset("في من على أن إلى عن هذا التي الذي مع كان هو هي".split()),
}


def detect_lang(text: str) -> str:
    """Best stopword-overlap language, 'und' if nothing matches."""
    words = text.lower().split()
    if not words:
        return "und"
    best_lang, best_score = "und", 0
    for lang in sorted(_LANG_STOPWORDS):  # sorted -> deterministic tie-break
        score = sum(1 for w in words if w in _LANG_STOPWORDS[lang])
        if score > best_score:
            best_lang, best_score = lang, score
    return best_lang
