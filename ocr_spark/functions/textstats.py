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
    finalizer.  Stable across processes/runs (unlike builtin hash()).

    This scalar form is the SPEC; the vectorized kernels below
    (``_hash_ranges`` and friends) must produce bit-identical values and are
    property-tested against it (tests/test_kernels.py)."""
    b = s.encode("utf-8")
    lo = _crc32(b)
    hi = _crc32(b, 0x9E3779B9)
    return splitmix64(((hi << 32) | lo) ^ splitmix64(seed))


# ---------------------------------------------------------------------------
# vectorized hashing core — numpy table-driven CRC32 over byte-range batches
# ---------------------------------------------------------------------------
def _make_crc_table() -> np.ndarray:
    table = np.empty(256, dtype=np.uint32)
    for i in range(256):
        c = i
        for _ in range(8):
            c = (c >> 1) ^ 0xEDB88320 if c & 1 else c >> 1
        table[i] = c
    return table


_CRC_TABLE = _make_crc_table()
_SEED0_MIX = np.uint64(splitmix64(0))  # hash64's default-seed mix constant


def _splitmix64_vec(x: np.ndarray) -> np.ndarray:
    with np.errstate(over="ignore"):
        x = x + np.uint64(0x9E3779B97F4A7C15)
        x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return x ^ (x >> np.uint64(31))


def _hash_ranges(b: np.ndarray, starts: np.ndarray, ends: np.ndarray) -> np.ndarray:
    """hash64 of each byte range b[starts[i]:ends[i]], vectorized; equals
    ``np.array([hash64(bytes(range).decode()) for range in ...])``.

    The table-driven CRC processes one byte COLUMN per step, vectorized over
    all ranges; ranges are pre-sorted by length descending so the rows still
    alive at column j form a dense prefix — each step is pure slice
    arithmetic with no masks or gather matrices, and the Python-level loop
    runs max-range-bytes (≈ shingle width) times per call, not per string."""
    n = len(starts)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    lens = ends - starts
    maxlen = int(lens.max())
    if int(lens.min()) == maxlen:  # uniform length (ASCII shingles): no sort
        order = None
        s_s, l_s = starts, lens
    else:
        order = np.argsort(-lens, kind="stable")
        s_s, l_s = starts[order], lens[order]
    r_lo = np.full(n, 0xFFFFFFFF, dtype=np.uint32)
    r_hi = np.full(n, 0x9E3779B9 ^ 0xFFFFFFFF, dtype=np.uint32)
    m = n
    for j in range(maxlen):
        # rows with length > j form a prefix of the sorted order
        while m > 0 and l_s[m - 1] <= j:
            m = int(np.searchsorted(-l_s, -(j + 1), side="right"))
        if m == 0:
            break
        byte = b[s_s[:m] + j].astype(np.uint32)
        r_lo[:m] = (r_lo[:m] >> np.uint32(8)) ^ _CRC_TABLE[(r_lo[:m] ^ byte) & np.uint32(0xFF)]
        r_hi[:m] = (r_hi[:m] >> np.uint32(8)) ^ _CRC_TABLE[(r_hi[:m] ^ byte) & np.uint32(0xFF)]
    lo = (r_lo ^ np.uint32(0xFFFFFFFF)).astype(np.uint64)
    hi = (r_hi ^ np.uint32(0xFFFFFFFF)).astype(np.uint64)
    out = _splitmix64_vec(((hi << np.uint64(32)) | lo) ^ _SEED0_MIX)
    if order is None:
        return out
    unsorted = np.empty_like(out)
    unsorted[order] = out
    return unsorted


def _utf8_offsets(t: str) -> tuple[np.ndarray, np.ndarray]:
    """(codepoints, byte offset of each char in t.encode('utf-8')); the
    offsets array has len(t)+1 entries so off[i:j] brackets any char span."""
    u32 = np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32)
    clen = np.ones(u32.size, dtype=np.int64)
    clen[u32 >= 0x80] += 1
    clen[u32 >= 0x800] += 1
    clen[u32 >= 0x10000] += 1
    off = np.empty(u32.size + 1, dtype=np.int64)
    off[0] = 0
    np.cumsum(clen, out=off[1:])
    return u32, off


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


def char_shingle_hashes(text: str, k: int = 5) -> np.ndarray:
    """hash64 of every k-char window of the whitespace-normalized lowered
    text, fully vectorized (no per-shingle Python strings).  Value-set equals
    ``{hash64(s) for s in char_shingles(text, k)}`` — duplicates are fine
    because every consumer (minhash) takes a min."""
    t = " ".join(text.split()).lower()
    if not t:
        return np.empty(0, dtype=np.uint64)
    b = np.frombuffer(t.encode("utf-8"), dtype=np.uint8)
    if len(t) < k:
        return _hash_ranges(
            b, np.zeros(1, dtype=np.int64), np.array([len(b)], dtype=np.int64)
        )
    _u32, off = _utf8_offsets(t)
    n = len(t) - k + 1
    return _hash_ranges(b, off[:n], off[k:])


def char_shingle_hashes_batch(texts: list[str], k: int = 5) -> list[np.ndarray]:
    """char_shingle_hashes for a whole Arrow batch in ONE _hash_ranges call:
    every doc's utf-8 bytes are packed into a single buffer and all window
    ranges hashed together, so the vectorized CRC runs over ~batch-size x
    windows rows at once instead of per-doc small arrays."""
    encs: list[bytes] = []
    starts_l: list[np.ndarray] = []
    ends_l: list[np.ndarray] = []
    counts: list[int] = []
    base = 0
    for text in texts:
        t = " ".join(text.split()).lower()
        if not t:
            counts.append(0)
            continue
        enc = t.encode("utf-8")
        encs.append(enc)
        if len(t) < k:
            starts_l.append(np.array([base], dtype=np.int64))
            ends_l.append(np.array([base + len(enc)], dtype=np.int64))
            counts.append(1)
        else:
            if len(enc) == len(t):  # pure ASCII: offsets are the identity
                off = np.arange(len(t) + 1, dtype=np.int64)
            else:
                _u32, off = _utf8_offsets(t)
            n = len(t) - k + 1
            starts_l.append(off[:n] + base)
            ends_l.append(off[k:] + base)
            counts.append(n)
        base += len(enc)
    if not starts_l:
        return [np.empty(0, dtype=np.uint64) for _ in texts]
    buf = np.frombuffer(b"".join(encs), dtype=np.uint8)
    hashes = _hash_ranges(buf, np.concatenate(starts_l), np.concatenate(ends_l))
    out: list[np.ndarray] = []
    pos = 0
    for c in counts:
        out.append(hashes[pos : pos + c])
        pos += c
    return out


def minhash_from_hashes(base: np.ndarray, num_perm: int = 64) -> np.ndarray:
    """num_perm 64-bit min-hashes over precomputed base hashes: one
    splitmix64 round per (perm, shingle), vectorized as a (num_perm, chunk)
    matrix with a running min (chunked so a huge doc never materializes a
    num_perm x n matrix).  Base hashes are deduped first — min() is
    insensitive to multiplicity and repeated-shingle text is common."""
    base = np.unique(base)  # sorted distinct
    if base.size == 0:
        return np.full(num_perm, _MASK64, dtype=np.uint64)
    seeds = _perm_seeds(num_perm)[:, None]
    out = np.full(num_perm, _MASK64, dtype=np.uint64)
    for i in range(0, base.size, 16384):
        x = _splitmix64_vec(base[None, i : i + 16384] + seeds)
        np.minimum(out, x.min(axis=1), out=out)
    return out


def minhash_batch(bases: list[np.ndarray], num_perm: int = 64) -> np.ndarray:
    """(n_docs, num_perm) minhash signatures for a whole Arrow batch in one
    set of numpy passes: concatenate every doc's (deduped) base hashes, then
    per permutation run splitmix64 over the flat array and take per-doc
    segment minima with ``np.minimum.reduceat`` — the Python-level loop is
    num_perm iterations per BATCH, not per document.  Bit-identical to
    ``minhash_from_hashes`` per row (asserted in tests)."""
    n = len(bases)
    out = np.full((n, num_perm), _MASK64, dtype=np.uint64)
    uniq = [np.unique(b) for b in bases]
    nonempty = [i for i, b in enumerate(uniq) if b.size]
    if not nonempty:
        return out
    flat = np.concatenate([uniq[i] for i in nonempty])
    lens = np.array([uniq[i].size for i in nonempty], dtype=np.int64)
    starts = np.concatenate(([0], np.cumsum(lens[:-1])))
    seeds = _perm_seeds(num_perm)
    rows = np.array(nonempty, dtype=np.int64)
    for p in range(num_perm):
        y = _splitmix64_vec(flat + seeds[p])
        out[rows, p] = np.minimum.reduceat(y, starts)
    return out


def minhash_signature(shingles: set[str], num_perm: int = 64) -> np.ndarray:
    """Spec form over an explicit shingle set (kept for tests / callers with
    precomputed shingles); the hot path is char_shingle_hashes +
    minhash_from_hashes, asserted bit-identical to this in pytest."""
    if not shingles:
        return np.full(num_perm, _MASK64, dtype=np.uint64)
    base = np.array([hash64(s) for s in shingles], dtype=np.uint64)
    return minhash_from_hashes(base, num_perm)


def lsh_bands(sig: np.ndarray, bands: int = 16) -> list[int]:
    """Band the signature; each band hashes to one 63-bit bucket key."""
    return [int(k) for k in lsh_band_keys(sig, bands)]


def lsh_band_keys(sig: np.ndarray, bands: int = 16) -> np.ndarray:
    """Vectorized band keys: FNV-1a across each band's rows (loop runs
    rows-per-band times, each step vectorized over all bands)."""
    rows = len(sig) // bands
    s = np.ascontiguousarray(sig[: bands * rows], dtype=np.uint64).reshape(bands, rows)
    h = np.full(bands, 0xCBF29CE484222325, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for r in range(rows):
            h = (h ^ s[:, r]) * np.uint64(0x100000001B3)
    return (np.arange(bands, dtype=np.uint64) << np.uint64(56)) ^ (h >> np.uint64(8))


def lsh_band_keys_batch(sigs: np.ndarray, bands: int = 16) -> np.ndarray:
    """(n_docs, bands) band keys for a (n_docs, num_perm) signature matrix;
    same FNV-1a per band as lsh_band_keys, vectorized across the batch."""
    n, num_perm = sigs.shape
    rows = num_perm // bands
    s = np.ascontiguousarray(sigs[:, : bands * rows]).reshape(n, bands, rows)
    h = np.full((n, bands), 0xCBF29CE484222325, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for r in range(rows):
            h = (h ^ s[:, :, r]) * np.uint64(0x100000001B3)
    band_ids = np.arange(bands, dtype=np.uint64)[None, :] << np.uint64(56)
    return band_ids ^ (h >> np.uint64(8))


_BIT_SHIFTS = np.arange(64, dtype=np.uint64)


def _word_ranges(t: str) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(utf8 bytes, word byte starts, word byte ends) of a single-space-
    joined text — the vectorized equivalent of ``t.split()``."""
    u32, off = _utf8_offsets(t)
    is_sp = u32 == np.uint32(0x20)
    nw = ~is_sp
    starts_c = np.flatnonzero(nw & np.concatenate(([True], is_sp[:-1])))
    ends_c = np.flatnonzero(nw & np.concatenate((is_sp[1:], [True]))) + 1
    b = np.frombuffer(t.encode("utf-8"), dtype=np.uint8)
    return b, off[starts_c], off[ends_c]


def word_hashes(text: str) -> np.ndarray:
    """hash64 of every word of ``text.lower().split()`` (with multiplicity),
    vectorized; bit-identical to the per-word scalar loop."""
    t = " ".join(text.lower().split())
    if not t:
        return np.empty(0, dtype=np.uint64)
    b, starts, ends = _word_ranges(t)
    return _hash_ranges(b, starts, ends)


def simhash64(text: str) -> int:
    """64-bit SimHash over word features (vectorized hash + bit unpack)."""
    hashes = word_hashes(text)
    if hashes.size == 0:
        return 0
    # bits[i, j] = bit j of hash i  -> column sums vs n/2 give the sign
    bits = (hashes[:, None] >> _BIT_SHIFTS) & np.uint64(1)
    votes = bits.sum(axis=0, dtype=np.int64) * 2 - hashes.size
    return int(((np.uint64(1) << _BIT_SHIFTS)[votes > 0]).sum(dtype=np.uint64))


def simhash_batch(texts: list[str]) -> np.ndarray:
    """simhash64 for a whole Arrow batch: every doc's words are hashed in
    ONE _hash_ranges call over a packed byte buffer, bit votes are summed
    per doc with ``np.add.reduceat`` — no per-doc numpy round trips.
    Bit-identical to simhash64 per row (asserted in tests)."""
    encs: list[bytes] = []
    starts_l: list[np.ndarray] = []
    ends_l: list[np.ndarray] = []
    counts: list[int] = []
    base = 0
    for text in texts:
        t = " ".join(text.lower().split())
        if not t:
            counts.append(0)
            continue
        enc = t.encode("utf-8")
        encs.append(enc)
        b, ws, we = _word_ranges(t)
        starts_l.append(ws + base)
        ends_l.append(we + base)
        counts.append(len(ws))
        base += len(enc)
    out = np.zeros(len(texts), dtype=np.uint64)
    if not starts_l:
        return out
    buf = np.frombuffer(b"".join(encs), dtype=np.uint8)
    hashes = _hash_ranges(buf, np.concatenate(starts_l), np.concatenate(ends_l))
    nz = np.array([i for i, c in enumerate(counts) if c], dtype=np.int64)
    lens = np.array([c for c in counts if c], dtype=np.int64)
    seg_starts = np.concatenate(([0], np.cumsum(lens[:-1])))
    seg_ends = seg_starts + lens
    # vote in DOC CHUNKS so the transient (words x 64) bit matrix stays
    # bounded (~128 MB) no matter how many words one Arrow batch carries —
    # the per-doc scalar path never allocated more than one doc's matrix
    max_words = 1 << 18
    packed = np.empty(len(lens), dtype=np.uint64)
    d = 0
    while d < len(lens):
        e = d
        total = 0
        while e < len(lens) and (e == d or total + lens[e] <= max_words):
            total += int(lens[e])
            e += 1
        h = hashes[seg_starts[d] : seg_ends[e - 1]]
        bits = ((h[:, None] >> _BIT_SHIFTS) & np.uint64(1)).astype(np.int64)
        rel_starts = (seg_starts[d:e] - seg_starts[d])
        sums = np.add.reduceat(bits, rel_starts, axis=0)  # (chunk_docs, 64)
        votes = sums * 2 - lens[d:e, None]
        packed[d:e] = (
            (votes > 0).astype(np.uint64) * (np.uint64(1) << _BIT_SHIFTS)
        ).sum(axis=1, dtype=np.uint64)
        d = e
    out[nz] = packed
    return out


def hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & _MASK64).count("1")


# ---------------------------------------------------------------------------
# rolling-hash fingerprint (winnowing-style document fingerprint)
# ---------------------------------------------------------------------------
def rolling_fingerprints(text: str, k: int = 7, window: int = 4) -> list[int]:
    """Winnowing (Schleimer et al. 2003): k-gram rolling hashes, min per
    window, deduped consecutive — a compact order-robust fingerprint.
    Vectorized: k-gram hashes via char_shingle_hashes (window order
    preserved), window min via a strided view, consecutive-dedup via a
    shifted compare — identical output to the scalar loop."""
    hashes = char_shingle_hashes(text, k)
    if hashes.size == 0:
        return []
    if hashes.size <= window:
        return [int(hashes.min())]
    m = np.lib.stride_tricks.sliding_window_view(hashes, window).min(axis=1)
    keep = np.concatenate(([True], m[1:] != m[:-1]))
    return [int(v) for v in m[keep]]


# ---------------------------------------------------------------------------
# language ID (n-gram heuristic over stopword profiles)
# ---------------------------------------------------------------------------
_LANG_STOPWORDS: dict[str, frozenset[str]] = {
    "ar": frozenset("في من على أن إلى عن هذا التي الذي مع كان هو هي".split()),
    "da": frozenset("og i det at en den til er som på de med han af for".split()),
    "de": frozenset("der die das und ist von zu mit den im für auf ein eine".split()),
    "en": frozenset("the of and to in a is that it for on with as are was be".split()),
    "es": frozenset("el la los las de y un una es que para en con del por".split()),
    "fr": frozenset("le la les de des et un une est que pour dans sur avec au du".split()),
    "id": frozenset("yang dan di itu dengan untuk tidak ini dari dalam akan pada juga".split()),
    "it": frozenset("il la di che e un una per non sono con del alla più".split()),
    "nl": frozenset("de het een van ik te dat die in en zij is niet op".split()),
    "pl": frozenset("w i na się nie to jest że z do tak jak po co".split()),
    "pt": frozenset("o a os as de que e do da em um para com não uma".split()),
    "ro": frozenset("de a în și la cu pe este un o care nu pentru mai".split()),
    "ru": frozenset("и в не на я что он с как это все она так его но".split()),
    "sv": frozenset("och i att det som en på är av för med den till om".split()),
    "tr": frozenset("bir bu ve da ne için ile mi ama o çok daha gibi en".split()),
    "vi": frozenset("của và các có được cho là những không trong người với một này".split()),
}


def detect_lang(text: str) -> str:
    """Best stopword-overlap language, 'und' if nothing matches.  This is
    the SPEC form; ``detect_lang_batch`` is the bit-identical hot path
    (enforced by a differential test in tests/test_kernels.py)."""
    words = text.lower().split()
    if not words:
        return "und"
    best_lang, best_score = "und", 0
    for lang in sorted(_LANG_STOPWORDS):  # sorted -> deterministic tie-break
        score = sum(1 for w in words if w in _LANG_STOPWORDS[lang])
        if score > best_score:
            best_lang, best_score = lang, score
    return best_lang


# inverted profile table for the batch path: stopword -> indices into the
# SORTED language list (one dict probe per word instead of 16 set probes)
_LANGS_SORTED = sorted(_LANG_STOPWORDS)
_WORD_LANGS: dict[str, list[int]] = {}
for _li, _lang in enumerate(_LANGS_SORTED):
    for _w in _LANG_STOPWORDS[_lang]:
        _WORD_LANGS.setdefault(_w, []).append(_li)


def detect_lang_batch(texts: list[str]) -> list[str]:
    """Vectorized ``detect_lang``: per word ONE inverted-table lookup; the
    winner is the first maximum over the sorted language order — exactly
    the scalar loop's strictly-greater tie-break."""
    import numpy as np

    n_langs = len(_LANGS_SORTED)
    out = []
    scores = np.zeros(n_langs, dtype=np.int64)
    for text in texts:
        words = text.lower().split()
        if not words:
            out.append("und")
            continue
        scores[:] = 0
        get = _WORD_LANGS.get
        for w in words:
            idx = get(w)
            if idx is not None:
                for i in idx:
                    scores[i] += 1
        m = int(scores.max())
        out.append("und" if m == 0 else _LANGS_SORTED[int(scores.argmax())])
    return out
