"""Signature sidecars — oracle-grade verification for the hash-based dedup
family (VERDICT r2 "Next round" #1).

The minhash/simhash/winnowing queries were rows-only through round 2: their
outputs depend on our deterministic hash kernels, which no independent SQL
engine reproduces.  The sidecar trick closes the gap: the KERNELS (the
scalar spec forms in ``ocr_spark.functions.textstats``, already pinned
bit-identical to the Spark-side batch forms by hypothesis tests) are run
here in plain Python/numpy — no Spark involved — and their per-document
signatures are written to parquet.  The DuckDB oracle then re-derives the
entire *candidate-generation + verification* logic in SQL over the sidecar:

- minhash: band-bucket self-join + position-match count (est. Jaccard);
- simhash: brute-force all-pairs Hamming<=k — which simultaneously PROVES
  the index construction's recall (any correct pigeonhole index must emit
  exactly the brute-force pair set);
- winnowing: window-min + consecutive-dedup reproduced with SQL window
  functions (hashes stored as UBIGINT so SQL ``min`` is the kernel's
  unsigned min);
- clustering: recursive-CTE minimum-label fixpoint over the verified pairs.

So everything EXCEPT the kernel arithmetic is verified by an independent
engine, and the kernel arithmetic is verified by the hypothesis
bit-identity suite (tests/test_kernels.py).

Sidecars are keyed by (format version, source file identity, parameters)
and regenerate on demand; the output directory lives under the gitignored
fixtures data root.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ocr_spark.functions import textstats as K

SIDECAR_VERSION = 1

# parameters MUST match the driver queries in __spark_entry__.py
NUM_PERM = 64
BANDS = 16
FP_K = 7  # rolling_fingerprints k-gram width (kernel default)

_ROOT = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "fixtures", "sidecars")


def _manifest(src: str) -> dict:
    st = os.stat(src)
    return {
        "format_version": SIDECAR_VERSION,
        "src": os.path.abspath(src),
        "src_size": st.st_size,
        "src_mtime": st.st_mtime,
        "num_perm": NUM_PERM,
        "bands": BANDS,
        "fp_k": FP_K,
    }


def ensure_sidecars(sf_dir: str) -> str:
    """Generate (or reuse) the signature sidecars for ``sf_dir``'s
    ``documents`` table; returns the sidecar directory.

    Concurrency/atomicity: every file lands via write-to-temp +
    ``os.replace`` (the manifest LAST), so a reader racing a regeneration
    sees either the old complete file or the new complete one, never a
    torn parquet.  Two concurrent writers are benign: the sidecar bytes
    are deterministic from (src content, frozen params), so racing
    replaces install identical data.  The dir key includes a digest of the
    source's ABSOLUTE path — two corpora that share a basename (a/sf0.01
    vs b/sf0.01) must not thrash one cache dir and silently serve each
    other's signatures."""
    import hashlib

    src = os.path.join(sf_dir, "documents.parquet")
    src_key = hashlib.sha1(os.path.abspath(src).encode()).hexdigest()[:10]
    out = os.path.join(
        _ROOT, f"{os.path.basename(os.path.normpath(sf_dir))}-{src_key}"
    )
    man_path = os.path.join(out, "_manifest.json")
    want = _manifest(src)
    sidecar_files = ("minhash.parquet", "simhash.parquet", "kgrams.parquet")
    if os.path.exists(man_path):
        with open(man_path) as f:
            # the manifest is written LAST, so it can outlive a partially
            # deleted cache — it only counts if the files it promises exist
            if json.load(f) == want and all(
                os.path.exists(os.path.join(out, s)) for s in sidecar_files
            ):
                return out
    os.makedirs(out, exist_ok=True)

    def _write_atomic(table, path: str) -> None:
        tmp = f"{path}.tmp-{os.getpid()}"
        pq.write_table(table, tmp)
        os.replace(tmp, path)

    t = pq.read_table(src, columns=["doc_id", "text"])
    doc_ids = t.column("doc_id").to_pylist()
    texts = ["" if v is None else v for v in t.column("text").to_pylist()]

    # ---- minhash signatures + LSH band keys (batch kernels, no Spark) ----
    bases = K.char_shingle_hashes_batch(texts)
    sig = K.minhash_batch(bases, NUM_PERM)  # (n, 64) uint64
    band = K.lsh_band_keys_batch(sig, BANDS)  # (n, 16) uint64
    _write_atomic(
        pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.int64()),
                "signature": pa.array(
                    sig.view(np.int64).tolist(), pa.list_(pa.int64())
                ),
                "band_keys": pa.array(
                    band.view(np.int64).tolist(), pa.list_(pa.int64())
                ),
            }
        ),
        os.path.join(out, "minhash.parquet"),
    )

    # ---- simhash fingerprints -------------------------------------------
    sh = K.simhash_batch(texts)  # (n,) uint64
    _write_atomic(
        pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.int64()),
                "simhash": pa.array(sh.view(np.int64).tolist(), pa.int64()),
            }
        ),
        os.path.join(out, "simhash.parquet"),
    )

    # ---- winnowing k-gram hash sequences (window ORDER preserved) -------
    # stored as UBIGINT so the SQL window-min is the kernel's unsigned min.
    # Batch kernel + flat numpy buffers: the old per-doc scalar loop
    # accumulated ~n_docs*500 Python ints per column (~28 B each) before
    # one pa.array conversion — multiple GB at a bench-scale corpus
    kg = K.char_shingle_hashes_batch(texts, FP_K)
    sizes = np.fromiter((h.size for h in kg), dtype=np.int64, count=len(kg))
    _write_atomic(
        pa.table(
            {
                "doc_id": pa.array(
                    np.repeat(np.asarray(doc_ids, dtype=np.int64), sizes)
                ),
                "pos": pa.array(
                    np.concatenate([np.arange(s, dtype=np.int64) for s in sizes])
                    if len(sizes)
                    else np.empty(0, np.int64)
                ),
                "hash": pa.array(
                    np.concatenate(kg) if len(kg) else np.empty(0, np.uint64),
                    pa.uint64(),
                ),
            }
        ),
        os.path.join(out, "kgrams.parquet"),
    )

    tmp = f"{man_path}.tmp-{os.getpid()}"  # pid-suffixed: two writers must
    with open(tmp, "w") as f:  # not interleave into one temp file
        json.dump(want, f, indent=1)
    os.replace(tmp, man_path)
    return out
