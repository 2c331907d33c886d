"""Signature sidecars (ocr_spark/fixtures/sidecars.py): the parquet the
DuckDB dedup oracles re-derive candidate generation over.

The heavy verification is the oracle gate itself (tools/check_oracles.py:
minhash_pairs / simhash_pairs / fingerprints / dedup_pipeline all compare
Spark vs DuckDB-over-sidecar); these tests pin the sidecar's own contract:
spec-kernel equality per row, unsigned hash storage, and the regeneration
guard.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow.parquet as pq

from ocr_spark.fixtures.sidecars import FP_K, NUM_PERM, ensure_sidecars
from ocr_spark.functions import textstats as K

SF_DIR = "/root/testdata/sf0.01"


def test_sidecars_match_scalar_spec_kernels():
    out = ensure_sidecars(SF_DIR)
    docs = pq.read_table(
        os.path.join(SF_DIR, "documents.parquet"), columns=["doc_id", "text"]
    )
    doc_ids = docs.column("doc_id").to_pylist()
    texts = ["" if v is None else v for v in docs.column("text").to_pylist()]
    by_id = dict(zip(doc_ids, texts))

    mh = pq.read_table(os.path.join(out, "minhash.parquet"))
    row = {c: mh.column(c)[0].as_py() for c in ("doc_id", "signature", "band_keys")}
    text = by_id[row["doc_id"]]
    # scalar spec path: per-shingle hash64 -> minhash -> band keys
    want_sig = K.minhash_signature(K.char_shingles(text), NUM_PERM)
    assert np.array_equal(np.array(row["signature"]).view(np.uint64), want_sig)
    want_bands = K.lsh_band_keys(want_sig)
    assert np.array_equal(np.array(row["band_keys"]).view(np.uint64), want_bands)

    sh = pq.read_table(os.path.join(out, "simhash.parquet"))
    sh_map = dict(zip(sh.column("doc_id").to_pylist(), sh.column("simhash").to_pylist()))
    some = sorted(sh_map)[:5]
    for d in some:
        assert sh_map[d] & ((1 << 64) - 1) == K.simhash64(by_id[d]) or (
            np.int64(np.uint64(K.simhash64(by_id[d]))) == sh_map[d]
        )

    # kgrams: unsigned storage (SQL min must be the kernel's uint64 min) and
    # window order; reproducing the winnowing selection over them yields the
    # kernel's fingerprint count
    kg = pq.read_table(os.path.join(out, "kgrams.parquet"))
    assert kg.schema.field("hash").type == "uint64"
    d0 = kg.column("doc_id")[0].as_py()
    mask = np.array(kg.column("doc_id")) == d0
    hs = np.array(kg.column("hash"))[mask].astype(np.uint64)
    poss = np.array(kg.column("pos"))[mask]
    assert list(poss) == list(range(len(poss)))  # window order preserved
    want = K.char_shingle_hashes(by_id[d0], FP_K)
    assert np.array_equal(hs, want)
    # python-side winnowing over the sidecar sequence == kernel output size
    if hs.size > 4:
        m = np.lib.stride_tricks.sliding_window_view(hs, 4).min(axis=1)
        n_fp = int(1 + (m[1:] != m[:-1]).sum())
    else:
        n_fp = 1 if hs.size else 0
    assert n_fp == len(K.rolling_fingerprints(by_id[d0]))


def test_sidecars_regeneration_guard():
    out = ensure_sidecars(SF_DIR)
    man = os.path.join(out, "_manifest.json")
    mtime = os.path.getmtime(os.path.join(out, "minhash.parquet"))
    assert ensure_sidecars(SF_DIR) == out
    assert os.path.getmtime(os.path.join(out, "minhash.parquet")) == mtime
    # a version/param drift forces regeneration
    with open(man) as f:
        d = json.load(f)
    d["format_version"] = -1
    with open(man, "w") as f:
        json.dump(d, f)
    ensure_sidecars(SF_DIR)
    with open(man) as f:
        assert json.load(f)["format_version"] != -1
