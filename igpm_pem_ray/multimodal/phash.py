"""Perceptual image hashing (pHash) + hamming near-dup grouping.

Classic DCT perceptual hash: grayscale -> area-average downsample to
32x32 -> 2-D DCT-II (two matmuls against a precomputed basis; no
scipy) -> keep the top-left 8x8 low-frequency block (minus DC) ->
threshold at the median -> 64-bit hash.  Perceptually similar images
(noise, small edits) land within a few hamming bits; unrelated images
are ~32 bits apart.

Near-dup grouping reuses the SimHash band trick from text/dedup: the
64-bit hash splits into 8 8-bit bands; any pair within hamming
distance 7 shares at least one exact band (pigeonhole), so candidate
generation is a band-key self-join with guaranteed recall for the
typical 4-10-bit pHash thresholds — the same scale shape as the text
near-dup pipelines, applied to the image corpus.

The DCT basis is built once per actor (__init__), decode + hash are
vectorized per batch; the payload column is dropped at the stage.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from igpm_pem_ray.multimodal.codec import decode_png

_SIZE = 32
_KEEP = 8


def _dct_basis(n: int) -> np.ndarray:
    k = np.arange(n)[:, None]
    i = np.arange(n)[None, :]
    basis = np.cos(np.pi * (2 * i + 1) * k / (2 * n))
    basis[0] *= 1.0 / np.sqrt(2.0)
    return basis * np.sqrt(2.0 / n)


def phash_image(rgb: np.ndarray, basis: np.ndarray | None = None) -> int:
    """64-bit perceptual hash of an (H, W, 3) uint8 array."""
    if basis is None:
        basis = _dct_basis(_SIZE)
    gray = rgb.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
    h, w = gray.shape
    # area-average resample to 32x32 (integer bucketing, deterministic)
    ys = (np.arange(h) * _SIZE) // h
    xs = (np.arange(w) * _SIZE) // w
    small = np.zeros((_SIZE, _SIZE))
    cnt = np.zeros((_SIZE, _SIZE))
    np.add.at(small, (ys[:, None].repeat(w, 1), xs[None, :].repeat(h, 0)),
              gray)
    np.add.at(cnt, (ys[:, None].repeat(w, 1), xs[None, :].repeat(h, 0)),
              1.0)
    small /= np.maximum(cnt, 1.0)
    coef = basis @ small @ basis.T
    block = coef[:_KEEP, :_KEEP].ravel()[1:]  # drop DC
    bits = block > np.median(block)
    out = 0
    for b in bits:
        out = (out << 1) | int(b)
    # 63 bits in positions 62..0 — no pad shift, so every bit
    # survives the int64 mask applied by PHasher.
    return out


class PHasher:
    """Actor-pool stage: (media_id, payload PNG) -> (media_id,
    phash int64); DCT basis built once per actor."""

    def __init__(self, *, strict: bool = False) -> None:
        self.basis = _dct_basis(_SIZE)
        self.strict = strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, hashes = [], []
        for mid, payload in zip(batch["media_id"].to_pylist(),
                                batch["payload"].to_pylist()):
            try:
                rgb = decode_png(payload)
            except Exception:
                if self.strict:
                    raise
                continue
            ids.append(mid)
            # 63-bit hash already fits int64; mask is a no-op guard
            hashes.append(phash_image(rgb, self.basis) & ((1 << 63) - 1))
        return pa.table({"media_id": pa.array(ids, pa.int64()),
                         "phash": pa.array(hashes, pa.int64())})


def phash_table(media_ds, *, concurrency=2, batch_size: int = 32):
    return media_ds.map_batches(PHasher, concurrency=concurrency,
                                batch_size=batch_size,
                                batch_format="pyarrow")


def phash_near_dup_pairs(media_ds, *, max_hamming: int = 6,
                         concurrency=2, batch_size: int = 32):
    """(id_a, id_b, hamming) candidate pairs within ``max_hamming``
    bits: 8 x 8-bit band keys -> band self-join -> exact popcount
    verify.  Pigeonhole guarantees full recall for max_hamming <= 7;
    beyond that the band filter may miss pairs (raise)."""
    if max_hamming > 7:
        raise ValueError("8-band pigeonhole only guarantees recall "
                         "for max_hamming <= 7")
    hashed = phash_table(media_ds, concurrency=concurrency,
                         batch_size=batch_size).materialize()

    def bands(b: pa.Table) -> pa.Table:
        h = b["phash"].to_numpy(zero_copy_only=False)
        mid = b["media_id"].to_numpy(zero_copy_only=False)
        outs = []
        for band in range(8):
            key = (h >> (band * 8)) & 0xFF
            outs.append(pa.table({
                "bkey": (key * 8 + band).astype(np.int64),
                "media_id": mid, "phash": h}))
        return pa.concat_tables(outs)

    banded = hashed.map_batches(bands, batch_format="pyarrow")
    j = banded.join(
        banded.map_batches(lambda b: pa.table(
            {"bkey2": b["bkey"], "media_id2": b["media_id"],
             "phash2": b["phash"]}), batch_format="pyarrow"),
        join_type="inner", num_partitions=4,
        on=("bkey",), right_on=("bkey2",))

    def verify(b: pa.Table) -> pa.Table:
        a = b["media_id"].to_numpy(zero_copy_only=False)
        bb = b["media_id2"].to_numpy(zero_copy_only=False)
        ha = b["phash"].to_numpy(zero_copy_only=False)
        hb = b["phash2"].to_numpy(zero_copy_only=False)
        keep = a < bb
        x = (ha[keep] ^ hb[keep]).astype(np.uint64)
        if len(x) == 0:
            return pa.table({"id_a": pa.array([], pa.int64()),
                             "id_b": pa.array([], pa.int64()),
                             "hamming": pa.array([], pa.int64())})
        from igpm_pem_ray.graph.distance import _POP8

        ham = _POP8[x.view(np.uint8).reshape(len(x), -1)] \
            .sum(axis=1, dtype=np.int64)
        ok = ham <= max_hamming
        return pa.table({"id_a": a[keep][ok], "id_b": bb[keep][ok],
                         "hamming": ham[ok]})

    return phash_dedupe_pairs(
        j.map_batches(verify, batch_format="pyarrow"))


def phash_dedupe_pairs(pairs_ds):
    """Distinct (id_a, id_b) pairs (a pair can match in 2+ bands)."""
    from ray.data.aggregate import Min

    return pairs_ds.groupby(["id_a", "id_b"]) \
        .aggregate(Min("hamming", alias_name="hamming"))
