"""Audio fingerprinting — spectral-peak frame hashes for audio
near-duplicate detection: the audio sibling of the image pHash
(multimodal/phash.py), simplified from the published constellation /
landmark family (Wang, ISMIR 2003 "An industrial-strength audio
search algorithm") to per-frame band-peak packing.

Per clip: frame the PCM signal (FRAME samples, HOP step, Hann
window), magnitude rFFT per frame — ONE vectorized matrix op per
clip, no Python per frame — then the peak bin within each of BANDS
geometric frequency bands, packed into a single int64 frame hash.
Peak LOCATIONS are invariant to gain, so re-encoded / volume-scaled
copies fingerprint identically; time-cropped copies share the
overlapping frames' hashes.

Near-dup detection is then exactly a neighbor-set Jaccard over the
(clip, distinct frame hash) adjacency, so the candidate join reuses
``graph/mirror.neighbor_jaccard_pairs`` (inverted-index self-join on
the hash, with the hub-hash df-cut available for silence/DC-heavy
corpora).  Reference tie-in: IGPM-PEM has no media operators; this
completes the repo's dedup family (exact / MinHash / SimHash /
embedding / image pHash / audio) on the multimodal axis.
"""

from __future__ import annotations

import logging

import numpy as np
import pyarrow as pa

from igpm_pem_ray.multimodal import codec

_LOG = logging.getLogger(__name__)

FRAME = 1024
HOP = 512
BANDS = 4


def _hann(n: int) -> np.ndarray:
    return 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(n) / n)


MIN_REL = 0.1  # band peak must reach 10% of the frame max to count


def frame_hashes(x: np.ndarray, *, frame: int = FRAME,
                 hop: int = HOP, bands: int = BANDS,
                 min_rel: float = MIN_REL) -> np.ndarray:
    """Distinct int64 spectral-peak hashes of one PCM clip.

    Each full frame contributes one hash: the argmax FFT bin inside
    each of ``bands`` geometric bands, packed 10 bits per band
    (frame <= 2048 keeps every bin index under 1024).  A band with no
    real component would place its argmax on quantization noise — an
    unstable, gain-SENSITIVE bit — so a band peak below ``min_rel`` of
    the frame's max magnitude encodes as 0 ("no peak"; bin 0, the DC
    bin, is outside every band so the code is unambiguous).  The
    RELATIVE threshold keeps the hash gain-invariant.  Deterministic,
    vectorized (stride-tricks framing + one rFFT).
    """
    x = np.asarray(x, dtype=np.float64)
    if len(x) < frame:
        return np.empty(0, dtype=np.int64)
    n_frames = 1 + (len(x) - frame) // hop
    stride = x.strides[0]
    frames = np.lib.stride_tricks.as_strided(
        x, shape=(n_frames, frame), strides=(hop * stride, stride))
    mag = np.abs(np.fft.rfft(frames * _hann(frame), axis=1))
    n_bins = mag.shape[1]
    # geometric band edges over [1, n_bins): low bands narrow (where
    # speech/music energy lives), high bands wide
    edges = np.unique(np.geomspace(1, n_bins, bands + 1).astype(np.int64))
    while len(edges) < bands + 1:  # tiny frames: pad with the top edge
        edges = np.r_[edges, edges[-1]]
    fmax = mag[:, 1:].max(axis=1)
    h = np.zeros(n_frames, dtype=np.int64)
    for b in range(bands):
        lo, hi = int(edges[b]), int(max(edges[b + 1], edges[b] + 1))
        hi = min(hi, n_bins)
        peak = np.argmax(mag[:, lo:hi], axis=1) + lo
        strong = mag[np.arange(n_frames), peak] >= min_rel * fmax
        h = (h << 10) | np.where(strong, peak, 0).astype(np.int64)
    return np.unique(h)


class AudioFingerprinter:
    """Actor-pool stage: (media_id, payload WAV) -> one row per
    (media_id, fhash) distinct frame hash.  Undecodable clips are
    skipped with a logged count (never silently)."""

    def __init__(self, *, strict: bool = False) -> None:
        self.strict = strict
        self.skipped = 0

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, hs = [], []
        batch_skipped = 0
        for mid, p in zip(batch["media_id"].to_pylist(),
                          batch["payload"].to_pylist()):
            try:
                x, _rate = codec.decode_wav(p or b"")
                fh = frame_hashes(x.mean(axis=1))  # mono mix
            except Exception:
                if self.strict:
                    raise
                batch_skipped += 1
                continue
            ids.extend([mid] * len(fh))
            hs.append(fh)
        if batch_skipped:
            self.skipped += batch_skipped
            _LOG.warning("AudioFingerprinter: skipped %d undecodable "
                         "clip(s) in a batch of %d (cumulative %d)",
                         batch_skipped, batch.num_rows, self.skipped)
        out = np.concatenate(hs) if hs else np.empty(0, np.int64)
        return pa.table({"media_id": pa.array(ids, pa.int64()),
                         "fhash": pa.array(out, pa.int64())})


def fingerprint_table(media_ds, *, concurrency=2, batch_size: int = 32):
    return media_ds.map_batches(AudioFingerprinter, concurrency=concurrency,
                                batch_size=batch_size,
                                batch_format="pyarrow")


def audio_near_dup_pairs(media_ds, *, min_jaccard_e6: int = 500_000,
                         max_hash_df: int | None = None,
                         concurrency=2, batch_size: int = 32):
    """Clip pairs whose distinct frame-hash sets have Jaccard >= the
    threshold — gain-scaled and re-encoded copies score 1e6, crops
    score by overlap fraction.  One fingerprint pass (actor pool) +
    the mirror kernel's inverted-index plan; ``max_hash_df`` cuts
    ubiquitous hashes (silence frames) before the self-join."""
    from igpm_pem_ray.graph.mirror import neighbor_jaccard_pairs

    fp = fingerprint_table(media_ds, concurrency=concurrency,
                           batch_size=batch_size) \
        .rename_columns({"media_id": "v", "fhash": "n"})
    return neighbor_jaccard_pairs(fp, min_jaccard_e6=min_jaccard_e6,
                                  max_neighbor_indeg=max_hash_df)
