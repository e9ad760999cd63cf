"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

A 100 TB training pipeline carries media as ``binary`` columns with a
sidecar metadata struct; decode / feature-extract / resize / frame-sample
are ACTOR-POOL ``map_batches`` stages (codec state loaded once per actor,
small batches because payloads are MBs, ``batch_format="pyarrow"`` so the
bytes never round-trip through pandas object dtype).

The decode kernels themselves are STUBBED here (this container ships no
image/audio codecs — PIL/cv2/torchaudio are unavailable): ``DecodeImage``
raises ``NotImplementedError`` unless constructed with
``fake_decoder=True``, in which case a deterministic fake (seeded from the
payload hash) produces stable "pixels"/features so the Ray-side plumbing
— schema, batch sizing, actor signature, output layout — is fully real
and tested.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("kind", pa.string()),            # image | audio | video
    ("payload", pa.large_binary()),   # opaque encoded bytes
    ("mime", pa.string()),
    ("width", pa.int32()),            # -1 when unknown / not applicable
    ("height", pa.int32()),
    ("duration_ms", pa.int32()),
])

#: Recommended map_batches kwargs for MB-scale payload stages: small
#: batches so batch_bytes × concurrency fits the worker heap.
MEDIA_BATCH_KWARGS = dict(batch_format="pyarrow", batch_size=32, num_cpus=1)


def synth_media_table(n: int = 64, seed: int = 42) -> pa.Table:
    """Deterministic fake media table (payload = seeded random bytes)."""
    rng = np.random.default_rng(seed)
    kinds = np.array(["image", "audio", "video"])[rng.integers(0, 3, n)]
    payloads = [rng.integers(0, 256, int(ln), dtype=np.uint8).tobytes()
                for ln in rng.integers(256, 4096, n)]
    return pa.table({
        "media_id": pa.array(np.arange(n), pa.int64()),
        "kind": pa.array(kinds.tolist(), pa.string()),
        "payload": pa.array(payloads, pa.large_binary()),
        "mime": pa.array([f"{k}/x-fake" for k in kinds], pa.string()),
        "width": pa.array(rng.integers(16, 512, n, dtype=np.int32)),
        "height": pa.array(rng.integers(16, 512, n, dtype=np.int32)),
        "duration_ms": pa.array(
            np.where(kinds == "image", -1,
                     rng.integers(1000, 60000, n)).astype(np.int32)),
    })


def _payload_seed(payload: bytes) -> int:
    return int(pd.util.hash_array(np.array([payload], dtype=object))[0])


class DecodeImage:
    """Actor-pool stage: payload → fixed-size feature vector.

    Real decode is NOT implemented in this container (no codec libraries);
    construct with ``fake_decoder=True`` for the deterministic stand-in.
    The actor signature, batch handling, and output schema are the real
    contract a codec-backed implementation drops into.
    """

    def __init__(self, feature_dim: int = 16, fake_decoder: bool = False):
        self.feature_dim = feature_dim
        self.fake = fake_decoder
        # real impl: import the codec ONCE here (per actor), e.g. libjpeg
        # bindings; compiled kernels, colorspace LUTs, etc.

    def _decode_one(self, payload: bytes) -> np.ndarray:
        if not self.fake:
            raise NotImplementedError(
                "image decode requires a codec library not present in this "
                "container; construct DecodeImage(fake_decoder=True) for the "
                "deterministic stand-in")
        rng = np.random.default_rng(_payload_seed(payload) % (2 ** 63))
        return rng.random(self.feature_dim, dtype=np.float64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        feats = np.stack([self._decode_one(p) for p in payloads])
        return pa.table({
            "media_id": batch["media_id"],
            "kind": batch["kind"],
            "features": pa.array(list(feats),
                                 pa.list_(pa.float64(), self.feature_dim)),
        })


class FrameSample:
    """Actor-pool stage: video payload → n_frames rows of frame features.

    Flat-map shaped (one input row → n output rows); the fake produces
    deterministic per-frame seeds. Real impl: demux + decode keyframes.
    """

    def __init__(self, n_frames: int = 4, feature_dim: int = 8,
                 fake_decoder: bool = False):
        self.n_frames = n_frames
        self.dim = feature_dim
        self.fake = fake_decoder

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.fake:
            raise NotImplementedError(
                "video demux requires codec libraries not in this container")
        ids, kinds, feats, frame_ix = [], [], [], []
        for mid, kind, payload in zip(batch["media_id"].to_pylist(),
                                      batch["kind"].to_pylist(),
                                      batch["payload"].to_pylist()):
            if kind != "video":
                continue
            base = _payload_seed(payload) % (2 ** 62)
            for f in range(self.n_frames):
                rng = np.random.default_rng(base + f)
                ids.append(mid)
                kinds.append(kind)
                frame_ix.append(f)
                feats.append(rng.random(self.dim, dtype=np.float64))
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "frame_idx": pa.array(frame_ix, pa.int32()),
            "features": pa.array(feats, pa.list_(pa.float64(), self.dim)),
        })
