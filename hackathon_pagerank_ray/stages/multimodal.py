"""Multimodal (image/audio/video) column plumbing — STUBBED decode.

Task brief: treat binary media as opaque ``binary`` columns with typed
metadata, run decode / feature-extract / resize / frame-sample as
actor-pool ``map_batches`` stages.  The image/audio codecs are NOT in this
container, so the codec call itself is stubbed — either a clearly marked
``NotImplementedError`` (``decoder="real"``) or a deterministic fake
(``decoder="fake"``, default) that derives pseudo pixels/samples from a
seeded hash of the payload — while everything Ray-side (schema, actor
signature, batch sizing, output layout) is real and tested.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

MEDIA_SCHEMA = pa.schema([
    pa.field("media_id", pa.int64()),
    pa.field("payload", pa.binary()),
    pa.field("mime", pa.string()),
    pa.field("width", pa.int32()),
    pa.field("height", pa.int32()),
    pa.field("duration_ms", pa.int32()),
])


def _fake_pixels(payload: bytes, h: int, w: int) -> np.ndarray:
    seed = int.from_bytes((payload or b"\0")[:8].ljust(8, b"\0"), "little")
    rng = np.random.RandomState(seed % (2 ** 32))
    return rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)


class DecodeMedia:
    """payload → decoded array (fake) or NotImplementedError (real).

    Small ``batch_size`` is mandatory here — rows are megabyte-scale, so
    batch × concurrency must fit worker heaps (task brief memory rule).
    """

    def __init__(self, decoder: str = "fake", target: tuple[int, int] = (32, 32)):
        if decoder not in ("fake", "real"):
            raise ValueError(decoder)
        self.decoder = decoder
        self.th, self.tw = target

    def _decode(self, payload: bytes, mime: str, h: int, w: int) -> np.ndarray:
        if self.decoder == "real":
            # STUB: no codec libraries in this container (PIL/ffmpeg absent).
            raise NotImplementedError(
                "real media decode requires codec libs not present here; "
                "swap this call for PIL/av in a full environment")
        return _fake_pixels(payload, max(h, 1), max(w, 1))

    def _resize(self, img: np.ndarray) -> np.ndarray:
        # nearest-neighbour resize with pure numpy (no codec deps)
        ys = (np.arange(self.th) * img.shape[0] // self.th)
        xs = (np.arange(self.tw) * img.shape[1] // self.tw)
        return img[ys][:, xs]

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        feats, thumbs = [], []
        for payload, mime, h, w in zip(batch["payload"], batch["mime"],
                                       batch["height"], batch["width"]):
            img = self._resize(self._decode(payload, mime, int(h), int(w)))
            thumbs.append(img.tobytes())
            feats.append(img.astype(np.float32).mean(axis=(0, 1)).tolist())
        out = batch[["media_id", "mime"]].copy()
        out["thumb"] = thumbs
        out["mean_rgb"] = feats
        return out


def decode_and_featurize(media_ds, decoder: str = "fake",
                         target=(32, 32), batch_size: int = 16,
                         concurrency=2):
    """Actor-pool decode/resize/feature stage over a media table."""
    return media_ds.map_batches(
        DecodeMedia,
        fn_constructor_kwargs=dict(decoder=decoder, target=target),
        batch_format="pandas", batch_size=batch_size,
        concurrency=concurrency)


def frame_sample(media_ds, every_ms: int = 1000, batch_size: int = 16,
                 concurrency=2):
    """Video frame-sampling plumbing: one output row per sampled timestamp
    (decode itself uses the same stub)."""
    def _sample(batch: pd.DataFrame) -> pd.DataFrame:
        ids, ts = [], []
        for mid, dur in zip(batch["media_id"], batch["duration_ms"]):
            n = max(1, int(dur) // every_ms)
            ids.extend([mid] * n)
            ts.extend(range(0, n * every_ms, every_ms))
        return pd.DataFrame({"media_id": ids,
                             "frame_ms": np.asarray(ts, dtype=np.int64)})

    return media_ds.map_batches(_sample, batch_format="pandas",
                                batch_size=batch_size,
                                concurrency=concurrency)


def synthetic_media_table(n: int = 32, seed: int = 3) -> pa.Table:
    """Deterministic fixture media table (no external data)."""
    rng = np.random.RandomState(seed)
    payloads = [rng.bytes(256) for _ in range(n)]
    return pa.Table.from_arrays(
        [pa.array(np.arange(n, dtype=np.int64)),
         pa.array(payloads, pa.binary()),
         pa.array(["image/fake"] * n),
         pa.array(rng.randint(16, 64, n).astype(np.int32)),
         pa.array(rng.randint(16, 64, n).astype(np.int32)),
         pa.array(rng.randint(1000, 9000, n).astype(np.int32))],
        schema=MEDIA_SCHEMA)
