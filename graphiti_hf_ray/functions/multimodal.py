"""Multimodal column plumbing (training-data ops): image/audio/video as
opaque ``binary`` columns with typed metadata.

The decode libraries (PIL/ffmpeg/torchaudio) are NOT in this container, so
the decode kernels are STUBS — ``DecodeImage`` raises ``NotImplementedError``
unless given the deterministic fake — while everything Ray-side is real and
tested: the schema, the actor-pool stage shape (model/codec loaded once per
actor in ``__init__``), small-batch sizing for wide binary rows, and the
feature-table output layout.

Scale note (SURVEY.md memory rules): binary payloads are MBs/row — stages
here use ``batch_size=32`` and rely on dynamic block splitting; the payload
column is dropped as soon as features are extracted (select_columns), the
same discipline as dropping ``html`` after text extraction.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

import ray

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.string()),
        ("payload", pa.binary()),
        ("mime", pa.string()),
        ("meta", pa.string()),  # JSON: {width,height,duration_s,...}
    ]
)

FEATURE_DIM = 64


def fake_decode_features(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic fake 'decoder': md5-seeded feature vector. Stands in
    for a real CNN/audio embedding so the pipeline plumbing is testable."""
    h = hashlib.md5(payload).digest()
    out = np.empty(dim, np.float32)
    for i in range(dim):
        b = hashlib.md5(h + i.to_bytes(2, "little")).digest()
        out[i] = (int.from_bytes(b[:4], "little") / 2**31) - 1.0
    n = float(np.linalg.norm(out))
    return out / n if n else out


class DecodeImage:
    """Actor-pool stage: binary payload → feature vector + payload hash.

    ``backend='fake'`` uses the deterministic fake (tests/benches);
    ``backend='pil'`` is the real path, gated: raises NotImplementedError
    here because PIL is not installed (drop-in at deploy time)."""

    def __init__(self, backend: str = "fake", dim: int = FEATURE_DIM):
        self.dim = dim
        if backend == "pil":
            try:
                from PIL import Image  # noqa: F401

                self._decode = self._pil_decode
            except ImportError as e:
                raise NotImplementedError(
                    "real image decode requires PIL (not in this container); use backend='fake'"
                ) from e
        else:
            self._decode = lambda b: fake_decode_features(b, self.dim)

    def _pil_decode(self, payload: bytes) -> np.ndarray:  # pragma: no cover
        raise NotImplementedError("resize/normalize/embed pipeline — deploy-time")

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        feats = np.stack([self._decode(b) for b in payloads]) if payloads else np.zeros((0, self.dim), np.float32)
        digests = [hashlib.md5(b).hexdigest() for b in payloads]
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "mime": batch.column("mime"),
                "payload_md5": pa.array(digests, pa.string()),
                "n_bytes": pa.array([len(b) for b in payloads], pa.int64()),
                "features": pa.FixedSizeListArray.from_arrays(
                    pa.array(feats.ravel(), pa.float32()), self.dim
                ),
            }
        )


def extract_media_features(media: "ray.data.Dataset", backend: str = "fake", concurrency=(1, 4)) -> "ray.data.Dataset":
    """payload-heavy stage: small batches, actor pool, payload dropped in
    the output (features + hash only leave the stage)."""
    return media.map_batches(
        DecodeImage,
        batch_format="pyarrow",
        batch_size=32,  # wide binary rows: keep batch × concurrency in heap
        concurrency=concurrency,
        fn_constructor_args=(backend,),
    )


def frame_sample_stub(video_payload: bytes, every_n: int = 30) -> list[bytes]:
    """Video frame sampling STUB (no ffmpeg in container): deterministic
    byte-window 'frames' so downstream plumbing is exercisable."""
    window = 1024
    return [video_payload[i : i + window] for i in range(0, max(1, len(video_payload) - window), window * every_n)]


class SampleFrames:
    """Actor-pool EXPLODE stage: one video row → N frame rows
    (media_id, frame_idx, payload, mime). The row-multiplying shape is the
    real contract a video pipeline needs (downstream ``DecodeImage``
    consumes the frame rows); the codec itself is gated —
    ``backend='ffmpeg'`` raises here (no ffmpeg in this container),
    ``'fake'`` uses the deterministic byte-window sampler.

    Memory shape: input batches stay small (wide binary rows) and the
    output payload per frame is bounded by the sampler window, so the
    explosion factor — not the batch size — is the knob that matters."""

    def __init__(self, backend: str = "fake", every_n: int = 30):
        self.every_n = every_n
        if backend == "ffmpeg":
            raise NotImplementedError(
                "real frame sampling requires ffmpeg (not in this container); use backend='fake'"
            )
        self._sample = frame_sample_stub

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, frames, idxs = [], [], []
        for mid, payload in zip(batch.column("media_id").to_pylist(), batch.column("payload").to_pylist()):
            for i, fr in enumerate(self._sample(payload, self.every_n)):
                ids.append(mid)
                idxs.append(i)
                frames.append(fr)
        return pa.table(
            {
                "media_id": pa.array(ids, pa.string()),
                "frame_idx": pa.array(idxs, pa.int32()),
                "payload": pa.array(frames, pa.binary()),
                "mime": pa.array(["image/x-frame"] * len(ids), pa.string()),
                "meta": pa.array(["{}"] * len(ids), pa.string()),
            }
        )


def sample_video_frames(
    media: "ray.data.Dataset", backend: str = "fake", every_n: int = 30, concurrency=(1, 4)
) -> "ray.data.Dataset":
    """Video rows → frame rows (then feed ``extract_media_features``)."""
    return media.map_batches(
        SampleFrames,
        batch_format="pyarrow",
        batch_size=8,  # video payloads are the widest rows in the engine
        concurrency=concurrency,
        fn_constructor_args=(backend, every_n),
    )


class DecodeAudio:
    """Actor-pool audio feature stage. ``backend='torchaudio'`` is gated
    (no audio libs in this container); ``'fake'`` computes REAL
    deterministic windowed byte-energy features — mean absolute level per
    ``n_windows`` equal byte slices, L2-normalized — so output shape,
    dtype and layout match what a real log-mel frontend would emit."""

    def __init__(self, backend: str = "fake", n_windows: int = 16):
        self.n_windows = n_windows
        if backend == "torchaudio":
            raise NotImplementedError(
                "real audio decode requires torchaudio/ffmpeg (not in this container); use backend='fake'"
            )

    def __call__(self, batch: pa.Table) -> pa.Table:
        # normalize null payloads once: the md5/len comprehensions below
        # must not see None (a single null binary row would crash the batch)
        payloads = [b or b"" for b in batch.column("payload").to_pylist()]
        feats = np.zeros((len(payloads), self.n_windows), np.float32)
        for r, b in enumerate(payloads):
            if not b:
                continue
            arr = np.frombuffer(b, np.uint8).astype(np.float32) - 128.0
            for w, chunk in enumerate(np.array_split(arr, self.n_windows)):
                feats[r, w] = np.abs(chunk).mean() if chunk.size else 0.0
            n = float(np.linalg.norm(feats[r]))
            if n:
                feats[r] /= n
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "payload_md5": pa.array([hashlib.md5(b).hexdigest() for b in payloads], pa.string()),
                "n_bytes": pa.array([len(b) for b in payloads], pa.int64()),
                "audio_features": pa.FixedSizeListArray.from_arrays(
                    pa.array(feats.ravel(), pa.float32()), self.n_windows
                ),
            }
        )
