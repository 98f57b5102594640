"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by actor-pool ``map_batches``
stages.

Codecs: ``codec="png"`` is a REAL pure-Python PNG decode (stdlib zlib +
full filter reconstruction, :mod:`.png` — 8-bit grayscale subset);
``codec="fake"`` parses the synthetic payload header written by
:func:`synth_media_table` (the zero-dependency stub); ``codec="real"``
(PIL/ffmpeg for arbitrary formats) raises a clearly-marked
``NotImplementedError`` — those libraries are not in this environment.
Everything around the kernel — the Arrow schema, small-batch sizing for
large payloads, actor signature, one-time codec init, output layout — is
shared by all three; swapping in PIL/ffmpeg later changes only
``_decode_one``.

Scale notes: binary payloads are large → callers should pass a SMALL
``batch_size`` (``suggested_batch_size``) so batch × concurrency fits the
worker heap; payloads stay in the object store between stages (zero-copy
Arrow binary), never driver-collected.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        pa.field("media_id", pa.int64()),
        pa.field("kind", pa.string()),  # image | audio | video
        pa.field("payload", pa.large_binary()),
        pa.field("meta_format", pa.string()),
        pa.field("meta_bytes", pa.int64()),
    ]
)

_MAGIC = b"FAKEMEDIA1"


def synth_media_table(
    n: int, seed: int = 5, kind: str = "image", fmt: str = "fake"
) -> pa.Table:
    """Deterministic synthetic payloads.

    ``fmt="fake"``: 10-byte magic + uint16 width/height + raw bytes
    (rng-seeded — stands in for opaque encoded media).

    ``fmt="png"``: REAL PNG-encoded grayscale images whose dimensions and
    pixels are CLOSED-FORM functions of ``media_id`` (so a SQL oracle can
    predict the decoded output without decoding):
    ``w = 8 + (id·7919) mod 56``, ``h = 8 + (id·104729) mod 56``,
    ``pixel[j] = (id·31 + j·17) mod 256`` in row-major order.

    ``fmt="wav"``: REAL WAV-encoded (RIFF PCM16 mono, 8 kHz) clips whose
    samples are likewise closed-form:
    ``n = 64 + (id·7919) mod 192``, ``s[j] = (id·31 + j·17) mod 257 − 128``."""
    ids = np.arange(n, dtype=np.int64)
    if fmt == "wav":
        from elasticsearch_assets_ray.stages.wav import wav_encode

        payloads = []
        for i in range(n):
            m = 64 + (i * 7919) % 192
            s = ((i * 31 + np.arange(m, dtype=np.int64) * 17) % 257) - 128
            payloads.append(wav_encode(s.astype(np.int16), sample_rate=8000))
        meta = "audio/wav"
    elif fmt == "png":
        from elasticsearch_assets_ray.stages.png import png_encode

        payloads = []
        for i in range(n):
            w = 8 + (i * 7919) % 56
            h = 8 + (i * 104729) % 56
            body = ((i * 31 + np.arange(w * h, dtype=np.int64) * 17) % 256).astype(
                np.uint8
            )
            payloads.append(png_encode(body.reshape(h, w)))
        meta = "image/png"
    elif fmt == "mjpng":
        # REAL video container: b"MJPN" + uint32 frame count + per frame
        # (uint32 length + a genuine PNG).  Frame content is closed-form
        # in (media_id, frame_idx): n_frames = 4 + (id*13) % 9,
        # w = 8 + (id*7919 + f*101) % 24, h = 8 + (id*104729 + f*59) % 24,
        # pixel[j] = (id*31 + f*7 + j*17) % 256 — so a SQL oracle predicts
        # every sampled frame's dimensions and pixel sum without decoding.
        import struct

        from elasticsearch_assets_ray.stages.png import png_encode

        payloads = []
        for i in range(n):
            nf = 4 + (i * 13) % 9
            parts = [b"MJPN", struct.pack("<I", nf)]
            for f in range(nf):
                w = 8 + (i * 7919 + f * 101) % 24
                h = 8 + (i * 104729 + f * 59) % 24
                body = (
                    (i * 31 + f * 7 + np.arange(w * h, dtype=np.int64) * 17) % 256
                ).astype(np.uint8)
                png = png_encode(body.reshape(h, w))
                parts.append(struct.pack("<I", len(png)))
                parts.append(png)
            payloads.append(b"".join(parts))
        meta = "video/mjpng"
    elif fmt == "fake":
        rng = np.random.default_rng(seed)
        w = rng.integers(8, 64, n).astype(np.uint16)
        h = rng.integers(8, 64, n).astype(np.uint16)
        payloads = []
        for i in range(n):
            body = rng.integers(0, 256, int(w[i]) * int(h[i]), dtype=np.uint8)
            payloads.append(_MAGIC + w[i].tobytes() + h[i].tobytes() + body.tobytes())
        meta = "fake/v1"
    else:
        raise ValueError(f"unknown fmt {fmt!r}")
    return pa.table(
        {
            "media_id": pa.array(ids),
            "kind": pa.array([kind] * n),
            "payload": pa.array(payloads, type=pa.large_binary()),
            "meta_format": pa.array([meta] * n),
            "meta_bytes": pa.array([len(p) for p in payloads], type=pa.int64()),
        }
    )


class MediaDecodeStage:
    """Actor-pool stage: decode payload → (width, height, n_pixels) +
    a feature vector (byte histogram, 16 bins — the stand-in for a model
    embedding).  Codec state initialised ONCE per actor in ``__init__``.

    Use: ``ds.map_batches(MediaDecodeStage, fn_constructor_kwargs=...,
    batch_size=MediaDecodeStage.suggested_batch_size, concurrency=(1, N),
    batch_format="pyarrow")``."""

    suggested_batch_size = 32  # large payloads → small batches

    def __init__(self, codec: str = "fake", drop_payload: bool = True):
        if codec == "real":
            raise NotImplementedError(
                "arbitrary-format decode needs PIL/ffmpeg, not present in "
                "this environment — use codec='png' (real pure-Python PNG) "
                "or codec='fake' (deterministic stub)"
            )
        if codec not in ("fake", "png"):
            raise ValueError(f"unknown codec {codec!r}")
        self.codec = codec
        if codec == "png":
            # one-time codec init per actor
            from elasticsearch_assets_ray.stages.png import png_decode

            self._png_decode = png_decode
        self.drop_payload = drop_payload
        # one-time 'model load': histogram bin edges
        self.bins = np.linspace(0, 256, 17)

    def _decode_one(self, payload: bytes) -> tuple[int, int, np.ndarray]:
        """The decode kernel: real PNG (inflate + unfilter) or the fake
        header stub."""
        if self.codec == "png":
            img = self._png_decode(payload)
            h, w = img.shape
            return w, h, img.reshape(-1)
        if not payload.startswith(_MAGIC):
            raise ValueError("bad magic: not a fake-media payload")
        w = int(np.frombuffer(payload[10:12], dtype=np.uint16)[0])
        h = int(np.frombuffer(payload[12:14], dtype=np.uint16)[0])
        body = np.frombuffer(payload, dtype=np.uint8, offset=14)
        return w, h, body

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"]
        n = batch.num_rows
        widths = np.zeros(n, dtype=np.int64)
        heights = np.zeros(n, dtype=np.int64)
        sums = np.zeros(n, dtype=np.int64)
        feats = np.zeros((n, 16), dtype=np.float64)
        for i in range(n):  # per-payload decode is inherently per-item
            w, h, body = self._decode_one(payloads[i].as_py())
            widths[i] = w
            heights[i] = h
            sums[i] = int(body.astype(np.int64).sum())
            hist, _ = np.histogram(body, bins=self.bins)
            feats[i] = hist / max(1, body.size)
        cols = {
            name: batch[name]
            for name in batch.column_names
            if not (self.drop_payload and name == "payload")
        }
        cols["width"] = pa.array(widths)
        cols["height"] = pa.array(heights)
        cols["n_pixels"] = pa.array(widths * heights)
        cols["pix_sum"] = pa.array(sums)
        cols["feature"] = pa.FixedSizeListArray.from_arrays(
            pa.array(feats.reshape(-1)), 16
        )
        return pa.table(cols)


class AudioFeatureStage:
    """Actor-pool stage: WAV decode (real RIFF PCM parser,
    :mod:`.wav`) → per-clip features (n_samples, sample_rate,
    duration_ms, exact sample sums, zero crossings).  Same shape as
    :class:`MediaDecodeStage`: codec bound once per actor in
    ``__init__``, per-payload decode in ``__call__`` (audio decode is
    inherently per-item; the feature math is vectorized per clip)."""

    suggested_batch_size = 64

    def __init__(self, codec: str = "wav", drop_payload: bool = True):
        if codec == "real":
            raise NotImplementedError(
                "arbitrary-format audio decode needs ffmpeg/soundfile, not "
                "present in this environment — use codec='wav' (real "
                "pure-Python RIFF PCM)"
            )
        if codec != "wav":
            raise ValueError(f"unknown codec {codec!r}")
        from elasticsearch_assets_ray.stages.wav import audio_features, wav_decode

        self._decode = wav_decode
        self._features = audio_features
        self.drop_payload = drop_payload

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"]
        n = batch.num_rows
        feats = {
            k: np.zeros(n, dtype=np.float64 if k == "duration_ms" else np.int64)
            for k in (
                "n_samples",
                "sample_rate",
                "duration_ms",
                "samp_sum",
                "samp_sqsum",
                "n_zero_cross",
            )
        }
        for i in range(n):
            samples, sr = self._decode(payloads[i].as_py())
            for k, v in self._features(samples, sr).items():
                feats[k][i] = v
        cols = {
            name: batch[name]
            for name in batch.column_names
            if not (self.drop_payload and name == "payload")
        }
        for k, v in feats.items():
            cols[k] = pa.array(v)
        return pa.table(cols)


class MediaResizeStage:
    """Image resize plumbing: decode (stub codec) → nearest-neighbour
    resample of the w×h byte grid to ``(out_w, out_h)`` (a REAL
    vectorized kernel — only the codec is fake) → re-encode.  Output rows
    keep the media schema so resize stages compose with decode/sample."""

    suggested_batch_size = 32

    def __init__(self, out_w: int = 16, out_h: int = 16, codec: str = "fake"):
        if codec == "real":
            raise NotImplementedError(
                "real image resize needs PIL, not present in this "
                "environment — use codec='fake'"
            )
        self.out_w = out_w
        self.out_h = out_h
        self._dec = MediaDecodeStage(codec=codec, drop_payload=False)

    def _resize_one(self, payload: bytes) -> bytes:
        w, h, body = self._dec._decode_one(payload)
        grid = body[: w * h].reshape(h, w)
        yi = (np.arange(self.out_h) * h // self.out_h).astype(np.int64)
        xi = (np.arange(self.out_w) * w // self.out_w).astype(np.int64)
        out = grid[yi][:, xi]
        return (
            _MAGIC
            + np.uint16(self.out_w).tobytes()
            + np.uint16(self.out_h).tobytes()
            + out.tobytes()
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = [self._resize_one(p.as_py()) for p in batch["payload"]]
        cols = {n: batch[n] for n in batch.column_names}
        cols["payload"] = pa.array(payloads, type=pa.large_binary())
        cols["meta_bytes"] = pa.array(
            [len(p) for p in payloads], type=pa.int64()
        )
        return pa.table(cols)


class FrameSampleStage:
    """Video analog: split a payload into ``n_frames`` even chunks and
    emit one row per sampled frame (every ``stride``-th) — the flat_map
    shape of frame extraction, with the real decode stubbed."""

    suggested_batch_size = 16

    def __init__(self, n_frames: int = 8, stride: int = 2):
        self.n_frames = n_frames
        self.stride = stride

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, frames, blobs = [], [], []
        for i in range(batch.num_rows):
            payload = batch["payload"][i].as_py()
            body = payload[14:]
            step = max(1, len(body) // self.n_frames)
            for f in range(0, self.n_frames, self.stride):
                ids.append(batch["media_id"][i].as_py())
                frames.append(f)
                blobs.append(body[f * step : (f + 1) * step])
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "frame": pa.array(frames, pa.int64()),
                "frame_bytes": pa.array(blobs, pa.large_binary()),
            }
        )


class VideoFrameSampleStage:
    """REAL video frame sampling: parses the MJPNG container (magic +
    frame count + length-prefixed PNGs), decodes every ``stride``-th
    frame with the pure-Python PNG codec (stages/png.py) and emits one
    row per sampled frame — the flat_map decode shape of a video
    pipeline with genuine bytes end to end.  Actor-pool stage: the codec
    module import / setup happens once per actor."""

    suggested_batch_size = 16

    def __init__(self, stride: int = 2, drop_payload: bool = True):
        import struct

        from elasticsearch_assets_ray.stages import png as png_mod

        if stride <= 0:
            raise ValueError("stride must be positive")
        self.stride = stride
        self.drop_payload = drop_payload
        self._struct = struct
        self._png = png_mod

    def __call__(self, batch: pa.Table) -> pa.Table:
        st = self._struct
        ids, frames, ws, hs, sums = [], [], [], [], []
        for i in range(batch.num_rows):
            payload = batch["payload"][i].as_py()
            if payload[:4] != b"MJPN":
                raise ValueError("not an MJPNG container")
            (nf,) = st.unpack_from("<I", payload, 4)
            off = 8
            mid = batch["media_id"][i].as_py()
            for f in range(nf):
                (ln,) = st.unpack_from("<I", payload, off)
                off += 4
                blob = payload[off : off + ln]
                off += ln
                if f % self.stride != 0:
                    continue
                img = self._png.png_decode(blob)
                ids.append(mid)
                frames.append(f)
                hs.append(img.shape[0])
                ws.append(img.shape[1])
                sums.append(int(img.astype(np.int64).sum()))
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "frame": pa.array(frames, pa.int64()),
                "width": pa.array(ws, pa.int64()),
                "height": pa.array(hs, pa.int64()),
                "pix_sum": pa.array(sums, pa.int64()),
            }
        )
