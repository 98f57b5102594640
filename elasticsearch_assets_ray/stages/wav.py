"""Pure-Python WAV (RIFF PCM) codec — real container parsing with zero
dependencies beyond the stdlib, mirroring the PNG upgrade in
:mod:`.png`: the engine-side plumbing (actor pools, batch sizing, Arrow
schemas) is exercised with genuinely encoded bytes, not a magic-header
stub.

The decoder is a hand-rolled RIFF chunk walker (validates the
RIFF/WAVE magics, iterates `fmt `/`data` chunks with the odd-size pad
rule, checks PCM/mono/16-bit) so the parsing logic itself is under
test; :func:`wav_encode` uses the stdlib :mod:`wave` writer, and the
test suite round-trips both directions against stdlib :mod:`wave` as an
independent reference.

Subset: uncompressed PCM (format tag 1), mono, 16-bit little-endian —
the canonical ML-pipeline audio interchange shape.
"""

from __future__ import annotations

import io
import struct
import wave as _stdlib_wave

import numpy as np


def wav_encode(samples: np.ndarray, sample_rate: int = 8000) -> bytes:
    """int16 mono PCM samples → WAV container bytes."""
    buf = io.BytesIO()
    with _stdlib_wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(np.ascontiguousarray(samples, dtype="<i2").tobytes())
    return buf.getvalue()


def wav_decode(payload: bytes) -> tuple[np.ndarray, int]:
    """WAV container bytes → (int16 samples as int64 ndarray, sample_rate).

    Hand-rolled RIFF walk: `RIFF<size>WAVE` header, then chunks
    `<fourcc><uint32 size><body>` with a pad byte after odd-sized bodies.
    Requires one `fmt ` chunk (PCM, mono, 16-bit) before the `data`
    chunk; trailing chunks (LIST, cue, …) are skipped, not errors."""
    if len(payload) < 12 or payload[0:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    riff_size = struct.unpack_from("<I", payload, 4)[0]
    if riff_size + 8 > len(payload):
        raise ValueError("truncated RIFF payload")
    pos, end = 12, 8 + riff_size
    fmt = None
    data = None
    while pos + 8 <= end:
        fourcc = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body_start = pos + 8
        if body_start + size > end:
            raise ValueError(f"chunk {fourcc!r} overruns the RIFF payload")
        if fourcc == b"fmt ":
            if size < 16:
                raise ValueError("fmt chunk too short")
            tag, channels, rate, _byte_rate, block_align, bits = struct.unpack_from(
                "<HHIIHH", payload, body_start
            )
            if tag != 1:
                raise ValueError(f"unsupported WAV format tag {tag} (PCM only)")
            if channels != 1 or bits != 16 or block_align != 2:
                raise ValueError(
                    f"unsupported layout (channels={channels}, bits={bits}); "
                    "mono 16-bit PCM only"
                )
            fmt = rate
        elif fourcc == b"data":
            if fmt is None:
                raise ValueError("data chunk before fmt chunk")
            data = payload[body_start : body_start + size]
        pos = body_start + size + (size & 1)  # odd chunks carry a pad byte
    if fmt is None or data is None:
        raise ValueError("missing fmt or data chunk")
    if len(data) % 2:
        raise ValueError("data chunk is not whole 16-bit frames")
    return np.frombuffer(data, dtype="<i2").astype(np.int64), int(fmt)


def audio_features(samples: np.ndarray, sample_rate: int) -> dict:
    """Deterministic per-clip features (vectorized numpy): exact integer
    sums so a SQL oracle can predict them closed-form, plus duration."""
    n = int(samples.size)
    s = samples.astype(np.int64)
    return {
        "n_samples": n,
        "sample_rate": int(sample_rate),
        "duration_ms": n * 1000.0 / sample_rate if sample_rate else 0.0,
        "samp_sum": int(s.sum()),
        "samp_sqsum": int((s * s).sum()),
        # strict sign-change crossings (zero samples break the streak)
        "n_zero_cross": int(np.count_nonzero(s[1:] * s[:-1] < 0)),
    }
