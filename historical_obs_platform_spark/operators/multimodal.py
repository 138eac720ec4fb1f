"""Multimodal column plumbing — image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched ``mapInPandas``
operators.

The pattern for a 100 TB multimodal corpus:

- media bytes live in a ``binary`` column (or a pointer column to an
  object store) next to a typed metadata struct (mime, width, height,
  duration_ms, sample_rate, ...);
- decode / feature-extract / resize / frame-sample run as
  ``mapInPandas`` stages: Arrow ships the binary batches to Python
  once, the worker processes a whole batch, and the output schema is
  declared up front so Catalyst can plan around the stage;
- partitioning is by content id — media rows never shuffle for the
  decode itself (map-only), only for downstream joins/groupings.

The actual codecs (PIL / libav / ffmpeg) are NOT in this container, so
``decode_image`` raises ``NotImplementedError`` unless a decoder is
injected; ``FakeDecoder`` is the deterministic stand-in used by tests
— the Spark-side plumbing (schema, batching, UDF signatures) is real
and tested.
"""

from __future__ import annotations

import hashlib
import zlib
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("content", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = (
    "media_id long, n_bytes int, crc32 long, sha1 string, sha256 string, "
    "width int, height int, feature array<float>"
)


class FakeDecoder:
    """Deterministic stand-in for an image decoder: 'decodes' bytes to
    a fixed-length feature vector derived from content hashes. Replace
    with a real codec-backed decoder in production."""

    feature_dim = 8

    def decode_batch(self, contents: pd.Series) -> pd.DataFrame:
        feats, widths, heights = [], [], []
        for raw in contents:
            if raw is None:
                feats.append(None)
                widths.append(None)
                heights.append(None)
                continue
            digest = hashlib.sha256(bytes(raw)).digest()
            feats.append(
                [b / 255.0 for b in digest[: self.feature_dim]]
            )
            widths.append(int.from_bytes(digest[8:10], "big") % 4096)
            heights.append(int.from_bytes(digest[10:12], "big") % 4096)
        return pd.DataFrame(
            {"feature": feats, "width": widths, "height": heights}
        )


class PpmBmpDecoder:
    """Real (pure-Python) image decoder for the two headerful
    uncompressed formats that need no codec library: binary PPM (P6)
    and 24-bit uncompressed BMP. It exercises the SAME injectable
    seam a PIL/libav decoder would use in production — proving the
    plumbing (batch signature, None handling, schema) end-to-end on
    genuinely decoded pixels, not the hash fake.

    Feature vector (8 floats, all in [0, 1]):
    [mean_R, mean_G, mean_B, std_luma, min_px, max_px,
     width/4096, height/4096] — channel statistics over the decoded
    pixel array (luma = Rec.601 0.299/0.587/0.114).

    Undecodable content (unknown magic, truncated pixel data,
    unsupported BMP bpp/compression) yields None fields, matching the
    FakeDecoder contract for null content.
    """

    feature_dim = 8

    @staticmethod
    def _decode_one(raw: bytes):
        import numpy as np

        if raw[:2] == b"P6":
            # header: magic, width, height, maxval — whitespace
            # separated, '#' comments allowed between tokens
            tokens, i = [], 2
            while len(tokens) < 3 and i < len(raw):
                c = raw[i : i + 1]
                if c == b"#":
                    while i < len(raw) and raw[i : i + 1] != b"\n":
                        i += 1
                elif c.isspace():
                    i += 1
                else:
                    j = i
                    while j < len(raw) and not raw[j : j + 1].isspace():
                        j += 1
                    tokens.append(raw[i:j])
                    i = j
            if len(tokens) < 3:
                return None
            w, h, maxval = (int(t) for t in tokens)
            if maxval > 255 or w <= 0 or h <= 0:
                return None
            # exactly ONE whitespace byte separates maxval from the
            # pixel stream (netpbm spec). A non-whitespace byte there
            # (truncated header) or a CRLF pair (non-conforming
            # writer) would shift the pixel data and silently skew
            # channel statistics — degrade to undecodable instead.
            sep = raw[i : i + 1]
            if not sep.isspace():
                return None
            if sep == b"\r" and raw[i + 1 : i + 2] == b"\n":
                return None
            i += 1
            px = raw[i : i + w * h * 3]
            if len(px) < w * h * 3:
                return None
            arr = np.frombuffer(px, dtype=np.uint8).reshape(h, w, 3)
            return w, h, arr
        if raw[:2] == b"BM":
            if len(raw) < 54:
                return None
            off = int.from_bytes(raw[10:14], "little")
            w = int.from_bytes(raw[18:22], "little", signed=True)
            h = int.from_bytes(raw[22:26], "little", signed=True)
            bpp = int.from_bytes(raw[28:30], "little")
            comp = int.from_bytes(raw[30:34], "little")
            if bpp != 24 or comp != 0 or w <= 0 or h == 0:
                return None
            flipped = h > 0  # positive height = bottom-up rows
            h = abs(h)
            stride = (w * 3 + 3) & ~3  # rows pad to 4 bytes
            if len(raw) < off + stride * h:
                return None
            rows = np.frombuffer(
                raw[off : off + stride * h], dtype=np.uint8
            ).reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
            if flipped:
                rows = rows[::-1]
            return w, h, rows[:, :, ::-1]  # BGR -> RGB
        return None

    @staticmethod
    def channel_features(w: int, h: int, arr) -> list:
        """The 8-float feature vector over a decoded pixel array —
        one definition shared by decode_batch and every composed
        kernel (chain_media_curation), so the Rec.601 order of
        operations can never fork between consumers."""
        import numpy as np

        a = arr.astype(np.float64)
        luma = (
            0.299 * a[:, :, 0] + 0.587 * a[:, :, 1] + 0.114 * a[:, :, 2]
        )
        return [
            float(a[:, :, 0].mean() / 255.0),
            float(a[:, :, 1].mean() / 255.0),
            float(a[:, :, 2].mean() / 255.0),
            float(luma.std() / 255.0),
            float(a.min() / 255.0),
            float(a.max() / 255.0),
            w / 4096.0,
            h / 4096.0,
        ]

    def decode_batch(self, contents: pd.Series) -> pd.DataFrame:
        feats, widths, heights = [], [], []
        for raw in contents:
            try:
                decoded = (
                    self._decode_one(bytes(raw))
                    if raw is not None
                    else None
                )
            except Exception:
                # a corrupt header (non-numeric PPM token, negative
                # reshape, ...) must degrade to the documented None
                # fields, not kill the executor task
                decoded = None
            if decoded is None:
                feats.append(None)
                widths.append(None)
                heights.append(None)
                continue
            w, h, arr = decoded
            feats.append(self.channel_features(w, h, arr))
            widths.append(w)
            heights.append(h)
        return pd.DataFrame(
            {"feature": feats, "width": widths, "height": heights}
        )


class WavPcmDecoder:
    """Real (pure-Python) audio decoder for canonical RIFF/WAVE
    containers holding 16-bit mono PCM — the audio analog of
    ``PpmBmpDecoder``: no codec library needed, but a genuine
    chunk-walking container parse (RIFF magic, WAVE form type,
    ``fmt `` format struct, word-aligned chunk advance, ``data``
    payload), so the injectable decode seam is exercised on real
    bytes, not a hash fake.

    ``decode_one`` returns ``(sample_rate, int16 ndarray)`` or None
    for anything that is not a mono 16-bit uncompressed PCM WAV
    (wrong magic, missing chunks, format != 1, odd data length, a
    chunk running past the buffer) — undecodable content degrades,
    never throws.
    """

    @staticmethod
    def decode_one(raw: bytes):
        import numpy as np

        if len(raw) < 12 or raw[:4] != b"RIFF" or raw[8:12] != b"WAVE":
            return None
        fmt, data = None, None
        i = 12
        while i + 8 <= len(raw):
            cid = raw[i : i + 4]
            size = int.from_bytes(raw[i + 4 : i + 8], "little")
            body = raw[i + 8 : i + 8 + size]
            if len(body) < size:
                return None  # chunk runs past the buffer
            if cid == b"fmt " and size >= 16:
                fmt = body
            elif cid == b"data":
                data = body
            i += 8 + size + (size & 1)  # chunks are word-aligned
        if fmt is None or data is None:
            return None
        audio_format = int.from_bytes(fmt[0:2], "little")
        channels = int.from_bytes(fmt[2:4], "little")
        sample_rate = int.from_bytes(fmt[4:8], "little")
        bits = int.from_bytes(fmt[14:16], "little")
        if audio_format != 1 or channels != 1 or bits != 16:
            return None
        if len(data) % 2 != 0:
            return None
        return sample_rate, np.frombuffer(data, dtype="<i2")


WAV_STATS_SCHEMA = (
    "media_id long, n_samples int, sample_rate int, peak int, "
    "sum_sq long, zero_cross int"
)


def wav_stats(media: DataFrame, decoder=None) -> DataFrame:
    """Per-clip integer-exact signal statistics through the real WAV
    container parse: sample count, declared sample rate, peak
    amplitude (|int16|, so up to 32768), energy (sum of squared
    samples — bounded by n*2^30, BIGINT-safe to ~2^33 samples/clip)
    and sign-change count (x[i-1] < 0 xor x[i] < 0). Map-only
    mapInPandas; undecodable clips are skipped like frame_energy's
    empty ones."""
    import numpy as np

    dec = decoder if decoder is not None else WavPcmDecoder()

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "media_id": [],
                "n_samples": [],
                "sample_rate": [],
                "peak": [],
                "sum_sq": [],
                "zero_cross": [],
            }
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                if content is None:
                    continue
                try:
                    decoded = dec.decode_one(bytes(content))
                except Exception:
                    decoded = None
                if decoded is None:
                    continue
                rate, s16 = decoded
                s = s16.astype(np.int64)
                neg = s < 0
                out["media_id"].append(mid)
                out["n_samples"].append(len(s))
                out["sample_rate"].append(rate)
                out["peak"].append(
                    int(np.abs(s).max()) if len(s) else 0
                )
                out["sum_sq"].append(int((s * s).sum()))
                out["zero_cross"].append(
                    int((neg[1:] != neg[:-1]).sum()) if len(s) else 0
                )
            yield pd.DataFrame(out)

    return media.mapInPandas(op, WAV_STATS_SCHEMA)


VAD_SCHEMA = (
    "media_id long, n_frames int, n_active int, n_segments int, "
    "longest_run int, first_active int"
)


def wav_vad_segments(
    media: DataFrame,
    frame_len: int = 4,
    energy_threshold: int = 1_200_000_000,
    decoder=None,
) -> DataFrame:
    """Energy-threshold voice-activity segmentation over really-parsed
    PCM: non-overlapping ``frame_len``-sample frames, frame energy =
    sum of squared int16 samples (exact int64), a frame is ACTIVE when
    energy > threshold, and active runs are the segments. Emits per
    clip: frame count, active count, segment count, longest run, and
    the 1-based first active frame (0 when silent). All arithmetic is
    integer, so the whole segmentation is hash-checkable. Map-only
    mapInPandas — audio bytes never shuffle."""
    import numpy as np

    dec = decoder if decoder is not None else WavPcmDecoder()

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "media_id": [],
                "n_frames": [],
                "n_active": [],
                "n_segments": [],
                "longest_run": [],
                "first_active": [],
            }
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                if content is None:
                    continue
                try:
                    decoded = dec.decode_one(bytes(content))
                except Exception:
                    decoded = None
                if decoded is None:
                    continue
                _rate, s16 = decoded
                s = s16.astype(np.int64)
                n_f = len(s) // frame_len
                if n_f == 0:
                    continue
                e = (s[: n_f * frame_len].reshape(n_f, frame_len) ** 2).sum(
                    axis=1
                )
                act = e > energy_threshold
                starts = act & ~np.concatenate(([False], act[:-1]))
                grp = np.cumsum(starts)
                runs = np.bincount(grp[act]) if act.any() else np.array([0])
                out["media_id"].append(mid)
                out["n_frames"].append(n_f)
                out["n_active"].append(int(act.sum()))
                out["n_segments"].append(int(starts.sum()))
                out["longest_run"].append(int(runs.max()))
                out["first_active"].append(
                    int(np.argmax(act)) + 1 if act.any() else 0
                )
            yield pd.DataFrame(out)

    return media.mapInPandas(op, VAD_SCHEMA)


def ahash_ints(arr) -> tuple:
    """All-integer average-hash of a decoded pixel array: integer
    Rec.601 luma (299 R + 587 G + 114 B), bit p set iff
    n_cells * luma_p > sum(lumas), row-major LSB-first. Returns
    (hash, n_bits_set). One definition shared by image_ahash and
    composed kernels."""
    import numpy as np

    a = arr.astype(np.int64)
    luma = (
        299 * a[:, :, 0] + 587 * a[:, :, 1] + 114 * a[:, :, 2]
    ).ravel()  # row-major
    total = int(luma.sum())
    bits = (luma * len(luma)) > total
    h = 0
    for p, b in enumerate(bits):
        if b:
            h |= 1 << p
    return h, int(bits.sum())


AHASH_SCHEMA = "media_id long, ahash long, n_bits_set int"


def image_ahash(media: DataFrame, decoder=None) -> DataFrame:
    """Average-hash over genuinely decoded pixels: integer Rec.601
    luma (299 R + 587 G + 114 B, no scaling loss), bit p set iff
    grid_cells * luma_p > sum(lumas) — all-integer, so the hash is
    bit-exact across engines. Bits are row-major LSB-first. A
    production path would have the codec resize to 8x8 grayscale
    first; here the hash runs over the decoded grid as-is (the
    synthesized corpora are already grid-sized). Map-only; rows
    whose content doesn't decode are skipped."""
    dec = decoder if decoder is not None else PpmBmpDecoder()

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "media_id": [],
                "ahash": [],
                "n_bits_set": [],
            }
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                if content is None:
                    continue
                try:
                    decoded = dec._decode_one(bytes(content))
                except Exception:
                    decoded = None
                if decoded is None:
                    continue
                _w, _h, arr = decoded
                h, nbits = ahash_ints(arr)
                out["media_id"].append(mid)
                out["ahash"].append(h)
                out["n_bits_set"].append(nbits)
            yield pd.DataFrame(out)

    return media.mapInPandas(op, AHASH_SCHEMA)


def decode_image(*_args, **_kwargs):
    """Real image decode — requires an image library not present in
    this environment. Inject a decoder into ``extract_features``
    instead (tests use ``FakeDecoder``)."""
    raise NotImplementedError(
        "no image codec in this environment; pass decoder=FakeDecoder() "
        "or a codec-backed implementation to extract_features()"
    )


def extract_features(
    media: DataFrame,
    decoder: Callable | None = None,
    batch_hint: int = 256,
) -> DataFrame:
    """mapInPandas feature-extraction stage over a media table with
    (media_id, content binary, meta struct).

    Emits per-item: byte size, crc32, sha1, decoded width/height and a
    feature vector. Map-only — no shuffle; Arrow batches bound worker
    memory regardless of per-item size.
    """
    dec = decoder if decoder is not None else decode_image()

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = dec.decode_batch(pdf["content"])
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"].values,
                    "n_bytes": [
                        len(bytes(c)) if c is not None else None
                        for c in pdf["content"]
                    ],
                    "crc32": [
                        zlib.crc32(bytes(c)) if c is not None else None
                        for c in pdf["content"]
                    ],
                    "sha1": [
                        hashlib.sha1(bytes(c)).hexdigest()
                        if c is not None
                        else None
                        for c in pdf["content"]
                    ],
                    "sha256": [
                        hashlib.sha256(bytes(c)).hexdigest()
                        if c is not None
                        else None
                        for c in pdf["content"]
                    ],
                    "width": decoded["width"].values,
                    "height": decoded["height"].values,
                    "feature": decoded["feature"].values,
                }
            )
            yield out

    return media.mapInPandas(op, schema=FEATURE_SCHEMA)


def frame_sample_plan(
    media: DataFrame, every_ms: int = 1000
) -> DataFrame:
    """Video frame-sampling *plan*: one output row per sampled frame
    timestamp (media_id, frame_ms) — the pure-Spark half of frame
    extraction (sequence + explode on the metadata; the decode of each
    frame would be another mapInPandas stage)."""
    return media.select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(
                    F.coalesce(F.col("meta.duration_ms"), F.lit(0))
                    - F.lit(1),
                    F.lit(0),
                ),
                F.lit(every_ms),
            )
        ).alias("frame_ms"),
    )


AUDIO_FRAME_SCHEMA = (
    "media_id long, frame_idx int, n_samples int, energy long, peak int"
)


def frame_energy(media: DataFrame, frame_bytes: int = 160) -> DataFrame:
    """Audio framing + per-frame signal statistics over unsigned-8-bit
    PCM content — the audio leg of the multimodal plumbing: an
    Arrow-batched ``mapInPandas`` stage that windows each clip into
    ``frame_bytes``-sample frames (160 = 20 ms at 8 kHz) and emits
    integer-exact per-frame energy (sum of squared centered samples)
    and peak amplitude. The trailing partial frame is kept.

    Map-only: media rows never shuffle for the framing itself; the
    output fans out one row per frame, so downstream aggregations
    shuffle frame rows, not media bytes. A real codec (libav/ffmpeg)
    would slot in before this stage exactly like ``decode_image`` —
    the uint8 interpretation here IS the deterministic fake decode,
    which keeps the whole island behind an exact SQL oracle (see
    queries/datasetops2.m_audio_energy).
    """
    import numpy as np

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "media_id": [],
                "frame_idx": [],
                "n_samples": [],
                "energy": [],
                "peak": [],
            }
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                if content is None or len(content) == 0:
                    continue
                a = (
                    np.frombuffer(content, dtype=np.uint8).astype(
                        np.int64
                    )
                    - 128
                )
                n_frames = -(-len(a) // frame_bytes)
                for f in range(n_frames):
                    seg = a[f * frame_bytes : (f + 1) * frame_bytes]
                    out["media_id"].append(mid)
                    out["frame_idx"].append(f)
                    out["n_samples"].append(len(seg))
                    out["energy"].append(int((seg * seg).sum()))
                    out["peak"].append(int(np.abs(seg).max()))
            yield pd.DataFrame(out)

    return media.mapInPandas(op, AUDIO_FRAME_SCHEMA)


RESIZE_SCHEMA = (
    "media_id long, width int, height int, out_w int, out_h int, "
    "resized boolean"
)


def resize_plan(
    media: DataFrame, target: int = 256, decoder=None
) -> DataFrame:
    """Aspect-preserving resize-to-fit planning through the decode
    island: decode dims (FakeDecoder in tests — a real codec slots in
    unchanged), then fit the long edge to ``target`` without
    upscaling: out = floor(dim * target / long_edge). The pixel
    resample itself is the codec's job — this stage is the planning +
    metadata half every 100 TB image pipeline runs first (to budget
    decode cost and skip already-small images), map-only over the
    media bytes."""
    import numpy as np

    dec = decoder if decoder is not None else decode_image()

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # undecodable rows (null content -> null dims) are skipped
            # like frame_energy's empty clips — int32 casting a NaN
            # would otherwise fabricate INT_MIN dimensions
            d = dec.decode_batch(pdf["content"])
            ok = d["width"].notna() & d["height"].notna()
            pdf = pdf[ok.to_numpy()]
            d = d[ok.to_numpy()]
            w = d["width"].to_numpy(dtype="float64")
            h = d["height"].to_numpy(dtype="float64")
            m = np.maximum(np.maximum(w, h), 1.0)
            need = m > target
            out_w = np.where(need, np.floor(w * target / m), w)
            out_h = np.where(need, np.floor(h * target / m), h)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    "width": w.astype("int32"),
                    "height": h.astype("int32"),
                    "out_w": out_w.astype("int32"),
                    "out_h": out_h.astype("int32"),
                    "resized": need,
                }
            )

    return media.mapInPandas(op, RESIZE_SCHEMA)
