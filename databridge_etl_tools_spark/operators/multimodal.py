"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed via Arrow-batched
``mapInPandas``.

The container has no image/audio codecs (no PIL/ffmpeg), so the
decode seam is explicit: real bytes route to the library if present,
else raise; a deterministic FAKE container format (``FAKEIMG:`` /
``FAKEAUD:`` headers) exercises the full Spark-side plumbing —
binary schema, batch iteration, per-partition decoder reuse, feature
schema — which is the part that must be right at 100 TB. One REAL
uncompressed format decodes with the stdlib alone: binary PPM (P6),
so the decode→feature→resize seam runs end-to-end in CI with actual
image bytes (r3 verdict #5); compressed formats (PNG/JPEG pixel
data) stay gated on Pillow.

Layout guidance for scale: media tables should be written with the
binary column LAST in the schema and row groups sized so metadata-
only scans (parquet column pruning) never touch the blob pages;
feature extraction repartitions by size so decode work balances.

FAKE formats (deterministic, self-describing):
- image: b"FAKEIMG:<width>:<height>:" + width*height pixel bytes
- audio: b"FAKEAUD:<sample_rate>:<n_samples>:" + n_samples bytes
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

IMAGE_META_SCHEMA = "width int, height int, format string"
IMAGE_FEATURE_SCHEMA = "mean_pixel double, std_pixel double, n_pixels long"


def pack_fake_image(width: int, height: int, seed: int = 0) -> bytes:
    px = bytes((seed + i) % 256 for i in range(width * height))
    return f"FAKEIMG:{width}:{height}:".encode() + px


def pack_fake_audio(sample_rate: int, n_samples: int, seed: int = 0) -> bytes:
    data = bytes((seed * 7 + i * 3) % 256 for i in range(n_samples))
    return f"FAKEAUD:{sample_rate}:{n_samples}:".encode() + data


def _decode_fake(content: bytes) -> tuple[str, dict, bytes]:
    head, rest = content.split(b":", 1)
    if head == b"FAKEIMG":
        w, h, px = rest.split(b":", 2)
        return "fakeimg", {"width": int(w), "height": int(h)}, px
    if head == b"FAKEAUD":
        sr, n, data = rest.split(b":", 2)
        return "fakeaud", {"sample_rate": int(sr), "n_samples": int(n)}, data
    raise ValueError("not a FAKE container")


def pack_ppm(width: int, height: int, seed: int = 0) -> bytes:
    """A real binary-PPM (P6) image with deterministic RGB pixels."""
    rgb = bytes((seed + i) % 256 for i in range(width * height * 3))
    return f"P6\n{width} {height}\n255\n".encode() + rgb


def _parse_ppm(content: bytes) -> tuple[int, int, int, bytes]:
    """Parse binary PPM (P6): ``P6 <w> <h> <maxval>`` header tokens
    separated by whitespace, ``#`` comments allowed, then exactly one
    whitespace byte before w*h*3 pixel bytes. Stdlib-only.

    Returns (width, height, maxval, pixels)."""
    if not content.startswith(b"P6"):
        raise ValueError("not a P6 PPM")
    pos, vals = 2, []
    while len(vals) < 3:
        while pos < len(content) and content[pos : pos + 1].isspace():
            pos += 1
        if content[pos : pos + 1] == b"#":
            pos = content.index(b"\n", pos) + 1
            continue
        start = pos
        while pos < len(content) and content[pos : pos + 1].isdigit():
            pos += 1
        if start == pos:
            raise ValueError("malformed PPM header")
        vals.append(int(content[start:pos]))
    pos += 1  # the single whitespace after maxval
    w, h, maxval = vals
    px = content[pos : pos + w * h * 3]
    if maxval > 255 or len(px) != w * h * 3:
        raise ValueError("unsupported or truncated PPM")
    return w, h, maxval, px


def _decode_image(content: bytes) -> tuple[str, int, int, int, bytes]:
    """Decode seam → (kind, width, height, channels, pixel bytes).

    FAKEIMG (1 channel) and real P6 PPM (3 channels) decode with the
    stdlib; anything else routes to Pillow when available."""
    if content.startswith(b"FAKEIMG:"):
        _, meta, px = _decode_fake(content)
        return "fakeimg", meta["width"], meta["height"], 1, px
    if content.startswith(b"P6"):
        w, h, _, px = _parse_ppm(content)
        return "ppm", w, h, 3, px
    try:
        import PIL.Image  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "compressed-image decode requires Pillow (not in this "
            "container); FAKEIMG and P6 PPM decode with the stdlib"
        ) from e
    raise NotImplementedError("PIL decode path not wired in this build")


def _pack_image(kind: str, w: int, h: int, px: bytes) -> bytes:
    if kind == "fakeimg":
        return f"FAKEIMG:{w}:{h}:".encode() + px
    if kind == "ppm":
        return f"P6\n{w} {h}\n255\n".encode() + px
    raise ValueError(f"cannot re-pack kind {kind!r}")


def image_metadata(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Header-only metadata extraction (no full decode) — the cheap
    pass that runs before any pixel work."""
    id_cols = [c for c in df.columns if c != content_col]
    schema = ", ".join(
        [f"`{c}` {t}" for c, t in df.dtypes if c != content_col] + [IMAGE_META_SCHEMA.replace("format", "`format`")]
    )

    def run(batches: Iterator) -> Iterator:
        for pdf in batches:
            out = pdf[id_cols].copy()
            ws, hs, fmts = [], [], []
            for content in pdf[content_col]:
                raw = bytes(content)
                try:
                    if raw.startswith(b"P6"):
                        w, h, _, _px = _parse_ppm(raw)
                        ws.append(w), hs.append(h), fmts.append("ppm")
                    else:
                        kind, meta, _ = _decode_fake(raw)
                        ws.append(meta.get("width"))
                        hs.append(meta.get("height"))
                        fmts.append(kind)
                except Exception:  # noqa: BLE001 - unknown container
                    ws.append(None), hs.append(None), fmts.append(None)
            out["width"], out["height"], out["format"] = ws, hs, fmts
            yield out

    return df.mapInPandas(run, schema)


def image_features(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Full-decode feature extraction (mean/std pixel) — the expensive
    pass; one decoder per partition, Arrow-batched."""
    id_cols = [c for c in df.columns if c != content_col]
    schema = ", ".join(
        [f"`{c}` {t}" for c, t in df.dtypes if c != content_col] + [IMAGE_FEATURE_SCHEMA]
    )

    def run(batches: Iterator) -> Iterator:
        import numpy as np

        for pdf in batches:
            out = pdf[id_cols].copy()
            means, stds, ns = [], [], []
            for content in pdf[content_col]:
                _kind, w, h, _ch, px = _decode_image(bytes(content))
                arr = np.frombuffer(px, dtype=np.uint8).astype(np.float64)
                means.append(float(arr.mean()))
                stds.append(float(arr.std()))
                ns.append(w * h)
            out["mean_pixel"], out["std_pixel"], out["n_pixels"] = means, stds, ns
            yield out

    return df.mapInPandas(run, schema)


def resize_images(df: DataFrame, new_width: int, new_height: int, content_col: str = "content") -> DataFrame:
    """Resize (nearest-neighbor on the FAKE container) — shows the
    binary-in/binary-out transform shape."""
    schema = ", ".join(f"`{c}` {t}" for c, t in df.dtypes)

    def run(batches: Iterator) -> Iterator:
        import numpy as np

        for pdf in batches:
            out = pdf.copy()
            resized = []
            for content in pdf[content_col]:
                kind, w, h, ch, px = _decode_image(bytes(content))
                arr = np.frombuffer(px, dtype=np.uint8).reshape(h, w, ch)
                yi = (np.arange(new_height) * h // new_height)
                xi = (np.arange(new_width) * w // new_width)
                small = arr[np.ix_(yi, xi)]
                resized.append(
                    _pack_image(kind, new_width, new_height, small.tobytes())
                )
            out[content_col] = resized
            yield out

    return df.mapInPandas(run, schema)


def audio_frame_sample(df: DataFrame, every_n: int, content_col: str = "content") -> DataFrame:
    """Frame sampling for audio/video: keep every ``every_n``-th
    sample (the video-frame-sampling shape on the FAKEAUD container)."""
    id_cols = [c for c in df.columns if c != content_col]
    schema = ", ".join(
        [f"`{c}` {t}" for c, t in df.dtypes if c != content_col]
        + ["sample_rate int, n_kept int, kept binary"]
    )

    def run(batches: Iterator) -> Iterator:
        for pdf in batches:
            out = pdf[id_cols].copy()
            srs, ns, kept = [], [], []
            for content in pdf[content_col]:
                kind, meta, data = _decode_fake(bytes(content))
                assert kind == "fakeaud", "audio container expected"
                k = data[::every_n]
                srs.append(meta["sample_rate"] // every_n)
                ns.append(len(k))
                kept.append(bytes(k))
            out["sample_rate"], out["n_kept"], out["kept"] = srs, ns, kept
            yield out

    return df.mapInPandas(run, schema)


def binary_stats(df: DataFrame, content_col: str, id_col: str) -> DataFrame:
    """Metadata-pass statistics that never leave the JVM: byte length
    + md5 over the binary column (pure column expressions)."""
    c = F.col(content_col)
    return df.select(
        F.col(id_col),
        F.octet_length(c).alias("n_bytes"),
        F.md5(c).alias("content_md5"),
    )


# ---------------------------------------------------------------------------
# Real audio: RIFF/WAVE PCM — like the P6 PPM path, WAV needs no codec
# library, so the stdlib `wave` module drives the decode seam end-to-end
# in CI (metadata, features, frame-sampling with re-pack); compressed
# audio would slot behind the same functions gated on its decoder.
# ---------------------------------------------------------------------------


def pack_wav(
    sample_rate: int, n_samples: int, seed: int = 0, channels: int = 1
) -> bytes:
    """Deterministic PCM16 WAV bytes (integer triangle-ish waveform —
    no floats, no RNG, identical on every platform)."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        frames = bytearray()
        for i in range(n_samples):
            for c in range(channels):
                v = ((seed * 31 + i * 257 + c * 101) % 20000) - 10000
                frames += int(v).to_bytes(2, "little", signed=True)
        w.writeframes(bytes(frames))
    return buf.getvalue()


def _parse_wav(content: bytes) -> tuple[int, int, int, bytes]:
    """(sample_rate, channels, n_frames, pcm16 bytes) from RIFF/WAVE."""
    import io
    import wave

    with wave.open(io.BytesIO(content), "rb") as w:
        if w.getsampwidth() != 2:
            raise ValueError("only PCM16 WAV supported")
        return w.getframerate(), w.getnchannels(), w.getnframes(), w.readframes(
            w.getnframes()
        )


def audio_features(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Audio feature extraction over binary columns: container kind,
    sample rate, channels, sample count, duration, RMS energy, peak
    amplitude, zero-crossing rate. Real RIFF/WAVE PCM16 decodes with
    the stdlib; the FAKEAUD container exercises the same seam with
    synthetic 8-bit streams. Arrow-batched ``mapInPandas`` — blob
    stays executor-side, features are per-row numpy over the PCM
    frame (deterministic integer → float64 math)."""
    import numpy as np

    id_cols = [c for c in df.columns if c != content_col]
    schema = ", ".join(
        [f"`{c}` {t}" for c, t in df.dtypes if c != content_col]
        + [
            "container string, sample_rate int, channels int, n_samples int",
            "duration_s double, rms double, peak int, zcr double",
        ]
    )

    def run(batches: Iterator) -> Iterator:
        for pdf in batches:
            out = pdf[id_cols].copy()
            rows = []
            for content in pdf[content_col]:
                b = bytes(content)
                if b.startswith(b"RIFF"):
                    sr, ch, n, pcm = _parse_wav(b)
                    x = np.frombuffer(pcm, dtype="<i2").astype(np.float64)
                    kind = "wav"
                else:
                    kind_, meta, data = _decode_fake(b)
                    assert kind_ == "fakeaud", "audio container expected"
                    sr, ch, n = meta["sample_rate"], 1, meta["n_samples"]
                    x = np.frombuffer(data, dtype=np.uint8).astype(np.float64) - 128.0
                    kind = "fakeaud"
                if len(x):
                    rms = float(np.sqrt(np.mean(x * x)))
                    peak = int(np.max(np.abs(x)))
                    zc = float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1])))
                else:
                    rms, peak, zc = 0.0, 0, 0.0
                rows.append(
                    (kind, sr, ch, n, (n / sr if sr else 0.0), rms, peak, zc)
                )
            cols = [
                "container", "sample_rate", "channels", "n_samples",
                "duration_s", "rms", "peak", "zcr",
            ]
            for i, cname in enumerate(cols):
                out[cname] = [r[i] for r in rows]
            yield out

    return df.mapInPandas(run, schema)


AHASH_BITS = 60  # 5 bands × 12 bits — signed-int64-safe like SimHash


def pack_ppm_random(width: int, height: int, seed: int = 0) -> bytes:
    """A P6 PPM with md5-derived pseudorandom pixels — deterministic
    but content-rich, so perceptual hashes of different seeds actually
    differ (``pack_ppm``'s sawtooth gradient is phase-shifted by the
    seed and perceptually IDENTICAL across seeds — fine for decode
    plumbing tests, useless for near-dup tests)."""
    import hashlib

    n = width * height * 3
    raw = b"".join(
        hashlib.md5(f"ppm:{seed}:{k}".encode()).digest() for k in range(n // 16 + 1)
    )
    return f"P6\n{width} {height}\n255\n".encode() + raw[:n]


def image_ahash(df: DataFrame, content_col: str = "content", id_col: str = "item_id") -> DataFrame:
    """Perceptual average-hash over decoded pixels — the image
    near-duplicate signature (cropped/re-encoded/noised copies land
    within a few bits; cf. exact-byte md5 in ``binary_stats`` which
    any single pixel change defeats).

    Recipe: decode → per-pixel channel SUM (integer grayscale ×ch) →
    8×8 nearest-neighbor downsample → bit i set iff ``64·cell_i >
    Σcells`` (the mean compare cleared of denominators — EXACT
    integer arithmetic, r9: the float ``cell > mean`` differed from
    any SQL replay in sub-ulp ties, and with integer pixels the whole
    hash is now engine-independent, which is what promoted
    ``mm_image_neardup`` to oracle-backed), keeping the first
    ``AHASH_BITS`` = 60 bits so the signature stays inside a signed
    int64 on every engine (the SimHash convention). Arrow-batched
    decode (the justified Python seam); everything downstream —
    banding, hamming — is JVM bit arithmetic via
    ``dedup.hamming_near_pairs``."""
    schema = f"`{id_col}` bigint, ahash bigint"

    def run(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            ids, hashes = [], []
            for item_id, content in zip(pdf[id_col], pdf[content_col]):
                _kind, w, h, ch, px = _decode_image(bytes(content))
                s3 = (
                    np.frombuffer(px, dtype=np.uint8)
                    .reshape(h, w, ch)
                    .astype(np.int64)
                    .sum(axis=2)
                )
                yi = np.arange(8) * h // 8
                xi = np.arange(8) * w // 8
                cells = s3[np.ix_(yi, xi)].ravel()
                total = int(cells.sum())
                bits = 64 * cells > total
                v = 0
                for i in range(AHASH_BITS):
                    if bits[i]:
                        v |= 1 << i
                ids.append(int(item_id))
                hashes.append(v)
            yield pd.DataFrame({id_col: ids, "ahash": hashes})

    return df.mapInPandas(run, schema)


def image_neardup_pairs(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "item_id",
    max_hamming: int = 4,
) -> DataFrame:
    """Image near-duplicate pairs: aHash signatures → the generic
    banded hamming join (pigeonhole-EXACT for distance ≤ 4 at 5
    bands). The multimodal twin of text SimHash dedup: one Arrow
    decode pass, one (band, key) equi-join, never n² image
    comparisons."""
    from .dedup import hamming_near_pairs
    from .materialize import materialize

    sig = materialize(image_ahash(df, content_col, id_col))
    return hamming_near_pairs(
        sig, id_col=id_col, sig_col="ahash", bits=AHASH_BITS,
        max_hamming=max_hamming, bands=5,
    )


def pack_fake_audio_random(sample_rate: int, n_samples: int, seed: int = 0) -> bytes:
    """FAKEAUD with md5-derived pseudorandom samples (see
    ``pack_ppm_random`` — the ramp in ``pack_fake_audio`` has a
    near-constant derivative, so derivative-sign fingerprints of
    different seeds would collide)."""
    import hashlib

    raw = b"".join(
        hashlib.md5(f"aud:{seed}:{k}".encode()).digest()
        for k in range(n_samples // 16 + 1)
    )
    return f"FAKEAUD:{sample_rate}:{n_samples}:".encode() + raw[:n_samples]


def audio_fingerprint(
    df: DataFrame, content_col: str = "content", id_col: str = "item_id"
) -> DataFrame:
    """Derivative-sign audio fingerprint (the Shazam-family shape on
    the FAKEAUD container): window-mean downsample to 61 frames, bit
    i = frame[i+1] > frame[i] — robust to gain/offset changes (both
    shift frame means equally, leaving every comparison unchanged)
    and to sparse sample noise (window means average it out). 60 bits
    → signed-int64-safe, feeds the same banded hamming join as
    SimHash/aHash."""
    schema = f"`{id_col}` bigint, afp bigint"

    def run(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            ids, fps = [], []
            for item_id, content in zip(pdf[id_col], pdf[content_col]):
                kind, _meta, data = _decode_fake(bytes(content))
                assert kind == "fakeaud", "audio container expected"
                arr = np.frombuffer(data, dtype=np.uint8).astype(np.float64)
                edges = (np.arange(62) * len(arr)) // 61
                frames = np.array(
                    [arr[edges[i]: max(edges[i + 1], edges[i] + 1)].mean()
                     for i in range(61)]
                )
                v = 0
                for i in range(AHASH_BITS):
                    if frames[i + 1] > frames[i]:
                        v |= 1 << i
                ids.append(int(item_id))
                fps.append(v)
            yield pd.DataFrame({id_col: ids, "afp": fps})

    return df.mapInPandas(run, schema)


def audio_neardup_pairs(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "item_id",
    max_hamming: int = 4,
) -> DataFrame:
    """Audio near-duplicate pairs: derivative-sign fingerprints → the
    generic banded hamming join (pigeonhole-exact ≤ 4 bits)."""
    from .dedup import hamming_near_pairs
    from .materialize import materialize

    sig = materialize(audio_fingerprint(df, content_col, id_col))
    return hamming_near_pairs(
        sig, id_col=id_col, sig_col="afp", bits=AHASH_BITS,
        max_hamming=max_hamming, bands=5,
    )
