"""Multimodal (image/audio/video) column operators.

Media rides in opaque ``binary`` columns with typed metadata columns
beside it — the standard lakehouse shape for 100 TB multimodal
training sets. Three layers:

1. Metadata extraction (``binary_metadata``): pure Column
   expressions — byte length, md5 digest, magic-byte container sniff.
   JVM-side, codegen'd, oracle-verifiable.
2. Decode / feature-extract (``decode_images``): Arrow-batched
   ``mapInPandas`` — the real 100 TB plumbing (schema, batch shape,
   partition-preserving, no shuffle). The pixel decode itself needs
   an image codec: Pillow is probed at runtime; absent (as in this
   container) each batch uses a clearly-marked DETERMINISTIC FAKE
   decoder (documented below) so the distributed plumbing stays
   fully testable. Real deployments drop PIL/libvips into the
   decoder slot unchanged.
3. Frame sampling (``sample_frames``): video-style byte-range frame
   slicing as a mapInPandas generator — 1 input row → N frame rows,
   demonstrating the fan-out UDF shape without a codec.

Fake-decode contract (reproducible everywhere):
  width  = 64 + byte_len mod 512
  height = 64 + (7 * byte_len) mod 512
  mean_byte = arithmetic mean of the raw bytes (float)
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

try:  # pragma: no cover - not present in this container
    from PIL import Image  # noqa: F401

    _HAVE_PIL = True
except Exception:  # pragma: no cover
    _HAVE_PIL = False

#: magic-byte prefixes (hex, uppercase) → container kind
MAGIC_PREFIXES: list[tuple[str, str]] = [
    ("89504E47", "png"),
    ("FFD8FF", "jpeg"),
    ("47494638", "gif"),
    ("52494646", "riff"),  # wav/avi/webp share the RIFF container
    ("494433", "mp3"),
    ("255044462D", "pdf"),
    ("1F8B", "gzip"),
]


def sniff_kind(bin_col: Column) -> Column:
    """Container kind from magic bytes — expression-only dispatch."""
    magic = F.upper(F.hex(F.substring(bin_col, 1, 5)))
    expr = F.lit("unknown")
    for prefix, kind in reversed(MAGIC_PREFIXES):
        expr = F.when(magic.startswith(prefix), F.lit(kind)).otherwise(expr)
    return expr


def binary_metadata(df: DataFrame, bin_col: str, id_col: str) -> DataFrame:
    """(id, byte_len, digest, magic, kind) typed metadata per blob."""
    b = F.col(bin_col)
    return df.select(
        F.col(id_col),
        F.length(b).cast("bigint").alias("byte_len"),
        F.md5(b).alias("digest"),
        F.upper(F.hex(F.substring(b, 1, 4))).alias("magic"),
        sniff_kind(b).alias("kind"),
    )


def _source_dims(data: bytes) -> tuple[int, int, str]:
    """(width, height, decoder): THE one dimension-reading slot shared
    by :func:`decode_images` and :func:`resize_images` — PIL when
    importable, else the module-docstring deterministic fake. One code
    path so the fake-decode contract (and both oracles replaying it)
    cannot drift between the two operators."""
    if _HAVE_PIL:  # pragma: no cover - codec not in container
        import io

        try:
            with Image.open(io.BytesIO(data)) as im:
                w, h = im.size
            return w, h, "pil"
        except Exception:
            return 0, 0, "pil-error"
    return 64 + len(data) % 512, 64 + (7 * len(data)) % 512, "fake"


DECODE_SCHEMA = (
    "id bigint, width int, height int, n_pixels bigint, mean_byte double, decoder string"
)


def decode_images(df: DataFrame, bin_col: str, id_col: str) -> DataFrame:
    """Arrow-batched decode: (id, width, height, n_pixels, mean_byte,
    decoder). Partition-preserving mapInPandas — no shuffle; batches
    stream through Arrow with ``spark.sql.execution.arrow.maxRecordsPerBatch``
    controlling memory. The decoder slot is PIL when importable,
    else the deterministic fake (module docstring)."""
    import numpy as np
    import pandas as pd

    bin_name, id_name = bin_col, id_col

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_name].to_numpy()
            widths, heights, means, decoders = [], [], [], []
            for raw in pdf[bin_name]:
                data = bytes(raw) if raw is not None else b""
                w, h, decoder = _source_dims(data)
                arr = np.frombuffer(data, dtype=np.uint8)
                means.append(float(arr.mean()) if arr.size else 0.0)
                widths.append(w)
                heights.append(h)
                decoders.append(decoder)
            yield pd.DataFrame(
                {
                    "id": ids,
                    "width": np.array(widths, dtype="int32"),
                    "height": np.array(heights, dtype="int32"),
                    "n_pixels": np.array(widths, dtype="int64")
                    * np.array(heights, dtype="int64"),
                    "mean_byte": means,
                    "decoder": decoders,
                }
            )

    return df.select(F.col(id_col), F.col(bin_col)).mapInPandas(_decode, DECODE_SCHEMA)


RESIZE_SCHEMA = (
    "id bigint, src_width int, src_height int, width int, height int, "
    "scale double, resizer string"
)


def resize_images(
    df: DataFrame,
    bin_col: str,
    id_col: str,
    target_w: int = 224,
    target_h: int = 224,
) -> DataFrame:
    """Aspect-preserving resize-to-fit (the PIL ``thumbnail`` /
    training-pipeline letterbox shape): each image scales by
    ``min(target_w/src_w, target_h/src_h)`` so it fits the target box
    without distortion — (id, src_width, src_height, width, height,
    scale, resizer). Same Arrow-batched partition-preserving
    mapInPandas plumbing as :func:`decode_images`; with PIL present
    the decoder slot reads true dimensions (and a real deployment
    resizes the pixels in the same pass), absent it runs on the
    deterministic fake dims, keeping the geometry arithmetic — and
    the DuckDB oracle replay — exact. IEEE double division + floor
    are bit-deterministic cross-engine for integer operands, the same
    determinism class as the strict-fold conventions."""
    import math

    import numpy as np
    import pandas as pd

    bin_name, id_name = bin_col, id_col
    tw, th = float(target_w), float(target_h)

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_name].to_numpy()
            sw_l, sh_l, w_l, h_l, sc_l, rz = [], [], [], [], [], []
            for raw in pdf[bin_name]:
                data = bytes(raw) if raw is not None else b""
                sw, sh, resizer = _source_dims(data)
                if sw and sh:
                    scale = min(tw / sw, th / sh)
                    w, h = int(math.floor(sw * scale)), int(
                        math.floor(sh * scale)
                    )
                else:
                    scale, w, h = 0.0, 0, 0
                sw_l.append(sw)
                sh_l.append(sh)
                w_l.append(w)
                h_l.append(h)
                sc_l.append(scale)
                rz.append(resizer)
            yield pd.DataFrame(
                {
                    "id": ids,
                    "src_width": np.array(sw_l, dtype="int32"),
                    "src_height": np.array(sh_l, dtype="int32"),
                    "width": np.array(w_l, dtype="int32"),
                    "height": np.array(h_l, dtype="int32"),
                    "scale": np.array(sc_l, dtype="float64"),
                    "resizer": rz,
                }
            )

    return df.select(F.col(id_col), F.col(bin_col)).mapInPandas(
        _resize, RESIZE_SCHEMA
    )


PHASH_SCHEMA = "id bigint, phash bigint"


def _fake_phash(data: bytes, bits: int) -> int:
    """Deterministic blockhash over the raw byte stream — the codec-free
    stand-in for a pixel aHash, replayable in ANSI SQL.

    Contract (mirrored bit-for-bit by the DuckDB oracle):
      byte i belongs to block floor(i * bits / n);
      bit k = 1 iff block_sum_k * n > total_sum * block_count_k
    — all-INTEGER arithmetic (no float thresholds), so the signature is
    bit-exact cross-engine. Empty blob → 0. Like a real blockhash, a
    brighter-than-average region sets its bit, so near-identical byte
    streams land within a small Hamming distance. int64-safe for blobs
    under ~190 MB: the threshold products are bounded by 255·n·n
    (worst case ONE block holds all n bytes), which crosses 2^63 at
    n = √(2^63/255) ≈ 1.9e8 — guarded loudly, because a silent numpy
    wraparound would flip signature bits with no cross-engine error."""
    import numpy as np

    n = len(data)
    if n == 0:
        return 0
    if n > 190_000_000:
        raise ValueError(
            f"blob of {n} bytes exceeds the phash int64-safe bound "
            "(~190 MB: 255*n*n must stay under 2^63); chunk or "
            "downsample the blob first"
        )
    arr = np.frombuffer(data, dtype=np.uint8).astype(np.int64)
    blk = (np.arange(n, dtype=np.int64) * bits) // n
    # bincount weights are float64 — exact for sums < 2^53 (255·n needs
    # n < 3.5e13, far past the int64 product bound documented above)
    sums = np.bincount(blk, weights=arr, minlength=bits).astype(np.int64)
    cnts = np.bincount(blk, minlength=bits).astype(np.int64)
    total = int(arr.sum())
    on = np.nonzero(sums * n > total * cnts)[0]
    return int(sum(1 << int(k) for k in on))


def _pil_phash(data: bytes, bits: int) -> int | None:  # pragma: no cover - codec absent
    """Real aHash when a codec is present: grayscale-resize to a
    rows×cols grid of exactly ``bits`` pixels (6×10 at the default 60),
    bit k = pixel k (row-major) brighter than the grid mean — the same
    strictly-greater tie rule as the fake contract.

    Decode failure returns ``None`` (→ NULL phash), NEVER a sentinel
    value: a constant sentinel (the old 0) made every distinct
    undecodable blob a hamming-0 "duplicate" of the first one, and the
    phash-index ingest path would then silently DELETE truncated
    images. A NULL signature joins with nothing on either engine, so
    undecodable blobs are conservatively kept everywhere.

    EXCEPTION: the EMPTY blob returns 0, matching ``_fake_phash`` —
    the empty-bytes case is part of the oracle-replayed contract
    (DuckDB twins hash empty blobs to 0), and without this branch the
    dedup semantics would silently depend on whether PIL is importable
    in the container (empty → None kept forever under PIL, → 0 paired
    at hamming 0 under the fake)."""
    import io
    import math

    if len(data) == 0:
        return 0
    rows = int(math.floor(math.sqrt(bits)))
    while bits % rows:
        rows -= 1
    cols = bits // rows
    try:
        with Image.open(io.BytesIO(data)) as im:
            px = list(im.convert("L").resize((cols, rows)).getdata())
    except Exception:
        return None
    mean = sum(px) / len(px)
    return sum(1 << k for k, p in enumerate(px) if p > mean)


def phash_images(
    df: DataFrame, bin_col: str, id_col: str, bits: int = 60
) -> DataFrame:
    """(id, phash): 60-bit perceptual signature per blob (aHash /
    blockhash family) through the same Arrow-batched mapInPandas
    plumbing as :func:`decode_images` — partition-preserving, no
    shuffle, the decoder slot swaps PIL in when importable and the
    deterministic byte-block fake otherwise (:func:`_fake_phash`).

    60 bits, not 64: the signature must band and XOR as a POSITIVE
    bigint on both engines (the same width rationale as
    ``operators.dedup.simhash``, dedup.py)."""
    import pandas as pd

    _validate_bits(bits, "banding/XOR")
    bin_name, id_name = bin_col, id_col
    hasher = _pil_phash if _HAVE_PIL else _fake_phash

    def _hash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            sigs = [
                hasher(bytes(raw) if raw is not None else b"", bits)
                for raw in pdf[bin_name]
            ]
            yield pd.DataFrame(
                {
                    "id": pdf[id_name].to_numpy(),
                    # nullable Int64: a PIL decode failure yields None →
                    # NULL phash, which equi-joins with nothing (the
                    # conservative keep-at-ingest contract); the fake
                    # hasher never returns None
                    "phash": pd.array(sigs, dtype="Int64"),
                }
            )

    return df.select(F.col(id_col), F.col(bin_col)).mapInPandas(
        _hash, PHASH_SCHEMA
    )


def image_near_dup(
    df: DataFrame,
    bin_col: str,
    id_col: str,
    bits: int = 60,
    max_hamming: int = 3,
) -> DataFrame:
    """(id_a, id_b, hamming): perceptual near-duplicate pairs over the
    blob column — the image-dedup step every multimodal training
    pipeline runs before training. One Arrow signature pass
    (:func:`phash_images`), then the SAME banded-Hamming kernel the
    text SimHash path uses (``operators.dedup.banded_hamming_pairs``):
    pigeonhole band equi-join + exact popcount verify, shuffle bounded
    by (bands × blobs), never all-pairs — so the 100 TB plan is the
    proven simhash_pairs shape with the signature source swapped."""
    from batch_process_dpla_index_spark.operators.dedup import (
        _with_cached_deps,
        banded_hamming_pairs,
    )

    sig = phash_images(df, bin_col, id_col, bits).persist()
    out = banded_hamming_pairs(sig, "id", "phash", bits, max_hamming)
    return _with_cached_deps(out, [sig])


FRAME_PHASH_SCHEMA = "id bigint, frame_no int, phash bigint"


def _validate_bits(bits: int, use: str) -> None:
    """Shared driver-side width check for every blockhash entry point
    (phash_images, frame_phash) — ONE message, ONE bound, so the two
    fingerprint surfaces can't drift validation semantics."""
    if not 1 <= bits <= 60:
        raise ValueError(
            f"bits={bits}: phash supports 1..60 bits (the signature must "
            f"stay a positive int64 for {use} on both engines)"
        )


def _validate_window(frame_size: int, stride: int) -> None:
    """Driver-side window-parameter check: a zero/negative frame_size
    or stride would otherwise fail deep inside executors as an obscure
    PythonException from range()/reshape instead of an immediate,
    self-explanatory error."""
    if frame_size < 1:
        raise ValueError(f"frame_size={frame_size}: must be >= 1")
    if stride < 1:
        raise ValueError(f"stride={stride}: must be >= 1")


def frame_phash(
    df: DataFrame,
    bin_col: str,
    id_col: str,
    frame_size: int = 64,
    stride: int = 1,
    bits: int = 60,
) -> DataFrame:
    """(id, frame_no, phash): per-frame perceptual fingerprint — the
    video-dedup building block (shot fingerprinting): every
    ``stride``-th full ``frame_size``-byte window gets the SAME
    blockhash signature contract as :func:`phash_images`, applied to
    the window bytes (a real video path decodes the frame and aHashes
    the pixels in the same slot). 1 → N fan-out inside mapInPandas,
    partition-preserving, no shuffle; trailing partial windows are
    never hashed (the :func:`sample_frames` full-frame convention), so
    the per-window length is constant and the oracle replay needs no
    ragged-tail arithmetic.

    Vectorized per BLOB, not per window: one reshape to
    (n_frames, frame_size), block sums as one indicator matmul, the
    strict-greater threshold and the bit-weight matmul batched over
    every sampled frame at once — no per-window Python (the
    audio_pcm_stats convention; the scalar :func:`_fake_phash` is the
    pinned reference the unit test replays per window)."""
    import numpy as np
    import pandas as pd

    _validate_bits(bits, "banding/XOR")
    _validate_window(frame_size, stride)
    bin_name, id_name = bin_col, id_col
    # per-window constants: block index per within-frame offset, the
    # (frame_size × bits) block-membership indicator, bit weights
    blk = (np.arange(frame_size, dtype=np.int64) * bits) // frame_size
    ind = np.zeros((frame_size, bits), dtype=np.int64)
    ind[np.arange(frame_size), blk] = 1
    cnts = ind.sum(axis=0)
    weights = (np.int64(1) << np.arange(bits, dtype=np.int64))

    def _hash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_id, out_no, out_ph = [], [], []
            for rid, raw in zip(pdf[id_name], pdf[bin_name]):
                data = bytes(raw) if raw is not None else b""
                usable = (len(data) // frame_size) * frame_size
                if not usable:
                    continue
                mat = (
                    np.frombuffer(data[:usable], dtype=np.uint8)
                    .astype(np.int64)
                    .reshape(-1, frame_size)
                )[::stride]
                sums = mat @ ind  # n_sampled × bits
                tot = mat.sum(axis=1, keepdims=True)
                on = sums * frame_size > tot * cnts
                phs = on.astype(np.int64) @ weights
                frame_nos = np.arange(0, usable // frame_size, stride)
                out_id.extend([rid] * len(phs))
                out_no.extend(frame_nos.tolist())
                out_ph.extend(phs.tolist())
            yield pd.DataFrame(
                {
                    "id": pd.Series(out_id, dtype="int64"),
                    "frame_no": pd.Series(out_no, dtype="int32"),
                    "phash": pd.Series(out_ph, dtype="int64"),
                }
            )

    return df.select(F.col(id_col), F.col(bin_col)).mapInPandas(
        _hash, FRAME_PHASH_SCHEMA
    )


def video_near_dup(
    df: DataFrame,
    bin_col: str,
    id_col: str,
    frame_size: int = 64,
    stride: int = 1,
    bits: int = 60,
    min_shared: int = 2,
    max_postings: int = 64,
) -> DataFrame:
    """(id_a, id_b, n_shared): video-style near-duplicate pairs — two
    blobs pair when they share at least ``min_shared`` distinct frame
    fingerprints (the standard shot-fingerprint dedup: a re-containered
    or trimmed copy keeps most frame windows byte-identical even when
    whole-file digests differ). One fan-out signature pass
    (:func:`frame_phash`), distinct (id, phash), then an exact
    equi-join on the signature with a posting cap: fingerprints shared
    by more than ``max_postings`` blobs are dropped BEFORE the join
    (the minhash_lsh_pairs convention — a degenerate constant frame,
    e.g. zero-padding, would otherwise make one bucket quadratic).
    Shuffles on the signature value; never all-pairs."""
    sigs = (
        frame_phash(df, bin_col, id_col, frame_size, stride, bits)
        .select("id", "phash")
        .distinct()
        .persist()
    )
    # the HOT set (signatures over the cap) is tiny by construction —
    # broadcast anti-join it out (the minhash_lsh_pairs shape,
    # dedup.py), never an inner join against the corpus-proportional
    # keep side, which would add a full corpus-sized shuffle
    hot = (
        sigs.groupBy("phash")
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") > max_postings)
        .select("phash")
    )
    s = sigs.join(F.broadcast(hot), "phash", "left_anti")
    pairs = (
        s.alias("x")
        .join(s.alias("y"), "phash")
        .filter(F.col("x.id") < F.col("y.id"))
        .groupBy(
            F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )
    from batch_process_dpla_index_spark.operators.dedup import _with_cached_deps

    return _with_cached_deps(pairs, [sigs])


AUDIO_SCHEMA = (
    "id bigint, n_samples bigint, peak int, zero_crossings bigint, rms double"
)


def audio_pcm_stats(df: DataFrame, bin_col: str, id_col: str) -> DataFrame:
    """(id, n_samples, peak, zero_crossings, rms): waveform statistics
    treating the blob as 16-bit little-endian signed PCM — the audio
    leg of the multimodal family (image decode / video frames /
    audio waveform all share the Arrow mapInPandas plumbing; a real
    deployment puts a codec in front and feeds the decoded PCM through
    the same arithmetic). Vectorized: one ``np.frombuffer('<i2')``
    view per blob, no per-sample Python.

    Contract (integer-exact, mirrored by the DuckDB oracle):
      sample_j = signed LE int16 at bytes [2j, 2j+2); a trailing odd
      byte is ignored; peak = max(|s|) (0 when no samples);
      zero_crossings = count of j >= 1 where (s_j >= 0) differs from
      (s_{j-1} >= 0); rms = round(sqrt(sum(s²)/n), 6), 0.0 when empty
      — the sum of squares is exact in int64 up to ~8.5e9 samples
      (~17 GB per blob), far past any single-row blob. The round-6 is
      applied JVM-side (F.round, the repo's scalar convention that the
      DuckDB oracles' round() is already proven against) — a Python
      round() in the worker would be half-to-even and could diverge
      from the oracle by one ulp at a .5e-6 boundary."""
    import numpy as np
    import pandas as pd

    bin_name, id_name = bin_col, id_col

    def _stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import math

        for pdf in batches:
            n_l, pk_l, zc_l, rms_l = [], [], [], []
            for raw in pdf[bin_name]:
                data = bytes(raw) if raw is not None else b""
                s = np.frombuffer(
                    data[: 2 * (len(data) // 2)], dtype="<i2"
                ).astype(np.int64)
                n = int(s.size)
                if n:
                    peak = int(np.abs(s).max())
                    nonneg = s >= 0
                    zc = int(np.count_nonzero(nonneg[1:] != nonneg[:-1]))
                    rms = math.sqrt(int((s * s).sum()) / n)
                else:
                    peak, zc, rms = 0, 0, 0.0
                n_l.append(n)
                pk_l.append(peak)
                zc_l.append(zc)
                rms_l.append(rms)
            yield pd.DataFrame(
                {
                    "id": pdf[id_name].to_numpy(),
                    "n_samples": pd.Series(n_l, dtype="int64"),
                    "peak": pd.Series(pk_l, dtype="int32"),
                    "zero_crossings": pd.Series(zc_l, dtype="int64"),
                    "rms": pd.Series(rms_l, dtype="float64"),
                }
            )

    return df.select(F.col(id_col), F.col(bin_col)).mapInPandas(
        _stats, AUDIO_SCHEMA
    ).withColumn("rms", F.round("rms", 6))


FRAME_SCHEMA = "id bigint, frame_no int, offset bigint, frame_digest string"


def sample_frames(
    df: DataFrame, bin_col: str, id_col: str, frame_size: int = 256, stride: int = 4
) -> DataFrame:
    """Video-style frame sampling: every ``stride``-th ``frame_size``
    byte window becomes one output row (1 → N fan-out inside
    mapInPandas; a real codec would emit decoded frames the same way)."""
    import hashlib

    import pandas as pd

    _validate_window(frame_size, stride)

    bin_name, id_name = bin_col, id_col

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_id, out_no, out_off, out_dig = [], [], [], []
            for rid, raw in zip(pdf[id_name], pdf[bin_name]):
                data = bytes(raw) if raw is not None else b""
                n_frames = max(0, len(data) // frame_size)
                for frame_no in range(0, n_frames, stride):
                    off = frame_no * frame_size
                    chunk = data[off : off + frame_size]
                    out_id.append(rid)
                    out_no.append(frame_no)
                    out_off.append(off)
                    out_dig.append(hashlib.md5(chunk).hexdigest())
            yield pd.DataFrame(
                {
                    "id": pd.Series(out_id, dtype="int64"),
                    "frame_no": pd.Series(out_no, dtype="int32"),
                    "offset": pd.Series(out_off, dtype="int64"),
                    "frame_digest": pd.Series(out_dig, dtype="object"),
                }
            )

    return df.select(F.col(id_col), F.col(bin_col)).mapInPandas(_frames, FRAME_SCHEMA)


AUDIO_PHASH_SCHEMA = "id bigint, phash bigint"


def audio_phash(
    df: DataFrame, bin_col: str, id_col: str, bits: int = 60
) -> DataFrame:
    """(id, phash): whole-clip energy-envelope fingerprint — the audio
    member of the blockhash family (image :func:`phash_images`, video
    :func:`frame_phash`). The blob decodes as 16-bit LE signed PCM
    under the EXACT :func:`audio_pcm_stats` contract (trailing odd
    byte ignored, NULL → empty), then the pinned blockhash arithmetic
    runs over the ABSOLUTE amplitudes:

      sample j belongs to block floor(j * bits / n);
      bit k = 1 iff block_sum_k(|s|) * n > total(|s|) * block_count_k

    — all-INTEGER (bit-exact cross-engine, DuckDB-replayable). Using
    |s| makes the fingerprint invariant under polarity inversion (a
    re-mastered clip with flipped waveform sign hashes identically —
    a real audio-dedup case byte-exact dedup misses) and under the
    trailing-pad-byte re-containering the decode contract already
    ignores. No samples → phash 0 (the empty contract shared with
    :func:`_fake_phash`; all-silence also → 0, ties never fire).

    int64-safe for clips under ~1.3e8 samples at 60 bits (~260 MB; the
    exact per-clip guard is 32768·n·(n//bits+1) < 2^63 — block sums
    are uniform under the blk formula, so the bound is bits-aware).
    Guarded loudly: a silent wraparound would flip bits with no
    cross-engine error. One partition-preserving Arrow pass, no
    shuffle."""
    import numpy as np
    import pandas as pd

    _validate_bits(bits, "banding/XOR")
    bin_name, id_name = bin_col, id_col

    def _one(data: bytes) -> int:
        s = np.frombuffer(data[: 2 * (len(data) // 2)], dtype="<i2")
        n = int(s.size)
        if n == 0:
            return 0
        # exact arbitrary-precision bound, not an approximate constant
        # (the round-14 review caught the first cut's 5e8 guard ~30x
        # too loose): blk spreads samples uniformly, so block sums and
        # counts are bounded by 32768*(n//bits+1) and n//bits+1 — both
        # threshold products stay under 32768*n*(n//bits+1). A silent
        # numpy int64 wraparound would flip signature bits with no
        # cross-engine error (the DuckDB oracle's sums never overflow).
        if 32768 * n * (n // bits + 1) >= 2**63:
            raise ValueError(
                f"clip of {n} samples exceeds the audio-phash "
                f"int64-safe bound for bits={bits} "
                "(32768*n*(n//bits+1) must stay under 2^63; ~1.3e8 "
                "samples at 60 bits); chunk or downsample the clip "
                "first"
            )
        a = np.abs(s.astype(np.int64))
        blk = (np.arange(n, dtype=np.int64) * bits) // n
        sums = np.bincount(blk, weights=a, minlength=bits).astype(np.int64)
        cnts = np.bincount(blk, minlength=bits).astype(np.int64)
        total = int(a.sum())
        on = np.nonzero(sums * n > total * cnts)[0]
        return int(sum(1 << int(k) for k in on))

    def _hash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            sigs = [
                _one(bytes(raw) if raw is not None else b"")
                for raw in pdf[bin_name]
            ]
            yield pd.DataFrame(
                {
                    "id": pdf[id_name].to_numpy(),
                    "phash": pd.Series(sigs, dtype="int64"),
                }
            )

    return df.select(F.col(id_col), F.col(bin_col)).mapInPandas(
        _hash, AUDIO_PHASH_SCHEMA
    )


def audio_near_dup(
    df: DataFrame,
    bin_col: str,
    id_col: str,
    bits: int = 60,
    max_hamming: int = 3,
) -> DataFrame:
    """(id_a, id_b, hamming): audio near-duplicate pairs over the blob
    column — completes the modality triangle (text SimHash / image
    phash / video frame-phash / audio envelope) through the SAME
    banded-Hamming kernel (``operators.dedup.banded_hamming_pairs``):
    pigeonhole band equi-join + exact popcount verify, shuffle bounded
    by (bands × clips), never all-pairs. The 100 TB plan is the proven
    simhash_pairs/image_near_dup shape with the signature source
    swapped for :func:`audio_phash`."""
    from batch_process_dpla_index_spark.operators.dedup import (
        _with_cached_deps,
        banded_hamming_pairs,
    )

    sig = audio_phash(df, bin_col, id_col, bits).persist()
    out = banded_hamming_pairs(sig, "id", "phash", bits, max_hamming)
    return _with_cached_deps(out, [sig])
