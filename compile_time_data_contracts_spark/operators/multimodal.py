"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with a typed metadata
struct; decode / feature-extraction runs as Arrow-batched pandas
functions over ``mapInPandas`` so each batch crosses the JVM->Python
boundary once.  The actual codec step is STUBBED (no image/audio libs in
this environment): ``decode_stub=True`` produces a deterministic fake
feature row from the raw bytes, and ``decode_stub=False`` raises
NotImplementedError where a real decoder (PIL/librosa/ffmpeg) would be
called.  Everything around the stub — schema, batch iteration, partition
sizing — is real and tested.
"""

from __future__ import annotations

import typing

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["MEDIA_SCHEMA", "attach_fake_media", "extract_media_features", "extract_frame_samples", "extract_audio_windows", "extract_image_tiles"]

# the media envelope: opaque payload + typed metadata (SURVEY §2.2 Q52 +
# north-star multimodal requirement)
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("byte_len", T.IntegerType(), False),
        T.StructField("checksum", T.LongType(), False),
        T.StructField("fake_width", T.IntegerType(), False),
        T.StructField("fake_height", T.IntegerType(), False),
    ]
)


def attach_fake_media(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Wrap each document's text bytes as a fake 'image' payload so the
    binary-column plumbing can be exercised without real media files."""
    return df.withColumn(
        "media",
        F.struct(
            F.lit("image/fake").alias("media_type"),
            F.encode(F.col(text_col), "UTF-8").alias("payload"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
        ),
    )


def extract_media_features(
    df: DataFrame, id_col: str = "doc_id", decode_stub: bool = True
) -> DataFrame:
    """Arrow-batched feature extraction over the binary payload via
    mapInPandas.  Each pandas batch is processed vectorized; the decode
    step is a deterministic stub (byte length + additive checksum +
    derived fake dimensions)."""

    def extract(batches: typing.Iterator["pd.DataFrame"]) -> typing.Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError(
                    "real media decode requires PIL/librosa/ffmpeg; "
                    "run with decode_stub=True in this environment"
                )
            # a NULL media STRUCT arrives as None (not a dict with a null
            # payload) — treat both as an empty payload instead of
            # an opaque executor TypeError
            payloads = pdf["media"].map(
                lambda m: (m["payload"] if m else None) or b""
            )
            byte_len = payloads.map(len).astype("int32")
            # vectorized byte sum: numpy over the raw buffer, not a
            # per-byte Python loop — the payload is the data-sized side
            checksum = payloads.map(
                lambda b: int(np.frombuffer(b, dtype=np.uint8).sum(dtype=np.int64))
                % (1 << 31)
            ).astype("int64")
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "byte_len": byte_len,
                    "checksum": checksum,
                    "fake_width": (checksum % 640).astype("int32"),
                    "fake_height": (checksum % 480).astype("int32"),
                }
            )

    return df.select(id_col, "media").mapInPandas(extract, FEATURE_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("offset", T.IntegerType(), False),
        T.StructField("frame_md5", T.StringType(), False),
    ]
)


def extract_frame_samples(
    df: DataFrame,
    id_col: str = "doc_id",
    frame_bytes: int = 32,
    stride: int = 4,
    decode_stub: bool = True,
) -> DataFrame:
    """Strided frame sampling over the binary payload — the video
    keyframe-extraction batch shape: treat the payload as a sequence
    of fixed-size ``frame_bytes`` blocks and emit every ``stride``-th
    block's (index, byte offset, md5) via Arrow-batched mapInPandas.
    The md5-of-slice stands in for the real per-frame decode (a
    deterministic, ENGINE-PORTABLE digest, so the DuckDB oracle can
    replay byte-exact frame identities with substring+md5 — unlike the
    q52/q62 checksum stub this one is cross-checkable per frame).
    ``decode_stub=False`` raises where a real frame decoder (ffmpeg)
    would run, the multimodal.py env contract.

    Scale shape: each batch crosses the JVM→Python boundary ONCE
    (Arrow), the per-doc loop is bounded by payload_size/
    (frame_bytes·stride), and output rows carry 16-byte digests —
    never the frames themselves.  Trailing partial blocks are
    dropped (a real sampler emits only whole frames).
    """

    def extract(
        batches: typing.Iterator["pd.DataFrame"],
    ) -> typing.Iterator["pd.DataFrame"]:
        import hashlib

        import pandas as pd

        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError(
                    "real frame decode requires ffmpeg; run with "
                    "decode_stub=True in this environment"
                )
            ids, idxs, offs, digests = [], [], [], []
            for did, m in zip(pdf[id_col], pdf["media"]):
                payload = (m["payload"] if m else None) or b""
                n_frames = len(payload) // frame_bytes
                for fi in range(0, n_frames, stride):
                    off = fi * frame_bytes
                    ids.append(int(did))
                    idxs.append(fi)
                    offs.append(off)
                    digests.append(
                        hashlib.md5(
                            payload[off : off + frame_bytes]
                        ).hexdigest()
                    )
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "offset": pd.Series(offs, dtype="int32"),
                    "frame_md5": pd.Series(digests, dtype="object"),
                }
            )

    return df.select(id_col, "media").mapInPandas(extract, FRAME_SCHEMA)


AUDIO_WINDOW_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("win_idx", T.IntegerType(), False),
        T.StructField("offset", T.IntegerType(), False),
        T.StructField("digest", T.StringType(), False),
        T.StructField("energy", T.LongType(), False),
    ]
)


def extract_audio_windows(
    df: DataFrame,
    id_col: str = "doc_id",
    window_bytes: int = 64,
    hop_bytes: int = 32,
    decode_stub: bool = True,
) -> DataFrame:
    """OVERLAPPING window extraction over the binary payload — the
    audio STFT/feature-frame batch shape (vs :func:`
    extract_frame_samples`' disjoint strided video keyframes): windows
    of ``window_bytes`` advance by ``hop_bytes`` (hop < window =
    overlap, the standard 50%-overlap analysis frame), each emitting
    (index, offset, md5 digest, integer energy = byte sum).  The
    digest and the byte-sum energy are both deterministic and
    ENGINE-PORTABLE (md5 + per-byte ord sum replay in ANSI SQL), so
    unlike the q52/q62 checksum stub every output cell is
    oracle-checkable.  ``decode_stub=False`` raises where a real
    decoder (librosa/ffmpeg) would run — the multimodal.py env
    contract.

    Scale shape: one Arrow crossing per batch; per-doc work is
    payload_size/hop windows; output carries 16-byte digests and
    longs, never samples.  Trailing partial windows are dropped.
    """
    if hop_bytes <= 0 or window_bytes <= 0:
        raise ValueError("window_bytes and hop_bytes must be positive")

    def extract(
        batches: typing.Iterator["pd.DataFrame"],
    ) -> typing.Iterator["pd.DataFrame"]:
        import hashlib

        import numpy as np
        import pandas as pd

        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError(
                    "real audio decode requires librosa/ffmpeg; run "
                    "with decode_stub=True in this environment"
                )
            ids, idxs, offs, digs, eners = [], [], [], [], []
            for did, m in zip(pdf[id_col], pdf["media"]):
                payload = (m["payload"] if m else None) or b""
                arr = np.frombuffer(payload, dtype=np.uint8)
                wi = 0
                off = 0
                while off + window_bytes <= len(payload):
                    sl = payload[off : off + window_bytes]
                    ids.append(int(did))
                    idxs.append(wi)
                    offs.append(off)
                    digs.append(hashlib.md5(sl).hexdigest())
                    eners.append(
                        int(
                            arr[off : off + window_bytes].sum(
                                dtype=np.int64
                            )
                        )
                    )
                    wi += 1
                    off += hop_bytes
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "win_idx": pd.Series(idxs, dtype="int32"),
                    "offset": pd.Series(offs, dtype="int32"),
                    "digest": pd.Series(digs, dtype="object"),
                    "energy": pd.Series(eners, dtype="int64"),
                }
            )

    return df.select(id_col, "media").mapInPandas(
        extract, AUDIO_WINDOW_SCHEMA
    )


IMAGE_TILE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("tile_row", T.IntegerType(), False),
        T.StructField("tile_col", T.IntegerType(), False),
        T.StructField("digest", T.StringType(), False),
        T.StructField("energy", T.LongType(), False),
    ]
)


def extract_image_tiles(
    df: DataFrame,
    id_col: str = "doc_id",
    width: int = 32,
    tile_h: int = 16,
    tile_w: int = 16,
    decode_stub: bool = True,
) -> DataFrame:
    """2D TILE extraction over the binary payload — the image-patch
    batch shape (ViT patches, thumbnail grids) completing the 1D
    strided (:func:`extract_frame_samples`) and 1D overlapping
    (:func:`extract_audio_windows`) multimodal family: the payload is
    a row-major ``width``-wide byte image, each full ``tile_h x
    tile_w`` tile emits (row, col, md5 digest of the tile's
    concatenated row-slices, integer byte-sum energy).  Both output
    cells replay in ANSI SQL (substring arithmetic + md5 + ord sums),
    so the whole Python boundary is value-checked, not just
    row-counted.  Partial edge tiles are dropped (the resize/pad
    decision belongs to the real decoder, stubbed per the
    multimodal.py env contract).

    Scale shape: one Arrow crossing; per-doc work is (H/th)*(W/tw)
    tiles; output carries 16-byte digests and longs, never pixels.
    """
    if width <= 0 or tile_h <= 0 or tile_w <= 0:
        raise ValueError("width and tile dims must be positive")
    if width % tile_w != 0:
        raise ValueError("width must be a multiple of tile_w")

    def extract(
        batches: typing.Iterator["pd.DataFrame"],
    ) -> typing.Iterator["pd.DataFrame"]:
        import hashlib

        import numpy as np
        import pandas as pd

        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError(
                    "real image decode requires PIL/opencv; run "
                    "with decode_stub=True in this environment"
                )
            ids, trs, tcs, digs, eners = [], [], [], [], []
            for did, m in zip(pdf[id_col], pdf["media"]):
                payload = (m["payload"] if m else None) or b""
                h = len(payload) // width
                arr = np.frombuffer(
                    payload[: h * width], dtype=np.uint8
                ).reshape(h, width) if h else None
                for tr in range(h // tile_h):
                    for tc in range(width // tile_w):
                        tile = arr[
                            tr * tile_h : (tr + 1) * tile_h,
                            tc * tile_w : (tc + 1) * tile_w,
                        ]
                        ids.append(int(did))
                        trs.append(tr)
                        tcs.append(tc)
                        digs.append(
                            hashlib.md5(tile.tobytes()).hexdigest()
                        )
                        eners.append(int(tile.sum(dtype=np.int64)))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "tile_row": pd.Series(trs, dtype="int32"),
                    "tile_col": pd.Series(tcs, dtype="int32"),
                    "digest": pd.Series(digs, dtype="object"),
                    "energy": pd.Series(eners, dtype="int64"),
                }
            )

    return df.select(id_col, "media").mapInPandas(
        extract, IMAGE_TILE_SCHEMA
    )
