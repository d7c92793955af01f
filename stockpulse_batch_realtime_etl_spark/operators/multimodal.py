"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The idiomatic Spark shape for image/audio/video at 100 TB:

* the payload is a ``binary`` column (never a path the executor re-fetches
  row-at-a-time; never a driver-side bytes list),
* decode / feature-extract / resize / frame-sample run inside Arrow-batched
  ``mapInPandas`` — bytes stay in the executor, transferred Python↔JVM in
  columnar Arrow batches,
* outputs are typed columns, so everything downstream is ordinary Catalyst.

The real codec calls (PIL / soundfile / av) are STUBBED — the libraries are
absent in this container — behind ``try: import``; what IS real and tested
is the plumbing: schema handling, batch iteration, deterministic features
from the raw bytes (length + md5 + md5-derived pseudo-dimensions), and a
byte-range "frame sample".  ``extract_features`` is oracle-checked end-to-
end (the md5 arithmetic is replayed in DuckDB SQL).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "asset_id long, media_type string, byte_len long, content_md5 string, "
    "width int, height int, duration_ms int"
)

_MEDIA_TYPES = ("image", "audio", "video")


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic media-asset table derived from ``documents``: the text
    bytes play the role of an encoded payload (schemas.MEDIA_ASSET_SCHEMA)."""
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        F.element_at(
            F.array(*[F.lit(m) for m in _MEDIA_TYPES]),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("media_type"),
        F.col("text").cast("binary").alias("content"),
        F.create_map(
            F.lit("lang"), F.col("lang"), F.lit("source"), F.col("source")
        ).alias("meta"),
    )


def _try_real_decode(media_type: str, payload: bytes):
    """Real codec path — stubbed: the decode libraries are not available in
    this environment.  Kept as the single seam where PIL/soundfile/av plug
    in; everything around it is production-shaped."""
    if media_type == "image":
        try:
            import PIL.Image  # noqa: F401
        except ImportError:
            raise NotImplementedError("image decode requires Pillow")
    raise NotImplementedError(f"real decode not available for {media_type}")


def _fake_dims(h: str) -> tuple[int, int]:
    """Deterministic pseudo width/height from the first 4 md5 nibbles."""
    return (
        64 + int(h[0], 16) * 16 + int(h[1], 16),
        64 + int(h[2], 16) * 16 + int(h[3], 16),
    )


def extract_features(media: DataFrame) -> DataFrame:
    """Per-asset features via Arrow-batched ``mapInPandas``.

    The pandas iterator shape is the production contract: each batch is a
    zero-copy Arrow block; features are computed columnar-ly per batch with
    no per-row Python except the byte hashing itself (which is the work).
    """
    import pandas as pd

    def features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hashes = pdf["content"].map(
                lambda b: hashlib.md5(bytes(b)).hexdigest()
            )
            dims = hashes.map(_fake_dims)
            is_img = pdf["media_type"] == "image"
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "media_type": pdf["media_type"],
                    "byte_len": pdf["content"].map(len).astype("int64"),
                    "content_md5": hashes,
                    "width": [d[0] if i else None for d, i in zip(dims, is_img)],
                    "height": [d[1] if i else None for d, i in zip(dims, is_img)],
                    "duration_ms": [
                        None if i else 1000 + int(h[:4], 16)
                        for h, i in zip(hashes, is_img)
                    ],
                }
            )

    from stockpulse_batch_realtime_etl_spark.sources.tables import fan_out

    return fan_out(media).mapInPandas(features, FEATURE_SCHEMA)


def resize_images(media: DataFrame, max_px: int = 256) -> DataFrame:
    """Resize stub: passes payloads through ``mapInPandas`` unchanged but
    stamps the target size — the real implementation replaces the identity
    transform with a PIL resize inside the same batch loop."""
    import pandas as pd

    schema = "asset_id long, media_type string, content binary, target_px int"

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[pdf["media_type"] == "image"][
                ["asset_id", "media_type", "content"]
            ].copy()
            out["target_px"] = max_px  # real path: PIL.Image.thumbnail here
            yield out

    return media.mapInPandas(resize, schema)


def sample_frames(media: DataFrame, n_frames: int = 4) -> DataFrame:
    """Frame-sampling stub for video: emits ``n_frames`` evenly-spaced byte
    slices per asset (one output row per frame — the real implementation
    decodes actual frames with av inside the same loop).  Demonstrates the
    1→N explode shape of frame extraction under mapInPandas."""
    import pandas as pd

    schema = "asset_id long, frame_idx int, frame_bytes binary"

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vids = pdf[pdf["media_type"] == "video"]
            rows = []
            for aid, content in zip(vids["asset_id"], vids["content"]):
                b = bytes(content)
                step = max(1, len(b) // n_frames)
                for i in range(n_frames):
                    rows.append((aid, i, b[i * step : i * step + step]))
            yield pd.DataFrame(
                rows, columns=["asset_id", "frame_idx", "frame_bytes"]
            )

    return media.mapInPandas(frames, schema)
