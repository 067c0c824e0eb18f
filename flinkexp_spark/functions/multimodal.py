"""X5 multimodal columns: images/audio/video as opaque ``binary`` columns
with typed metadata, processed by Arrow-batched ``mapInPandas``
(SURVEY §2.3 X5).

No reference analog.  The decode step is STUBBED (this environment has no
image/audio codecs — see :func:`decode_image` / :func:`decode_audio` /
:func:`sample_frames`), but everything Spark-side is real and tested:
column schema (binary + metadata struct), Arrow batch transfer, the
mapInPandas iterator contract, and a deterministic fake feature extractor
whose output is oracle-checkable (md5-derived, so DuckDB reproduces it
exactly).

Scale notes: binary payloads ride in parquet as byte arrays; mapInPandas
streams Arrow batches (``spark.sql.execution.arrow.maxRecordsPerBatch``)
so executor memory is bounded by batch size x payload size, not partition
size.  Feature extraction is embarrassingly parallel — no shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FAKE_FEATURE_DIM = 4

MODALITY_MIME = {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}


def with_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach an opaque binary payload + typed metadata struct.

    (In production the payload IS the media file; here it is the utf-8
    bytes of ``text_col`` so fixtures stay self-contained.)
    """
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.withColumn("payload", payload).withColumn(
        "media_meta",
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.octet_length(payload).alias("n_bytes"),
        ),
    )


def extract_binary_metadata(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """mapInPandas pass over binary payloads -> (id, n_bytes, first_byte).

    The real plumbing for any decode stage: Arrow-batched iterator of
    pandas DataFrames, binary dtype in, typed rows out.
    """

    def scan(batches):
        # closure: pickled by value (see streaming/stateful.py module doc)
        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "first_byte": pdf["payload"].map(lambda b: b[0]).astype("int64"),
                }
            )

    return df.mapInPandas(scan, schema="doc_id long, n_bytes long, first_byte long")


def fake_feature_extract(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic stand-in for a neural feature extractor.

    feature_j = (md5-hash of (hex(md5(payload)), j) mod 1000) / 1000 — the
    same md5-int contract as functions/text.py, so the DuckDB oracle
    reproduces every value exactly.  Swap this body for a real model runner
    (ONNX/torch) in production; the Spark plumbing is identical.
    """

    def extract(batches):
        import hashlib

        import pandas as pd

        P = 2_147_483_647

        def feats(payload: bytes) -> list[float]:
            hx = hashlib.md5(payload).hexdigest()
            out = []
            for j in range(FAKE_FEATURE_DIM):
                h = int(hashlib.md5(f"{hx}-{j}".encode()).hexdigest()[:15], 16) % P
                out.append((h % 1000) / 1000.0)
            return out

        for pdf in batches:
            yield pd.DataFrame(
                {"doc_id": pdf[id_col], "features": pdf["payload"].map(feats)}
            )

    return df.mapInPandas(extract, schema="doc_id long, features array<double>")


FRAME_BYTES = 64  # fake "frame" stride for chunk_payload


def chunk_payload(df: DataFrame, id_col: str = "doc_id", every: int = FRAME_BYTES) -> DataFrame:
    """1 -> N frame-sampling plumbing: emit one row per ``every``-byte chunk
    of the payload (the video frame-sample shape, with byte windows standing
    in for decoded frames).

    Real pattern: a codec (pyav/ffmpeg) yields frames inside the same
    mapInPandas generator; here the chunking is deterministic so the DuckDB
    oracle reproduces row counts AND per-chunk contents exactly.
    """

    def chunks(batches):
        import pandas as pd

        for pdf in batches:
            ids, idxs, sizes, firsts = [], [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf["payload"]):
                for i in range(0, len(payload), every):
                    chunk = payload[i : i + every]
                    ids.append(doc_id)
                    idxs.append(i // every)
                    sizes.append(len(chunk))
                    firsts.append(chunk[0])
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int64"),
                    "frame_bytes": pd.Series(sizes, dtype="int64"),
                    "first_byte": pd.Series(firsts, dtype="int64"),
                }
            )

    return df.mapInPandas(
        chunks,
        schema="doc_id long, frame_idx long, frame_bytes long, first_byte long",
    )


# --- stubbed codecs (no media libraries in this environment) ---------------

def decode_image(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """STUB: decode image bytes -> (height, width, channels).

    Requires an image codec (PIL/opencv) — not available here.  The
    mapInPandas shape is identical to :func:`extract_binary_metadata`.
    """
    raise NotImplementedError(
        "image decode requires PIL/opencv; wire the codec into a mapInPandas "
        "closure exactly like extract_binary_metadata()"
    )


def decode_audio(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """STUB: decode audio bytes -> (sample_rate, n_samples, duration_s)."""
    raise NotImplementedError(
        "audio decode requires soundfile/librosa; wire the codec into a "
        "mapInPandas closure exactly like extract_binary_metadata()"
    )


def sample_frames(df: DataFrame, every_n: int = 30) -> DataFrame:
    """STUB: sample every-Nth video frame -> one row per sampled frame."""
    raise NotImplementedError(
        "video frame sampling requires ffmpeg/pyav; emit one row per frame "
        "from a mapInPandas closure (1->N rows is the UDTF shape, see "
        "catalog/udfs.py U2)"
    )
