"""K7: multimodal column handling — opaque binary payloads + typed metadata.

The pattern (SURVEY.md §1.3): media lives as a ``BinaryType`` column next to
a ``StructType`` metadata column in the same table; decode / feature-extract
runs as Arrow-batched ``mapInPandas`` so bytes never round-trip through
Python row objects.

The fixtures carry no real media, so the *payload* here is the document's
UTF-8 bytes — the Spark-side plumbing (schema, batching, UDF signature,
partitioning) is real and oracle-checked; the media decode itself is a
clearly marked STUB (``decode_image_stub``) that falls back to a
deterministic fake when no imaging library exists in the environment.

Scale: payload columns dominate row size — at 100 TB keep them in their own
column (Parquet column pruning skips them unless projected), size
``spark.sql.files.maxPartitionBytes`` so a batch of payloads fits executor
memory, and never collect() payloads to the driver.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from daas_apps_spark.catalog import table
from daas_apps_spark.registry import register

FAKE_FEATURE_DIMS = 4


@register(
    "k7_binary_payload",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS payload_bytes,
           md5(text) AS payload_md5,
           lang AS meta_lang,
           source AS meta_source,
           CAST(n_chars AS BIGINT) AS meta_n_chars
    FROM documents
    """,
    tags=("K7",),
)
def k7_binary_payload(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload + struct metadata round-trip, digest-verified.

    Payload = utf-8 bytes of text (BinaryType); metadata = struct(lang,
    source, n_chars). Outputs are scalars extracted back out of the binary/
    struct columns so the oracle can verify the representation round-trips.
    """
    d = table(spark, sf_dir, "documents")
    enriched = d.select(
        "doc_id",
        F.encode("text", "utf-8").alias("payload"),
        F.struct("lang", "source", "n_chars").alias("meta"),
    )
    return enriched.select(
        "doc_id",
        F.length("payload").cast("long").alias("payload_bytes"),
        F.md5("payload").alias("payload_md5"),
        F.col("meta.lang").alias("meta_lang"),
        F.col("meta.source").alias("meta_source"),
        F.col("meta.n_chars").cast("long").alias("meta_n_chars"),
    )


def decode_image_stub(payload: bytes) -> dict:
    """STUB media decode: deterministic fake features from payload bytes.

    A real deployment would decode with PIL/torchvision/ffmpeg here; those
    libraries are absent in this environment, so the decode is a
    deterministic fake (first-bytes scaled to [0,1]) behind an import-try.
    The surrounding Spark plumbing — Arrow batches, schema, partitioning —
    is exactly what the real decoder would use.
    """
    try:  # pragma: no cover - imaging libs absent in this environment
        import PIL  # noqa: F401

        raise NotImplementedError(
            "real image decode not wired up: container lacks codecs; "
            "replace decode_image_stub with a PIL/ffmpeg decoder"
        )
    except ImportError:
        pass
    feats = [(payload[i] if i < len(payload) else 0) % 251 / 255.0 for i in range(FAKE_FEATURE_DIMS)]
    return {"byte_len": len(payload), "feats": feats}


@register(
    "k7_decode_features",
    oracle=f"""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
           {', '.join(
               f"ROUND((ascii(substring(text, {i + 1}, 1)) % 251) / 255.0, 6) AS f{i}"
               for i in range(FAKE_FEATURE_DIMS)
           )}
    FROM documents
    """,
    tags=("K7", "J4"),
)
def k7_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas feature extraction over binary payloads (decode stub).

    Arrow-batched iterator UDF — the J4 whole-partition transform shape
    (R2 analog): each pandas batch holds many payloads; the decoder maps
    bytes → fixed-width feature columns with an explicit output schema.
    """
    d = table(spark, sf_dir, "documents")
    src = d.select("doc_id", F.encode("text", "utf-8").alias("payload"))

    feat_cols = ", ".join(f"f{i} double" for i in range(FAKE_FEATURE_DIMS))
    out_schema = f"doc_id long, byte_len long, {feat_cols}"

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [decode_image_stub(p) for p in pdf["payload"]]
            out = {
                "doc_id": pdf["doc_id"].values,
                "byte_len": [d_["byte_len"] for d_ in decoded],
            }
            for i in range(FAKE_FEATURE_DIMS):
                out[f"f{i}"] = [round(d_["feats"][i], 6) for d_ in decoded]
            yield pd.DataFrame(out)

    return src.mapInPandas(extract, schema=out_schema)
