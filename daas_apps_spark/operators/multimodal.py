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


RESIZE_BYTES = 256  # target payload budget for the resize stand-in
FRAME_BYTES = 64  # fixed frame width for the frame-sample stand-in
FRAME_STRIDE = 4  # keep every 4th frame


@register(
    "k7_resize_payload",
    oracle=f"""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS orig_bytes,
           CAST(octet_length(encode(substring(text, 1, {RESIZE_BYTES}))) AS BIGINT)
               AS resized_bytes,
           md5(substring(text, 1, {RESIZE_BYTES})) AS resized_md5
    FROM documents
    """,
    tags=("K7",),
)
def k7_resize_payload(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize stand-in: truncate each binary payload to a byte budget.

    A real resize decodes pixels and re-encodes (stubbed out — no codecs in
    this container); the engine-relevant part is byte-level binary column
    surgery staying JVM-side: ``substring``/``md5`` run directly on
    BinaryType, no Python. The oracle mirrors via VARCHAR slicing, valid
    because the fixture text is pure ASCII (byte offset == char offset).
    """
    d = table(spark, sf_dir, "documents")
    payload = F.encode("text", "utf-8")
    resized = F.expr(f"substring(encode(text, 'utf-8'), 1, {RESIZE_BYTES})")
    return d.select(
        "doc_id",
        F.length(payload).cast("long").alias("orig_bytes"),
        F.length(resized).cast("long").alias("resized_bytes"),
        F.md5(resized).alias("resized_md5"),
    )


@register(
    "k7_frame_sample",
    oracle=f"""
    WITH frames AS (
        SELECT doc_id, text,
               unnest(range(0, CAST(ceil(octet_length(encode(text)) / {FRAME_BYTES}.0)
                                    AS BIGINT), {FRAME_STRIDE})) AS frame_idx
        FROM documents WHERE length(text) > 0
    )
    SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx,
           CAST(octet_length(encode(substring(text, frame_idx * {FRAME_BYTES} + 1,
                                              {FRAME_BYTES}))) AS BIGINT) AS frame_bytes,
           md5(substring(text, frame_idx * {FRAME_BYTES} + 1, {FRAME_BYTES}))
               AS frame_md5
    FROM frames
    """,
    tags=("K7", "J4"),
)
def k7_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sample stand-in: strided fixed-width frames from a binary payload.

    Models video frame sampling over an opaque payload: the payload splits
    into FRAME_BYTES-wide frames, every FRAME_STRIDE-th frame is kept, and
    each sampled frame is emitted as its own row with a digest — the
    explode-per-frame shape a real ffmpeg-backed sampler would produce, all
    in JVM expressions (sequence + explode + binary substring).
    """
    d = table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    n_frames = F.ceil(F.length(F.encode("text", "utf-8")) / F.lit(FRAME_BYTES))
    return (
        d.select(
            "doc_id",
            F.col("text"),
            F.explode(
                F.sequence(F.lit(0).cast("long"), (n_frames - 1).cast("long"), F.lit(FRAME_STRIDE).cast("long"))
            ).alias("frame_idx"),
        )
        .select(
            "doc_id",
            "frame_idx",
            F.length(
                F.expr(f"substring(encode(text, 'utf-8'), cast(frame_idx * {FRAME_BYTES} + 1 as int), {FRAME_BYTES})")
            ).cast("long").alias("frame_bytes"),
            F.md5(
                F.expr(f"substring(encode(text, 'utf-8'), cast(frame_idx * {FRAME_BYTES} + 1 as int), {FRAME_BYTES})")
            ).alias("frame_md5"),
        )
    )


def _k7_ppm_oracle() -> str:
    """Closed-form per-channel means of the synthetic PPM pixel field:
    channel value at pixel p is (7*doc_id + 3*p + c) % 256."""
    return """
    WITH dims AS (
        SELECT doc_id,
               4 + doc_id % 5 AS w,
               3 + doc_id % 4 AS h
        FROM documents WHERE doc_id < 60
    ),
    px AS (
        SELECT doc_id, w, h, t.p
        FROM dims, unnest(range(w * h)) AS t(p)
    )
    SELECT doc_id,
           CAST(MAX(w) AS INTEGER) AS width,
           CAST(MAX(h) AS INTEGER) AS height,
           CAST(SUM((7 * doc_id + 3 * p + 0) % 256) AS DOUBLE)
               / (MAX(w) * MAX(h)) AS mean_r,
           CAST(SUM((7 * doc_id + 3 * p + 1) % 256) AS DOUBLE)
               / (MAX(w) * MAX(h)) AS mean_g,
           CAST(SUM((7 * doc_id + 3 * p + 2) % 256) AS DOUBLE)
               / (MAX(w) * MAX(h)) AS mean_b
    FROM px GROUP BY doc_id
    """


@register(
    "k7_ppm_decode",
    oracle=_k7_ppm_oracle(),
    tags=("K7", "J4", "A10"),
)
def k7_ppm_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A REAL image codec through the multimodal plumbing — no stub: each
    row synthesizes a valid binary P6 PPM (header + RGB24 raster, the
    format's actual wire layout), and a second `mapInPandas` pass parses
    the header, `numpy.frombuffer`s the raster, reshapes to (h, w, 3),
    and reduces per-channel means — exactly the decode→feature shape a
    JPEG/PNG pipeline runs, executed end-to-end because PPM needs no
    codec library. The oracle recomputes the channel means in closed
    form from the pixel formula, so the check spans synthesis, byte
    layout, parsing, and reduction.

    The deterministic pixel field ((7·doc_id + 3·p + c) mod 256) makes
    the binary a pure content function — any batching or partitioning
    yields identical images, the K9 rule applied to synthesized media.

    Scale: both passes are Arrow-batched iterator UDFs over opaque
    binary — the payload never leaves the executor; per-row memory is
    one image. Real corpora would ingest payloads via A10 binaryFile
    instead of synthesizing them; everything after the scan is
    identical.
    """
    import numpy as np

    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 60)
    src = d.select("doc_id")

    def encode_ppm(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                w = 4 + int(doc_id) % 5
                h = 3 + int(doc_id) % 4
                p = np.arange(w * h, dtype=np.int64)
                rast = np.empty((w * h, 3), dtype=np.uint8)
                for c in range(3):
                    rast[:, c] = (7 * int(doc_id) + 3 * p + c) % 256
                payloads.append(
                    f"P6\n{w} {h}\n255\n".encode("ascii") + rast.tobytes()
                )
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "ppm": payloads})

    images = src.mapInPandas(encode_ppm, schema="doc_id long, ppm binary")

    def decode_ppm(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {
                "doc_id": [], "width": [], "height": [],
                "mean_r": [], "mean_g": [], "mean_b": [],
            }
            for doc_id, blob in zip(pdf["doc_id"], pdf["ppm"]):
                raw = bytes(blob)
                # P6 header: magic \n "w h" \n maxval \n raster
                magic, wh, maxv, raster = raw.split(b"\n", 3)
                assert magic == b"P6" and maxv == b"255"
                w, h = (int(x) for x in wh.split())
                img = np.frombuffer(raster, dtype=np.uint8).reshape(h * w, 3)
                rows["doc_id"].append(int(doc_id))
                rows["width"].append(w)
                rows["height"].append(h)
                # exact integer sums / n -> one IEEE division per channel
                for i, name in enumerate(("mean_r", "mean_g", "mean_b")):
                    rows[name].append(
                        float(img[:, i].astype(np.int64).sum()) / (w * h)
                    )
            yield pd.DataFrame(rows)

    return images.mapInPandas(
        decode_ppm,
        schema=(
            "doc_id long, width int, height int, "
            "mean_r double, mean_g double, mean_b double"
        ),
    )


def _k7_wav_oracle() -> str:
    """Closed-form features of the synthetic PCM16 waveform:
    sample s of doc d is ((7*d + 13*s) % 2001) - 1000."""
    return """
    WITH dims AS (
        SELECT doc_id, 100 + doc_id % 50 AS n
        FROM documents WHERE doc_id < 60
    ),
    smp AS (
        SELECT doc_id, n, t.s,
               (7 * doc_id + 13 * t.s) % 2001 - 1000 AS v
        FROM dims, unnest(range(n)) AS t(s)
    ),
    lagged AS (
        SELECT doc_id, n, s, v,
               LAG(v) OVER (PARTITION BY doc_id ORDER BY s) AS pv
        FROM smp
    )
    SELECT doc_id,
           CAST(MAX(n) AS INTEGER) AS n_samples,
           CAST(MIN(v) AS INTEGER) AS v_min,
           CAST(MAX(v) AS INTEGER) AS v_max,
           CAST(SUM(v) AS BIGINT) AS v_sum,
           CAST(COUNT(CASE WHEN pv IS NOT NULL AND v * pv < 0 THEN 1 END)
                AS BIGINT) AS zero_crossings
    FROM lagged GROUP BY doc_id
    """


@register(
    "k7_wav_decode",
    oracle=_k7_wav_oracle(),
    tags=("K7", "J4", "A10"),
)
def k7_wav_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A REAL audio codec through the same plumbing as k7_ppm_decode:
    each row synthesizes a valid RIFF/WAVE file (fmt chunk: PCM, mono,
    8 kHz, 16-bit; data chunk: little-endian int16 samples), and the
    decode pass walks the chunk structure — finds the `data` chunk by
    tag, not by offset assumption — `numpy.frombuffer`s the PCM, and
    reduces to waveform features (extrema, exact sum, zero-crossing
    count, the cheap VAD-ish signals). With PPM (image) and the strided
    frame sampler (video), all three declared media modalities now have
    a working parse path; only entropy-coded formats (JPEG/MP3) remain
    stubbed, by container constraint.

    The sample field ((7·doc_id + 13·s) mod 2001 − 1000) is a pure
    content function — same K9 determinism rule as the PPM pixels — and
    the oracle re-derives every feature in closed form, so the check
    spans synthesis, RIFF layout, chunk walking, endianness, and
    reduction (a byte-order bug flips v_sum's sign pattern instantly).
    """
    import struct

    import numpy as np

    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 60)
    src = d.select("doc_id")

    def encode_wav(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                n = 100 + int(doc_id) % 50
                s = np.arange(n, dtype=np.int64)
                v = ((7 * int(doc_id) + 13 * s) % 2001 - 1000).astype("<i2")
                data = v.tobytes()
                fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
                chunks = (
                    b"WAVE"
                    + b"fmt " + struct.pack("<I", len(fmt)) + fmt
                    + b"data" + struct.pack("<I", len(data)) + data
                )
                payloads.append(
                    b"RIFF" + struct.pack("<I", len(chunks)) + chunks
                )
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "wav": payloads})

    waves = src.mapInPandas(encode_wav, schema="doc_id long, wav binary")

    def decode_wav(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {
                "doc_id": [], "n_samples": [], "v_min": [], "v_max": [],
                "v_sum": [], "zero_crossings": [],
            }
            for doc_id, blob in zip(pdf["doc_id"], pdf["wav"]):
                raw = bytes(blob)
                assert raw[:4] == b"RIFF" and raw[8:12] == b"WAVE"
                # walk chunks: [tag(4)][size(4)][payload(size)]...
                off, data = 12, None
                while off + 8 <= len(raw):
                    tag = raw[off : off + 4]
                    (size,) = struct.unpack_from("<I", raw, off + 4)
                    if tag == b"data":
                        data = raw[off + 8 : off + 8 + size]
                        break
                    off += 8 + size
                assert data is not None, "no data chunk"
                v = np.frombuffer(data, dtype="<i2").astype(np.int64)
                rows["doc_id"].append(int(doc_id))
                rows["n_samples"].append(len(v))
                rows["v_min"].append(int(v.min()))
                rows["v_max"].append(int(v.max()))
                rows["v_sum"].append(int(v.sum()))
                rows["zero_crossings"].append(int(((v[1:] * v[:-1]) < 0).sum()))
            yield pd.DataFrame(rows)

    return waves.mapInPandas(
        decode_wav,
        schema=(
            "doc_id long, n_samples int, v_min int, v_max int, "
            "v_sum long, zero_crossings long"
        ),
    )


def _k7_bmp_oracle() -> str:
    """Closed-form features of the synthetic BMP pixel field: logical RGB
    channel c of pixel p (row-major, top-down) is (11*doc_id + 5*p + c)
    % 256. top_row_sum covers the rows p < w — in the FILE those are the
    LAST stored row (BMP rasters are bottom-up), so a decoder that skips
    the vertical flip fails this column even though the means (row-order
    invariant) still agree."""
    return """
    WITH dims AS (
        SELECT doc_id,
               4 + doc_id % 5 AS w,
               3 + doc_id % 4 AS h
        FROM documents WHERE doc_id < 60
    ),
    px AS (
        SELECT doc_id, w, h, t.p
        FROM dims, unnest(range(w * h)) AS t(p)
    )
    SELECT doc_id,
           CAST(MAX(w) AS INTEGER) AS width,
           CAST(MAX(h) AS INTEGER) AS height,
           CAST(SUM((11 * doc_id + 5 * p + 0) % 256) AS DOUBLE)
               / (MAX(w) * MAX(h)) AS mean_r,
           CAST(SUM((11 * doc_id + 5 * p + 1) % 256) AS DOUBLE)
               / (MAX(w) * MAX(h)) AS mean_g,
           CAST(SUM((11 * doc_id + 5 * p + 2) % 256) AS DOUBLE)
               / (MAX(w) * MAX(h)) AS mean_b,
           CAST(SUM(CASE WHEN p < w THEN
                 (11 * doc_id + 5 * p + 0) % 256
               + (11 * doc_id + 5 * p + 1) % 256
               + (11 * doc_id + 5 * p + 2) % 256
             ELSE 0 END) AS BIGINT) AS top_row_sum
    FROM px GROUP BY doc_id
    """


@register(
    "k7_bmp_decode",
    oracle=_k7_bmp_oracle(),
    tags=("K7", "J4", "A10"),
)
def k7_bmp_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A SECOND real image codec through the multimodal plumbing: each row
    synthesizes a valid 24-bit uncompressed BMP — 14-byte file header,
    40-byte BITMAPINFOHEADER, then the raster stored BOTTOM-UP in BGR
    order with every row zero-padded to a 4-byte boundary — and a second
    ``mapInPandas`` pass parses the headers with ``struct``, strips the
    per-row padding, flips the rows, swaps BGR back to RGB, and reduces
    to per-channel means plus a top-row checksum.

    Where PPM (k7_ppm_decode) exercises a text-header + packed-RGB
    format, BMP adds the three wire-format hazards codec code actually
    trips on: row padding (widths here make the pad 0-3 bytes across
    docs, so a stride bug breaks the reshape), bottom-up row order
    (caught by ``top_row_sum``, which the oracle computes over the
    LOGICAL top row), and BGR channel order (caught by mean_r/mean_b,
    which differ by construction). Still pure stdlib + numpy — no codec
    library, nothing stubbed.

    The deterministic pixel field ((11·doc_id + 5·p + c) mod 256) keeps
    the binary a pure content function — the K9 determinism rule — and
    the oracle recomputes every feature in closed form, so the check
    spans synthesis, byte layout, parsing, and reduction. Scale: both
    passes are Arrow-batched iterator UDFs over opaque binary; payloads
    never leave the executor (A10 binaryFile would replace synthesis on
    a real corpus)."""
    import struct

    import numpy as np

    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 60)
    src = d.select("doc_id")

    def encode_bmp(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                did = int(doc_id)
                w = 4 + did % 5
                h = 3 + did % 4
                p = np.arange(w * h, dtype=np.int64)
                rgb = np.empty((w * h, 3), dtype=np.uint8)
                for c in range(3):
                    rgb[:, c] = (11 * did + 5 * p + c) % 256
                bgr = rgb.reshape(h, w, 3)[:, :, ::-1]  # channel swap
                stride = (3 * w + 3) & ~3
                raster = np.zeros((h, stride), dtype=np.uint8)
                raster[:, : 3 * w] = bgr[::-1].reshape(h, 3 * w)  # bottom-up
                image_size = stride * h
                header = (
                    b"BM"
                    + struct.pack("<IHHI", 54 + image_size, 0, 0, 54)
                    + struct.pack(
                        "<IiiHHIIiiII",
                        40, w, h, 1, 24, 0, image_size, 2835, 2835, 0, 0,
                    )
                )
                payloads.append(header + raster.tobytes())
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "bmp": payloads})

    images = src.mapInPandas(encode_bmp, schema="doc_id long, bmp binary")

    def decode_bmp(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {
                "doc_id": [], "width": [], "height": [],
                "mean_r": [], "mean_g": [], "mean_b": [], "top_row_sum": [],
            }
            for doc_id, blob in zip(pdf["doc_id"], pdf["bmp"]):
                raw = bytes(blob)
                assert raw[:2] == b"BM"
                (offset,) = struct.unpack_from("<I", raw, 10)
                hdr_size, w, h, planes, bpp, comp = struct.unpack_from(
                    "<IiiHHI", raw, 14
                )
                assert hdr_size == 40 and bpp == 24 and comp == 0
                stride = (3 * w + 3) & ~3
                raster = np.frombuffer(
                    raw, dtype=np.uint8, count=stride * h, offset=offset
                ).reshape(h, stride)
                bgr = raster[:, : 3 * w].reshape(h, w, 3)
                rgb = bgr[::-1, :, ::-1]  # un-flip rows, BGR -> RGB
                flat = rgb.reshape(w * h, 3).astype(np.int64)
                rows["doc_id"].append(int(doc_id))
                rows["width"].append(w)
                rows["height"].append(h)
                for i, name in enumerate(("mean_r", "mean_g", "mean_b")):
                    rows[name].append(float(flat[:, i].sum()) / (w * h))
                rows["top_row_sum"].append(int(rgb[0].astype(np.int64).sum()))
            yield pd.DataFrame(rows)

    return images.mapInPandas(
        decode_bmp,
        schema=(
            "doc_id long, width int, height int, "
            "mean_r double, mean_g double, mean_b double, top_row_sum long"
        ),
    )
