"""Multimodal plumbing, sources/sinks, and the pandas-UDF tier."""

import math

import pytest
from pyspark.sql import functions as F

from datafusion_sqlgen_spark.operators import multimodal as mm
from datafusion_sqlgen_spark.sources import (
    read_csv,
    read_orc,
    read_parquet,
    write_bucketed,
    write_csv,
    write_orc,
    write_parquet,
)


def test_multimodal_schema_and_features(spark):
    docs = spark.table("documents").limit(50)
    m = mm.as_multimodal(docs)
    assert [f.name for f in m.schema.fields] == ["doc_id", "payload", "media_meta"]
    assert m.schema["payload"].dataType.typeName() == "binary"
    feats = mm.extract_features(m, dim=16)
    rows = feats.collect()
    assert len(rows) == 50
    assert all(len(r["feature"]) == 16 for r in rows)
    # determinism: same payload -> same features on rerun
    again = {r["doc_id"]: r["feature"] for r in mm.extract_features(m, dim=16).collect()}
    for r in rows:
        assert again[r["doc_id"]] == r["feature"]
    # fake decode matches the local python implementation
    one = m.filter("doc_id = 0").collect()[0]
    expected = mm.decode_fake(bytes(one["payload"]), 16)
    got = [r for r in rows if r["doc_id"] == 0][0]["feature"]
    assert [round(v, 5) for v in got] == [round(v, 5) for v in expected]


def _tiny_png(pixels, width, height) -> bytes:
    """Minimal valid grayscale PNG from stdlib only (struct+zlib) — lets
    the real-decode test build input without needing Pillow itself."""
    import struct
    import zlib

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = b"".join(
        b"\x00" + bytes(pixels[y * width:(y + 1) * width])
        for y in range(height)
    )
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def test_decode_real_without_pillow_raises_with_hint():
    """Where Pillow is absent the optional-import path must fail with
    the actionable NotImplementedError, not an ImportError."""
    try:
        import PIL  # noqa: F401

        pytest.skip("Pillow installed — covered by the real-decode test")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError, match="Pillow"):
        mm.decode_real(b"xx", "image/png")
    with pytest.raises(NotImplementedError, match="Pillow"):
        mm._make_local_real_decoder()


def test_decode_real_decodes_png():
    """Skip-gated real-codec path (round-6 VERDICT item 7): with Pillow
    installed, decode_real reads a PNG built from stdlib bytes and
    honors the decode_fake shape contract (length n, values in [0,1],
    deterministic)."""
    pytest.importorskip("PIL")
    png = _tiny_png([0, 64, 128, 255], 2, 2)
    out = mm.decode_real(png, "image/png", n=16)
    assert len(out) == 16
    assert all(0.0 <= v <= 1.0 for v in out)
    assert out == mm.decode_real(png, "image/png", n=16)
    # video mimes still raise toward the PyAV TODO
    with pytest.raises(NotImplementedError, match="PyAV"):
        mm.decode_real(png, "video/mp4")


def _tiny_wav(samples, rate=8000):
    """Mono 16-bit PCM WAV from stdlib bytes — no media libs needed to
    BUILD the fixture, only to decode it."""
    import io
    import struct
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(b"".join(
            struct.pack("<h", int(s * 32767)) for s in samples))
    return buf.getvalue()


def test_decode_real_audio_without_soundfile_raises_with_hint():
    """Where soundfile is absent the optional-import audio path must
    fail with the actionable NotImplementedError, not an ImportError
    (round-6 VERDICT item 6, mirroring the Pillow pattern)."""
    try:
        import soundfile  # noqa: F401

        pytest.skip("soundfile installed — covered by the decode test")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError, match="soundfile"):
        mm.decode_real(b"xx", "audio/wav")
    with pytest.raises(NotImplementedError, match="soundfile"):
        mm._make_local_audio_decoder()


def test_decode_real_decodes_wav():
    """Skip-gated real-audio path: with soundfile installed, decode_real
    reads a stdlib-built PCM WAV and honors the decode_fake shape
    contract (length n, values in [0,1], deterministic); a constant
    positive waveform must land above the 0.5 midpoint."""
    pytest.importorskip("soundfile")
    wav = _tiny_wav([0.5] * 64 + [-0.5] * 64)
    out = mm.decode_real(wav, "audio/wav", n=16)
    assert len(out) == 16
    assert all(0.0 <= v <= 1.0 for v in out)
    assert out == mm.decode_real(wav, "audio/wav", n=16)
    assert out[0] > 0.5 > out[-1]


def test_resize_and_frames(spark):
    docs = spark.table("documents").limit(10)
    m = mm.as_multimodal(docs)
    resized = mm.resize_images(m, 224, 224).collect()
    assert all(r["media_meta"]["width"] == 224 for r in resized)
    # give payloads a fake duration then sample frames
    vid = m.withColumn(
        "media_meta",
        F.struct(
            F.lit("video/fake").alias("mime"),
            F.col("media_meta.width").alias("width"),
            F.col("media_meta.height").alias("height"),
            F.lit(3500).alias("duration_ms"),
        ),
    )
    frames = mm.sample_frames(vid, every_ms=1000)
    counts = frames.groupBy("doc_id").count().collect()
    assert all(r["count"] == 4 for r in counts)  # 0,1000,2000,3000


def test_parquet_roundtrip_partitioned(spark, tmp_path):
    p = str(tmp_path / "orders_by_status")
    orders = spark.table("orders")
    write_parquet(orders, p, partition_by=["o_orderstatus"])
    back = read_parquet(spark, p)
    assert back.count() == orders.count()
    # partition pruning: a status filter must prune directories
    plan = (
        back.filter(F.col("o_orderstatus") == "F")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PartitionFilters: [isnotnull(o_orderstatus" in plan


def test_csv_roundtrip(spark, tmp_path):
    p = str(tmp_path / "nation_csv")
    write_csv(spark.table("nation"), p)
    back = read_csv(spark, p)
    assert back.count() == 25
    assert set(back.columns) == {"n_nationkey", "n_name", "n_regionkey"}


def test_bucketed_join_no_shuffle(spark, tmp_path):
    write_bucketed(
        spark.table("customer"), "cust_b", ["c_custkey"], 4,
        sort_by=["c_custkey"], path=str(tmp_path / "cust_b"),
    )
    write_bucketed(
        spark.table("orders"), "ord_b", ["o_custkey"], 4,
        sort_by=["o_custkey"], path=str(tmp_path / "ord_b"),
    )
    j = spark.table("cust_b").join(
        spark.table("ord_b"), F.col("c_custkey") == F.col("o_custkey")
    )
    plan = j._jdf.queryExecution().executedPlan().toString()
    # bucketed-bucketed equi join: no shuffle exchange on either side
    assert "Exchange hashpartitioning" not in plan
    assert j.count() == spark.table("orders").count()


def test_bpeish_token_count_udf(spark):
    from datafusion_sqlgen_spark.functions.udfs import bpeish_token_count

    docs = spark.table("documents").limit(20)
    rows = docs.select("doc_id", "text", bpeish_token_count("text").alias("n")).collect()
    import re

    pat = re.compile(r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]")
    for r in rows:
        assert r["n"] == len(pat.findall(r["text"]))


def test_zscore_udf_vs_window_twin(spark):
    from datafusion_sqlgen_spark.functions.udfs import (
        grouped_zscore,
        grouped_zscore_window,
    )

    ev = spark.table("events").select("event_id", "event_type", "value")
    a = {
        r["event_id"]: round(r["zscore"], 6)
        for r in grouped_zscore(ev, "event_type", "value").collect()
    }
    b = {
        r["event_id"]: round(r["zscore"], 6)
        for r in grouped_zscore_window(ev, "event_type", "value").collect()
    }
    assert a == b


def test_orc_roundtrip_partitioned(spark, tmp_path):
    p = str(tmp_path / "orders_orc")
    orders = spark.table("orders")
    write_orc(orders, p, partition_by=["o_orderstatus"])
    back = read_orc(spark, p)
    assert back.count() == orders.count()
    plan = (
        back.filter(F.col("o_orderstatus") == "F")
        ._jdf.queryExecution().executedPlan().toString()
    )
    # directory partition pruning works for ORC exactly like parquet
    assert "PartitionFilters: [isnotnull(o_orderstatus" in plan


def test_chunk_udtf_equals_builtin(spark):
    """The per-row-Python UDTF tier must agree with the codegen'd
    built-in composition (operators.text.chunk_documents)."""
    from datafusion_sqlgen_spark.functions.udfs import make_chunk_udtf
    from datafusion_sqlgen_spark.operators import text as text_ops
    from tests.conftest import normalize_rows

    spark.udtf.register("chunk_document", make_chunk_udtf())
    via_udtf = spark.sql(
        "SELECT c.* FROM documents, LATERAL chunk_document(documents.doc_id, text) c "
        "WHERE documents.doc_id < 40"
    )
    via_builtin = text_ops.chunk_documents(
        spark.table("documents").filter("doc_id < 40")
    )
    a = normalize_rows([tuple(r) for r in via_udtf.collect()])
    b = normalize_rows([tuple(r) for r in via_builtin.collect()])
    assert a == b
    assert len(a) > 0


def test_chunk_documents_overlap_semantics(spark):
    from datafusion_sqlgen_spark.operators import text as text_ops
    import pyspark.sql.functions as F

    one = spark.createDataFrame(
        [(1, " ".join(str(i) for i in range(40)))], ["doc_id", "text"]
    )
    rows = {
        r["chunk_idx"]: r
        for r in text_ops.chunk_documents(one, size=32, stride=24).collect()
    }
    assert rows[0]["n_words"] == 32 and rows[0]["chunk"].startswith("0 1 ")
    # second chunk starts at word 24 and holds the 16-word tail
    assert rows[1]["n_words"] == 16 and rows[1]["chunk"].startswith("24 25")
    assert set(rows) == {0, 1}


def test_perceptual_hash_deterministic(spark):
    from datafusion_sqlgen_spark.operators import multimodal as mm

    docs = spark.table("documents").limit(50)
    wrapped = mm.as_multimodal(docs)
    h1 = {r["doc_id"]: r["phash"] for r in mm.perceptual_hash(wrapped).collect()}
    h2 = {r["doc_id"]: r["phash"] for r in mm.perceptual_hash(wrapped).collect()}
    assert h1 == h2 and len(h1) == 50


def test_phash_near_dup_finds_exact_payload_dups(spark):
    """Identical payloads hash identically (hamming 0); the fake
    decoder's avalanche means distinct payloads are unrelated — so the
    found pairs are exactly the duplicated-payload pairs."""
    from datafusion_sqlgen_spark.operators import multimodal as mm

    rows = [(1, "same image bytes"), (2, "same image bytes"),
            (3, "other payload"), (4, "third thing"),
            (5, "same image bytes")]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    pairs = mm.phash_near_dup_pairs(mm.as_multimodal(df), max_hamming=4)
    got = sorted((r["id_a"], r["id_b"], r["hamming"]) for r in pairs.collect())
    assert got == [(1, 2, 0), (1, 5, 0), (2, 5, 0)]


def test_phash_pairs_stay_candidate_bounded(spark):
    """Plan shape: the pair search is a chunk-keyed equi self-join —
    no cartesian, no nested loop."""
    from datafusion_sqlgen_spark.operators import multimodal as mm

    docs = spark.table("documents").limit(100)
    df = mm.phash_near_dup_pairs(mm.as_multimodal(docs))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_zorder_write_tightens_footers(spark, tmp_path):
    """Z-ordered files must carry much tighter min/max footer stats on
    BOTH clustered columns than a row-order layout — the property that
    makes multi-dimensional file/row-group skipping real."""
    import glob

    import pyarrow.parquet as pq

    from datafusion_sqlgen_spark.sources.io import write_zordered

    orders = spark.table("orders")
    st = orders.agg(
        F.min("o_custkey"), F.max("o_custkey"),
        F.min("o_totalprice"), F.max("o_totalprice"),
    ).first()
    ranges = [
        ("o_custkey", float(st[0]), float(st[1])),
        ("o_totalprice", float(st[2]), float(st[3])),
    ]
    write_zordered(orders, str(tmp_path / "z"), ranges, n_files=8)
    orders.repartition(8).write.parquet(str(tmp_path / "naive"))

    def mean_span(path: str, col: str, lo: float, hi: float) -> float:
        spans = []
        for fp in glob.glob(path + "/*.parquet"):
            md = pq.ParquetFile(fp).metadata
            idx = md.schema.names.index(col)
            los, his = [], []
            for rg in range(md.num_row_groups):
                s = md.row_group(rg).column(idx).statistics
                los.append(s.min)
                his.append(s.max)
            spans.append((max(his) - min(los)) / (hi - lo))
        return sum(spans) / len(spans)

    # data integrity: the clustered copy is the same multiset
    back = spark.read.parquet(str(tmp_path / "z"))
    assert back.count() == orders.count()
    assert back.agg(F.sum("o_totalprice")).first()[0] == pytest.approx(
        orders.agg(F.sum("o_totalprice")).first()[0]
    )
    for col, lo, hi in ranges:
        z = mean_span(str(tmp_path / "z"), col, lo, hi)
        naive = mean_span(str(tmp_path / "naive"), col, lo, hi)
        assert z < naive * 0.7, f"{col}: z-span {z:.2f} vs naive {naive:.2f}"

    # auto-bounds variant (no driver .first round-trip) must produce the
    # same clustered layout: identical sorted z-file contents
    from datafusion_sqlgen_spark.sources.io import write_zordered_auto

    write_zordered_auto(
        orders, str(tmp_path / "z_auto"), ["o_custkey", "o_totalprice"],
        n_files=8,
    )
    auto_back = spark.read.parquet(str(tmp_path / "z_auto"))
    assert auto_back.count() == orders.count()
    for col, lo, hi in ranges:
        za = mean_span(str(tmp_path / "z_auto"), col, lo, hi)
        naive = mean_span(str(tmp_path / "naive"), col, lo, hi)
        assert za < naive * 0.7, f"{col}: auto z-span {za:.2f} vs {naive:.2f}"


def test_decode_real_video_without_pyav_raises_with_hint():
    """Where PyAV is absent the optional-import video path must fail
    with the actionable NotImplementedError, not an ImportError —
    the same contract as the Pillow and soundfile lanes."""
    try:
        import av  # noqa: F401

        pytest.skip("PyAV installed — covered by the decode test")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError, match="PyAV"):
        mm.decode_real(b"xx", "video/mp4")
    with pytest.raises(NotImplementedError, match="PyAV"):
        mm._make_local_video_decoder()


def test_decode_real_decodes_video():
    """Skip-gated real-video path: with PyAV installed, decode_real
    samples frame luminance means and honors the decode_fake shape
    contract (length n, values in [0,1], deterministic)."""
    av = pytest.importorskip("av")
    import io

    import numpy as np

    buf = io.BytesIO()
    with av.open(buf, "w", format="mp4") as out:
        stream = out.add_stream("mpeg4", rate=4)
        stream.width, stream.height = 32, 32
        for shade in (0, 128, 255):
            arr = np.full((32, 32, 3), shade, dtype=np.uint8)
            frame = av.VideoFrame.from_ndarray(arr, format="rgb24")
            for pkt in stream.encode(frame):
                out.mux(pkt)
        for pkt in stream.encode():
            out.mux(pkt)
    clip = buf.getvalue()
    out = mm.decode_real(clip, "video/mp4", n=6)
    assert len(out) == 6
    assert all(0.0 <= v <= 1.0 for v in out)
    assert out == mm.decode_real(clip, "video/mp4", n=6)
