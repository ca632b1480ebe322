"""Pure-stdlib PNG/BMP codecs (round 3: the multimodal decode stub is
now real for these formats)."""

import struct
import zlib

import numpy as np
import pytest

from pure_python_geospatial_export_spark.operators import imaging


def _rand_px(h, w, c, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, c), dtype=np.uint8)


def test_png_roundtrip_all_channel_counts():
    for c in (1, 2, 3, 4):
        px = _rand_px(13, 9, c, seed=c)
        data = imaging.encode_png(px)
        back = imaging.decode_png(data)
        np.testing.assert_array_equal(back, px)


def test_bmp_roundtrip_with_row_padding():
    # w=5 -> 15-byte rows padded to 16: exercises stride handling
    px = _rand_px(7, 5, 3, seed=9)
    back = imaging.decode_bmp(imaging.encode_bmp(px))
    np.testing.assert_array_equal(back, px)


def _filter_row(ftype, line, prev, bpp):
    """Forward PNG filtering (encoder side) for the test vectors."""
    out = bytearray()
    for x in range(len(line)):
        left = line[x - bpp] if x >= bpp else 0
        up = prev[x]
        ul = prev[x - bpp] if x >= bpp else 0
        if ftype == 0:
            base = 0
        elif ftype == 1:
            base = left
        elif ftype == 2:
            base = up
        elif ftype == 3:
            base = (left + up) >> 1
        else:
            p = left + up - ul
            pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
            base = left if pa <= pb and pa <= pc else (
                up if pb <= pc else ul
            )
        out.append((line[x] - base) & 0xFF)
    return bytes(out)


def test_png_decode_every_filter_type():
    """Hand-encode rows with filters 0..4 and verify exact recovery —
    encode_png only emits filter 0, so this pins the sub/up/average/
    paeth unfilter paths."""
    px = _rand_px(5, 6, 3, seed=3)
    h, w, c = px.shape
    raw = bytearray()
    prev = bytes(w * c)
    for y in range(h):
        line = px[y].tobytes()
        ftype = y % 5
        raw.append(ftype)
        raw += _filter_row(ftype, line, prev, c)
        prev = line

    def chunk(ctype, body):
        crc = zlib.crc32(ctype + body) & 0xFFFFFFFF
        return (struct.pack(">I", len(body)) + ctype + body
                + struct.pack(">I", crc))

    data = (
        imaging.PNG_SIG
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )
    np.testing.assert_array_equal(imaging.decode_png(data), px)


def test_png_palette_expansion():
    plte = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255]],
                    dtype=np.uint8)
    idx = np.array([[0, 1], [2, 0]], dtype=np.uint8)
    h, w = idx.shape
    raw = b"".join(b"\x00" + idx[y].tobytes() for y in range(h))

    def chunk(ctype, body):
        crc = zlib.crc32(ctype + body) & 0xFFFFFFFF
        return (struct.pack(">I", len(body)) + ctype + body
                + struct.pack(">I", crc))

    data = (
        imaging.PNG_SIG
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 3, 0, 0, 0))
        + chunk(b"PLTE", plte.tobytes())
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    got = imaging.decode_png(data)
    np.testing.assert_array_equal(got, plte[idx])


def test_decode_image_dispatch_and_unsupported():
    px = _rand_px(4, 4, 3, seed=1)
    np.testing.assert_array_equal(
        imaging.decode_image(imaging.encode_png(px)), px
    )
    np.testing.assert_array_equal(
        imaging.decode_image(imaging.encode_bmp(px)), px
    )
    with pytest.raises(NotImplementedError):
        imaging.decode_image(b"\xff\xd8\xffJPEGDATA")


def test_resize_and_feature():
    px = np.zeros((8, 8, 3), dtype=np.uint8)
    px[:4, :, :] = 255  # top half white
    small = imaging.resize_nearest(px, 4, 4)
    assert small.shape == (4, 4, 3)
    assert small[:2].mean() == 255.0 and small[2:].mean() == 0.0
    feat = imaging.image_feature(px, grid=4)
    assert feat.shape == (18,)  # 16 grid cells + mean + std
    assert 0.45 < feat[-2] < 0.55  # global mean ~0.5


def test_extract_features_real_decode(spark):
    """End-to-end Spark path: PNG/BMP payloads decode for real, an
    unsupported payload nulls out."""
    from pyspark.sql.types import (
        BinaryType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from pure_python_geospatial_export_spark.operators import multimodal

    png = imaging.encode_png(_rand_px(6, 6, 3, seed=5))
    bmp = imaging.encode_bmp(_rand_px(6, 6, 3, seed=6))
    schema = StructType([
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("payload", BinaryType(), False),
    ])
    df = spark.createDataFrame(
        [(1, "image", bytearray(png)),
         (2, "image", bytearray(bmp)),
         (3, "image", bytearray(b"\xff\xd8\xffnot-decodable"))],
        schema,
    )
    got = {
        r["media_id"]: r
        for r in multimodal.extract_features(df, fake=False).collect()
    }
    assert got[1]["feature"] is not None and len(got[1]["feature"]) == 18
    assert got[2]["feature"] is not None
    assert got[3]["feature"] is None
    # feature values match the local computation exactly
    want = imaging.image_feature(imaging.decode_png(png)).tolist()
    assert got[1]["feature"] == pytest.approx(want)


def test_image_near_dup_pipeline(spark):
    """End-to-end image near-dup: PNG payloads -> real decode ->
    grid-brightness features -> banded sign-LSH embedding near-dup.
    Perturbed copies of the same image pair up; unrelated images don't
    — the multimodal column feeding the similarity stack directly."""
    import numpy as np
    from pyspark.sql import functions as F

    from pure_python_geospatial_export_spark.operators import (
        imaging,
        multimodal,
        similarity,
    )
    from pure_python_geospatial_export_spark.session import local_df

    rng = np.random.default_rng(12)
    base_a = rng.integers(0, 255, (24, 24, 3), dtype=np.uint8)
    base_b = rng.integers(0, 255, (24, 24, 3), dtype=np.uint8)

    def perturb(px, eps):
        noise = rng.integers(-eps, eps + 1, px.shape)
        return np.clip(px.astype(int) + noise, 0, 255).astype(np.uint8)

    payloads = [
        (0, "image", bytearray(imaging.encode_png(base_a))),
        (1, "image", bytearray(imaging.encode_png(perturb(base_a, 2)))),
        (2, "image", bytearray(imaging.encode_png(base_b))),
        (3, "image", bytearray(imaging.encode_png(perturb(base_b, 2)))),
    ]
    df = local_df(spark, payloads, ["media_id", "kind", "payload"])
    feats = multimodal.extract_features(df).where(
        F.col("feature").isNotNull()
    ).select("media_id", F.col("feature").alias("embedding"))
    assert feats.count() == 4
    pairs = {
        tuple(sorted((r["id_a"], r["id_b"])))
        for r in similarity.embedding_near_duplicates(
            feats, "media_id", "embedding",
            threshold=0.995, n_bands=8, band_planes=4, dim=18,
        ).collect()
    }
    assert (0, 1) in pairs and (2, 3) in pairs
    assert not {(0, 2), (0, 3), (1, 2), (1, 3)} & pairs


def test_extract_features_corrupt_and_null_payloads(spark):
    """Corrupt payloads raise zlib/struct/IndexError inside the
    decoders — 'null' mode must null them out, never fail the job;
    NULL payloads pass through as NULL features."""
    from pyspark.sql.types import (
        BinaryType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from pure_python_geospatial_export_spark.operators import (
        imaging,
        multimodal,
    )

    good = imaging.encode_png(
        (np.arange(48, dtype=np.uint8)).reshape(4, 4, 3)
    )
    corrupt_idat = imaging.PNG_SIG + good[8:20] + b"\x00" * 30
    truncated_bmp = b"BM" + b"\x01" * 10
    rows = [
        (1, "image", bytearray(good)),
        (2, "image", bytearray(corrupt_idat)),
        (3, "image", bytearray(truncated_bmp)),
        (4, "image", None),
    ]
    schema = StructType([
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("payload", BinaryType(), True),
    ])
    df = spark.createDataFrame(rows, schema)
    out = {r["media_id"]: r for r in
           multimodal.extract_features(df).collect()}
    assert out[1]["feature"] is not None
    assert out[2]["feature"] is None and out[2]["n_bytes"] > 0
    assert out[3]["feature"] is None
    assert out[4]["feature"] is None and out[4]["n_bytes"] == 0
    import pytest
    with pytest.raises(Exception):
        multimodal.extract_features(
            df, on_undecodable="raise"
        ).collect()


def test_image_feature_gray_alpha_ignores_alpha():
    from pure_python_geospatial_export_spark.operators import imaging

    ga = np.zeros((8, 8, 2), dtype=np.uint8)
    ga[:, :, 0] = 128   # mid gray
    ga[:, :, 1] = 255   # fully opaque
    feat = imaging.image_feature(ga)
    # global mean brightness is feature[-2]
    assert abs(float(feat[-2]) - 128.0 / 255.0) < 1e-6
    rgb = np.full((8, 8, 3), 128, dtype=np.uint8)
    np.testing.assert_allclose(feat, imaging.image_feature(rgb))


# ---------------------------------------------------------------------------
# perceptual hashes (round-4 verdict item 5)
# ---------------------------------------------------------------------------

def test_ahash_dhash_known_values():
    import numpy as np

    from pure_python_geospatial_export_spark.operators import imaging

    # 8x8 gray ramp: row r has value 10*r -> ahash bits set for rows
    # brighter than the mean (rows 4..7), dhash all zero (no horizontal
    # gradient)
    px = (np.arange(8, dtype=np.uint8) * 10)[:, None].repeat(8, axis=1)
    a = imaging.ahash(px)
    want = 0
    for r in range(4, 8):
        for c in range(8):
            want |= 1 << (r * 8 + c)
    # want has bit 63 set -> compare as int64 two's complement
    want = want - (1 << 64) if want >= 1 << 63 else want
    assert a == want
    assert imaging.dhash(px) == 0
    # transpose: horizontal ramp -> every left-to-right comparison true
    # EXCEPT column 0 (the 8->9 nearest resize duplicates the first
    # column, so pixel[r,1] == pixel[r,0]): per-row bit pattern 0xFE
    d = imaging.dhash(px.T)
    want_d = 0xFEFEFEFEFEFEFEFE - (1 << 64)
    assert d == want_d


def test_phash_scale_invariance():
    import numpy as np

    from pure_python_geospatial_export_spark.operators import imaging

    rng = np.random.default_rng(7)
    base = rng.integers(0, 255, (8, 8, 3), dtype=np.uint8)
    up2 = base.repeat(2, axis=0).repeat(2, axis=1)   # 16x16 nearest
    up4 = base.repeat(4, axis=0).repeat(4, axis=1)
    for fn in (imaging.ahash, imaging.dhash):
        assert fn(base) == fn(up2) == fn(up4)


def test_perceptual_hash_pairs_planted_pngs(spark):
    """Planted near-identical PNGs pair up through decode -> dhash ->
    banded Hamming join; unrelated images and undecodable payloads
    don't."""
    import numpy as np
    from pyspark.sql import functions as F

    from pure_python_geospatial_export_spark.operators import (
        imaging,
        multimodal,
    )
    from pure_python_geospatial_export_spark.session import local_df

    rng = np.random.default_rng(31)
    base_a = rng.integers(0, 255, (24, 24, 3), dtype=np.uint8)
    base_b = rng.integers(0, 255, (24, 24, 3), dtype=np.uint8)

    def perturb(px, eps):
        noise = rng.integers(-eps, eps + 1, px.shape)
        return np.clip(px.astype(int) + noise, 0, 255).astype(np.uint8)

    payloads = [
        (0, bytearray(imaging.encode_png(base_a))),
        (1, bytearray(imaging.encode_png(perturb(base_a, 2)))),
        (2, bytearray(imaging.encode_png(base_b))),
        (3, bytearray(imaging.encode_png(perturb(base_b, 2)))),
        (4, bytearray(b"not an image at all")),
    ]
    df = local_df(spark, payloads, ["media_id", "payload"])
    ph = multimodal.perceptual_hash(df)
    rows = {r["media_id"]: r["phash"] for r in ph.collect()}
    assert rows[4] is None
    assert all(rows[i] is not None for i in range(4))
    pairs = {
        tuple(sorted((r["id_a"], r["id_b"])))
        for r in multimodal.perceptual_hash_pairs(
            ph, max_hamming=10
        ).collect()
    }
    assert (0, 1) in pairs and (2, 3) in pairs
    assert not {(0, 2), (0, 3), (1, 2), (1, 3)} & pairs
    assert not any(4 in p for p in pairs)


def test_hamming_near_pairs_complete_vs_bruteforce(spark):
    """Pigeonhole completeness of the banded join: output equals the
    exact all-pairs Hamming filter on random + planted fingerprints."""
    import numpy as np

    from pure_python_geospatial_export_spark.operators.dedup import (
        hamming_near_pairs,
    )
    from pure_python_geospatial_export_spark.session import local_df

    rng = np.random.default_rng(5)
    vals = rng.integers(-(2**63), 2**63 - 1, 60, dtype=np.int64)
    # plant close pairs: flip <=6 bits of some values
    for k in range(0, 20, 2):
        flips = rng.choice(64, size=rng.integers(1, 7), replace=False)
        v = np.uint64(vals[k])
        for f in flips:
            v ^= np.uint64(1) << np.uint64(f)
        vals[k + 1] = np.int64(v)

    df = local_df(
        spark, [(i, int(v)) for i, v in enumerate(vals)],
        ["media_id", "phash"],
    )
    got = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in hamming_near_pairs(
            df, "media_id", hash_col="phash", max_hamming=6
        ).collect()
    }
    want = set()
    u = vals.astype(np.uint64)
    for i in range(len(u)):
        for j in range(i + 1, len(u)):
            h = bin(int(u[i] ^ u[j])).count("1")
            if h <= 6:
                want.add((i, j, h))
    assert got == want and want


def test_hamming_near_pairs_rejects_bad_chunking(spark):
    import pytest

    from pure_python_geospatial_export_spark.operators.dedup import (
        hamming_near_pairs,
    )
    from pure_python_geospatial_export_spark.session import local_df

    df = local_df(spark, [(1, 0)], ["media_id", "phash"])
    with pytest.raises(ValueError, match="pigeonhole"):
        hamming_near_pairs(df, "media_id", hash_col="phash",
                           max_hamming=6, n_chunks=5)
