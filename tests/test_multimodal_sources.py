import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data as rd

from pomp_ray.sources.corpus import read_pages
from pomp_ray.sources import gen_corpus
from pomp_ray.stages.multimodal import (
    FEATURE_DIM,
    MediaFeaturizer,
    fake_decode,
    real_decode,
    resize_stub,
    synth_media_table,
)
from tests.helpers import fixture_corpus


def test_media_featurizer_actor_pool():
    """Binary payload column -> fixed-size-list features via an actor
    pool; deterministic across runs."""
    t = synth_media_table(64)
    ds = rd.from_arrow(t).map_batches(
        MediaFeaturizer, fn_constructor_kwargs={"decode": "fake"},
        concurrency=2, batch_size=16, batch_format="pyarrow")
    out = ds.take_all()
    assert len(out) == 64
    feats = {r["media_id"]: np.asarray(r["features"]) for r in out}
    assert all(v.shape == (FEATURE_DIM,) for v in feats.values())
    # determinism: same payload -> same features
    again = rd.from_arrow(t).map_batches(
        MediaFeaturizer, fn_constructor_kwargs={"decode": "fake"},
        concurrency=2, batch_size=16, batch_format="pyarrow").take_all()
    feats2 = {r["media_id"]: np.asarray(r["features"]) for r in again}
    for k in feats:
        np.testing.assert_array_equal(feats[k], feats2[k])


def test_real_decode_codec_boundaries():
    import shutil

    from pomp_ray.stages import multimodal as mm
    if shutil.which("ffmpeg") is None:
        # video: explicit stub when the ffmpeg CLI is absent
        with pytest.raises(NotImplementedError):
            real_decode(b"x", "video")
    if mm._pillow_image_module() is None:
        # unsupported image codecs name the Pillow seam when it's absent
        with pytest.raises(ValueError):
            real_decode(b"\x89PNG...", "image")
    with pytest.raises(ValueError):
        real_decode(b"ID3...", "audio")
    # fake decode is pure + deterministic
    assert np.array_equal(fake_decode(b"abc", "image"),
                          fake_decode(b"abc", "image"))


def test_real_decode_pillow_seam_dispatch(monkeypatch):
    """The optional-import dispatch really routes non-netpbm images
    through the Pillow module when one is importable -- exercised by
    injecting a stand-in module (Pillow itself is absent here)."""
    from pomp_ray.stages import multimodal as mm

    class _FakeImg:
        def convert(self, mode):
            assert mode == "L"
            return np.full((16, 16), 128, np.uint8)

    class _FakeImageModule:
        @staticmethod
        def open(fp):
            assert fp.read(4) == b"\x89PNG"
            return _FakeImg()

    monkeypatch.setattr(mm, "_PIL_IMAGE", _FakeImageModule)
    feats = real_decode(b"\x89PNGrest-of-payload", "image")
    assert feats.shape == (64,)
    np.testing.assert_allclose(feats, np.float32(128 / 255.0))
    # netpbm still takes the exact built-in path with the seam present
    p5 = b"P5 8 8 255 " + bytes(range(64))
    assert real_decode(p5, "image").dtype == np.float32


def test_real_decode_pillow_real_roundtrip():
    """Runs only where Pillow is actually installed (skipped in this
    sandbox): a real PNG decodes through the seam."""
    pytest.importorskip("PIL")
    import io

    from PIL import Image
    buf = io.BytesIO()
    Image.fromarray(np.full((16, 16), 100, np.uint8)).save(buf, "PNG")
    feats = real_decode(buf.getvalue(), "image")
    np.testing.assert_allclose(feats, np.float32(100 / 255.0))


def test_real_decode_ffmpeg_seam_dispatch(monkeypatch):
    """Video dispatch calls the ffmpeg frame extractor when a CLI is
    found; absent CLI raises the documented stub."""
    from pomp_ray.stages import multimodal as mm

    monkeypatch.setattr(mm, "_ffmpeg_path", lambda: None)
    with pytest.raises(NotImplementedError):
        real_decode(b"x", "video")
    monkeypatch.setattr(mm, "_ffmpeg_path", lambda: "/usr/bin/ffmpeg")
    monkeypatch.setattr(
        mm, "_ffmpeg_first_frame_gray",
        lambda payload: np.full((64, 64), 0.5))
    feats = real_decode(b"any-container", "video")
    np.testing.assert_allclose(feats, np.float32(0.5))


def _ppm_bytes(w, h, pixel_fn):
    raster = bytes(pixel_fn(x, y, c)
                   for y in range(h) for x in range(w) for c in range(3))
    return b"P6\n# test image\n%d %d\n255\n" % (w, h) + raster


def _wav_bytes(samples_int16, framerate=8000):
    import io
    import wave
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(framerate)
        f.writeframes(np.asarray(samples_int16, np.int16).tobytes())
    return buf.getvalue()


def test_real_decode_ppm_block_means():
    # 16x16 image, gray value = x*16 in every channel: block means are
    # exactly the mean of two adjacent column values / 255
    img = _ppm_bytes(16, 16, lambda x, y, c: x * 16)
    feats = real_decode(img, "image")
    assert feats.shape == (64,)
    for bj in range(8):
        # block bj spans x in {2bj, 2bj+1}: mean of the two gray values
        expect = ((2 * bj) * 16 + (2 * bj + 1) * 16) / 2 / 255.0
        assert abs(float(feats[bj]) - expect) < 1e-6
    # P5 grayscale parses too, and comments are skipped
    p5 = b"P5\n#c\n4 4\n255\n" + bytes(range(16))
    f5 = real_decode(p5, "image")
    assert f5.shape == (64,)
    assert abs(float(f5.reshape(8, 8)[0, 0]) - 0 / 255.0) < 1e-6


def test_real_decode_wav_rms():
    # constant-amplitude signal: every time bucket reads the same RMS
    amp = 8192
    wav = _wav_bytes([amp, -amp] * 640)
    feats = real_decode(wav, "audio")
    assert feats.shape == (64,)
    np.testing.assert_allclose(feats, amp / 32768.0, rtol=1e-6)


def test_media_featurizer_real_decode_end_to_end():
    import pyarrow as pa

    from pomp_ray.stages.multimodal import MEDIA_SCHEMA, MediaFeaturizer
    rows = []
    for i in range(6):
        if i % 2 == 0:
            payload = _ppm_bytes(8, 8, lambda x, y, c, _i=i: (x * y + _i) % 256)
            kind = "image"
        else:
            payload = _wav_bytes([(i * 997 + j * 13) % 4096 - 2048
                                  for j in range(256)])
            kind = "audio"
        rows.append({"media_id": i, "kind": kind, "payload": payload,
                     "width": 8, "height": 8, "duration_ms": 0})
    t = pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA)
    fz = MediaFeaturizer(decode="real")
    out = fz(t)
    assert out["features"].type.list_size == 64
    out2 = MediaFeaturizer(decode="real")(t)
    for a, b in zip(out["features"].to_pylist(),
                    out2["features"].to_pylist()):
        assert a == b


def test_resize_stub():
    t = synth_media_table(8)
    out = resize_stub(t, max_side=100)
    assert max(out["width"].to_pylist()) <= 100
    assert max(out["height"].to_pylist()) <= 100


def test_read_pages_formats(tmp_path):
    """Same corpus through parquet and jsonl loaders -> identical
    canonical tables."""
    fix = fixture_corpus(gen_corpus.TINY)
    native = read_pages(fix.pages_path).take_all()

    # write a jsonl flavour with html as base64 text
    import base64
    import json
    t = pq.read_table(fix.pages_path)
    jl = tmp_path / "pages.jsonl"
    with open(jl, "w") as f:
        for row in t.to_pylist():
            row["html_b64"] = base64.b64encode(row.pop("html")).decode()
            row["warc_ts"] = row["warc_ts"].isoformat()
            f.write(json.dumps(row) + "\n")
    via_json = read_pages(str(jl), fmt="json").take_all()
    a = {r["url"]: r["html"] for r in native}
    b = {r["url"]: r["html"] for r in via_json}
    assert a == b


def test_write_pages_roundtrip_json_csv(ray_session, tmp_path):
    """write_pages -> read_pages must round-trip the canonical PAGES
    schema losslessly through JSONL and CSV (html via base64,
    timestamps via ISO strings) and Arrow IPC shards (native types)."""
    import pyarrow as pa
    import ray.data as rd

    from pomp_ray import schemas
    from pomp_ray.sources.corpus import read_pages, write_pages
    from pomp_ray.sources import gen_corpus

    fix = gen_corpus.generate("/tmp/pomp_rt_corpus", gen_corpus.TINY)
    src = read_pages(fix.pages_path)
    want = pa.concat_tables(
        b for b in src.iter_batches(batch_format="pyarrow"))
    want = want.sort_by("url")
    for fmt in ("json", "csv", "ipc", "json_gz", "orc"):
        out = str(tmp_path / fmt)
        write_pages(read_pages(fix.pages_path), out, fmt=fmt)
        got = pa.concat_tables(
            b for b in read_pages(out, fmt=fmt).iter_batches(
                batch_format="pyarrow"))
        got = got.sort_by("url")
        assert got.schema.equals(schemas.PAGES), fmt
        assert got.equals(want), fmt


def test_frame_sampler_explosion_and_stub(ray_session):
    """FrameSampler: per-kind chunking caps hold, frames reassemble to
    the payload prefix, images pass through whole, and decode='real'
    raises the explicit stub error."""
    import pytest
    import ray.data as rd

    from pomp_ray.stages.multimodal import FrameSampler, synth_media_table

    t = synth_media_table(n=48)
    out = rd.from_arrow(t).map_batches(
        FrameSampler, fn_constructor_kwargs={"decode": "fake"},
        concurrency=1, batch_size=16, batch_format="pyarrow").take_all()
    payloads = {r["media_id"]: (r["kind"], r["payload"])
                for r in t.to_pylist()}
    by_media: dict[int, list] = {}
    for r in out:
        by_media.setdefault(r["media_id"], []).append(r)
    assert set(by_media) == set(payloads)
    for mid, rows in by_media.items():
        kind, payload = payloads[mid]
        rows.sort(key=lambda r: r["frame_idx"])
        chunk, cap = FrameSampler.CHUNK[kind]
        if chunk is None:
            assert len(rows) == 1 and rows[0]["frame"] == payload
        else:
            assert len(rows) <= cap
            joined = b"".join(r["frame"] for r in rows)
            assert joined == payload[:len(joined)]

    with pytest.raises(NotImplementedError):
        FrameSampler(decode="real")


def test_discover_sitemap_seeds_crawl_equivalence(ray_session, tmp_path):
    """Seeding a crawl from the discovered sitemap urls must reach
    exactly the same page set as the standard root seeds (every
    sitemap entry is in the root's reachable closure, and the root is
    listed first)."""
    import pyarrow.parquet as pq

    from pomp_ray import crawl as crawl_mod
    from pomp_ray.crawl import CrawlConfig, CrawlEngine
    from pomp_ray.sources import gen_corpus
    from pomp_ray.sources.corpus import discover_sitemap_seeds

    fix = gen_corpus.generate("/tmp/pomp_sm_corpus", gen_corpus.TINY)
    seeds = discover_sitemap_seeds(fix.pages_path).take_all()
    assert len(seeds) > 2
    assert all(s["url"].startswith("http://") for s in seeds)
    roots = {f"http://site{h}.test/p/0" for h in range(2)}
    assert roots <= {s["url"] for s in seeds}

    def crawl(ckpt, seed_rows):
        cfg = CrawlConfig(corpus_path=fix.pages_path, ckpt_dir=ckpt,
                          robots_path=fix.robots_path, mode="bfs",
                          min_distributed_rows=16, n_seen_shards=2)
        eng = CrawlEngine(cfg)
        try:
            eng.run(seeds=seed_rows)
        finally:
            eng.close()
        return set(crawl_mod.read_visited(ckpt)["url"].to_pylist())

    std = crawl(str(tmp_path / "std"),
                pq.read_table(fix.seeds_path).to_pylist())
    sm = crawl(str(tmp_path / "sm"), seeds)
    # sitemaps exist precisely to surface pages the link graph hides:
    # the sitemap crawl covers everything the root crawl reached PLUS
    # pages orphaned behind the robots-blocked /p/7 subtree -- directly
    # listed pages are fetchable, only the /p/7-prefixed ones stay out
    assert std <= sm
    extras = sm - std
    corpus_urls = set(
        pq.read_table(fix.pages_path, columns=["url"])["url"].to_pylist())
    assert extras <= corpus_urls
    assert not {u for u in extras if "site0.test/p/7" in u}


def test_compact_parquet_dir(ray_session, tmp_path):
    """40 tiny fragments compact to the expected file count with no
    row loss and identical content."""
    import glob

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pomp_ray.sources.corpus import compact_parquet_dir

    frag = tmp_path / "frag"
    frag.mkdir()
    rng = np.random.default_rng(3)
    all_ids = []
    for i in range(40):
        ids = (np.arange(50) + i * 50).astype("int64")
        all_ids.extend(ids.tolist())
        pq.write_table(
            pa.table({"id": ids, "v": rng.random(50)}),
            str(frag / f"part-{i:03d}.parquet"))
    out = compact_parquet_dir(str(frag), str(tmp_path / "compact"),
                              target_rows_per_file=500)
    assert out == {"rows": 2000, "files_in": 40, "files_out": 4}
    got = pa.concat_tables(
        pq.read_table(p)
        for p in glob.glob(str(tmp_path / "compact" / "*.parquet")))
    assert sorted(got["id"].to_pylist()) == sorted(all_ids)
