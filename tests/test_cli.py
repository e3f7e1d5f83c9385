"""CLI entry point (the ray-job-submit surface) via real subprocesses --
the CLI owns its own Ray session, separate from the test session."""

import pytest
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args):
    env = dict(os.environ, PYTHONPATH=REPO, RAY_ADDRESS="")
    r = subprocess.run([sys.executable, "-m", "pomp_ray.cli", *args],
                       capture_output=True, text=True, env=env, cwd="/tmp",
                       timeout=240)
    assert r.returncode == 0, r.stderr[-2000:]
    return json.loads(r.stdout.strip().splitlines()[-1])


@pytest.mark.slow
def test_cli_crawl_and_dedup(tmp_path):
    from pomp_ray.sources import gen_corpus
    fix = gen_corpus.generate(str(tmp_path / "corpus"), gen_corpus.TINY)
    out = _run(["crawl", "--corpus", fix.pages_path,
                "--ckpt", str(tmp_path / "ckpt"),
                "--seeds", fix.seeds_path, "--robots", fix.robots_path,
                "--mode", "bfs"])
    assert out["visited"] == 57 and out["errors"] == 2   # TINY golden counts
    dd = _run(["dedup-corpus", "--sf-dir", "/root/testdata/sf0.001",
               "--out", str(tmp_path / "dedup")])
    assert dd["rows_written"] > 0


@pytest.mark.slow
def test_cli_tick_publish_export(tmp_path):
    """The continuous-crawl lifecycle over one checkpoint, driven
    entirely through the CLI: crawl -> tick (+publish) -> export-seeds
    (empty after a drained crawl)."""
    from pomp_ray.sources import gen_corpus
    fix = gen_corpus.generate(str(tmp_path / "corpus"), gen_corpus.TINY)
    ckpt = str(tmp_path / "ckpt")
    _run(["crawl", "--corpus", fix.pages_path, "--ckpt", ckpt,
          "--seeds", fix.seeds_path, "--robots", fix.robots_path])
    tick = _run(["tick", "--corpus", fix.pages_path, "--ckpt", ckpt,
                 "--robots", fix.robots_path,
                 "--archive", str(tmp_path / "arch")])
    assert tick["requeued_stale"] > 0
    assert tick["archive"]["pages"] == 57   # latest capture per url
    assert os.path.isdir(str(tmp_path / "arch" / "warc"))
    exp = _run(["export-seeds", "--ckpt", ckpt,
                "--out", str(tmp_path / "seeds")])
    assert exp["seeds_exported"] == 0       # drained crawl: no pending work
    pub = _run(["publish", "--ckpt", ckpt, "--out",
                str(tmp_path / "arch2")])
    assert pub["cdx_rows"] == 57
