"""Versioned corpus store: a minimal manifest-pinned table format over
parquet (the lakehouse pattern -- snapshot isolation, time travel,
vacuum) for corpus publishing between crawl rounds.

Layout:

    root/_manifest.json      {"current": N, "versions": {"N": {...}}}
    root/v000N/part-*.parquet

Every ``commit`` writes a NEW version directory (Ray-native streaming
write, one file per block) and atomically swaps the manifest
(tmp + os.replace).  Readers resolve the manifest's EXACT file list --
never a glob -- so a half-written commit or stray file is invisible
(snapshot isolation), and an old version keeps reading identically
until ``vacuum`` drops it.  At 100-TB scale the version directory is
the unit of retention; manifests stay O(files).
"""

from __future__ import annotations

import glob
import json
import os

import ray.data as rd


class VersionedCorpus:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    @property
    def _manifest_path(self) -> str:
        return os.path.join(self.root, "_manifest.json")

    def _load(self) -> dict:
        if not os.path.exists(self._manifest_path):
            return {"current": 0, "versions": {}}
        with open(self._manifest_path) as f:
            return json.load(f)

    def _store(self, m: dict) -> None:
        tmp = self._manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(m, f, indent=1, sort_keys=True)
        os.replace(tmp, self._manifest_path)

    def commit(self, ds: rd.Dataset, message: str = "") -> int:
        """Write ``ds`` as the next version; returns the version id.
        The manifest swap is the commit point -- a crash before it
        leaves an unreferenced directory that vacuum() collects."""
        m = self._load()
        v = int(m["current"]) + 1
        vdir = os.path.join(self.root, f"v{v:04d}")
        ds.write_parquet(vdir)
        files = sorted(os.path.basename(p)
                       for p in glob.glob(os.path.join(vdir, "*.parquet")))
        n_rows = sum(_parquet_rows(os.path.join(vdir, f)) for f in files)
        m["versions"][str(v)] = {
            "dir": f"v{v:04d}", "files": files, "n_rows": n_rows,
            "parent": int(m["current"]) or None, "message": message}
        m["current"] = v
        self._store(m)
        return v

    def read(self, version: int | None = None) -> rd.Dataset:
        """Dataset over the manifest-pinned files of ``version``
        (default: current).  Time travel = pass an old id."""
        m = self._load()
        v = int(m["current"]) if version is None else int(version)
        info = m["versions"].get(str(v))
        if info is None:
            raise FileNotFoundError(f"version {v} not in manifest "
                                    f"(vacuumed or never committed)")
        paths = [os.path.join(self.root, info["dir"], f)
                 for f in info["files"]]
        return rd.read_parquet(paths)

    def versions(self) -> list[dict]:
        m = self._load()
        return [{"version": int(k), **v}
                for k, v in sorted(m["versions"].items(),
                                   key=lambda kv: int(kv[0]))]

    def vacuum(self, keep_last: int = 1) -> dict:
        """Drop all but the newest ``keep_last`` versions: manifest
        entries first (the commit point, so readers never see a
        half-deleted version), then directories -- including
        unreferenced dirs from crashed commits."""
        import shutil

        m = self._load()
        keep = sorted((int(k) for k in m["versions"]), reverse=True)
        keep = set(keep[:keep_last])
        dropped = [k for k in list(m["versions"]) if int(k) not in keep]
        for k in dropped:
            del m["versions"][k]
        self._store(m)
        n_dirs = 0
        referenced = {v["dir"] for v in m["versions"].values()}
        for d in glob.glob(os.path.join(self.root, "v[0-9]*")):
            if os.path.basename(d) not in referenced:
                shutil.rmtree(d)
                n_dirs += 1
        return {"kept": sorted(keep), "n_dirs_removed": n_dirs}


def _parquet_rows(path: str) -> int:
    import pyarrow.parquet as pq

    return pq.ParquetFile(path).metadata.num_rows
