#!/usr/bin/env python3
"""Packaging smoke (round-12 verdict item 6): prove `pip install .` has
something to bite on.

A real cluster's driver node installs the engine via pip/wheel rather
than relying on a sys.path checkout; ``ship_package`` then ships the
installed tree to executors. This script exercises the packaging
contract with the PEP 517 hooks directly (the same entry points pip
calls), so it runs in the offline build container too:

1. ``build_sdist`` — the source distribution builds; its PKG-INFO
   metadata carries the right name/version.
2. sdist completeness — the tarball contains every package module
   (compared against the live tree).
3. import-from-installed-copy — the sdist's package tree is unpacked to
   a temp dir, put FIRST on sys.path in a subprocess, and the package
   must import from there with the right ``__version__`` (the driver
   entry contract's import, minus Spark startup).
4. ``build_wheel`` — only when the ``wheel`` backend dependency is
   available (it is on any real deployment host; the offline container
   lacks it, which the script reports and skips, exit still 0).

Exit 0 = the packaging contract holds.
"""
from __future__ import annotations

import os
import subprocess
import sys
import tarfile
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    os.chdir(REPO)
    sys.path.insert(0, REPO)
    from setuptools import build_meta

    tmp = tempfile.mkdtemp(prefix="mmvs-pkg-smoke-")
    import multi_model_vectorsearch_spark as pkg

    # 1+2. sdist builds; PKG-INFO metadata + module completeness
    sdist = build_meta.build_sdist(tmp)
    live = set()
    for dirpath, _dirs, files in os.walk(
            os.path.join(REPO, "multi_model_vectorsearch_spark")):
        for f in files:
            if f.endswith(".py"):
                live.add(os.path.relpath(os.path.join(dirpath, f), REPO))
    with tarfile.open(os.path.join(tmp, sdist)) as tf:
        shipped = {m.name.split("/", 1)[1] for m in tf.getmembers()
                   if m.isfile() and "/" in m.name}
        root = sdist[:-len(".tar.gz")]
        with tf.extractfile(f"{root}/PKG-INFO") as fh:
            meta = {}
            for raw in fh:
                line = raw.decode()
                if not line.strip():
                    break
                if ":" in line:
                    k, _, v = line.partition(":")
                    meta.setdefault(k.strip(), v.strip())
        tf.extractall(os.path.join(tmp, "x"), filter="data")
    assert meta["Name"] == "multi-model-vectorsearch-spark", meta["Name"]
    assert meta["Version"] == pkg.__version__, (
        f"pyproject version {meta['Version']} != package __version__ "
        f"{pkg.__version__}")
    print(f"# metadata ok: {meta['Name']} {meta['Version']}")
    missing = {p for p in live if p not in shipped}
    assert not missing, f"sdist is missing package modules: {missing}"
    print(f"# sdist ok: {sdist} carries all {len(live)} package modules")

    # 3. import from the unpacked (installed-copy-shaped) tree
    unpacked = os.path.join(tmp, "x", sdist[:-len(".tar.gz")])
    out = subprocess.run(
        [sys.executable, "-c",
         "import multi_model_vectorsearch_spark as p;"
         "print(p.__version__, p.__file__)"],
        capture_output=True, text=True,
        env={**os.environ, "PYTHONPATH": unpacked}, cwd=tmp)
    assert out.returncode == 0, out.stderr
    ver, path = out.stdout.split()
    assert ver == pkg.__version__ and path.startswith(unpacked), out.stdout
    print(f"# installed-copy import ok: {ver} from {path}")

    # 4. wheel, where the backend dep exists
    try:
        import wheel  # noqa: F401
    except ImportError:
        print("# wheel backend not installed in this container — "
              "build_wheel SKIPPED (runs on any real deployment host)")
        return 0
    whl = build_meta.build_wheel(tmp)
    print(f"# wheel ok: {whl}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
