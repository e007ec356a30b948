"""StateFS adapter + generation-pointer commit protocol.

The ingest state machine's seven FS primitives route through one adapter
(streaming/statefs.py) so the exactly-once protocol runs unchanged on
local disk, HDFS, or an object store. These tests pin (a) op-level parity
between the POSIX and Hadoop backends over the same tree, (b) the
pointer-commit swap (the object-store mode, where no directory rename is
ever trusted) producing byte-identical pipeline state to the rename swap,
and (c) the pointer-mode re-train swap seam rolling forward exactly like
the rename-mode seam the r9 suite already pins.
"""
from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from multi_model_vectorsearch_spark.streaming.ingest import IngestPipeline
from multi_model_vectorsearch_spark.streaming.statefs import (
    HadoopStateFS,
    LocalStateFS,
    statefs_for,
)


def _moddocs(tables, n):
    return tables["documents"].limit(n).select(
        "doc_id", "text",
        F.element_at(
            F.array(F.lit("text"), F.lit("image"), F.lit("audio")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("modality"),
    )


def test_backend_op_parity(spark, tmp_path):
    """Every adapter primitive agrees between the POSIX backend and the
    Hadoop backend resolved over the same local tree."""
    root = str(tmp_path / "tree")
    lfs = LocalStateFS()
    hfs = HadoopStateFS(spark, root)
    assert hfs.scheme == "file" and hfs.atomic_rename

    spark.range(3).write.parquet(lfs.join(root, "b0"))
    os.makedirs(lfs.join(root, "empty"))
    lfs.write_text(lfs.join(root, "_CURRENT"), ".gen-2")

    for fs in (lfs, hfs):
        assert fs.isdir(root) and fs.isdir(fs.join(root, "b0"))
        assert not fs.isdir(fs.join(root, "nope"))
        assert fs.isfile(fs.join(root, "_CURRENT"))
        assert not fs.isfile(fs.join(root, "b0"))
        assert fs.listdir(root) == ["_CURRENT", "b0", "empty"]
        assert fs.listdir(fs.join(root, "nope")) == []
        assert fs.has_parquet(fs.join(root, "b0"))
        assert fs.has_parquet(root)  # via the non-hidden child
        assert not fs.has_parquet(fs.join(root, "empty"))
        assert fs.read_text(fs.join(root, "_CURRENT")) == ".gen-2"
        assert fs.read_text(fs.join(root, "nope")) is None

    # hidden subtrees don't count as readable state, on either backend
    spark.range(2).write.parquet(lfs.join(root, ".gen-3", "b0"))
    for fs in (lfs, hfs):
        assert not fs.has_parquet(fs.join(root, "empty"))
        assert fs.has_parquet(fs.join(root, ".gen-3"))  # explicit root ok

    # rename + recursive delete round-trip through the Hadoop API
    hfs.rename(hfs.join(root, "b0"), hfs.join(root, "b1"))
    assert lfs.isdir(lfs.join(root, "b1"))
    assert not lfs.isdir(lfs.join(root, "b0"))
    hfs.rmtree(hfs.join(root, "b1"))
    assert not lfs.isdir(lfs.join(root, "b1"))
    hfs.write_text(hfs.join(root, "ptr"), "x\ny")
    assert lfs.read_text(lfs.join(root, "ptr")) == "x\ny"
    hfs.rmtree(hfs.join(root, "ptr"))  # plain-file delete, both backends
    assert lfs.read_text(lfs.join(root, "ptr")) is None


def test_statefs_routing_and_commit_mode(spark, tmp_path):
    """Bare paths get the POSIX backend; URI schemes go through Hadoop.
    commit_mode='auto' resolves from the backend's rename guarantee."""
    assert isinstance(statefs_for(spark, str(tmp_path)), LocalStateFS)
    assert isinstance(statefs_for(spark, "file:///tmp/x"), HadoopStateFS)

    class FakeObjectStore(LocalStateFS):
        atomic_rename = False

    p1 = IngestPipeline(spark, str(tmp_path / "a"))
    assert p1.commit_mode == "rename"
    p2 = IngestPipeline(spark, str(tmp_path / "b"), fs=FakeObjectStore())
    assert p2.commit_mode == "pointer"
    with pytest.raises(ValueError, match="commit_mode"):
        IngestPipeline(spark, str(tmp_path / "c"), commit_mode="bogus")


def test_pointer_compact_matches_rename_compact(spark, tables, tmp_path):
    """The generation-pointer compact publishes byte-identical state to
    the rename compact, flips atomically (a _CURRENT file names the live
    generation), sweeps the superseded generation, and keeps advancing
    across repeated compactions."""
    docs = _moddocs(tables, 40)
    b0 = docs.filter(F.col("doc_id") < 20)
    b1 = docs.filter(F.col("doc_id") >= 20)

    ref = IngestPipeline(spark, str(tmp_path / "ref"), k=5)
    ptr = IngestPipeline(spark, str(tmp_path / "ptr"), k=5,
                         commit_mode="pointer")
    for pipe in (ref, ptr):
        pipe.process_batch(b0, 0)
        pipe.process_batch(b1, 1)
        assert pipe.compact().get("corpus") == 1

    def snap(pipe):
        return (sorted(map(tuple, pipe.corpus().collect())),
                sorted(map(tuple, pipe.edges().collect())))

    assert snap(ptr) == snap(ref)
    cur = ptr.fs.read_text(ptr.fs.join(ptr.corpus_dir, "_CURRENT"))
    assert cur == ".gen-1"
    # gen-0 root-level state was swept: only the pointer + live gen remain
    visible = [e for e in ptr.fs.listdir(ptr.corpus_dir)
               if not e.startswith(("_", "."))]
    assert visible == []
    # a second compact advances the generation and removes the old one
    ptr.process_batch(b0.limit(5).withColumn(
        "text", F.concat(F.col("text"), F.lit(" v2"))), 2)
    ptr.compact()
    assert ptr.fs.read_text(
        ptr.fs.join(ptr.corpus_dir, "_CURRENT")) == ".gen-2"
    assert not ptr.fs.isdir(ptr.fs.join(ptr.corpus_dir, ".gen-1"))
    assert ptr.corpus().count() == 45


def test_pointer_torn_batch_survives_compact_and_replays(
        spark, tables, tmp_path):
    """Pointer-mode twin of the r8 kill-compact pin: a torn batch's
    subdirectories are carried into the new generation BEFORE the flip,
    so a post-compact replay still excludes its own partial writes and
    finishes the batch with state identical to an uninterrupted run."""
    docs = _moddocs(tables, 40)
    b0 = docs.filter(F.col("doc_id") < 20)
    b1 = docs.filter(F.col("doc_id") >= 20)

    ref = IngestPipeline(spark, str(tmp_path / "ref"), k=5)
    ref.process_batch(b0, 0)
    ref.process_batch(b1, 1)

    ptr = IngestPipeline(spark, str(tmp_path / "ptr"), k=5,
                         commit_mode="pointer")
    ptr.process_batch(b0, 0)
    orig = ptr.knn_against_corpus

    def dying(*a, **kw):
        raise RuntimeError("injected crash after corpus write")

    ptr.knn_against_corpus = dying
    with pytest.raises(RuntimeError, match="injected"):
        ptr.process_batch(b1, 1)
    ptr.knn_against_corpus = orig
    assert ptr._torn_batch_keys() == {"b1"}

    ptr.compact()
    key_dir = ptr._bdir(ptr.corpus_dir, "b1")
    assert ptr.fs.isdir(key_dir), "torn subdir must ride into the new gen"
    assert ptr._torn_batch_keys() == {"b1"}

    ptr.process_batch(b1, 1)  # the checkpoint replay
    def snap(pipe):
        return (sorted(map(tuple, pipe.corpus().collect())),
                sorted(map(tuple, pipe.edges().collect())))

    assert snap(ptr) == snap(ref)


def test_pointer_retrain_seam_rolls_forward(spark, tables, tmp_path):
    """The re-train's one non-atomic seam — between the index flip and
    the centroid flip — under pointer commit: a crash there leaves the
    index pointer advanced with the committed next-generation centroids
    still staged, and any writer entry point must finish the flip,
    restoring a matched centroid/assignment pair (the rename-mode twin
    of this pin is test_retrain_swap_seam_rolls_forward)."""
    docs = _moddocs(tables, 360)
    pipe = IngestPipeline(spark, str(tmp_path / "st"), k=6,
                          maintain_ivf=True, n_centroids=None,
                          ivf_bootstrap=16, commit_mode="pointer")
    pipe.process_batch(docs.filter(F.col("doc_id") < 20), 0)
    c0 = pipe.centroids().count()
    assert c0 > 1

    orig_swap = pipe._swap_dir
    calls = {"n": 0}

    def crash_on_second_flip(live, nxt):
        calls["n"] += 1
        if calls["n"] == 2:
            raise RuntimeError("injected crash between the two flips")
        return orig_swap(live, nxt)

    pipe._swap_dir = crash_on_second_flip
    with pytest.raises(RuntimeError, match="injected"):
        pipe.process_batch(docs.filter(F.col("doc_id") >= 20), 1)
    pipe._swap_dir = orig_swap
    # crash window: index flipped to the new generation, centroids stale
    assert pipe._gen_num(pipe.index_dir) == 1
    assert pipe._gen_num(pipe.centroids_dir) == 0
    assert pipe.centroids().count() == c0  # the degraded (old) set

    # a fresh pipeline object (the restarted process) rolls it forward
    pipe2 = IngestPipeline(spark, str(tmp_path / "st"), k=6,
                           maintain_ivf=True, n_centroids=None,
                           ivf_bootstrap=16, commit_mode="pointer")
    pipe2.compact()  # any writer entry point
    assert pipe2._gen_num(pipe2.centroids_dir) >= 1
    c1 = pipe2.centroids().count()
    assert c1 >= 2 * c0, "rolled-forward pair must be the re-trained one"
    n = pipe2.corpus().count()
    idx = pipe2.ivf_index()
    assert idx.count() == n
    assert idx.select("doc_id").distinct().count() == n
    # serving works against the converged pair
    sample = docs.orderBy("doc_id").first()
    rows = pipe2.search_ivf(sample.text, k=6, probes=c1).collect()
    assert rows[0].s == 1.0


def test_has_parquet_under_hidden_prefixed_root(spark, tmp_path):
    """r10-advisor pin: listFiles returns scheme-qualified URIs even for a
    bare-path base, so a string-prefix slice misaligns and runs the hidden
    check over the ROOT's own components — a state root under a '_'- or
    '.'-prefixed parent (a perfectly legal deploy path) then reads as
    permanently empty. Both backends must see state under such a root."""
    root = str(tmp_path / "_state" / ".area" / "corpus")
    spark.range(3).write.parquet(LocalStateFS.join(root, "b0"))
    lfs = LocalStateFS()
    hfs = HadoopStateFS(spark, root)
    for fs in (lfs, hfs):
        assert fs.has_parquet(root), type(fs).__name__
        assert fs.has_parquet(fs.join(root, "b0")), type(fs).__name__
    # hidden pruning still works for children below the root
    spark.range(2).write.parquet(LocalStateFS.join(root, "b0", ".staged"))
    import shutil

    shutil.rmtree(LocalStateFS.join(root, "b0"))
    spark.range(2).write.parquet(LocalStateFS.join(root, "b0", ".staged"))
    for fs in (lfs, hfs):
        assert not fs.has_parquet(fs.join(root, "b0")), type(fs).__name__


def test_write_text_pointer_never_missing(spark, tmp_path, monkeypatch):
    """r10 verdict item 3: the pointer commit on rename-capable stores must
    be ONE atomic step — the old delete-then-rename dance had a window
    where a concurrent reader (or a crash) observed no ``_CURRENT`` at all
    and resolved state to the swept root. Interleave a reader at every
    seam of the overwrite and require the pointer to always resolve."""
    root = str(tmp_path)
    hfs = HadoopStateFS(spark, root)
    ptr = hfs.join(root, "_CURRENT")
    hfs.write_text(ptr, ".gen-1")

    seen: list[tuple[str, str | None]] = []
    orig_ow = HadoopStateFS._overwrite_rename
    orig_rename = HadoopStateFS.rename

    def spying_ow(self, src, dst):
        seen.append(("pre-commit", LocalStateFS.read_text(ptr)))
        orig_ow(self, src, dst)
        seen.append(("post-commit", LocalStateFS.read_text(ptr)))

    def spying_rename(self, src, dst):
        # the delete+rename fallback would route through here
        seen.append(("fallback-rename", LocalStateFS.read_text(ptr)))
        orig_rename(self, src, dst)

    monkeypatch.setattr(HadoopStateFS, "_overwrite_rename", spying_ow)
    monkeypatch.setattr(HadoopStateFS, "rename", spying_rename)
    hfs.write_text(ptr, ".gen-2")

    assert ("pre-commit", ".gen-1") in seen
    assert ("post-commit", ".gen-2") in seen
    assert not any(e[0] == "fallback-rename" for e in seen), \
        "one-step overwrite must not fall back on file://"
    assert all(v is not None for _, v in seen), \
        "a reader must NEVER observe the pointer missing"
    assert LocalStateFS.read_text(ptr) == ".gen-2"


def test_write_text_fallback_when_filecontext_unavailable(
        spark, tmp_path, monkeypatch):
    """Schemes without an AbstractFileSystem binding can't build a
    FileContext; write_text must degrade to delete+rename and still land
    the new content."""
    root = str(tmp_path)
    hfs = HadoopStateFS(spark, root)
    ptr = hfs.join(root, "_CURRENT")
    hfs.write_text(ptr, ".gen-1")

    def broken_ow(self, src, dst):
        raise RuntimeError("no AbstractFileSystem for scheme")

    monkeypatch.setattr(HadoopStateFS, "_overwrite_rename", broken_ow)
    hfs.write_text(ptr, ".gen-2")
    assert hfs.read_text(ptr) == ".gen-2"
    assert not hfs.isfile(ptr + ".tmp")


class _CrashError(RuntimeError):
    pass


class _CrashFS(LocalStateFS):
    """LocalStateFS that raises on the k-th MUTATING adapter op (rename /
    rmtree / write_text) — every such op is a potential crash seam in the
    commit protocol, and the sweep below exercises all of them."""

    def __init__(self, crash_at: int):
        self.crash_at = crash_at
        self.n = 0

    def _tick(self):
        self.n += 1
        if self.n == self.crash_at:
            raise _CrashError(f"injected crash at mutation {self.n}")

    def rename(self, src, dst):
        self._tick()
        super().rename(src, dst)

    def rmtree(self, path):
        self._tick()
        super().rmtree(path)

    def write_text(self, path, content):
        self._tick()
        super().write_text(path, content)


@pytest.mark.parametrize("commit_mode", ["rename", "pointer"])
def test_exhaustive_crash_sweep_over_retrain_batch(spark, tables, tmp_path,
                                                   commit_mode):
    """Exhaustive crash-point sweep of the exactly-once machine: a
    re-train micro-batch performs every class of state-FS mutation the
    protocol has (staging cleanup, the two swaps, post-flip sweeps), and
    the stream contract says an uncommitted batch replays. For EVERY
    mutating-op index k, crash there, then recover the real way — a
    fresh pipeline replays the batch — and require the final LOGICAL
    state (corpus, edges, index, centroids) to equal the uninterrupted
    run's, in both commit modes. This is the property all the individual
    seam tests (torn batch, swap seam, roll-forward) are instances of."""
    import shutil

    docs = _moddocs(tables, 360)
    b0 = docs.filter(F.col("doc_id") < 20)
    b1 = docs.filter(F.col("doc_id") >= 20)

    def mk(state, fs=None):
        return IngestPipeline(spark, state, k=6, maintain_ivf=True,
                              n_centroids=None, ivf_bootstrap=16,
                              fs=fs, commit_mode=commit_mode)

    def snap(pipe):
        return (sorted(map(tuple, pipe.corpus().collect())),
                sorted(map(tuple, pipe.edges().collect())),
                sorted(map(tuple, pipe.ivf_index().collect())),
                sorted((r.cid, tuple(r.cvec))
                       for r in pipe.centroids().collect()))

    base = str(tmp_path / "base")
    mk(base).process_batch(b0, 0)

    ref_state = str(tmp_path / "ref")
    shutil.copytree(base, ref_state)
    ref = mk(ref_state)
    ref.process_batch(b1, 1)
    want = snap(ref)
    assert want[3], "fixture must have re-trained centroids"

    k = 0
    while True:
        k += 1
        state = str(tmp_path / f"crash{k}")
        shutil.copytree(base, state)
        crashfs = _CrashFS(k)
        try:
            mk(state, fs=crashfs).process_batch(b1, 1)
        except _CrashError:
            pass
        else:
            # k exceeded the batch's mutation count: no crash fired —
            # the sweep has covered every seam
            assert snap(mk(state)) == want
            break
        recovered = mk(state)  # the restarted process
        recovered.process_batch(b1, 1)  # at-least-once replay
        assert snap(recovered) == want, f"divergence at crash point {k}"
    assert k >= (8 if commit_mode == "pointer" else 10), \
        "sweep must have exercised the full mutation sequence"
